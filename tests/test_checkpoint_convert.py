"""Torch→Flax converter: key mapping, layout transposes, and numerical parity
of converted blocks against an independent torch implementation of the same
math (GroupNorm/Conv/Linear semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from videomv_tpu.models.blocks import ResBlock, SpatialTransformer
from videomv_tpu.training.checkpoints import map_torch_to_flax


def _t2n(t):
    return t.detach().numpy()


class TorchMiniRes(tnn.Module):
    """Independent torch impl of the ResBlock math (GN→SiLU→conv, +emb,
    GN→SiLU→zero conv, skip) with reference-compatible key names."""

    def __init__(self, cin, cemb, cout):
        super().__init__()
        self.in_layers = tnn.Sequential(
            tnn.GroupNorm(32, cin), tnn.SiLU(), tnn.Conv2d(cin, cout, 3, padding=1)
        )
        self.emb_layers = tnn.Sequential(tnn.SiLU(), tnn.Linear(cemb, cout))
        self.out_layers = tnn.Sequential(
            tnn.GroupNorm(32, cout), tnn.SiLU(), tnn.Dropout(0.0),
            tnn.Conv2d(cout, cout, 3, padding=1),
        )
        self.skip_connection = tnn.Conv2d(cin, cout, 1)

    def forward(self, x, emb):
        h = self.in_layers(x)
        h = h + self.emb_layers(emb)[..., None, None]
        h = self.out_layers(h)
        return self.skip_connection(x) + h


@pytest.mark.parity
def test_resblock_parity_with_torch():
    cin, cemb, cout = 32, 64, 64
    tmod = TorchMiniRes(cin, cemb, cout).eval()
    sd = {k: _t2n(v) for k, v in tmod.state_dict().items()}

    fmod = ResBlock(channels=cin, emb_channels=cemb, out_channels=cout,
                    dropout=0.0, use_temporal_conv=False)
    x = np.random.RandomState(0).randn(2, cin, 8, 8).astype(np.float32)
    emb = np.random.RandomState(1).randn(2, cemb).astype(np.float32)

    params = jax.jit(fmod.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(emb),
        1,
    )
    new_params, report = map_torch_to_flax(sd, params, strict=True)
    assert not report["missing"] and not report["unexpected"]

    out_f = jax.jit(lambda p, x, e: fmod.apply(p, x, e, 1))(
        new_params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(emb)
    )
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(x), torch.from_numpy(emb)).numpy()
    np.testing.assert_allclose(
        np.asarray(out_f).transpose(0, 3, 1, 2), out_t, atol=2e-5
    )


@pytest.mark.parity
def test_spatial_transformer_parity_with_torch():
    """Full spatial transformer (GN → linear proj → self+cross attn + GEGLU FF
    → zero proj, residual) vs independent torch math."""
    C, heads, dh, ctx_dim = 32, 2, 16, 24

    class TorchAttn(tnn.Module):
        def __init__(self, qd, cd):
            super().__init__()
            inner = heads * dh
            self.to_q = tnn.Linear(qd, inner, bias=False)
            self.to_k = tnn.Linear(cd, inner, bias=False)
            self.to_v = tnn.Linear(cd, inner, bias=False)
            self.to_out = tnn.Sequential(tnn.Linear(inner, qd), tnn.Dropout(0.0))

        def forward(self, x, ctx=None):
            ctx = x if ctx is None else ctx
            q, k, v = self.to_q(x), self.to_k(ctx), self.to_v(ctx)
            b, s, _ = q.shape
            sk = k.shape[1]
            q = q.view(b, s, heads, dh).transpose(1, 2)
            k = k.view(b, sk, heads, dh).transpose(1, 2)
            v = v.view(b, sk, heads, dh).transpose(1, 2)
            a = torch.softmax(q @ k.transpose(-1, -2) * dh ** -0.5, dim=-1)
            o = (a @ v).transpose(1, 2).reshape(b, s, heads * dh)
            return self.to_out(o)

    class TorchBTB(tnn.Module):
        def __init__(self):
            super().__init__()
            self.attn1 = TorchAttn(heads * dh, heads * dh)
            self.attn2 = TorchAttn(heads * dh, ctx_dim)
            self.norm1 = tnn.LayerNorm(heads * dh)
            self.norm2 = tnn.LayerNorm(heads * dh)
            self.norm3 = tnn.LayerNorm(heads * dh)
            self.ff = tnn.Module()
            self.ff.net = tnn.Sequential()
            proj = tnn.Linear(heads * dh, heads * dh * 4 * 2)
            self.ff.net.add_module("0", tnn.Module())
            self.ff.net[0].proj = proj
            self.ff.net.add_module("1", tnn.Dropout(0.0))
            self.ff.net.add_module("2", tnn.Linear(heads * dh * 4, heads * dh))

        def forward(self, x, ctx):
            x = x + self.attn1(self.norm1(x))
            x = x + self.attn2(self.norm2(x), ctx)
            h = self.ff.net[0].proj(self.norm3(x))
            a, g = h.chunk(2, dim=-1)
            x = x + self.ff.net[2](a * torch.nn.functional.gelu(g))
            return x

    class TorchST(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm = tnn.GroupNorm(32, C, eps=1e-6)
            self.proj_in = tnn.Linear(C, heads * dh)
            self.transformer_blocks = tnn.ModuleList([TorchBTB()])
            self.proj_out = tnn.Linear(heads * dh, C)
            tnn.init.zeros_(self.proj_out.weight)
            tnn.init.zeros_(self.proj_out.bias)

        def forward(self, x, ctx):
            b, c, hh, ww = x.shape
            xin = x
            h = self.norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
            h = self.proj_in(h)
            h = self.transformer_blocks[0](h, ctx)
            h = self.proj_out(h)
            return h.reshape(b, hh, ww, c).permute(0, 3, 1, 2) + xin

    # randomize the zero-init proj_out so the test is non-trivial
    tmod = TorchST().eval()
    with torch.no_grad():
        tmod.proj_out.weight.normal_(0, 0.05)
        tmod.proj_out.bias.normal_(0, 0.05)
    sd = {k: _t2n(v) for k, v in tmod.state_dict().items()}

    fmod = SpatialTransformer(in_channels=C, n_heads=heads, d_head=dh,
                              context_dim=ctx_dim, dropout=0.0)
    rs = np.random.RandomState(0)
    x = rs.randn(2, C, 8, 8).astype(np.float32)
    ctx = rs.randn(2, 5, ctx_dim).astype(np.float32)

    params = jax.jit(fmod.init)(
        jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(ctx)
    )
    new_params, report = map_torch_to_flax(sd, params, strict=True)

    out_f = jax.jit(fmod.apply)(new_params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(ctx))
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(x), torch.from_numpy(ctx)).numpy()
    np.testing.assert_allclose(
        np.asarray(out_f).transpose(0, 3, 1, 2), out_t, atol=1e-4
    )


@pytest.mark.parity
def test_temporal_conv_parity_with_torch():
    """TemporalConvBlockV2 (4× (3,1,1) conv3d) vs independent torch math —
    exercises the converter's rank-5 kernel transpose."""
    from videomv_tpu.models.blocks import TemporalConvBlockV2

    C = 32

    class TorchTC(tnn.Module):
        def __init__(self):
            super().__init__()
            def seq(drop):
                layers = [tnn.GroupNorm(32, C), tnn.SiLU()]
                if drop:
                    layers.append(tnn.Dropout(0.0))
                layers.append(tnn.Conv3d(C, C, (3, 1, 1), padding=(1, 0, 0)))
                return tnn.Sequential(*layers)
            self.conv1 = seq(False)
            self.conv2 = seq(True)
            self.conv3 = seq(True)
            self.conv4 = seq(True)

        def forward(self, x):  # [B, C, F, H, W]
            h = self.conv4(self.conv3(self.conv2(self.conv1(x))))
            return x + h

    tmod = TorchTC().eval()
    with torch.no_grad():
        # randomize the zero-init tail so the test is non-trivial
        tmod.conv4[-1].weight.normal_(0, 0.05)
        tmod.conv4[-1].bias.normal_(0, 0.05)
    sd = {k: _t2n(v) for k, v in tmod.state_dict().items()}

    fmod = TemporalConvBlockV2(in_dim=C, out_dim=C, dropout=0.0)
    x = np.random.RandomState(0).randn(1, C, 6, 4, 4).astype(np.float32)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # [B, F, H, W, C]
    params = jax.jit(fmod.init)(jax.random.PRNGKey(0), x_nhwc)
    new_params, report = map_torch_to_flax(sd, params, strict=True)

    out_f = jax.jit(fmod.apply)(new_params, x_nhwc)
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(
        np.asarray(out_f).transpose(0, 4, 1, 2, 3), out_t, atol=1e-4
    )


@pytest.mark.parity
def test_vae_key_surface_matches_sd_layout():
    """The VAE param tree must expose exactly the SD checkpoint key surface
    (encoder.down.N.block.M..., mid blocks, quant convs) so the released
    VQGAN_autoencoder.pth maps 1:1."""
    from videomv_tpu.models.autoencoder import AutoencoderKL

    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    p = jax.jit(vae.init)(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))
    flat = jax.tree_util.tree_flatten_with_path(p)[0]
    names = {"/".join(str(k.key) for k in path if hasattr(k, "key")) for path, _ in flat}
    for expect in (
        "encoder/conv_in/kernel",
        "encoder/down_0_block_0/norm1/scale",
        "encoder/down_0_downsample_conv/kernel",
        "encoder/mid_attn_1/q/kernel",
        "encoder/norm_out/scale",
        "decoder/up_1_upsample_conv/kernel",
        "decoder/mid_block_2/conv2/bias",
        "quant_conv/kernel",
        "post_quant_conv/bias",
    ):
        assert any(expect in n for n in names), expect


@pytest.mark.parity
@pytest.mark.slow
def test_load_weights_raises_on_mostly_unmatched_checkpoint(tmp_path):
    """A checkpoint that matches almost nothing must fail loudly instead of
    silently proceeding with random-init weights (pipeline.load_weights)."""
    from safetensors.numpy import save_file

    from videomv_tpu.config import load_config
    from videomv_tpu.inference.pipeline import T2VPipeline

    junk = tmp_path / "junk.safetensors"
    save_file({"totally.wrong.key.weight": np.zeros((3, 3), np.float32)}, str(junk))

    cfg = load_config("configs/t2v_infer_tiny.yaml", opts=[])
    cfg.test_model = str(junk)
    pipe = T2VPipeline(cfg)
    pipe.init_params(load=False)
    with pytest.raises(ValueError, match="matched only"):
        pipe.load_weights()
