"""Tests for the dormant temporal-attention variants of the block zoo.

The reference keeps these behind the USE_TEMPORAL_TRANSFORMER=False code
constant (unet_t2v.py:27) / unused class definitions:
  - rotary TemporalAttentionBlock + RelativePositionBias + focus-present /
    video / sim masks (util.py:871-990, 271-309)
  - TemporalAttentionMultiBlock honoring temporal_attn_times (util.py:1249)
  - causal TemporalTransformer_attemask (util.py:1150-1247, 430-474)
  - DropPath (util.py:1395-1433)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videomv_tpu.models import (
    DropPath,
    RelativePositionBias,
    TemporalAttentionBlock,
    TemporalAttentionMultiBlock,
    UNetSD_T2VBase,
    rotary_rotate,
)


def test_rotary_relative_property():
    """<rot(q)_i, rot(k)_j> must depend only on i-j (and position 0 is the
    identity rotation)."""
    rng = np.random.RandomState(0)
    d, n, rot = 16, 8, 8
    q = jnp.asarray(rng.randn(1, n, d).astype(np.float32))
    k = jnp.asarray(rng.randn(1, n, d).astype(np.float32))
    rq, rk = rotary_rotate(q, rot), rotary_rotate(k, rot)
    # position 0 rotation is identity
    np.testing.assert_allclose(rq[0, 0], q[0, 0], atol=1e-6)
    # norms preserved (rotation)
    np.testing.assert_allclose(
        jnp.linalg.norm(rq, axis=-1), jnp.linalg.norm(q, axis=-1), rtol=1e-5
    )
    # shift q and k by the same offset: same vectors placed at i+2, j+2 must
    # produce the same dot product as at i, j
    q2 = jnp.roll(q, 2, axis=1)
    k2 = jnp.roll(k, 2, axis=1)
    rq2, rk2 = rotary_rotate(q2, rot), rotary_rotate(k2, rot)
    dot_a = jnp.einsum("bd,bd->b", rq[:, 1], rk[:, 3])
    dot_b = jnp.einsum("bd,bd->b", rq2[:, 3], rk2[:, 5])
    np.testing.assert_allclose(dot_a, dot_b, rtol=1e-4)
    # channels past rot_dim pass through
    assert jnp.array_equal(rotary_rotate(q, 8)[..., 8:], q[..., 8:])


def test_relative_position_bias_structure():
    mod = RelativePositionBias(heads=4, num_buckets=32, max_distance=32)
    params = mod.init(jax.random.PRNGKey(0), 24)
    bias = mod.apply(params, 24)
    assert bias.shape == (4, 24, 24)
    # bucket of (i,i) is constant along the diagonal
    diag = jnp.diagonal(bias, axis1=1, axis2=2)
    np.testing.assert_allclose(diag, diag[:, :1] * jnp.ones_like(diag), atol=1e-6)
    # bias depends only on relative offset: check a stripe
    np.testing.assert_allclose(bias[:, 2, 5], bias[:, 10, 13], atol=1e-6)


def _randomize_torch(module, seed=0):
    import torch

    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in module.named_parameters():
            if p.ndim == 1 and name.endswith("weight"):
                p.copy_(1.0 + 0.2 * torch.randn(p.shape, generator=gen))
            else:
                p.copy_(0.15 * torch.randn(p.shape, generator=gen))


@pytest.mark.parity
def test_temporal_attention_block_parity_vs_reference():
    """Forward parity of the rotary temporal attention block against the
    reference torch implementation (util.py:871-990), covering rotary
    positions, relative-position bias, sim (causal) mask, and a mixed
    focus-present mask. NOTE: the pre-attention GroupNorm spans the frame
    axis in BOTH implementations, so the block is deliberately NOT strictly
    causal even under use_sim_mask — parity, not causality, is the contract."""
    import sys
    import torch

    from reference_oracle import load as load_ref
    from videomv_tpu.training.checkpoints import map_torch_to_flax

    ref_util = load_ref("tools.modules.unet.util")
    rot = sys.modules["rotary_embedding_torch"].RotaryEmbedding(16)

    b, f, hw, dim, heads = 2, 6, 2, 64, 4
    tblock = ref_util.TemporalAttentionBlock(
        dim, heads=heads, rotary_emb=rot, use_sim_mask=True
    ).eval()
    _randomize_torch(tblock, seed=3)
    tbias = ref_util.RelativePositionBias(heads=heads, max_distance=32).eval()
    _randomize_torch(tbias, seed=4)

    fblock = TemporalAttentionBlock(
        dim=dim, heads=heads, rotary_dim=16, use_sim_mask=True
    )
    fbias = RelativePositionBias(heads=heads, max_distance=32)

    rs = np.random.RandomState(5)
    x = rs.randn(b, dim, f, hw, hw).astype(np.float32)  # torch layout
    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))        # [B, F, H, W, C]

    params = fblock.init(jax.random.PRNGKey(0), xj)
    params, rep = map_torch_to_flax(
        {k: v.detach().numpy() for k, v in tblock.state_dict().items()},
        params, strict=True,
    )
    bias_params = fbias.init(jax.random.PRNGKey(0), f)
    bias_params, _ = map_torch_to_flax(
        {k: v.detach().numpy() for k, v in tbias.state_dict().items()},
        bias_params, strict=True,
    )

    with torch.no_grad():
        pos_t = tbias(f, device="cpu")
    pos_f = fbias.apply(bias_params, f)
    np.testing.assert_allclose(np.asarray(pos_f), pos_t.numpy(), atol=1e-6)

    # case 1: pos_bias + causal sim mask
    with torch.no_grad():
        out_t = tblock(torch.from_numpy(x), pos_bias=pos_t).numpy()
    out_f = jax.jit(fblock.apply)(params, xj, pos_f)
    np.testing.assert_allclose(
        np.asarray(out_f).transpose(0, 4, 1, 2, 3), out_t, atol=2e-5, rtol=1e-4
    )

    # case 2: mixed focus-present mask (row 0 self-only, row 1 attend-all)
    focus = np.array([True, False])
    with torch.no_grad():
        out_t2 = tblock(
            torch.from_numpy(x), pos_bias=pos_t,
            focus_present_mask=torch.from_numpy(focus),
        ).numpy()
    out_f2 = jax.jit(fblock.apply)(params, xj, pos_f, jnp.asarray(focus))
    np.testing.assert_allclose(
        np.asarray(out_f2).transpose(0, 4, 1, 2, 3), out_t2, atol=2e-5, rtol=1e-4
    )


@pytest.mark.parity
def test_unet_rotary_variant_parity_vs_reference(monkeypatch):
    """Full-UNet parity on the dormant USE_TEMPORAL_TRANSFORMER=False path:
    the reference constant is patched off, its state dict pushed through the
    real converter, forwards compared (temporal_attn_times=2)."""
    import torch

    from reference_oracle import load as load_ref
    from videomv_tpu.training.checkpoints import convert_unet

    ref_mod = load_ref("tools.modules.unet.unet_t2v")
    monkeypatch.setattr(ref_mod, "USE_TEMPORAL_TRANSFORMER", False)

    kw = dict(
        in_dim=4, dim=32, y_dim=32, context_dim=1024, out_dim=4, dim_mult=[1, 2],
        num_heads=2, head_dim=16, num_res_blocks=1, attn_scales=[1.0],
        dropout=0.0, temporal_attention=True, use_camera_condition=True,
        use_checkpoint=False, temporal_attn_times=2,
    )
    tref = ref_mod.UNetSD_T2VBase(**kw).eval()
    _randomize_torch(tref, seed=6)
    sd = {k: v.detach().numpy() for k, v in tref.state_dict().items()}

    fkw = {k: (tuple(v) if isinstance(v, list) else v) for k, v in kw.items()}
    fmod = UNetSD_T2VBase(**fkw, temporal_block="rotary")

    b, f, hw = 1, 3, 8
    rs = np.random.RandomState(7)
    x = rs.randn(b, 4, f, hw, hw).astype(np.float32)
    t = np.array([123], np.int64)
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
def test_attemask_transformer_parity_vs_reference():
    """Causal temporal transformer parity (util.py:1150-1247 with the
    LowerTriangularMask attention, util.py:430-474)."""
    import torch

    from reference_oracle import load as load_ref
    from videomv_tpu.models import TemporalTransformerAttemask
    from videomv_tpu.training.checkpoints import map_torch_to_flax

    ref_util = load_ref("tools.modules.unet.util")
    tmod = ref_util.TemporalTransformer_attemask(
        64, 4, 16, depth=1, use_linear=False, use_checkpoint=False
    ).eval()
    _randomize_torch(tmod, seed=8)

    fmod = TemporalTransformerAttemask(in_channels=64, n_heads=4, d_head=16)
    b, f, hw = 2, 5, 2
    rs = np.random.RandomState(9)
    x = rs.randn(b, 64, f, hw, hw).astype(np.float32)
    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))

    params = fmod.init(jax.random.PRNGKey(0), xj)
    params, rep = map_torch_to_flax(
        {k: v.detach().numpy() for k, v in tmod.state_dict().items()},
        params, strict=True,
    )
    out_f = jax.jit(fmod.apply)(params, xj)
    with torch.no_grad():
        out_t = tmod(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(
        np.asarray(out_f).transpose(0, 4, 1, 2, 3), out_t, atol=2e-5, rtol=1e-4
    )


def test_multiblock_honors_temporal_attn_times():
    mod = TemporalAttentionMultiBlock(dim=64, heads=4, temporal_attn_times=3)
    x = jnp.zeros((1, 4, 2, 2, 64))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params.keys()) == {"att_layers_0", "att_layers_1", "att_layers_2"}


@pytest.fixture(scope="module")
def tiny_unet_io():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4, 4, 8, 8).astype(np.float32))
    t = jnp.asarray([3.0])
    y = jnp.asarray(rng.randn(1, 5, 32).astype(np.float32))
    cam = jnp.asarray(rng.randn(1, 4, 16).astype(np.float32))
    return x, t, y, cam


def _tiny_unet(**kw):
    return UNetSD_T2VBase(
        in_dim=4, dim=64, y_dim=32, context_dim=32, out_dim=4,
        dim_mult=(1, 2), num_heads=2, head_dim=16, num_res_blocks=1,
        attn_scales=(1.0,), dropout=0.0, **kw,
    )


@pytest.mark.slow
def test_unet_rotary_variant_forward(tiny_unet_io):
    """temporal_block='rotary' builds the MultiBlock path (with the shared
    time_rel_pos_bias table) and runs with temporal_attn_times=2 honored."""
    x, t, y, cam = tiny_unet_io
    model = _tiny_unet(temporal_block="rotary", temporal_attn_times=2,
                       use_sim_mask=True)
    params = model.init(jax.random.PRNGKey(0), x, t, y, None, cam)
    p = params["params"]
    assert "time_rel_pos_bias" in p
    assert "att_layers_1" in p["input_blocks_0_1"]
    out = jax.jit(model.apply)(params, x, t, y, None, cam)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


def test_unet_attemask_variant_forward(tiny_unet_io):
    """temporal_block='attemask' runs and is causal over the frame axis at
    the temporal mixers."""
    x, t, y, cam = tiny_unet_io
    model = _tiny_unet(temporal_block="attemask")
    params = model.init(jax.random.PRNGKey(0), x, t, y, None, cam)
    out = jax.jit(model.apply)(params, x, t, y, None, cam)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


def test_unet_rejects_unknown_temporal_block(tiny_unet_io):
    x, t, y, cam = tiny_unet_io
    model = _tiny_unet(temporal_block="bogus")
    with pytest.raises(ValueError, match="temporal_block"):
        model.init(jax.random.PRNGKey(0), x, t, y, None, cam)


def test_drop_path():
    mod = DropPath(p=1.0)
    x = jnp.ones((4, 3))
    # deterministic: identity
    out = mod.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(out, x)
    # p=1: all dropped, no rescale
    out = mod.apply({}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_array_equal(out, jnp.zeros_like(x))
    # keep override wins
    keep = jnp.asarray([True, False, False, False])
    out = mod.apply({}, x, keep=keep, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_array_equal(out[0], x[0])
    np.testing.assert_array_equal(out[1:], jnp.zeros_like(x[1:]))
