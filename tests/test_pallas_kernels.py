"""Interpret-mode correctness tests for both Pallas kernels.

``pl.pallas_call(interpret=True)`` executes the kernel bodies on CPU, so a
kernel regression fails the default suite instead of shipping silently
(previously the kernels were validated only by manual TPU scripts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import videomv_tpu.ops.flash_attention as fa
import videomv_tpu.ops.splat_pallas as sp
from videomv_tpu.ops.gaussian_splat import rasterize_dense


@pytest.fixture()
def interpret_kernels(monkeypatch):
    monkeypatch.setattr(fa, "INTERPRET", True)
    monkeypatch.setattr(sp, "INTERPRET", True)


def test_flash_attention_self_attn_matches_reference(interpret_kernels):
    b, s, h, d = 2, 256, 2, 64
    rng = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(rng, i), (b, s, h, d), jnp.float32)
        for i in range(3)
    )
    got = fa._flash_fwd(q, k, v)
    want = fa._reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_attention_cross_attn_padded_kv(interpret_kernels):
    """KV length 77 (text tokens) exercises the pad+mask path."""
    b, sq, sk, h, d = 2, 128, 77, 2, 64
    rng = jax.random.PRNGKey(1)
    q = jax.random.normal(jax.random.fold_in(rng, 0), (b, sq, h, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (b, sk, h, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (b, sk, h, d), jnp.float32)
    got = fa._flash_fwd(q, k, v)
    want = fa._reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def _random_scene(n, rng_seed=0):
    """Gaussians in the LGM activation ranges, plus a front-facing camera."""
    rs = np.random.default_rng(rng_seed)
    pos = rs.uniform(-0.7, 0.7, (n, 3)).astype(np.float32)
    opacity = rs.uniform(0.2, 1.0, (n, 1)).astype(np.float32)
    scale = rs.uniform(0.02, 0.08, (n, 3)).astype(np.float32)
    quat = rs.normal(size=(n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    rgb = rs.uniform(0, 1, (n, 3)).astype(np.float32)
    g = np.concatenate([pos, opacity, scale, quat, rgb], axis=1)

    from videomv_tpu.data.cameras import GSCameraSettings, orbit_c2w_opengl, prepare_gs_training

    st = GSCameraSettings(input_size=64, output_size=64)
    cams = prepare_gs_training(orbit_c2w_opengl(2, 10.0, 1.5), st, ray_size=16)
    return (
        jnp.asarray(g),
        jnp.asarray(cams["cam_view"][0, 0]),
        jnp.asarray(cams["cam_view_proj"][0, 0]),
    )


def test_splat_pallas_forward_matches_dense(interpret_kernels):
    img_size = 32
    gaussians, cv, cvp = _random_scene(192)
    bg = jnp.asarray([1.0, 1.0, 1.0])
    tan_half_fov = float(np.tan(0.5 * np.deg2rad(39.6)))

    img_p, alpha_p, depth_p = sp._rasterize_pallas_fwd_impl(
        gaussians, cv, cvp, img_size, tan_half_fov, bg,
        max_pairs=1 << 12, max_span=16,
    )
    img_d, alpha_d, depth_d = rasterize_dense(
        gaussians, cv, cvp, img_size, tan_half_fov, bg
    )

    assert float(jnp.asarray(alpha_d).max()) > 0.1, "scene must hit the screen"
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_d), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(alpha_p), np.asarray(alpha_d), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(depth_p), np.asarray(depth_d), rtol=1e-4, atol=1e-4
    )
    # composited depth must be positive where the scene is opaque
    assert float((jnp.asarray(depth_d) * (jnp.asarray(alpha_d) > 0.5)).max()) > 0.0


def test_splat_pallas_packed_payload_matches_dense(interpret_kernels):
    """The 8-row bf16-packed inference payload must match the dense render
    to bf16-truncation tolerance (colors/opacity lose ≤1 ulp ≈ 0.4%)."""
    img_size = 32
    gaussians, cv, cvp = _random_scene(192)
    bg = jnp.asarray([0.3, 0.5, 0.7])
    tan_half_fov = float(np.tan(0.5 * np.deg2rad(39.6)))

    out = sp.rasterize_pallas_batch(
        gaussians[None], cv[None, None], cvp[None, None], img_size,
        tan_half_fov, bg, max_pairs=1 << 12, packed=True,
    )
    img_d, alpha_d, depth_d = rasterize_dense(
        gaussians, cv, cvp, img_size, tan_half_fov, bg
    )
    np.testing.assert_allclose(
        np.asarray(out["image"][0, 0]), np.asarray(img_d), atol=1.5e-2
    )
    np.testing.assert_allclose(
        np.asarray(out["alpha"][0, 0]), np.asarray(alpha_d), atol=1.5e-2
    )
    np.testing.assert_allclose(
        np.asarray(out["depth"][0, 0]), np.asarray(depth_d),
        rtol=1e-2, atol=5e-2,
    )


def test_splat_packed_pack_unpack_roundtrip():
    a = jnp.asarray([0.0, 1.0, 0.12345, 3e-4, 250.0], jnp.float32)
    b = jnp.asarray([0.5, 0.0, 7.5, 1e-5, 0.999], jnp.float32)
    hi, lo = sp._unpack2(sp._pack2(a, b))
    np.testing.assert_allclose(
        np.asarray(hi), np.asarray(a.astype(jnp.bfloat16), np.float32), atol=4e-3)
    np.testing.assert_allclose(
        np.asarray(lo), np.asarray(b.astype(jnp.bfloat16), np.float32),
        rtol=1e-2, atol=1e-7)


@pytest.mark.slow
def test_splat_pallas_grads_match_dense(interpret_kernels):
    """The dedicated Pallas backward kernel (+ XLA binning VJP) must agree
    with the dense rasterizer gradient on the same scene."""
    img_size = 16
    gaussians, cv, cvp = _random_scene(64, rng_seed=3)
    bg = jnp.asarray([0.0, 0.0, 0.0])
    tan_half_fov = float(np.tan(0.5 * np.deg2rad(39.6)))

    def loss_pallas(g):
        img, alpha, depth = sp.rasterize_pallas(
            g, cv, cvp, img_size, tan_half_fov, bg, 1 << 11, 16
        )
        return jnp.sum(img ** 2) + jnp.sum(alpha) + 0.3 * jnp.sum(depth ** 2)

    def loss_dense(g):
        img, alpha, depth = rasterize_dense(g, cv, cvp, img_size, tan_half_fov, bg)
        return jnp.sum(img ** 2) + jnp.sum(alpha) + 0.3 * jnp.sum(depth ** 2)

    g_p = jax.grad(loss_pallas)(gaussians)
    g_d = jax.grad(loss_dense)(gaussians)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_d), rtol=1e-3, atol=1e-4)


def test_fused_geglu_ffn_matches_reference(monkeypatch):
    """Fused GEGLU FF kernel vs the XLA reference, including the token-pad
    path and multi-inner-tile accumulation."""
    import videomv_tpu.ops.fused_ffn as ff

    monkeypatch.setattr(ff, "INTERPRET", True)
    rng = jax.random.PRNGKey(3)
    for t, c, inner in ((1024, 256, 1024), (700, 128, 512)):
        x = jax.random.normal(jax.random.fold_in(rng, t), (t, c), jnp.float32) * 0.5
        w1 = jax.random.normal(jax.random.fold_in(rng, t + 1), (c, 2 * inner)) * 0.05
        b1 = jax.random.normal(jax.random.fold_in(rng, t + 2), (2 * inner,)) * 0.1
        w2 = jax.random.normal(jax.random.fold_in(rng, t + 3), (inner, c)) * 0.05
        b2 = jax.random.normal(jax.random.fold_in(rng, t + 4), (c,)) * 0.1
        got = ff._ffn_fwd(x, w1, b1, w2, b2)
        want = ff.geglu_ffn_reference(x, w1, b1, w2, b2)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )


def test_fused_geglu_ffn_grads_match_reference():
    """The custom VJP (XLA recompute path) must differentiate cleanly."""
    import videomv_tpu.ops.fused_ffn as ff

    rng = jax.random.PRNGKey(4)
    t, c, inner = 64, 32, 128
    x = jax.random.normal(jax.random.fold_in(rng, 0), (t, c), jnp.float32) * 0.5
    w1 = jax.random.normal(jax.random.fold_in(rng, 1), (c, 2 * inner)) * 0.05
    b1 = jnp.zeros((2 * inner,))
    w2 = jax.random.normal(jax.random.fold_in(rng, 2), (inner, c)) * 0.05
    b2 = jnp.zeros((c,))

    def loss_fused(x, w1, w2):
        return jnp.sum(ff.geglu_ffn(x, w1, b1, w2, b2) ** 2)

    def loss_ref(x, w1, w2):
        return jnp.sum(ff.geglu_ffn_reference(x, w1, b1, w2, b2) ** 2)

    # forward path of geglu_ffn runs the pallas kernel — use interpret mode
    import videomv_tpu.ops.fused_ffn as m
    old = m.INTERPRET
    m.INTERPRET = True
    try:
        g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w1, w2)
    finally:
        m.INTERPRET = old
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w1, w2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


class TestFusedSpatial:
    @pytest.fixture(scope="class")
    def setup(self):
        from videomv_tpu.models.blocks import SpatialTransformer

        rng = jax.random.PRNGKey(5)
        r, s, c, heads = 2, 512, 128, 2
        mod = SpatialTransformer(
            in_channels=c, n_heads=heads, d_head=64, depth=1,
            context_dim=96, dropout=0.0,
        )
        x4 = jax.random.normal(jax.random.fold_in(rng, 0), (r, 16, 32, c)) * 0.5
        ctx = jax.random.normal(jax.random.fold_in(rng, 1), (r, 7, 96)) * 0.5
        params = mod.init(jax.random.PRNGKey(0), x4, ctx)
        return mod, x4, ctx, params

    def test_reference_matches_module(self, setup):
        """The pure-jnp oracle must equal the module composition exactly."""
        mod, x4, ctx, params = setup
        from videomv_tpu.ops.fused_spatial import spatial_block_reference

        r, hh, ww, c = x4.shape
        want = mod.apply(params, x4, ctx)
        got = spatial_block_reference(
            x4.reshape(r, hh * ww, c), ctx, params["params"], mod.n_heads
        ).reshape(r, hh, ww, c)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_kernel_matches_reference(self, setup, monkeypatch):
        """Interpret-mode fused kernel vs the oracle (bf16 matmuls inside the
        kernel → loose tolerance)."""
        mod, x4, ctx, params = setup
        import videomv_tpu.ops.fused_spatial as fs

        monkeypatch.setattr(fs, "INTERPRET", True)
        r, hh, ww, c = x4.shape
        want = fs.spatial_block_reference(
            x4.reshape(r, hh * ww, c), ctx, params["params"], mod.n_heads
        )
        got = fs._fst_impl(
            x4.reshape(r, hh * ww, c), ctx, params["params"], mod.n_heads
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=3e-2,
        )

    def test_kernel_multirow_bf16_res_matches_reference(self, setup, monkeypatch):
        """The VERDICT-r3 #8 experiment arms (rows-per-cell > 1, bf16
        residual carriers) must stay numerically faithful to the oracle."""
        mod, x4, ctx, params = setup
        import videomv_tpu.ops.fused_spatial as fs

        monkeypatch.setattr(fs, "INTERPRET", True)
        monkeypatch.setenv("VIDEOMV_FUSED_SPATIAL_ROWS", "2")
        monkeypatch.setenv("VIDEOMV_FUSED_SPATIAL_BF16_RES", "1")
        r, hh, ww, c = x4.shape
        want = fs.spatial_block_reference(
            x4.reshape(r, hh * ww, c), ctx, params["params"], mod.n_heads
        )
        got = fs._fst_impl(
            x4.reshape(r, hh * ww, c), ctx, params["params"], mod.n_heads
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=4e-2,
        )


def test_expand_tiers_bit_identical(interpret_kernels):
    """The three pair-expansion tiers (single packed cummax / two-cummax /
    per-pair meta row-gather — selected statically by int32 bit budget) must
    produce bit-identical payload and tile tables on the same scene.
    Only the fastest tier runs in production at a given shape
    (scripts/probe_expand_variants.py); this pins semantic equivalence."""
    from videomv_tpu.ops.gaussian_splat import project_gaussians

    img_size = 32
    gaussians, cv, cvp = _random_scene(192)
    tan_half_fov = float(np.tan(0.5 * np.deg2rad(39.6)))
    proj = project_gaussians(gaussians, cv, cvp, img_size, tan_half_fov)
    outs = {
        mode: sp._bin_pairs(
            *proj, img_size=img_size, max_pairs=1 << 12, max_span=16,
            expand_mode=mode,
        )
        for mode in ("packed1", "packed2", "gather")
    }
    for mode in ("packed2", "gather"):
        for a, b in zip(outs["packed1"][:3], outs[mode][:3]):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=mode)


def test_prefix_sum_mxu_matches_cumsum():
    """MXU triangular-matmul prefix sum == jnp.cumsum for int32 histograms
    (padding, non-divisible lengths, repeated values)."""
    rng = np.random.default_rng(3)
    for n in (256, 300, 4096, 5000):
        x = rng.integers(0, 7, n).astype(np.int32)
        got = np.asarray(sp._prefix_sum_mxu(jnp.asarray(x)))
        np.testing.assert_array_equal(got, np.cumsum(x).astype(np.int32))


def test_counting_binning_matches_sort(interpret_kernels):
    """The opt-in counting placement (cumulative-rectangle ranks, no sort)
    must produce bit-identical payload/tile tables to the sort path.
    (A/B-measured slower on TPU — kept as the documented alternative;
    scripts/ab_counting_sort.py.)"""
    from videomv_tpu.ops.gaussian_splat import project_gaussians

    img_size = 32
    gaussians, cv, cvp = _random_scene(192)
    tan_half_fov = float(np.tan(0.5 * np.deg2rad(39.6)))
    proj = project_gaussians(gaussians, cv, cvp, img_size, tan_half_fov)
    outs = {}
    for counting in (False, True):
        outs[counting] = sp._bin_pairs(
            *proj, img_size=img_size, max_pairs=1 << 12, max_span=16,
            counting=counting,
        )
    for a, b in zip(outs[False][:3], outs[True][:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_counting_binning_overflow_prefix(interpret_kernels):
    """Overflowed capacity keeps a depth-prefix: tile counts must never
    exceed the capacity and the composite must stay finite."""
    from videomv_tpu.ops.gaussian_splat import project_gaussians

    img_size = 32
    gaussians, cv, cvp = _random_scene(192)
    tan_half_fov = float(np.tan(0.5 * np.deg2rad(39.6)))
    proj = project_gaussians(gaussians, cv, cvp, img_size, tan_half_fov)
    payload, ts, tc, n_side = sp._bin_pairs(
        *proj, img_size=img_size, max_pairs=512, max_span=16, counting=True,
    )
    assert int((ts + tc).max()) <= 512
    img, alpha, depth = sp._composite_tiles(payload, ts, tc, n_side)
    assert np.isfinite(np.asarray(img)).all()


def test_ffn_eligible_gates_on_dtype(monkeypatch):
    """fp32 traces must never take the fused FFN kernel: its VMEM tiling is
    sized for 2-byte weights and OOMs at 2x the bytes (the round-3 fp32
    acceptance-path failure). bf16 at the same shape stays eligible."""
    import videomv_tpu.ops.fused_ffn as ff

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    t, c, inner = 48 * 1024, 320, 1280
    assert ff.ffn_eligible(t, c, inner, jnp.bfloat16)
    assert not ff.ffn_eligible(t, c, inner, jnp.float32)
    assert not ff.ffn_eligible(t, c, inner, jnp.float16)
