"""Pallas kernels on SHARDED serving traces (ops/serving_mesh.py).

Round-3 limitation: Pallas custom calls carry no GSPMD partitioning rules,
so every serving mesh traced with the kernels disabled. Both kernels are
row-local, so running them under ``shard_map`` with row-local specs is
exact — these tests pin that parity on the 8-device CPU mesh with the
kernel bodies interpreted (``pl.pallas_call(interpret=True)``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import videomv_tpu.ops.attention as attn_mod
import videomv_tpu.ops.flash_attention as fa
import videomv_tpu.ops.fused_ffn as ffn_mod
from videomv_tpu.ops.serving_mesh import (
    kernel_specs_for,
    serving_ctx_active,
    serving_kernel_mesh,
)


def _mesh(axis="sp", n=8):
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=(axis,))


@pytest.fixture()
def interpret_kernels(monkeypatch):
    monkeypatch.setattr(fa, "INTERPRET", True)
    monkeypatch.setattr(ffn_mod, "INTERPRET", True)
    # CPU suite: bypass the backend/shape policy gates (the kernels
    # themselves are what's under test)
    monkeypatch.setattr(
        attn_mod, "_pallas_eligible", lambda q, k: q.shape[1] == k.shape[1]
    )
    monkeypatch.setattr(
        ffn_mod, "ffn_eligible", lambda t, c, inner, dtype=None: True
    )


def test_ctx_helpers():
    mesh = _mesh()
    assert not serving_ctx_active()
    assert kernel_specs_for((16, 64, 2, 32), 0) is None
    with serving_kernel_mesh(mesh, "sp", "frame"):
        assert serving_ctx_active()
        m, spec = kernel_specs_for((16, 64, 2, 32), 0)
        assert m is mesh and spec == {0: "sp"}
        # frames on dim 1 (temporal layout)
        _, spec = kernel_specs_for((128, 8, 64), 1)
        assert spec == {1: "sp"}
        # non-divisible sharded dim -> no wrap
        assert kernel_specs_for((13, 64, 2, 32), 0) is None
    assert not serving_ctx_active()
    with serving_kernel_mesh(mesh, "sp", "batch"):
        # batch kind always shards dim 0, whatever frame_dim says
        _, spec = kernel_specs_for((16, 8, 64), 1)
        assert spec == {0: "sp"}


def test_ctx_helpers_composed():
    """Composed ('sp','tp') context: frames over sp, attention heads over
    tp where the head count divides; failing dims drop out individually."""
    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, axis_names=("sp", "tp"))
    with serving_kernel_mesh(mesh, "sp", "frame", head_axis="tp"):
        # both gates pass: rows over sp, heads over tp
        _, spec = kernel_specs_for((16, 64, 8, 32), 0, head_dim=2)
        assert spec == {0: "sp", 2: "tp"}
        # odd head count (5): head gate fails, row-only wrap remains
        _, spec = kernel_specs_for((16, 64, 5, 32), 0, head_dim=2)
        assert spec == {0: "sp"}
        # FFN-style call (no head_dim): row-only
        _, spec = kernel_specs_for((16, 64, 320), 0)
        assert spec == {0: "sp"}
        # nothing shards -> None (caller takes the XLA path)
        assert kernel_specs_for((13, 64, 5, 32), 0, head_dim=2) is None


def test_flash_attention_sharded_matches_reference(interpret_kernels):
    """dot_product_attention under a serving mesh: the kernel runs per
    frame shard via shard_map; output equals the XLA reference."""
    mesh = _mesh()
    b, s, h, d = 16, 64, 2, 32
    rng = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(rng, i), (b, s, h, d), jnp.float32)
        for i in range(3)
    )
    want = attn_mod._reference_attention(q, k, v)
    with serving_kernel_mesh(mesh, "sp", "frame"):
        got = jax.jit(attn_mod.dot_product_attention)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_feedforward_sharded_matches_unsharded(interpret_kernels):
    """FeedForward's fused kernel under frame sharding: spatial layout
    (frames = dim 0) and temporal layout (frames = dim 1) both wrap with
    row-local specs and match the single-trace fused output exactly."""
    from videomv_tpu.models.blocks import FeedForward

    mesh = _mesh()
    rng = jax.random.PRNGKey(1)

    # spatial: [2f, seq, c], frames-in-batch rows
    ff = FeedForward(dim=64, frame_dim=0, dtype=jnp.float32)
    x = jax.random.normal(rng, (16, 64, 64), jnp.float32)
    params = ff.init(jax.random.PRNGKey(2), x)
    base = jax.jit(lambda p, xx: ff.apply(p, xx))(params, x)
    with serving_kernel_mesh(mesh, "sp", "frame"):
        got = jax.jit(lambda p, xx: ff.apply(p, xx))(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-5, atol=1e-6)

    # temporal: [b*h*w, f, c], frames are the token axis
    ff_t = FeedForward(dim=64, frame_dim=1, dtype=jnp.float32)
    xt = jax.random.normal(jax.random.fold_in(rng, 7), (32, 8, 64), jnp.float32)
    params_t = ff_t.init(jax.random.PRNGKey(3), xt)
    base_t = jax.jit(lambda p, xx: ff_t.apply(p, xx))(params_t, xt)
    with serving_kernel_mesh(mesh, "sp", "frame"):
        got_t = jax.jit(lambda p, xx: ff_t.apply(p, xx))(params_t, xt)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(base_t),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_frame_parallel_pipeline_keeps_kernels(interpret_kernels):
    """End-to-end: generate(frame_parallel=True) traced with the kernels
    ACTIVE (interpreted) matches the single-device run — the round-3
    kernels-off-on-meshes limitation is closed for 1-axis meshes."""
    from videomv_tpu.config import load_inference_config
    from videomv_tpu.inference.pipeline import T2VPipeline

    cfg = load_inference_config("configs/t2v_infer_tiny.yaml")
    pipe = T2VPipeline(cfg, seed=0)
    pipe.init_params(load=False)
    base = pipe.generate("a chair", steps=2, seed=5)
    fp = pipe.generate("a chair", steps=2, seed=5, frame_parallel=True)
    assert pipe._sp_mesh is not None and pipe._sp_mesh.shape["sp"] == 8
    np.testing.assert_allclose(fp["latents"], base["latents"],
                               rtol=2e-4, atol=2e-5)


def test_composed_tp_mesh_keeps_kernels():
    """_kernel_trace_ctx enters the serving ctx for 1-axis AND composed
    ('sp','tp') meshes (round-4: the tp head axis rides shard_map too —
    flash attention is head-local)."""
    from videomv_tpu.inference.pipeline import _kernel_trace_ctx

    sp = _mesh()
    with _kernel_trace_ctx(sp, "frame"):
        assert serving_ctx_active()
        assert kernel_specs_for((16, 64, 8, 32), 0, head_dim=2)[1] == {0: "sp"}
    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    sptp = Mesh(devices, axis_names=("sp", "tp"))
    with _kernel_trace_ctx(sptp, "frame"):
        assert serving_ctx_active()
        assert kernel_specs_for((16, 64, 8, 32), 0, head_dim=2)[1] == \
            {0: "sp", 2: "tp"}
    with _kernel_trace_ctx(None, "frame"):
        assert not serving_ctx_active()


def test_flash_attention_head_sharded_matches_reference(interpret_kernels):
    """Composed ('sp','tp') mesh: attention wraps rows over sp AND heads
    over tp; output equals the XLA reference."""
    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, axis_names=("sp", "tp"))
    b, s, h, d = 8, 64, 4, 32
    rng = jax.random.PRNGKey(3)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(rng, i), (b, s, h, d), jnp.float32)
        for i in range(3)
    )
    want = attn_mod._reference_attention(q, k, v)
    with serving_kernel_mesh(mesh, "sp", "frame", head_axis="tp"):
        got = jax.jit(attn_mod.dot_product_attention)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_tp_serving_pipeline_keeps_kernels(interpret_kernels):
    """End-to-end: generate(frame_parallel=True) with serving_tp=2 (a 4x2
    sp*tp mesh) traced with the kernels ACTIVE matches the single-device
    run — the last kernels-off-on-meshes case is closed."""
    from videomv_tpu.config import load_inference_config
    from videomv_tpu.inference.pipeline import T2VPipeline

    cfg = load_inference_config("configs/t2v_infer_tiny.yaml")
    cfg.serving_tp = 2
    pipe = T2VPipeline(cfg, seed=0)
    pipe.init_params(load=False)
    base = pipe.generate("a chair", steps=2, seed=5)
    fp = pipe.generate("a chair", steps=2, seed=5, frame_parallel=True)
    assert pipe._sp_mesh is not None and pipe._sp_mesh.axis_names == ("sp", "tp")
    np.testing.assert_allclose(fp["latents"], base["latents"],
                               rtol=2e-4, atol=2e-5)
