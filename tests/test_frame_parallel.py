"""Frame-sharded (sequence-parallel) inference: sharding one sample's frame
axis over an ``sp`` mesh must be a pure placement change — bit-for-bit-ish
identical latents to the single-device run, with spatial blocks frame-local
and GSPMD inserting the temporal collectives (parallel/infer.py).

The reference has no analog (one sample per GPU); this is the TPU-native
single-sample latency lever.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videomv_tpu.config import load_inference_config
from videomv_tpu.inference.pipeline import T2VPipeline
from videomv_tpu.parallel import frame_parallel_mesh, replicate_params, shard_on_axis


def test_mesh_picks_divisor():
    # 8 virtual CPU devices (conftest); 6 frames → largest divisor ≤ 8 is 6
    mesh = frame_parallel_mesh(6)
    assert mesh is not None and mesh.shape["sp"] == 6
    mesh = frame_parallel_mesh(8)
    assert mesh is not None and mesh.shape["sp"] == 8
    # 7 frames → 7 devices
    assert frame_parallel_mesh(7).shape["sp"] == 7
    # cap by n_devices
    assert frame_parallel_mesh(8, n_devices=4).shape["sp"] == 4
    # degenerate: 1 frame → no mesh
    assert frame_parallel_mesh(1) is None


@pytest.fixture(scope="module")
def tiny_pipe():
    cfg = load_inference_config("configs/t2v_infer_tiny.yaml")
    pipe = T2VPipeline(cfg, seed=0)
    pipe.init_params(load=False)
    return pipe


@pytest.mark.slow
def test_frame_parallel_matches_single_device(tiny_pipe):
    pipe = tiny_pipe
    base = pipe.generate("a chair", steps=3, seed=5)
    fp = pipe.generate("a chair", steps=3, seed=5, frame_parallel=True)
    assert pipe._sp_mesh is not None and pipe._sp_mesh.shape["sp"] == 8
    # same math, different placement: fp32 CPU tolerances only allow for
    # reassociation differences from re-partitioned reductions
    np.testing.assert_allclose(fp["latents"], base["latents"], rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(fp["frames"].shape, base["frames"].shape)


def test_sharded_forward_layout(tiny_pipe):
    """The sharded inputs actually shard: noise placed on the sp mesh has
    one frame-slice shard per device."""
    pipe = tiny_pipe
    mesh = frame_parallel_mesh(pipe.max_frames)
    x = jnp.zeros((1, 4, pipe.max_frames, 4, 4))
    xs = shard_on_axis(mesh, x, 2)
    shards = xs.addressable_shards
    assert len(shards) == mesh.shape["sp"]
    assert shards[0].data.shape[2] == pipe.max_frames // mesh.shape["sp"]
    p = replicate_params(mesh, {"w": jnp.ones((3, 3))})
    assert len(p["w"].addressable_shards) == mesh.shape["sp"]
    assert p["w"].addressable_shards[0].data.shape == (3, 3)


@pytest.mark.slow
def test_custom_negative_words_respected_under_fp(tiny_pipe):
    """A caller-supplied negative encoding must steer the CFG uncond row
    even under frame-parallel serving — the orbit placement cache must not
    substitute the default negative (regression: the old _sp_cache bundled
    negative_words into the per-orbit entry).

    At random init the cross-attn transformers' proj_out is zero-init
    (reference/SD init scheme), making text conditioning inert — perturb
    the zero leaves so the CFG rows actually diverge."""
    pipe = tiny_pipe
    leaves, treedef = jax.tree_util.tree_flatten(pipe._params["unet"])
    keys = jax.random.split(jax.random.PRNGKey(3), len(leaves))
    leaves = [
        l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
        if bool(jnp.all(l == 0)) else l
        for l, k in zip(leaves, keys)
    ]
    pipe._params["unet"] = jax.tree_util.tree_unflatten(treedef, leaves)
    pipe._params_sp = None  # mutated params invalidate the mesh snapshot

    default = pipe.generate("a chair", steps=3, seed=5, frame_parallel=True)
    custom_neg = pipe.encode_text(["low quality, blurry"])
    custom = pipe.generate(
        "a chair", steps=3, seed=5, frame_parallel=True,
        negative_words=custom_neg,
    )
    assert not np.allclose(custom["latents"], default["latents"]), (
        "custom negative_words had no effect under frame_parallel"
    )
    # and the default path afterwards is unpoisoned by the custom call
    again = pipe.generate("a chair", steps=3, seed=5, frame_parallel=True)
    np.testing.assert_allclose(again["latents"], default["latents"], rtol=1e-6)


def test_weight_reload_invalidates_clip_caches(tiny_pipe):
    """load_weights / init_params must drop negative-prompt encodings and
    mesh param snapshots produced by the previous weights (regression:
    stale random-init CLIP encodings survived a checkpoint load)."""
    pipe = tiny_pipe
    pipe._negative_cache["stale"] = jnp.zeros((1, 77, 8))
    pipe.load_weights()  # tiny config ships no checkpoint paths: pure invalidation
    assert not pipe._negative_cache
    assert pipe._params_sp is None and pipe._params_dp is None


@pytest.mark.slow
def test_serving_tp_composed_mesh_parity():
    """cfg serving_tp=2 composes a ('sp','tp') mesh inside generate():
    frames over sp, attention heads over tp — one sample on sp*tp devices,
    same latents as the single-device run."""
    cfg = load_inference_config("configs/t2v_infer_tiny.yaml")
    cfg["serving_tp"] = 2
    pipe = T2VPipeline(cfg, seed=0)
    pipe.init_params(load=False)
    base = pipe.generate("a chair", steps=3, seed=5)
    fp = pipe.generate("a chair", steps=3, seed=5, frame_parallel=True)
    assert pipe._sp_mesh is not None
    assert dict(pipe._sp_mesh.shape) == {"sp": 4, "tp": 2}
    np.testing.assert_allclose(fp["latents"], base["latents"], rtol=2e-4, atol=2e-5)
