"""Tensor-parallel (Megatron-style) attention sharding: head-sharded qkv,
row-parallel out-proj, everything else replicated (parallel/tp.py). Pure
placement change — the same jitted forward must match the single-device
result on a 1-D tp mesh AND on the composed ('sp', 'tp') serving mesh.

No reference analog (one sample per GPU there); this is the scale-out axis
past frame-parallelism's num_frames-device cap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videomv_tpu.inference.pipeline import _pallas_kernels_disabled
from videomv_tpu.models import UNetSD_T2VBase
from videomv_tpu.parallel import (
    place_params_tp, replicate_params, shard_on_axis, tensor_parallel_mesh,
    tp_shardings,
)


@pytest.fixture(scope="module")
def tiny():
    m = UNetSD_T2VBase(
        in_dim=4, dim=64, y_dim=32, context_dim=32, out_dim=4,
        dim_mult=(1, 2), num_heads=2, head_dim=16, num_res_blocks=1,
        attn_scales=(1.0, 0.5), dropout=0.0, use_camera_condition=True,
    )
    b, f, hw = 1, 4, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, 4, f, hw, hw))
    t = jnp.array([500])
    y = jax.random.normal(jax.random.PRNGKey(1), (b, 5, 32))
    cam = jax.random.normal(jax.random.PRNGKey(2), (b, f, 16))
    p = m.init(jax.random.PRNGKey(3), x, t, y=y, camera_data=cam)
    # zero-init leaves (proj_out, camera MLP — reference/SD init) make the
    # attention output path inert at init; perturb so tp placement is load-
    # bearing rather than multiplying by zeros
    leaves, td = jax.tree_util.tree_flatten(p)
    ks = jax.random.split(jax.random.PRNGKey(4), len(leaves))
    leaves = [
        l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
        if bool(jnp.all(l == 0)) else l
        for l, k in zip(leaves, ks)
    ]
    p = jax.tree_util.tree_unflatten(td, leaves)
    fwd = jax.jit(lambda p, x, t, y, c: m.apply(p, x, t, y=y, camera_data=c))
    ref = np.asarray(fwd(p, x, t, y, cam))
    return m, p, (x, t, y, cam), fwd, ref


def test_mesh_selection():
    # 8 virtual CPU devices (conftest); tp must divide num_heads
    assert tensor_parallel_mesh(num_heads=2).shape["tp"] == 2
    assert tensor_parallel_mesh(num_heads=8).shape["tp"] == 8
    assert tensor_parallel_mesh(num_heads=6).shape["tp"] == 6
    assert tensor_parallel_mesh(num_heads=1) is None
    m = tensor_parallel_mesh(num_heads=8, tp=2, sp=4)
    assert dict(m.shape) == {"sp": 4, "tp": 2}
    with pytest.raises(ValueError):
        tensor_parallel_mesh(num_heads=8, tp=3)
    with pytest.raises(ValueError):
        tensor_parallel_mesh(num_heads=8, tp=8, sp=2)  # 16 > 8 devices


@pytest.mark.slow
def test_sharding_rules(tiny):
    _, p, _, _, _ = tiny
    mesh = tensor_parallel_mesh(num_heads=2)
    specs = tp_shardings(p, mesh)
    flat = dict(
        ("/".join(str(getattr(k, "key", k)) for k in path), s)
        for path, s in jax.tree_util.tree_flatten_with_path(specs)[0]
    )
    col = [k for k, s in flat.items()
           if "to_q/kernel" in k or "to_k/kernel" in k or "to_v/kernel" in k]
    assert col and all(flat[k].spec == jax.sharding.PartitionSpec(None, "tp")
                       for k in col)
    row = [k for k in flat if "to_out_0/kernel" in k]
    assert row and all(flat[k].spec == jax.sharding.PartitionSpec("tp", None)
                       for k in row)
    # conv kernels, norms, biases: replicated
    other = [k for k, s in flat.items()
             if k not in col and k not in row]
    assert all(flat[k].spec == jax.sharding.PartitionSpec() for k in other)


@pytest.mark.slow
def test_tp_forward_parity(tiny):
    _, p, args, fwd, ref = tiny
    mesh = tensor_parallel_mesh(num_heads=2)
    with _pallas_kernels_disabled(enabled=True):
        out = fwd(place_params_tp(mesh, p), *replicate_params(mesh, args))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_sp_tp_composed_parity(tiny):
    """The flagship serving shape: frames over 'sp' AND heads over 'tp' on
    one 2-D mesh — a single sample on sp*tp devices."""
    _, p, (x, t, y, cam), fwd, ref = tiny
    mesh = tensor_parallel_mesh(num_heads=2, tp=2, sp=4)
    with _pallas_kernels_disabled(enabled=True):
        out = fwd(
            place_params_tp(mesh, p),
            shard_on_axis(mesh, x, 2),
            *replicate_params(mesh, (t, y)),
            shard_on_axis(mesh, cam, 1),
        )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_head_divisibility_gate():
    """With head_dim given, a projection shards only when its head count
    divides tp — a 5-head projection split 2 ways would cut a head in half
    and force GSPMD resharding at the heads reshape (pipeline passes the
    UNet's head_dim for exactly this; per-level head counts vary)."""
    from jax.sharding import PartitionSpec as P

    mesh = tensor_parallel_mesh(num_heads=2)  # tp=2 on the 8-device mesh
    hd = 16
    tree = {"blk": {
        "to_q": {"kernel": jnp.zeros((64, 5 * hd))},       # 5 heads: gate fails
        "to_k": {"kernel": jnp.zeros((64, 4 * hd))},       # 4 heads: shards
        "to_out_0": {"kernel": jnp.zeros((5 * hd, 64))},   # 5 heads: gate fails
    }}
    specs = tp_shardings(tree, mesh, head_dim=hd)
    assert specs["blk"]["to_q"]["kernel"].spec == P()
    assert specs["blk"]["to_k"]["kernel"].spec == P(None, "tp")
    assert specs["blk"]["to_out_0"]["kernel"].spec == P()
    # without head_dim the gate is raw divisibility: 80 % 2 == 0 → shards
    specs2 = tp_shardings(tree, mesh)
    assert specs2["blk"]["to_q"]["kernel"].spec == P(None, "tp")
    assert specs2["blk"]["to_out_0"]["kernel"].spec == P("tp", None)


def test_mid_head_gate_requires_exact_head_multiple():
    """A dim that floor-divides to a tp-divisible head count but is NOT an
    exact head multiple (dim=160, head_dim=64 -> 160//64 == 2 divisible by
    tp=2, yet 160 % 64 != 0) must stay replicated — sharding it would split
    the trailing partial head across devices (ADVICE r3)."""
    from jax.sharding import PartitionSpec as P

    mesh = tensor_parallel_mesh(num_heads=2)
    tree = {"blk": {"to_q": {"kernel": jnp.zeros((64, 160))}}}
    specs = tp_shardings(tree, mesh, head_dim=64)
    assert specs["blk"]["to_q"]["kernel"].spec == P()
