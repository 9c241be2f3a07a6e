"""Sharded-trace story for the Pallas custom kernels.

Pallas calls lower to opaque ``stablehlo.custom_call``s that GSPMD cannot
partition, so programs traced over a serving mesh used to drop BOTH hot
kernels (flash attention, fused GEGLU-FFN) and fall back to the XLA
compositions (round-3 limitation, PERF.md "Serving placements"). But both
kernels are row-local in their math — flash attention per (batch·head)
grid cell, the FFN per token row — so running them under ``shard_map``
with row-local specs is EXACT and needs zero communication: each device
executes the single-chip kernel on its shard.

This module carries the trace-time context that tells the kernel call
sites (``ops.attention.dot_product_attention``,
``models.blocks.FeedForward``) which mesh the surrounding program is being
traced over and which logical dimension is sharded:

- ``kind='frame'`` (sequence-parallel serving, ``parallel/infer.py``): the
  FRAME axis is sharded — dim 0 of the spatial transformers' operands
  (frames-in-batch layout), the token/seq axis of the temporal
  transformers. Call sites pass ``frame_dim`` to say where frames live in
  THEIR operands; the wrap follows the existing layout so GSPMD inserts no
  resharding.
- ``kind='batch'`` (dp-batched serving): dim 0 is batch-major everywhere —
  every call site wraps dim 0.

Composed ``('sp','tp')`` meshes stay on the XLA paths: tensor-parallel
attention shards HEADS via in-trace constraints the kernel cannot see, and
forcing a head spec here would fight GSPMD's placement (this narrows the
original blanket disable instead of removing it; see
``inference.pipeline._pallas_kernels_disabled``).

The reference has no analog (single-GPU xformers attention,
/root/reference/tools/modules/unet/util.py:212-258).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "serving_kernel_mesh", "kernel_mesh_for", "shard_map_rows",
    "serving_ctx_active",
]

_CTX: Optional[Tuple[Mesh, str, str]] = None  # (mesh, axis, kind)


@contextmanager
def serving_kernel_mesh(mesh: Mesh, axis: str, kind: str):
    """Declare (for the duration of a trace) that programs are being traced
    over ``mesh`` with ``axis`` sharding frames (``kind='frame'``) or the
    batch (``kind='batch'``). Consulted at trace time only — compiled
    executables keep whatever they were traced with."""
    global _CTX
    assert kind in ("frame", "batch"), kind
    prev = _CTX
    _CTX = (mesh, axis, kind)
    try:
        yield
    finally:
        _CTX = prev


def serving_ctx_active() -> bool:
    """True while tracing under a serving mesh (kernels that have no
    shard_map wrapping — e.g. the opt-in fused spatial block — must take
    their XLA path)."""
    return _CTX is not None


def kernel_mesh_for(shape, frame_dim: int):
    """Return ``(mesh, sharded_dim)`` if a serving mesh is active and the
    kernel's operands can be row-sharded along it, else None.

    ``shape``: the operand's global shape at the call site.
    ``frame_dim``: which dim of the operand carries frames (where the
    'frame' kind's sharding lives). 'batch' kind always shards dim 0."""
    if _CTX is None:
        return None
    mesh, axis, kind = _CTX
    dim = frame_dim if kind == "frame" else 0
    n = mesh.shape[axis]
    if dim >= len(shape) or shape[dim] % n != 0 or shape[dim] // n < 1:
        return None
    return mesh, axis, dim


def shard_map_rows(fn, mesh: Mesh, axis: str, dims, n_out_dims=None):
    """``shard_map`` a row-local kernel: operand i is sharded on ``dims[i]``
    over ``axis`` (None = fully replicated operand); the output is sharded
    like operand 0. Row-local means the function applies independently
    along the sharded dim, so per-shard execution is exact
    (``check_vma=False`` skips the replication check the custom call
    can't prove)."""
    try:  # jax>=0.6 stable name, older experimental fallback
        from jax import shard_map

        vma_kwargs = {"check_vma": False}
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

        vma_kwargs = {"check_rep": False}

    def spec(d, ndim):
        if d is None:
            return P()
        s = [None] * ndim
        s[d] = axis
        return P(*s)

    def wrapped(*args):
        in_specs = tuple(spec(d, a.ndim) for d, a in zip(dims, args))
        out_ndim = n_out_dims if n_out_dims is not None else args[0].ndim
        out_spec = spec(dims[0], out_ndim)
        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
            **vma_kwargs,
        )(*args)

    return wrapped
