"""Sharded-trace story for the Pallas custom kernels.

Pallas calls lower to opaque ``stablehlo.custom_call``s that GSPMD cannot
partition, so programs traced over a serving mesh used to drop BOTH hot
kernels (flash attention, fused GEGLU-FFN) and fall back to the XLA
compositions (round-3 limitation, PERF.md "Serving placements"). But both
kernels are GRID-LOCAL in their math — flash attention per (batch·head)
grid cell, the FFN per token row — so running them under ``shard_map``
with grid-local specs is EXACT and needs zero communication: each device
executes the single-chip kernel on its shard.

This module carries the trace-time context that tells the kernel call
sites (``ops.attention.dot_product_attention``,
``models.blocks.FeedForward``) which mesh the surrounding program is being
traced over and which logical dimensions are sharded:

- ``kind='frame'`` (sequence-parallel serving, ``parallel/infer.py``): the
  FRAME axis is sharded — dim 0 of the spatial transformers' operands
  (frames-in-batch layout), the token/seq axis of the temporal
  transformers. Call sites pass ``frame_dim`` to say where frames live in
  THEIR operands; the wrap follows the existing layout so GSPMD inserts no
  resharding.
- ``kind='batch'`` (dp-batched serving): dim 0 is batch-major everywhere —
  every call site wraps dim 0.
- ``head_axis`` (composed ``('sp','tp')`` serving, ``parallel/tp.py``):
  attention HEADS are additionally sharded over ``tp`` wherever the level's
  head count divides the tp degree — the same gate ``tp_shardings`` uses to
  head-shard the q/k/v projections, so the shard_map specs match GSPMD's
  existing placement and no resharding is inserted. Levels that fail the
  head gate (replicated projections) wrap on the frame axis alone. The
  fused FFN never shards over tp (its weights stay replicated — the GEGLU
  value|gate stacking can't column-shard, see parallel/tp.py) and wraps
  row-locally over sp only.

Each sharded dim is independent in both kernels (attention: batch rows AND
heads index the grid; FFN: token rows), so any combination of these specs
is exact per shard.

The reference has no analog (single-GPU xformers attention,
/root/reference/tools/modules/unet/util.py:212-258).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Dict, Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = [
    "serving_kernel_mesh", "kernel_specs_for", "shard_map_kernel",
    "serving_ctx_active",
]

# (mesh, row_axis, head_axis|None, kind)
_CTX: Optional[Tuple[Mesh, str, Optional[str], str]] = None


@contextmanager
def serving_kernel_mesh(mesh: Mesh, axis: str, kind: str,
                        head_axis: Optional[str] = None):
    """Declare (for the duration of a trace) that programs are being traced
    over ``mesh`` with ``axis`` sharding frames (``kind='frame'``) or the
    batch (``kind='batch'``), and optionally ``head_axis`` sharding
    attention heads (composed tensor-parallel serving). Consulted at trace
    time only — compiled executables keep whatever they were traced with."""
    global _CTX
    assert kind in ("frame", "batch"), kind
    prev = _CTX
    _CTX = (mesh, axis, head_axis, kind)
    try:
        yield
    finally:
        _CTX = prev


def serving_ctx_active() -> bool:
    """True while tracing under a serving mesh (kernels that have no
    shard_map wrapping — e.g. the opt-in fused spatial block — must take
    their XLA path)."""
    return _CTX is not None


def kernel_specs_for(shape, frame_dim: int, head_dim: Optional[int] = None):
    """Return ``(mesh, {dim: axis})`` if a serving mesh is active and the
    kernel's operands can be shard_map'd along it, else None.

    ``shape``: the operand's global shape at the call site.
    ``frame_dim``: which dim of the operand carries frames (where the
    'frame' kind's sharding lives). 'batch' kind always shards dim 0.
    ``head_dim``: which dim carries attention heads (attention call sites
    only); sharded over the context's head axis when the head count divides
    it. Dims that fail divisibility are simply left unsharded; None is
    returned only when NO dim can shard (the caller then takes the
    unwrapped single-device kernel — correct only off-mesh, so callers
    should treat None as "use the XLA path" when ``serving_ctx_active()``).
    """
    if _CTX is None:
        return None
    mesh, row_axis, head_axis, kind = _CTX
    spec: Dict[int, str] = {}
    row = frame_dim if kind == "frame" else 0
    if row < len(shape) and shape[row] % mesh.shape[row_axis] == 0:
        spec[row] = row_axis
    if (head_axis is not None and head_dim is not None
            and head_dim < len(shape) and head_dim != row
            and shape[head_dim] % mesh.shape[head_axis] == 0):
        spec[head_dim] = head_axis
    if not spec:
        return None
    return mesh, spec


def shard_map_kernel(fn, mesh: Mesh, spec_maps: Sequence[Optional[Dict[int, str]]]):
    """``shard_map`` a grid-local kernel: operand i is sharded per
    ``spec_maps[i]`` (``{dim: axis}``; None = fully replicated operand);
    the output is sharded like operand 0. Grid-local means the function
    applies independently along every sharded dim, so per-shard execution
    is exact (``check_vma=False`` skips the replication check the custom
    call can't prove)."""
    try:  # jax>=0.6 stable name, older experimental fallback
        from jax import shard_map

        vma_kwargs = {"check_vma": False}
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

        vma_kwargs = {"check_rep": False}

    def spec(m, ndim):
        if not m:
            return P()
        return P(*[m.get(d) for d in range(ndim)])

    def wrapped(*args):
        in_specs = tuple(spec(m, a.ndim) for m, a in zip(spec_maps, args))
        out_spec = spec(spec_maps[0], args[0].ndim)
        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
            **vma_kwargs,
        )(*args)

    return wrapped
