"""Tensor-parallel (Megatron-style) attention sharding for serving.

A TPU-native scale-out axis with no reference analog (the reference serves
one sample per GPU). Frame-parallel serving (``infer.py``) caps at
``num_frames`` devices; tensor parallelism composes with it on a 2-D
``('sp', 'tp')`` mesh so a single sample can use ``frames × tp`` chips.

Mechanism — placement is the annotation, exactly like fsdp/sp: the UNet's
attention projections get head-sharded parameter placements and GSPMD
propagates the layout through the unchanged jitted sampler:

- ``to_q/to_k/to_v`` kernels ``[in, heads·head_dim]`` shard the OUT dim
  (column-parallel). The ``(tokens, heads·head_dim) → (tokens, heads,
  head_dim)`` reshape factors cleanly because every block's head count is
  the constant UNet ``num_heads`` (models/unet_t2v.py) — ``tp`` must divide
  it — so each device attends over its local heads with zero collectives.
- ``to_out_0`` kernels ``[heads·head_dim, out]`` shard the IN dim
  (row-parallel): each device contributes a partial product and GSPMD
  inserts ONE psum per attention, the textbook Megatron count. The bias
  stays replicated (added once, after the reduce).
- Everything else (convs, norms, time/camera MLPs, GEGLU FFN) stays
  replicated. The fused GEGLU layout ``[in, 2·inner]`` (value|gate stacked
  for torch-checkpoint parity, blocks.py FeedForward) cannot shard its OUT
  dim without splitting value and gate across devices — the elementwise
  ``value · gelu(gate)`` would reshard every call — so the FFN is left
  replicated rather than sharded badly.

tp traces keep the Pallas flash-attention kernel: it is head-local, so the
call site wraps it in ``shard_map`` with heads sharded over tp at exactly
the levels this module's head gate shards the projections
(ops/serving_mesh.py; levels that fail the gate wrap on the frame axis
alone). The fused GEGLU-FFN stays row-wrapped only — its weights are
replicated under tp (see above).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tensor_parallel_mesh", "tp_shardings", "place_params_tp"]

logger = logging.getLogger(__name__)

# leaf names of the attention projections, as declared by
# models/blocks.py::CrossAttention (torch-checkpoint-parity names)
_COLUMN_PARALLEL = ("to_q", "to_k", "to_v")
_ROW_PARALLEL = ("to_out_0",)


def tensor_parallel_mesh(
    num_heads: int,
    tp: Optional[int] = None,
    sp: int = 1,
    n_devices: Optional[int] = None,
) -> Optional[Mesh]:
    """Build a ``('sp', 'tp')`` mesh (1-D ``('tp',)`` when ``sp == 1``).

    ``tp`` must divide ``num_heads`` (the head axis is what shards); when
    omitted, the largest head-divisor that fits the remaining devices is
    chosen. Returns None when only one device would participate.
    """
    avail = len(jax.devices()) if n_devices is None else min(n_devices, len(jax.devices()))
    budget = avail // max(sp, 1)
    if tp is None:
        tp = max((d for d in range(1, budget + 1) if num_heads % d == 0), default=1)
    if num_heads % tp != 0:
        raise ValueError(f"tp={tp} must divide num_heads={num_heads}")
    if sp * tp > avail:
        raise ValueError(f"sp*tp = {sp}*{tp} exceeds {avail} devices")
    if tp == 1 and sp == 1:
        return None
    devices = np.asarray(jax.devices()[: sp * tp])
    if sp == 1:
        return Mesh(devices, axis_names=("tp",))
    return Mesh(devices.reshape(sp, tp), axis_names=("sp", "tp"))


def tp_shardings(params, mesh: Mesh, axis: str = "tp",
                 head_dim: Optional[int] = None):
    """Megatron attention placement for a UNet param tree: returns a pytree
    of ``NamedSharding`` (column-parallel qkv, row-parallel out-proj,
    everything else replicated over the whole mesh).

    With ``head_dim`` given, a projection is sharded only when its HEAD
    COUNT (projection dim // head_dim) divides the tp degree — the UNet's
    per-level head counts vary (``n_heads = cout // head_dim``,
    models/unet_t2v.py:207-209), and sharding a 5-head projection 2 ways
    would split a head across devices: the ``(tokens, heads, head_dim)``
    reshape then forces GSPMD to reshard every attention. Kernels whose
    level fails the gate stay replicated (correct, merely unsharded).
    Without ``head_dim`` the gate falls back to raw dim divisibility."""
    n = mesh.shape[axis]
    repl = NamedSharding(mesh, P())
    col = NamedSharding(mesh, P(None, axis))
    row = NamedSharding(mesh, P(axis, None))

    def _gate(dim):
        if dim % n != 0:
            return False
        if head_dim is None:
            return True
        # a dim that floor-divides to a tp-divisible head count but is not
        # an exact head multiple (e.g. dim=160, head_dim=64, tp=2) would
        # shard mid-head — require exact divisibility first (ADVICE r3)
        return dim % head_dim == 0 and (dim // head_dim) % n == 0

    def spec_for(path, x):
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        leaf = names[-1] if names else ""
        parent = names[-2] if len(names) > 1 else ""
        if leaf == "kernel" and parent in _COLUMN_PARALLEL:
            if _gate(x.shape[-1]):
                return col
            logger.warning("tp: %s out dim %d fails %d-way head gate — replicating",
                           "/".join(names), x.shape[-1], n)
        if leaf == "kernel" and parent in _ROW_PARALLEL:
            if _gate(x.shape[0]):
                return row
            logger.warning("tp: %s in dim %d fails %d-way head gate — replicating",
                           "/".join(names), x.shape[0], n)
        return repl

    return jax.tree_util.tree_map_with_path(spec_for, params)


def place_params_tp(mesh: Mesh, params, axis: str = "tp",
                    head_dim: Optional[int] = None):
    """Device-put a param tree per :func:`tp_shardings`."""
    return jax.tree_util.tree_map(
        jax.device_put, params,
        tp_shardings(params, mesh, axis=axis, head_dim=head_dim),
    )
