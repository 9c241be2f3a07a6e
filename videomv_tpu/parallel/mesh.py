"""Device mesh and sharding helpers.

The TPU-native replacement for the reference's process-spawned
DDP/NCCL stack (utils/distributed.py + mp.spawn in the engines,
SURVEY.md §2 parallelism inventory): one process per host, a
``jax.sharding.Mesh`` over all devices, batch sharded on the ``dp`` axis,
params replicated.  Gradient all-reduce is inserted by GSPMD as a compiled
``psum`` over ICI — no hand-written collectives.

Multi-host: call ``jax.distributed.initialize()`` before anything else
(replaces MASTER_ADDR/PORT rendezvous, train_t2v_enterance.py:44-48);
everything below is unchanged because GSPMD is global-view.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "init_distributed", "make_mesh", "shard_batch", "replicate",
    "fsdp_shardings",
]


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host bring-up: replaces the reference's MASTER_ADDR/PORT env
    rendezvous + NCCL init (train_t2v_enterance.py:44-48,74). Call once per
    host before building meshes; afterwards ``jax.devices()`` spans the
    slice and GSPMD programs are global-view. Returns the process index.

    With TPU metadata available (real pods), argument-free
    ``jax.distributed.initialize()`` autodiscovers everything.
    """
    import jax

    if jax.process_count() > 1:
        return jax.process_index()
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            jax.distributed.initialize()
    except Exception:
        pass  # single-process (the common dev case)
    return jax.process_index()


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("dp",)
) -> Mesh:
    """1-D (or reshaped) mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if len(axis_names) == 1:
        dev_array = np.asarray(devices)
    else:
        raise NotImplementedError(
            "make_mesh builds 1-D dp/fsdp meshes; for tensor-parallel or "
            "composed serving meshes use parallel.tp.tensor_parallel_mesh "
            "(sp/tp/sp×tp) instead"
        )
    return Mesh(dev_array, axis_names=tuple(axis_names))


def shard_batch(mesh: Mesh, batch, axis: str = "dp"):
    """Place a host batch with the leading axis sharded over ``axis``."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def fsdp_shardings(tree, mesh: Mesh, axis: str = "dp", min_size: int = 1 << 16):
    """Fully-sharded-data-parallel placement for a param/opt-state pytree:
    each leaf is sharded along its LARGEST dimension divisible by the mesh
    axis size; small or indivisible leaves stay replicated.

    This is the GSPMD recipe for fitting optimizer state that replication
    can't (1.4B fp32 params + AdamW moments ≫ one v5e's 16 GB): annotate
    the placement, let XLA insert the all-gathers before each layer's use
    and reduce-scatter the grads — no hand-written collectives
    (scaling-book §sharding; replaces torch FSDP/ZeRO wrappers).

    Returns a pytree of ``NamedSharding`` matching ``tree`` (None leaves
    pass through), usable as jit in/out_shardings or ``device_put`` specs.
    """
    n = mesh.shape[axis]
    repl = NamedSharding(mesh, P())

    def spec_for(x):
        if x is None:
            return None
        shape = getattr(x, "shape", ())
        if not shape or int(np.prod(shape)) < min_size:
            return repl
        # EARLIEST divisible dim wins. For 2D kernels that is the
        # in-features dim: sharding out-features propagates the weight
        # sharding into the activation, and the (tokens, inner) →
        # (tokens, heads, head_dim) reshape before attention then forces an
        # "[SPMD] Involuntary full rematerialization" (XLA cannot reshard a
        # factored split efficiently — observed on every attn2 in the fsdp
        # dryrun). In-feature sharding keeps activations batch-sharded:
        # XLA all-gathers the weight before use, the ZeRO recipe.
        best_dim = None
        for i, d in enumerate(shape):
            if d % n == 0:
                best_dim = i
                break
        if best_dim is None:
            return repl
        parts = [None] * len(shape)
        parts[best_dim] = axis
        return NamedSharding(mesh, P(*parts))

    return jax.tree_util.tree_map(spec_for, tree)
