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

__all__ = ["init_distributed", "make_mesh", "shard_batch", "replicate"]


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
        raise NotImplementedError("only dp meshes needed for parity; tp/pp later")
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
