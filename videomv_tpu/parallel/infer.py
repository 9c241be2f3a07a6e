"""Frame-sharded (sequence-parallel) inference placement.

A TPU-native serving capability with no reference analog: the reference
serves one sample per GPU (inference_text2video_entrance.py runs the whole
24-view batch on a single device), so multi-GPU only raises throughput.
Here ONE sample's F views shard over the mesh — spatial convolutions and
spatial attention are frame-local, so they run embarrassingly parallel on
the frame shards; the temporal-attention/conv blocks need cross-frame
context and GSPMD inserts the all-to-alls over ICI at exactly those
reshapes ("sequence parallelism" in scaling-book terms, with frames as the
sequence axis).

Mechanism: data placement IS the program annotation. The sampler is jitted
with no sharding arguments; passing inputs that live frame-sharded on an
``sp`` mesh (params replicated) makes GSPMD propagate the layout through
the whole scanned program — no sampler code changes, one extra compile per
placement.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh, replicate

__all__ = ["frame_parallel_mesh", "shard_on_axis", "replicate_params"]

logger = logging.getLogger(__name__)


def frame_parallel_mesh(num_frames: int, n_devices: Optional[int] = None) -> Optional[Mesh]:
    """Largest usable ``sp`` mesh: the most local devices (≤ ``n_devices``
    if given) that evenly divide ``num_frames``. Returns None when only one
    device would participate (sharding would be a no-op)."""
    avail = len(jax.devices()) if n_devices is None else min(n_devices, len(jax.devices()))
    n = max(d for d in range(1, avail + 1) if num_frames % d == 0)
    if n < avail:
        logger.warning(
            "frame_parallel: %d frames not divisible by %d devices — using %d",
            num_frames, avail, n,
        )
    if n == 1:
        return None
    return make_mesh(n, axis_names=("sp",))


def shard_on_axis(mesh: Mesh, x, dim: int, axis: str = "sp"):
    """Place ``x`` sharded along array dimension ``dim`` over ``axis``."""
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


# Weights (and any other non-frame arrays) live everywhere — the
# activations are what shard; this is sequence, not tensor, parallelism.
# Same semantics as mesh.replicate; exported under the serving-side name.
replicate_params = replicate
