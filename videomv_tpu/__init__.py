"""videomv_tpu — a TPU-native (JAX/XLA/Pallas) multi-view diffusion framework.

Re-implements the capabilities of alibaba/VideoMV (consistent multi-view
generation with a 3D video diffusion model + feed-forward Gaussian-splat
refinement) as an idiomatic JAX/Flax/Pallas stack:

  - ``videomv_tpu.diffusion``  — Gaussian diffusion math, beta schedules,
    fully-jitted ``lax.scan`` DDIM/DDPM/PLMS samplers.
  - ``videomv_tpu.models``     — the 3D video UNets (T2V / I2V), SD KL-VAE,
    OpenCLIP conditioning towers, and the LGM Gaussian reconstructor.
  - ``videomv_tpu.ops``        — Pallas TPU kernels (flash attention,
    tile-binned differentiable Gaussian splatting) with pure-XLA fallbacks.
  - ``videomv_tpu.parallel``   — GSPMD mesh / sharding helpers for
    data-parallel training over TPU slices.
  - ``videomv_tpu.data``       — camera math, ray casting, dataset pipelines.
  - ``videomv_tpu.training``   — optax train loop, EMA, checkpointing.
  - ``videomv_tpu.inference``  — text→multiview and image→multiview engines.
"""

__version__ = "0.1.0"

# Pin the compile-cache key against tunnel-terminal rotations (axon-gated
# no-op on every other backend; see utils/stable_cache.py for the full
# why).  Import-time so every entry point — bench.py, the CLI entries,
# scripts/ — gets warm starts without each wiring it up.  Opt out with
# VIDEOMV_NO_STABLE_CACHE=1.
import os as _os

if not _os.environ.get("VIDEOMV_NO_STABLE_CACHE"):
    from .utils.stable_cache import install as _stable_cache_install

    _stable_cache_install(verbose=False)
del _os
