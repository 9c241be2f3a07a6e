"""A/B the refine render size (VERDICT r2 #8): gs_render_size 256 (our
default — render at the diffusion resolution) vs 512 (the reference's
render-then-nearest-downsample, unet_t2v.py:417-428).

Measures (same seed, random init):
  - per-view PSNR between the two refined outputs (if the delta is
    sub-noise vs bf16 jitter, 256 stays the default)
  - steady-state latency of each
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

from videomv_tpu.config import load_inference_config
from videomv_tpu.inference import T2VPipeline

print("backend:", jax.default_backend(), flush=True)


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) / 255 - np.asarray(b, np.float64) / 255) ** 2)
    return float("inf") if mse == 0 else float(-10 * np.log10(mse))


outs, times = {}, {}
for size in (256, 512):
    cfg = load_inference_config("configs/t2v_infer.yaml")
    cfg["gs_render_size"] = size
    pipe = T2VPipeline(cfg, seed=11)
    pipe.init_params(load=False)
    t0 = time.time()
    out = pipe.generate("a wooden chair", steps=50, use_gs_refine=True, seed=11)
    print(f"render={size}: compile+first {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    out = pipe.generate("a wooden chair", steps=50, use_gs_refine=True, seed=11)
    times[size] = time.time() - t0
    outs[size] = out["frames"]
    print(f"render={size}: steady {times[size]:.2f}s", flush=True)
    del pipe

per_view = [psnr(outs[256][v], outs[512][v]) for v in range(outs[256].shape[0])]
print("\nper-view PSNR 256-render vs 512-render refined outputs:")
for v, p in enumerate(per_view):
    print(f"  view {v:02d}: {p:6.2f} dB")
print(f"min {min(per_view):.2f} mean {np.mean(per_view):.2f} dB; "
      f"latency 256={times[256]:.2f}s 512={times[512]:.2f}s", flush=True)
