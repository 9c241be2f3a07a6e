"""Full-size I2V (image→24 views) end-to-end on TPU — first full-scale run
of the I2V engine on hardware (the CPU suite drives it tiny). Random-init
weights; measures compile + steady-state latency at the shipped i2vgen
geometry (guide 6.0, 50 DDIM steps).
"""
import sys; sys.path.insert(0, "/root/repo")
import os
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

from videomv_tpu.config import load_inference_config
from videomv_tpu.inference.i2v import I2VPipeline

print("backend:", jax.default_backend(), flush=True)

cfg = load_inference_config("configs/i2vgen_xl_infer.yaml")
pipe = I2VPipeline(cfg, seed=11)
t0 = time.time()
pipe.init_params(load=False)
print(f"init {time.time()-t0:.0f}s", flush=True)

# synthesize a conditioning image (no assets in this environment)
img_path = "/root/repo/workspace/i2v_probe.png"
if not os.path.exists(img_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = np.full((256, 256, 4), 255, np.uint8)
    arr[64:192, 64:192, :3] = rng.integers(0, 255, (128, 128, 3), np.uint8)
    Image.fromarray(arr, "RGBA").save(img_path)

t0 = time.time()
out = pipe.generate_from_image(img_path, steps=50, seed=11)
print(f"i2v sample compile+run {time.time()-t0:.0f}s frames {out['frames'].shape}",
      flush=True)
t0 = time.time()
out = pipe.generate_from_image(img_path, steps=50, seed=12)
print(f"i2v sample steady {time.time()-t0:.1f}s "
      f"finite={np.isfinite(out['frames']).all()}", flush=True)

# first hardware run of the I2V refine path in the shipped default mode
# (gs_refine_uncond: shared, configs/i2vgen_xl_infer.yaml)
t0 = time.time()
ref = pipe.generate_from_image(img_path, steps=50, use_gs_refine=True, seed=12)
print(f"i2v refined compile+run {time.time()-t0:.0f}s "
      f"finite={np.isfinite(ref['frames']).all()}", flush=True)
t0 = time.time()
ref = pipe.generate_from_image(img_path, steps=50, use_gs_refine=True, seed=13)
print(f"i2v refined steady {time.time()-t0:.1f}s", flush=True)
