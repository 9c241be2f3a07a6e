"""Single-chip batched-serving throughput (VERDICT r2 #9): generate_batch
with B=4 prompts in ONE compiled program (CFG forward = 2B*F = 192
frame-rows) vs B sequential generate() calls. Reports samples/s for both.
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

cfg = load_inference_config("configs/t2v_infer.yaml")
cfg["UNet"]["use_lgm_refine"] = False
pipe = T2VPipeline(cfg, seed=11)
pipe.init_params(load=False)

PROMPTS = ["a wooden chair", "a blue teapot", "a stone lantern", "a red bicycle"]
B = len(PROMPTS)

# sequential baseline (warm the B=1 program first)
pipe.generate(PROMPTS[0], steps=50, seed=3)
t0 = time.time()
for i, p in enumerate(PROMPTS):
    pipe.generate(p, steps=50, seed=10 + i)
seq = time.time() - t0
print(f"sequential {B}x generate: {seq:.1f}s -> {B/seq:.3f} samples/s", flush=True)

# batched: one program, 2B*F frame-rows per CFG forward
t0 = time.time()
out = pipe.generate_batch(PROMPTS, steps=50, seed=10)
print(f"batch B={B} compile+first {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
out = pipe.generate_batch(PROMPTS, steps=50, seed=11)
bat = time.time() - t0
assert out["frames"].shape[0] == B and np.isfinite(out["latents"]).all()
print(f"batch B={B} steady: {bat:.1f}s -> {B/bat:.3f} samples/s "
      f"({seq/bat:.2f}x over sequential)", flush=True)
