"""Single-chip batched serving throughput (VERDICT r2 #9): B=4 prompts in
one generate_batch program vs 4 sequential generate() calls.  dp sharding
is a no-op on one chip; the win is the 4x-batched CFG forward keeping the
MXU fed (8·24 = 192 frame-rows per UNet call)."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from videomv_tpu.config import load_inference_config
from videomv_tpu.inference import T2VPipeline

print("backend:", jax.default_backend(), flush=True)

cfg = load_inference_config("configs/t2v_infer.yaml")
pipe = T2VPipeline(cfg, seed=5)
pipe.init_params(load=False)

PROMPTS = ["a wooden chair", "a blue teapot", "a red sports car", "a potted plant"]
STEPS = 50

t0 = time.time()
out = pipe.generate_batch(PROMPTS, steps=STEPS, seed=7)
print(f"B=4 compile+first: {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
out = pipe.generate_batch(PROMPTS, steps=STEPS, seed=8)
bt = time.time() - t0
print(f"B=4 batched steady: {bt:.2f}s  ({bt/4:.2f}s/prompt)", flush=True)

t0 = time.time()
for i, p in enumerate(PROMPTS):
    pipe.generate(p, steps=STEPS, seed=20 + i)
st = time.time() - t0
print(f"B=1 x4 sequential:  {st:.2f}s  ({st/4:.2f}s/prompt)", flush=True)
print(f"batched speedup: {st/bt:.2f}x", flush=True)
