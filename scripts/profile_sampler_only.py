"""Time the jitted 50-step sampler programs alone (no VAE decode, no host
image fetch): refined vs plain, steady-state, plus the decode separately.
Uses the same (steps, guide, refine) keys as refine_e2e so the persistent
compile cache is warm."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from videomv_tpu.config import load_inference_config
from videomv_tpu.inference import T2VPipeline

cfg = load_inference_config("configs/t2v_infer.yaml")
pipe = T2VPipeline(cfg, seed=11)
pipe.init_params(load=False)
print("params ready", flush=True)

name = {False: "plain", True: "refined"}

# time generate() minus decode+image-fetch: monkeypatch decode to identity
orig_decode = pipe._decode_latents
pipe._decode_latents = lambda lat: lat  # skip decode+fetch

for refine in (False, True):
    out = pipe.generate("a wooden chair", steps=50, use_gs_refine=refine, seed=3)
    jax.block_until_ready(out["frames"])
    best = 1e9
    for i in range(2):
        t0 = time.perf_counter()
        out = pipe.generate("a wooden chair", steps=50, use_gs_refine=refine, seed=4 + i)
        jax.block_until_ready(out["frames"])
        best = min(best, time.perf_counter() - t0)
    print(f"sampler-only {name[refine]}: {best:.2f}s", flush=True)

pipe._decode_latents = orig_decode
lat = out["frames"]
if lat.ndim == 5:  # latents passthrough
    d0 = pipe._decode_latents(lat)
    jax.block_until_ready(d0)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        d = pipe._decode_latents(lat)
        jax.block_until_ready(d)
        best = min(best, time.perf_counter() - t0)
    print(f"decode-only: {best:.2f}s", flush=True)
    t0 = time.perf_counter()
    h = np.asarray(d)
    print(f"host-fetch {h.nbytes/1e6:.0f}MB: {time.perf_counter()-t0:.2f}s", flush=True)
