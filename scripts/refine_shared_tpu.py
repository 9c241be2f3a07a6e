"""GS-refine e2e with the opt-in fast serving mode (gs_refine_uncond:
shared): only the cond CFG row refines. Measures steady-state latency and
the per-view PSNR delta vs full (reference-parity) mode, same seed."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from videomv_tpu.config import load_inference_config
from videomv_tpu.inference import T2VPipeline


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) / 255 - np.asarray(b, np.float64) / 255) ** 2)
    return float("inf") if mse == 0 else float(-10 * np.log10(mse))


outs, times = {}, {}
for mode in ("shared", "full"):
    cfg = load_inference_config("configs/t2v_infer.yaml")
    cfg["gs_refine_uncond"] = mode
    pipe = T2VPipeline(cfg, seed=11)
    pipe.init_params(load=False)
    t0 = time.time()
    out = pipe.generate("a wooden chair", steps=50, use_gs_refine=True, seed=11)
    print(f"{mode}: compile+first {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    out = pipe.generate("a wooden chair", steps=50, use_gs_refine=True, seed=11)
    times[mode] = time.time() - t0
    outs[mode] = out["frames"]
    print(f"{mode}: steady {times[mode]:.2f}s", flush=True)
    del pipe

pv = [psnr(outs["shared"][v], outs["full"][v]) for v in range(outs["full"].shape[0])]
print(f"\nshared-vs-full per-view PSNR: min {min(pv):.2f} mean {np.mean(pv):.2f} dB")
print(f"latency shared={times['shared']:.2f}s full={times['full']:.2f}s", flush=True)
