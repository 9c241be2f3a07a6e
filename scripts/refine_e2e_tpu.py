"""Full-size T2V + GS-refine end-to-end on TPU (BASELINE config #3)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
from videomv_tpu.config import load_inference_config
from videomv_tpu.inference import T2VPipeline

cfg = load_inference_config("configs/t2v_infer.yaml")
print("use_lgm_refine:", cfg.UNet.use_lgm_refine, "render:", cfg.get("gs_render_size", 256), flush=True)

pipe = T2VPipeline(cfg, seed=11)
t0 = time.time()
pipe.init_params(load=False)
print(f"init {time.time()-t0:.0f}s", flush=True)

t0 = time.time()
out = pipe.generate("a wooden chair", steps=50, use_gs_refine=True, seed=11)
print(f"refined sample compile+run {time.time()-t0:.0f}s frames {out['frames'].shape}", flush=True)
t0 = time.time()
out = pipe.generate("a blue teapot", steps=50, use_gs_refine=True, seed=12)
print(f"refined sample steady {time.time()-t0:.1f}s finite={np.isfinite(out['frames']).all()}", flush=True)
out2 = pipe.generate("a blue teapot", steps=50, use_gs_refine=False, seed=12)
t0 = time.time()
out2 = pipe.generate("a blue teapot", steps=50, use_gs_refine=False, seed=13)
print(f"plain sample steady {time.time()-t0:.1f}s", flush=True)
