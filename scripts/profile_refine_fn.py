"""Time one full refine_fn call (UNet CFG fwd + VAE decode 8 + LGM x2 +
48 splat renders + VAE encode 48) in isolation on TPU."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from videomv_tpu.config import load_inference_config
from videomv_tpu.inference import T2VPipeline
from videomv_tpu.inference.refine import make_refine_fn
from videomv_tpu.data.cameras import prepare_gs_training, orbit_c2w_opengl

cfg = load_inference_config("configs/t2v_infer.yaml")
pipe = T2VPipeline(cfg, seed=3)
pipe.init_params(load=False)
print("params ready", flush=True)

b, f, hw = 1, 24, 32
y = pipe.encode_text(["a chair, 3d asset"])
zero_y = pipe.encode_text([cfg.get("negative_prompt", "")])
from videomv_tpu.data.cameras import orbit_camera_for_t2v
cam = jnp.asarray(orbit_camera_for_t2v(f, 15.0, 2.0))
gs = prepare_gs_training(orbit_c2w_opengl(f, 15.0, 2.0), pipe.gs_settings,
                         ray_size=pipe.gs_settings.input_size)
gs_rays = jnp.asarray(gs["input_rays"])
cv = jnp.asarray(gs["cam_view"])
cvp = jnp.asarray(gs["cam_view_proj"])
print("shapes", gs_rays.shape, cv.shape, cvp.shape, flush=True)

xt = jax.random.normal(jax.random.PRNGKey(0), (b, 4, f, hw, hw))
t = jnp.full((b,), 400, jnp.int32)


def make(params):
    rfn = make_refine_fn(
        unet=pipe.unet, vae=pipe.vae, lgm=pipe.lgm, params=params,
        diffusion=pipe.diffusion, scale_factor=pipe.scale_factor, batch=b,
        gs_settings=pipe.gs_settings, y=y, zero_y=zero_y, cam=cam,
        gs_rays=gs_rays, cam_view=cv, cam_view_proj=cvp,
    )
    def chain(xt):
        def body(xt, _):
            c, u = rfn(xt, t)
            return xt + 1e-9 * (c + u).astype(xt.dtype), None
        xt, _ = jax.lax.scan(body, xt, None, length=4)
        return jnp.sum(xt.astype(jnp.float32))
    return chain


f_chain = jax.jit(lambda p, xt: make(p)(xt))
t0 = time.time()
s = float(f_chain(pipe._params, xt))
print(f"compile+first {time.time()-t0:.0f}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    s = float(f_chain(pipe._params, xt))
    best = min(best, (time.perf_counter() - t0) / 4)
print(f"refine_fn: {best*1000:.0f} ms/call", flush=True)
