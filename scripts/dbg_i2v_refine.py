"""Bisect the NaN in the micro-scale I2V refine path (tests/test_i2v_pipeline)."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/tests")
from test_i2v_pipeline import _build_pipe, SIZE

pipe = _build_pipe("shared")
print("built; backend:", jax.default_backend())

from videomv_tpu.data.cameras import orbit_c2w_opengl, orbit_camera_for_t2v, prepare_gs_training
from videomv_tpu.inference.refine import make_refine_fn

f = pipe.max_frames
cam = jnp.asarray(orbit_camera_for_t2v(f, 15.0, 2.0))
gs = prepare_gs_training(orbit_c2w_opengl(f, 15.0, 2.0), pipe.gs_settings,
                         ray_size=pipe.gs_settings.input_size)
h, w = pipe.latent_hw
xt = jax.random.normal(jax.random.PRNGKey(1), (1, 4, f, h, w))
t = jnp.full((1,), 334, jnp.int32)

y = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 64))
zero_y = jnp.zeros_like(y)
local = jnp.zeros((1, 4, 1, h, w))
img_emb = jnp.zeros((1, 64))
zero_img = jnp.zeros((1, 64))

unet, vae, lgm = pipe.unet, pipe.vae, pipe.lgm
params = pipe._params

def unet_apply(p, x2, t2, **kw):
    b = 1
    if x2.shape[0] == b:
        l2, i2 = local, img_emb
    else:
        l2 = jnp.concatenate([local, local], axis=0)
        i2 = jnp.concatenate([img_emb, zero_img], axis=0)
    return unet.apply(p, x2, t2, local_image=l2, image=i2, **kw)

class Shim:
    apply = staticmethod(unet_apply)

# stage 1: raw unet output
eps = unet_apply(params["unet"], xt, t, y=y, camera_data=cam)
print("unet out finite:", bool(jnp.isfinite(eps).all()), eps.dtype)

fake_x0 = pipe.diffusion.pred_to_x0(eps, xt, t)
print("fake_x0 finite:", bool(jnp.isfinite(fake_x0).all()))

# stage 2: vae decode of 4 views
idxs = jnp.asarray([0, 1, 2, 3])
dec = jnp.take(fake_x0, idxs, axis=2)
dec = dec.transpose(0, 2, 1, 3, 4).reshape(4, 4, h, w) / pipe.scale_factor
imgs = vae.apply(params["vae"], dec, method=vae.decode)
print("vae dec finite:", bool(jnp.isfinite(imgs).all()))

# stage 3: lgm
from videomv_tpu.inference.refine import _VID_MEAN, _VID_STD
imgs2 = jnp.clip(imgs.reshape(1, 4, 3, SIZE, SIZE) * 0.5 + 0.5, 0, 1)
imgs2 = (imgs2 - jnp.asarray(_VID_MEAN).reshape(1,1,3,1,1)) / jnp.asarray(_VID_STD).reshape(1,1,3,1,1)
rays = jnp.take(jnp.asarray(gs["input_rays"]), idxs, axis=1)
lgm_in = jnp.concatenate([imgs2, jnp.broadcast_to(rays, (1,)+rays.shape[1:])], axis=2)
gaussians = lgm.apply(params["lgm"], lgm_in)
print("gaussians finite:", bool(jnp.isfinite(gaussians).all()), gaussians.shape)

# stage 4: render
from videomv_tpu.ops.gaussian_splat import render_gaussians
cv = jnp.asarray(gs["cam_view"]); cvp = jnp.asarray(gs["cam_view_proj"])
out = render_gaussians(gaussians, cv, cvp, bg_color=jnp.full((3,), 0.5),
                       img_size=SIZE, fovy_deg=pipe.gs_settings.fovy,
                       backend="dense", packed=True)
print("render finite:", bool(jnp.isfinite(out["image"]).all()))

# stage 5: encode
r = out["image"].reshape(f, 3, SIZE, SIZE)
r = (r - 0.5) / 0.5
z = vae.apply(params["vae"], r, pipe.scale_factor, method=vae.encode_first_stage)
print("encode finite:", bool(jnp.isfinite(z).all()))

# stage 6: the actual make_refine_fn
rfn = jax.jit(make_refine_fn(
    unet=Shim, vae=vae, lgm=lgm, params=params, diffusion=pipe.diffusion,
    scale_factor=pipe.scale_factor, batch=1, gs_settings=pipe.gs_settings,
    y=y, zero_y=zero_y, cam=cam, gs_rays=jnp.asarray(gs["input_rays"]),
    cam_view=cv[None] if cv.ndim == 3 else cv,
    cam_view_proj=cvp[None] if cvp.ndim == 3 else cvp,
    uncond_mode="shared", view_idxs=(0, 1, 2, 3),
))
zc, zu = rfn(xt, t)
print("refine_fn finite:", bool(jnp.isfinite(zc).all()))
