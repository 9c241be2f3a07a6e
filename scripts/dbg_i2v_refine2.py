"""Stage-2 NaN bisect: the full generate_from_image path, plain vs refined."""
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

from PIL import Image
img_path = "/tmp/probe_i2v.png"
rng = np.random.default_rng(0)
arr = np.full((SIZE, SIZE, 4), 255, np.uint8)
arr[8:24, 8:24, :3] = rng.integers(0, 255, (16, 16, 3), np.uint8)
Image.fromarray(arr, "RGBA").save(img_path)

pipe = _build_pipe("shared")
print("built", flush=True)

# conditioning pieces
from videomv_tpu.inference.i2v import load_white_composite
rgb = load_white_composite(img_path, SIZE)
y = pipe.encode_text([""])
print("y finite:", bool(jnp.isfinite(y).all()), y.shape, flush=True)
yv = pipe.encode_image_clip(rgb)
print("img_emb finite:", bool(jnp.isfinite(yv).all()), yv.shape, flush=True)
loc = pipe.encode_local_latent(rgb)
print("local finite:", bool(jnp.isfinite(loc).all()), loc.shape, flush=True)

plain = pipe.generate_from_image(img_path, steps=3, seed=3)
print("plain latents finite:", np.isfinite(plain["latents"]).all(), flush=True)

ref = pipe.generate_from_image(img_path, steps=3, use_gs_refine=True, seed=3)
print("ref latents finite:", np.isfinite(ref["latents"]).all(), flush=True)

# direct unet fwd with the real conditioning
h, w = pipe.latent_hw
f = pipe.max_frames
from videomv_tpu.data.cameras import orbit_camera_for_t2v
cam = jnp.asarray(orbit_camera_for_t2v(f, 15.0, 2.0))
xt = jax.random.normal(jax.random.PRNGKey(1), (1, 4, f, h, w))
out = pipe.unet.apply(pipe._params["unet"], xt, jnp.full((1,), 334, jnp.int32),
                      y=y, camera_data=cam, local_image=loc, image=yv)
print("unet(real cond) finite:", bool(jnp.isfinite(out).all()), flush=True)
