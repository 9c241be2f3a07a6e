import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from videomv_tpu.data.cameras import GSCameraSettings, orbit_c2w_opengl, prepare_gs_training
from videomv_tpu.ops.gaussian_splat import project_gaussians
from videomv_tpu.ops.splat_pallas import _bin_pairs

rs = np.random.RandomState(0)
N2 = 393216
g2 = np.zeros((N2, 14), np.float32)
g2[:, 0:3] = rs.uniform(-0.7, 0.7, (N2, 3))
g2[:, 3] = rs.uniform(0.1, 0.9, N2)
g2[:, 4:7] = rs.uniform(0.002, 0.01, (N2, 3))
q = rs.randn(N2, 4); g2[:, 7:11] = q / np.linalg.norm(q, axis=1, keepdims=True)
g2[:, 11:14] = rs.uniform(0, 1, (N2, 3))
g2j = jnp.asarray(g2)
S2 = 512
settings2 = GSCameraSettings(output_size=S2)
cams2 = prepare_gs_training(orbit_c2w_opengl(4, 0, 2.0), settings2, ray_size=16)
cv2 = jnp.asarray(cams2["cam_view"][0,0]); cvp2 = jnp.asarray(cams2["cam_view_proj"][0,0])
thf = settings2.tan_half_fov

@jax.jit
def proj_only(g):
    return project_gaussians(g, cv2, cvp2, S2, thf)

@jax.jit
def bin_only(g):
    pr = project_gaussians(g, cv2, cvp2, S2, thf)
    payload, ts, tc, nts = _bin_pairs(*pr, img_size=S2, max_pairs=1<<21, max_span=16)
    return payload.sum(), ts, tc

o = proj_only(g2j); jax.block_until_ready(o)
t0=time.time(); o = proj_only(g2j); jax.block_until_ready(o); print(f"project: {time.time()-t0:.4f}s")
o = bin_only(g2j); jax.block_until_ready(o)
t0=time.time(); o = bin_only(g2j); jax.block_until_ready(o)
print(f"project+bin: {time.time()-t0:.4f}s")
# how many pairs actually?
pr = proj_only(g2j)
mean2d, inv_cov, depth, radius, color, opacity, valid = pr
print("valid:", int(valid.sum()), "radius mean:", float(jnp.where(valid, radius,0).mean()))
