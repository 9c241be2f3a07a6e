"""Validate the Pallas tile-binned rasterizer (TPU) vs dense reference (CPU)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from videomv_tpu.data.cameras import GSCameraSettings, orbit_c2w_opengl, prepare_gs_training
from videomv_tpu.ops.gaussian_splat import rasterize_dense
from videomv_tpu.ops.splat_pallas import rasterize_pallas

S = 128
settings = GSCameraSettings(output_size=S)
cams = prepare_gs_training(orbit_c2w_opengl(4, 0, 2.0), settings, ray_size=16)
rs = np.random.RandomState(0)
N = 4096
g = np.zeros((N, 14), np.float32)
g[:, 0:3] = rs.uniform(-0.5, 0.5, (N, 3))
g[:, 3] = rs.uniform(0.2, 0.9, N)
g[:, 4:7] = rs.uniform(0.01, 0.05, (N, 3))
q = rs.randn(N, 4); g[:, 7:11] = q / np.linalg.norm(q, axis=1, keepdims=True)
g[:, 11:14] = rs.uniform(0, 1, (N, 3))
gj = jnp.asarray(g)
cv = jnp.asarray(cams["cam_view"][0, 0]); cvp = jnp.asarray(cams["cam_view_proj"][0, 0])
bg = jnp.full((3,), 0.3)
thf = settings.tan_half_fov

t0=time.time()
pal = jax.jit(lambda g: rasterize_pallas(g, cv, cvp, S, thf, bg))
pi, pa, pd = pal(gj); jax.block_until_ready(pi)
print(f"pallas(tpu) compile+run {time.time()-t0:.1f}s", flush=True)

cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    t0=time.time()
    di, da, _dd = jax.jit(lambda g: rasterize_dense(g, jax.device_put(cv,cpu), jax.device_put(cvp,cpu), S, thf, jax.device_put(bg,cpu)))(jax.device_put(gj, cpu))
    jax.block_until_ready(di)
    print(f"dense(cpu) compile+run {time.time()-t0:.1f}s", flush=True)

di, da, pi, pa = map(np.asarray, (di, da, pi, pa))
print('depth err: max', np.abs(np.asarray(_dd)-np.asarray(pd)).max(), flush=True)
print("img err: max", np.abs(di-pi).max(), "mean", np.abs(di-pi).mean(), flush=True)
print("alpha err: max", np.abs(da-pa).max(), flush=True)
print("coverage dense", (da>0.01).mean(), "pallas", (pa>0.01).mean(), flush=True)

# timing at full production scale on TPU
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
pal2 = jax.jit(lambda g: rasterize_pallas(g, cv2, cvp2, S2, settings2.tan_half_fov, bg))
t0=time.time(); pi2, pa2, _pd2 = pal2(g2j); jax.block_until_ready(pi2); print(f"pallas 393k@512 compile+run {time.time()-t0:.1f}s", flush=True)
for _ in range(3):
    t0=time.time(); pi2, pa2, _pd2 = pal2(g2j); jax.block_until_ready(pi2)
    print(f"pallas 393k@512 steady {time.time()-t0:.4f}s", flush=True)
print("coverage", float((np.asarray(pa2)>0.01).mean()), flush=True)

# --- dedicated Pallas backward: grad parity vs dense (small) + 512 timing
def loss_pal(g):
    i, a, d = rasterize_pallas(g, cv, cvp, S, thf, bg)
    return jnp.sum(i ** 2) + jnp.sum(a)

def loss_den(g, cvx, cvpx, bgx):
    i, a, d = rasterize_dense(g, cvx, cvpx, S, thf, bgx)
    return jnp.sum(i ** 2) + jnp.sum(a)

t0 = time.time()
gp = jax.jit(jax.grad(loss_pal))(gj); jax.block_until_ready(gp)
print(f"pallas bwd compile+run {time.time()-t0:.1f}s", flush=True)
with jax.default_device(cpu):
    gd = jax.jit(jax.grad(loss_den))(jax.device_put(gj, cpu), jax.device_put(cv, cpu), jax.device_put(cvp, cpu), jax.device_put(bg, cpu))
    jax.block_until_ready(gd)
gp, gd = np.asarray(gp), np.asarray(gd)
denom = np.abs(gd).max() + 1e-8
print("grad err: max", np.abs(gp-gd).max(), "rel", np.abs(gp-gd).max()/denom, flush=True)

def loss_pal2(g):
    i, a, d = rasterize_pallas(g, cv2, cvp2, S2, settings2.tan_half_fov, bg)
    return jnp.sum(i ** 2) + jnp.sum(a)

gfn2 = jax.jit(jax.grad(loss_pal2))
t0 = time.time(); r = gfn2(g2j); jax.block_until_ready(r)
print(f"pallas bwd 393k@512 compile+run {time.time()-t0:.1f}s", flush=True)
for _ in range(3):
    t0 = time.time(); r = gfn2(g2j); jax.block_until_ready(r)
    print(f"pallas bwd 393k@512 steady {time.time()-t0:.4f}s", flush=True)
