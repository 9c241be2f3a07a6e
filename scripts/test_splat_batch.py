import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from videomv_tpu.data.cameras import GSCameraSettings, orbit_c2w_opengl, prepare_gs_training
from videomv_tpu.ops.splat_pallas import rasterize_pallas, rasterize_pallas_batch

rs = np.random.RandomState(0)
N = 393216
g = np.zeros((2, N, 14), np.float32)
for b in range(2):
    g[b, :, 0:3] = rs.uniform(-0.7, 0.7, (N, 3))
    g[b, :, 3] = rs.uniform(0.1, 0.9, N)
    g[b, :, 4:7] = rs.uniform(0.002, 0.01, (N, 3))
    q = rs.randn(N, 4); g[b, :, 7:11] = q / np.linalg.norm(q, axis=1, keepdims=True)
    g[b, :, 11:14] = rs.uniform(0, 1, (N, 3))
gj = jnp.asarray(g)
for S, mp in [(256, 1<<20), (512, 1<<21)]:
    st = GSCameraSettings(output_size=S)
    cams = prepare_gs_training(orbit_c2w_opengl(24, 15, 2.0), st, ray_size=16)
    cv = jnp.broadcast_to(jnp.asarray(cams["cam_view"]), (2, 24, 4, 4))
    cvp = jnp.broadcast_to(jnp.asarray(cams["cam_view_proj"]), (2, 24, 4, 4))
    bg = jnp.full((3,), 0.5)
    fn = jax.jit(lambda g, cv, cvp: rasterize_pallas_batch(g, cv, cvp, S, st.tan_half_fov, bg, max_pairs=mp))
    t0=time.time(); out = fn(gj, cv, cvp); jax.block_until_ready(out)
    print(f"S={S} batch 2x24 compile+run {time.time()-t0:.1f}s", flush=True)
    t0=time.time(); out = fn(gj, cv, cvp); jax.block_until_ready(out)
    dt = time.time()-t0
    print(f"S={S} batch 2x24 steady {dt:.3f}s -> {dt/48*1000:.1f} ms/view, shapes {out['image'].shape}", flush=True)
    # single-view parity check
    one_i, one_a = jax.jit(lambda g: rasterize_pallas(g, cv[0,3], cvp[0,3], S, st.tan_half_fov, bg, mp))(gj[0])
    err = float(jnp.abs(out['image'][0,3]-one_i).max())
    print(f"S={S} batch-vs-single max err {err:.2e}", flush=True)
