"""Profile the reworked splat batch path: right-sized pair capacity +
group-size sweep (per-op dispatch amortization) at the refine shapes."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from videomv_tpu.data.cameras import GSCameraSettings, prepare_gs_training, orbit_c2w_opengl
from videomv_tpu.ops import splat_pallas as sp

print("backend:", jax.default_backend(), flush=True)

B, V, S = 2, 24, 256
N = 4 * 128 * 128
settings = GSCameraSettings(output_size=S)
gs = prepare_gs_training(orbit_c2w_opengl(V, 15.0, 2.0), settings, ray_size=256)
cam_view = jnp.broadcast_to(jnp.asarray(gs["cam_view"]), (B, V, 4, 4))
cam_view_proj = jnp.broadcast_to(jnp.asarray(gs["cam_view_proj"]), (B, V, 4, 4))
tan_half_fov = float(np.tan(0.5 * np.deg2rad(settings.fovy)))

rng = np.random.RandomState(0)
g = np.zeros((B, N, 14), np.float32)
g[..., 0:3] = rng.uniform(-0.6, 0.6, (B, N, 3))
g[..., 3] = 1 / (1 + np.exp(-rng.randn(B, N)))
g[..., 4:7] = np.abs(rng.randn(B, N, 3)) * 0.01 + 0.003
g[..., 7] = 1.0
g[..., 11:14] = rng.uniform(0, 1, (B, N, 3))
gaussians = jnp.asarray(g)
bg = jnp.full((3,), 0.5, jnp.float32)


def run(mp, gsize, packed=False):
    f = jax.jit(lambda g: jnp.sum(sp.rasterize_pallas_batch(
        g, cam_view, cam_view_proj, S, tan_half_fov, bg,
        max_pairs=mp, group_size=gsize, packed=packed)["image"].astype(jnp.float32)))
    t0 = time.time()
    s = float(f(gaussians))
    ct = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = float(f(gaussians))
        best = min(best, time.perf_counter() - t0)
    print(f"max_pairs={mp} G={gsize} packed={int(packed)}: full(48v)={best*1000:.0f}ms "
          f"({best/48*1000:.1f}ms/view)  [compile {ct:.0f}s]", flush=True)


import sys
cfgs = ((262144, 8, True), (327680, 8, True))
for mp, gsize, packed in cfgs:
    run(mp, gsize, packed)
