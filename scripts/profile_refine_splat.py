"""Profile the GS-refine splat cost breakdown on TPU.

Refine shapes: B=2 scenes (cond+uncond), V=24 views, 256^2 renders,
N = 4 * 128^2 = 65,536 gaussians per scene (LGM 'big' infer from 4 views).

Sweeps max_pairs to isolate the static pair-capacity cost (sort + repeat +
payload gather all scale with capacity, not with live pairs).
"""
import sys; sys.path.insert(0, "/root/repo")
import functools
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from videomv_tpu.data.cameras import GSCameraSettings, prepare_gs_training, orbit_c2w_opengl
from videomv_tpu.ops.gaussian_splat import project_gaussians
from videomv_tpu.ops import splat_pallas as sp
from videomv_tpu.utils.profiling import time_chained

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
g[..., 0:3] = rng.uniform(-0.6, 0.6, (B, N, 3))          # pos
g[..., 3] = 1 / (1 + np.exp(-rng.randn(B, N)))           # opacity (activated)
g[..., 4:7] = np.abs(rng.randn(B, N, 3)) * 0.01 + 0.003  # scale
g[..., 7] = 1.0                                           # quat w
g[..., 11:14] = rng.uniform(0, 1, (B, N, 3))             # rgb
gaussians = jnp.asarray(g)
bg = jnp.full((3,), 0.5, jnp.float32)

# live pair count at this scene/scale
proj = jax.jit(functools.partial(project_gaussians, img_size=S,
                                 tan_half_fov=tan_half_fov))(
    gaussians[0], cam_view[0, 0], cam_view_proj[0, 0])
mean2d, inv_cov, depthv, radius, color, opac, valid = proj
tx0 = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / 16), 0, S // 16 - 1)
tx1 = jnp.clip(jnp.floor((mean2d[:, 0] + radius) / 16), 0, S // 16 - 1)
ty0 = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / 16), 0, S // 16 - 1)
ty1 = jnp.clip(jnp.floor((mean2d[:, 1] + radius) / 16), 0, S // 16 - 1)
spans = (tx1 - tx0 + 1) * (ty1 - ty0 + 1) * valid
print(f"live pairs/view ~ {int(jnp.sum(spans))} (N={N})", flush=True)


def full_render(mp):
    f = jax.jit(lambda g: sp.rasterize_pallas_batch(
        g, cam_view, cam_view_proj, S, tan_half_fov, bg, max_pairs=mp)["image"])
    out = f(gaussians)
    out.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        f(gaussians).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def prep_only(mp):
    def one(gg, cv, cvp):
        pr = project_gaussians(gg, cv, cvp, S, tan_half_fov)
        p, ts, tc, _ = sp._bin_pairs(*pr, img_size=S, max_pairs=mp, max_span=16)
        return jnp.sum(p[:, ::997]) + jnp.sum(ts) + jnp.sum(tc)

    f = jax.jit(lambda g: jax.vmap(lambda cv, cvp: one(g[0], cv, cvp))(
        cam_view[0], cam_view_proj[0]).sum())
    s = f(gaussians); s.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        f(gaussians).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best  # 24 views


for mp_log in (18, 19, 20):
    mp = 1 << mp_log
    t_prep = prep_only(mp)
    t_full = full_render(mp)
    print(f"max_pairs=2^{mp_log}: prep(24v)={t_prep*1000:.0f}ms "
          f"({t_prep/24*1000:.1f}ms/view)  full(48v)={t_full*1000:.0f}ms "
          f"({t_full/48*1000:.1f}ms/view)", flush=True)
