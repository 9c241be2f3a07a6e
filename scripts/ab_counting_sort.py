"""A/B: counting placement vs uint32 sort in splat binning, refine shapes."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from videomv_tpu.data.cameras import GSCameraSettings, prepare_gs_training, orbit_c2w_opengl
from videomv_tpu.ops import splat_pallas as sp
from videomv_tpu.ops.gaussian_splat import prepare_gaussians, project_prepared

print("backend:", jax.default_backend(), flush=True)

# argv: [render_size] — 256 (serving refine) or 512 (training renders /
# acceptance gs_render_size; VERDICT r4 stretch-#9 asks for the 512 A/B)
V = 24
S = int(sys.argv[1]) if len(sys.argv) > 1 else 256
N = 4 * 128 * 128
# match the production capacity rule (ops/gaussian_splat.py:318-321):
# ceil(4.5 pairs/gaussian to 4096), resolution-scaled ceiling
MP = min((1 << 21) if S >= 512 else (1 << 20),
         max(16384, -(-9 * N // 2 // 4096) * 4096))
settings = GSCameraSettings(output_size=S)
gs = prepare_gs_training(orbit_c2w_opengl(V, 15.0, 2.0), settings, ray_size=256)
cam_view = jnp.asarray(gs["cam_view"])[0]
cam_view_proj = jnp.asarray(gs["cam_view_proj"])[0]
tan_half_fov = float(np.tan(0.5 * np.deg2rad(settings.fovy)))

rng = np.random.RandomState(0)
g = np.zeros((N, 14), np.float32)
g[:, 0:3] = rng.uniform(-0.6, 0.6, (N, 3))
g[:, 3] = 1 / (1 + np.exp(-rng.randn(N)))
g[:, 4:7] = np.abs(rng.randn(N, 3)) * 0.01 + 0.003
g[:, 7] = 1.0
g[:, 11:14] = rng.uniform(0, 1, (N, 3))
gaussians = jnp.asarray(g)
bg = jnp.full((3,), 0.5, jnp.float32)


def make(counting):
    def one(pr, cv, cvp):
        proj = project_prepared(pr, cv, cvp, S, tan_half_fov)
        p, ts, tc, _ = sp._bin_pairs(
            *proj, img_size=S, max_pairs=MP, max_span=16, packed=True,
            counting=counting)
        return p, ts, tc

    def full(gs_):
        pr = prepare_gaussians(gs_)
        prb = {k: jnp.broadcast_to(v, (V,) + v.shape) for k, v in pr.items()}
        def grp(args):
            payloads, starts, counts = jax.vmap(one)(*args)
            def view(a):
                img, alpha, depth = sp._composite_tiles(a[0], a[1], a[2], S // sp.TILE)
                return img + (1 - alpha)[..., None] * bg[None, None, :]
            return jax.lax.map(view, (payloads, starts, counts))
        out = jax.lax.map(
            grp,
            ({k: v.reshape(3, 8, *v.shape[1:]) for k, v in prb.items()},
             cam_view.reshape(3, 8, 4, 4), cam_view_proj.reshape(3, 8, 4, 4)),
        )
        return out
    return jax.jit(full)


outs = {}
for name, counting in (("sort", False), ("counting", True)):
    f = make(counting)
    o = np.asarray(f(gaussians))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(f(gaussians))
        best = min(best, time.perf_counter() - t0)
    outs[name] = o
    print(f"{name:9s}: {best*1000:7.1f} ms /24v  ({best/24*1000:.2f} ms/view)", flush=True)

d = np.abs(outs["sort"] - outs["counting"]).max()
print("max |sort - counting| =", d)
