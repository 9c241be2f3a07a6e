"""Stage-bisected binning profile for the CURRENT splat prep (packed
payload, gaussian-id sort key, elementwise projection), at the refine
shapes: 65k gaussians, 256², G=8-view groups, cap=327680.

Each stage jits the pipeline cut at a different point; stage cost =
difference between successive cuts (all include the scene prep)."""
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

V, S = 24, 256
N = 4 * 128 * 128
MP = 327680
settings = GSCameraSettings(output_size=S)
gs = prepare_gs_training(orbit_c2w_opengl(V, 15.0, 2.0), settings, ray_size=256)
cam_view = jnp.asarray(gs["cam_view"])[0]        # [V, 4, 4]
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

TILE = sp.TILE


def stage_fn(stage):
    def one(pr, cv, cvp):
        mean2d, inv_cov, depth, radius, color, opacity, valid = project_prepared(
            pr, cv, cvp, S, tan_half_fov)
        if stage == "project":
            return jnp.sum(mean2d) + jnp.sum(inv_cov) + jnp.sum(radius)
        n_side = S // TILE
        order = jnp.argsort(jnp.where(valid, depth, jnp.inf))
        mean2d = mean2d[order]; inv_cov = inv_cov[order]; color = color[order]
        opacity = jnp.where(valid[order], opacity[order], 0.0)
        radius = jnp.where(valid[order], radius[order], 0.0)
        depth = jnp.where(valid[order], depth[order], 0.0)
        tx0 = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / TILE), 0, n_side - 1).astype(jnp.int32)
        tx1 = jnp.clip(jnp.floor((mean2d[:, 0] + radius) / TILE), 0, n_side - 1).astype(jnp.int32)
        ty0 = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / TILE), 0, n_side - 1).astype(jnp.int32)
        ty1 = jnp.clip(jnp.floor((mean2d[:, 1] + radius) / TILE), 0, n_side - 1).astype(jnp.int32)
        on = ((mean2d[:, 0] + radius >= 0) & (mean2d[:, 0] - radius < S)
              & (mean2d[:, 1] + radius >= 0) & (mean2d[:, 1] - radius < S)
              & (radius > 0) & (opacity > 0))
        span_x = jnp.where(on, jnp.clip(tx1 - tx0 + 1, 0, 16), 0)
        span_y = jnp.where(on, jnp.clip(ty1 - ty0 + 1, 0, 16), 0)
        counts = span_x * span_y
        if stage == "spans":
            return jnp.sum(counts)
        offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
        pair_g = jnp.repeat(jnp.arange(N, dtype=jnp.int32), counts, total_repeat_length=MP)
        pair_idx = jnp.arange(MP, dtype=jnp.int32)
        meta = jnp.stack([offsets, jnp.maximum(span_x, 1), tx0, ty0], axis=1)
        m = meta[pair_g]
        local = pair_idx - m[:, 0]
        tile_x = m[:, 2] + local % m[:, 1]
        tile_y = m[:, 3] + local // m[:, 1]
        total = jnp.sum(counts)
        live = pair_idx < total
        n_tiles = n_side * n_side
        tile_id = jnp.where(live, tile_y * n_side + tile_x, n_tiles)
        if stage == "expand":
            return jnp.sum(tile_id) + jnp.sum(pair_g[::997])
        idx_bits = max(1, (N - 1).bit_length())
        key = (tile_id.astype(jnp.uint32) << idx_bits) | pair_g.astype(jnp.uint32)
        key_sorted = jax.lax.sort(key)
        tile_sorted = (key_sorted >> idx_bits).astype(jnp.int32)
        pair_sorted = (key_sorted & ((1 << idx_bits) - 1)).astype(jnp.int32)
        if stage == "sort":
            return jnp.sum(tile_sorted[::997]) + jnp.sum(pair_sorted[::997])
        attrs = jnp.concatenate([
            mean2d, inv_cov,
            sp._pack2(color[:, 0], color[:, 1])[:, None],
            sp._pack2(color[:, 2], opacity)[:, None],
            sp._pack2(depth, jnp.zeros_like(depth))[:, None],
        ], axis=1)
        payload = attrs[pair_sorted].T
        payload = jnp.where(live[None, :], payload, 0.0)
        return jnp.sum(payload[:, ::997].astype(jnp.float32))

    def full(g):
        pr = prepare_gaussians(g)
        prb = {k: jnp.broadcast_to(v, (V,) + v.shape) for k, v in pr.items()}
        grp = lambda args: jax.vmap(lambda p_, c_, q_: one(p_, c_, q_))(*args)
        out = jax.lax.map(
            grp,
            ({k: v.reshape(3, 8, *v.shape[1:]) for k, v in prb.items()},
             cam_view.reshape(3, 8, 4, 4), cam_view_proj.reshape(3, 8, 4, 4)),
        )
        return jnp.sum(out)

    return jax.jit(full)


for stage in ("project", "spans", "expand", "sort", "gather"):
    f = stage_fn(stage)
    s = float(f(gaussians))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = float(f(gaussians))
        best = min(best, time.perf_counter() - t0)
    print(f"{stage:8s}: {best*1000:6.0f} ms /24v  ({best/24*1000:.2f} ms/view)", flush=True)
