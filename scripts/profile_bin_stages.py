"""Stage-bisected timing of the 24-view splat binning prep on TPU.

Each stage variant runs the vmapped 24-view prep n times inside ONE jitted
scan with a data-dependent carry, so tunnel latency and async-dispatch
artifacts are amortized away (CLAUDE.md: block_until_ready can return early
through the axon tunnel).
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from videomv_tpu.data.cameras import GSCameraSettings, prepare_gs_training, orbit_c2w_opengl
from videomv_tpu.ops.gaussian_splat import project_gaussians

S = 256
V = 24
N = 4 * 128 * 128
P = 1 << 19
TILE = 16
n_tiles_side = S // TILE
n_tiles = n_tiles_side ** 2
max_span = 16

settings = GSCameraSettings(output_size=S)
gs = prepare_gs_training(orbit_c2w_opengl(V, 15.0, 2.0), settings, ray_size=256)
cam_view = jnp.asarray(gs["cam_view"]).reshape(V, 4, 4)
cam_view_proj = jnp.asarray(gs["cam_view_proj"]).reshape(V, 4, 4)
tan = float(np.tan(0.5 * np.deg2rad(settings.fovy)))

rng = np.random.RandomState(0)
g = np.zeros((N, 14), np.float32)
g[:, 0:3] = rng.uniform(-0.6, 0.6, (N, 3))
g[:, 3] = 1 / (1 + np.exp(-rng.randn(N)))
g[:, 4:7] = np.abs(rng.randn(N, 3)) * 0.01 + 0.003
g[:, 7] = 1.0
g[:, 11:14] = rng.uniform(0, 1, (N, 3))
g0 = jnp.asarray(g)


def stage_fn(upto):
    def one(gg, cv, cvp):
        out = 0.0
        mean2d, inv_cov, depth, radius, color, opacity, valid = project_gaussians(
            gg, cv, cvp, S, tan)
        if upto == "project":
            return (mean2d.sum() + inv_cov.sum() + depth.sum() + radius.sum()
                    + color.sum() + opacity.sum())
        order = jnp.argsort(jnp.where(valid, depth, jnp.inf))
        mean2d = mean2d[order]; inv_cov = inv_cov[order]; color = color[order]
        opacity = jnp.where(valid[order], opacity[order], 0.0)
        radius = jnp.where(valid[order], radius[order], 0.0)
        depth = jnp.where(valid[order], depth[order], 0.0)
        if upto == "sort_gauss":
            return (mean2d.sum() + inv_cov.sum() + depth.sum() + radius.sum()
                    + color.sum() + opacity.sum())
        tx0 = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / TILE), 0, n_tiles_side - 1).astype(jnp.int32)
        tx1 = jnp.clip(jnp.floor((mean2d[:, 0] + radius) / TILE), 0, n_tiles_side - 1).astype(jnp.int32)
        ty0 = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / TILE), 0, n_tiles_side - 1).astype(jnp.int32)
        ty1 = jnp.clip(jnp.floor((mean2d[:, 1] + radius) / TILE), 0, n_tiles_side - 1).astype(jnp.int32)
        on = ((mean2d[:, 0] + radius >= 0) & (mean2d[:, 0] - radius < S)
              & (mean2d[:, 1] + radius >= 0) & (mean2d[:, 1] - radius < S)
              & (radius > 0) & (opacity > 0))
        span_x = jnp.where(on, jnp.clip(tx1 - tx0 + 1, 0, max_span), 0)
        span_y = jnp.where(on, jnp.clip(ty1 - ty0 + 1, 0, max_span), 0)
        counts = span_x * span_y
        offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
        if upto == "spans":
            return counts.sum().astype(jnp.float32) + offsets[-1].astype(jnp.float32)
        pair_idx = jnp.arange(P, dtype=jnp.int32)
        total = jnp.sum(counts)
        pair_live = pair_idx < total
        if upto == "repeat_only":
            pair_g = jnp.repeat(jnp.arange(N, dtype=jnp.int32), counts,
                                total_repeat_length=P)
            return pair_g.sum().astype(jnp.float32)
        if upto in ("expand", "sort", "full"):
            # packed meta: ONE row-gather instead of 4 scalar gathers
            pair_g = jnp.repeat(jnp.arange(N, dtype=jnp.int32), counts,
                                total_repeat_length=P)
            meta = jnp.stack(
                [offsets, jnp.maximum(span_x, 1), tx0, ty0], axis=1)  # [N,4]
            m = meta[pair_g]  # [P,4]
            local = pair_idx - m[:, 0]
            sx = m[:, 1]
            tile_x = m[:, 2] + local % sx
            tile_y = m[:, 3] + local // sx
        else:
            pair_g = jnp.repeat(jnp.arange(N, dtype=jnp.int32), counts,
                                total_repeat_length=P)
            local = pair_idx - offsets[pair_g]
            sx = jnp.maximum(span_x[pair_g], 1)
            tile_x = tx0[pair_g] + local % sx
            tile_y = ty0[pair_g] + local // sx
        tile_id = jnp.where(pair_live, tile_y * n_tiles_side + tile_x, n_tiles)
        if upto == "expand":
            return tile_id.sum().astype(jnp.float32)
        idx_bits = (P - 1).bit_length()
        key = (tile_id.astype(jnp.uint32) << idx_bits) | pair_idx.astype(jnp.uint32)
        key_sorted = jax.lax.sort(key)
        tile_sorted = (key_sorted >> idx_bits).astype(jnp.int32)
        pair_sorted = pair_g[(key_sorted & (P - 1)).astype(jnp.int32)]
        if upto == "sort":
            return tile_sorted.sum().astype(jnp.float32) + pair_sorted.sum().astype(jnp.float32)
        starts = jnp.searchsorted(tile_sorted, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left")
        attrs = jnp.concatenate([
            mean2d, inv_cov, color, opacity[:, None], depth[:, None],
            jnp.zeros((N, 6), jnp.float32)], axis=1)
        payload = attrs[pair_sorted].T.astype(jnp.float32)
        payload = payload * pair_live[None, :]
        return payload.sum() + starts.sum().astype(jnp.float32)

    def all_views(gg):
        return jax.vmap(lambda cv, cvp: one(gg, cv, cvp))(cam_view, cam_view_proj).sum()

    @jax.jit
    def chain(gg):
        def body(c, _):
            s = all_views(gg + c * 1e-12)
            return c + s * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=8)
        return c
    return chain


for name in ("repeat_only", "expand", "sort", "full"):
    chain = stage_fn(name)
    out = chain(g0); out.block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        chain(g0).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    per_view = best / 8 / V * 1000
    print(f"{name:11s}: {best*1000:7.1f} ms/chain  {per_view:6.2f} ms/view", flush=True)
