"""A/B two pair-expansion formulations for splat binning on TPU.

(a) current: jnp.repeat (searchsorted under the hood) + [N,4] meta row-gather
(b) scatter+cumsum histogram for pair_g, cummax run-starts for local idx,
    single packed int32 [N] scalar gather for (span_x, tx0, ty0)
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

N = 65536
MP = 327680
V = 24
n_side = 16

rs = np.random.RandomState(0)
counts_np = rs.poisson(4.3, (V, N)).astype(np.int32)
tx0_np = rs.randint(0, n_side, (V, N)).astype(np.int32)
ty0_np = rs.randint(0, n_side, (V, N)).astype(np.int32)
span_np = np.clip(np.ceil(np.sqrt(counts_np)), 1, 16).astype(np.int32)
counts = jnp.asarray(counts_np); tx0 = jnp.asarray(tx0_np)
ty0 = jnp.asarray(ty0_np); span_x = jnp.asarray(span_np)


def expand_a(counts, span_x, tx0, ty0):
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
    tile_id = jnp.where(live, tile_y * n_side + tile_x, n_side * n_side)
    return tile_id, pair_g


def expand_b(counts, span_x, tx0, ty0):
    ends = jnp.cumsum(counts)
    pair_idx = jnp.arange(MP, dtype=jnp.int32)
    marks = jnp.zeros((MP,), jnp.int32).at[ends[:-1]].add(1, mode="drop")
    pair_g = jnp.cumsum(marks)
    starts = jnp.zeros((MP,), jnp.int32).at[ends[:-1]].max(ends[:-1], mode="drop")
    run_start = jax.lax.cummax(starts)
    local = pair_idx - run_start
    packed = (jnp.maximum(span_x, 1) | (tx0 << 5) | (ty0 << 11)).astype(jnp.int32)
    sp = packed[pair_g]
    s = sp & 31
    tile_x = ((sp >> 5) & 63) + local % s
    tile_y = (sp >> 11) + local // s
    total = ends[-1]
    live = pair_idx < total
    tile_id = jnp.where(live, tile_y * n_side + tile_x, n_side * n_side)
    return tile_id, pair_g


def expand_c(counts, span_x, tx0, ty0):
    """Gather-free: propagate per-run metadata by position-tagged cummax
    (position in the high bits makes 'latest run start wins' a max)."""
    ends = jnp.cumsum(counts)
    pair_idx = jnp.arange(MP, dtype=jnp.int32)
    marks = jnp.zeros((MP,), jnp.int32).at[ends[:-1]].add(1, mode="drop")
    pair_g = jnp.cumsum(marks)
    sp1 = jnp.maximum(span_x, 1) - 1          # 4 bits
    meta_a = (sp1 | (tx0 << 4)) & 1023        # 10 bits: span-1 | tx0
    meta_b = ty0                              # 6 bits
    # run-start combos: (start position << bits) | meta; starts at index 0
    # seed the chain via an initial max with the g=0 meta
    # zero-count gaussians own no run — mask them out so every scattered
    # start position is unique (otherwise max picks the wrong run's meta)
    starts_idx = jnp.where(counts[1:] > 0, ends[:-1], MP)
    ca = jnp.zeros((MP,), jnp.int32).at[starts_idx].max(
        (starts_idx << 10) | meta_a[1:], mode="drop")
    ca = ca.at[0].max(jnp.where(counts[0] > 0, meta_a[0], 0))
    cb = jnp.zeros((MP,), jnp.int32).at[starts_idx].max(
        (starts_idx << 6) | meta_b[1:], mode="drop")
    cb = cb.at[0].max(jnp.where(counts[0] > 0, meta_b[0], 0))
    run_a = jax.lax.cummax(ca)
    run_b = jax.lax.cummax(cb)
    s = (run_a & 15) + 1
    tile_x = ((run_a >> 4) & 63) + (pair_idx - (run_a >> 10)) % s
    tile_y = (run_b & 63) + (pair_idx - (run_a >> 10)) // s
    total = ends[-1]
    live = pair_idx < total
    tile_id = jnp.where(live, tile_y * n_side + tile_x, n_side * n_side)
    return tile_id, pair_g


def bench(name, fn):
    f = jax.jit(lambda c, s, x, y: jax.lax.map(
        lambda args: jax.vmap(lambda *a: jnp.stack([jnp.sum(t[::97]) for t in fn(*a)]))(*args),
        (c.reshape(3, 8, N), s.reshape(3, 8, N),
         x.reshape(3, 8, N), y.reshape(3, 8, N))).sum())
    s0 = float(f(counts, span_x, tx0, ty0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s0 = float(f(counts, span_x, tx0, ty0))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1000:.0f} ms /24v ({best/24*1000:.2f} ms/view)", flush=True)


# correctness cross-check on one view (jit to avoid eager tunnel crawl)
ta, ga = jax.jit(expand_a)(counts[0], span_x[0], tx0[0], ty0[0])
tb, gb = jax.jit(expand_b)(counts[0], span_x[0], tx0[0], ty0[0])
tc, gc = jax.jit(expand_c)(counts[0], span_x[0], tx0[0], ty0[0])
tot = int(jnp.sum(counts[0]))
assert np.array_equal(np.asarray(ta[:tot]), np.asarray(tb[:tot])), "tile mismatch b"
assert np.array_equal(np.asarray(ga[:tot]), np.asarray(gb[:tot])), "pair_g mismatch b"
assert np.array_equal(np.asarray(ta[:tot]), np.asarray(tc[:tot])), "tile mismatch c"
assert np.array_equal(np.asarray(ga[:tot]), np.asarray(gc[:tot])), "pair_g mismatch c"
print("parity ok, live", tot, flush=True)

bench("repeat+rowmeta  (a)", expand_a)
bench("scatter+cumsum (b)", expand_b)
bench("cummax-fill    (c)", expand_c)
