"""Probe variants of the pair-expansion stage (the dominant binning cost,
~5.8 ms/view at refine shapes): given per-gaussian counts + tile meta,
produce per-pair (pair_g, tile_x, tile_y).

V0 current: marks scatter + cumsum(P) for pair_g; 2 position-tagged
   scatter-max + 2 cummax(P) for the run meta.
V1 packed:  same but ONE scatter-max + ONE cummax (meta packed into the
   spare bits — fits at 256²: pos 19 + span 4 + tx 4 + ty 4 = 31 bits).
V2 gather:  pair_g as in V0, then 1-D gathers meta_a[pair_g], meta_b[pair_g]
   instead of scatter+cummax.
V3 mxu:     V1 with cumsum(marks) done as hierarchical triangular matmuls
   on the MXU instead of XLA's log-step cumsum.
V4 search:  pair_g = searchsorted(ends, pair_idx, 'right') (no marks
   scatter, no P-length cumsum), then 1-D meta gathers.

All variants are bit-identical on the outputs (asserted on one sample).
G=8 vmap to match production. Times via device_get-synced chains.
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

N = 4 * 128 * 128          # 65536
P = 294912                 # 4.5 / gaussian
NSIDE = 16                 # 256² / 16
G = 8
MAXSPAN = 16

rng = np.random.default_rng(0)


def make_inputs():
    # realistic span distribution: most 1-4, few large
    sx = np.minimum(rng.geometric(0.55, (G, N)), MAXSPAN).astype(np.int32)
    sy = np.minimum(rng.geometric(0.55, (G, N)), MAXSPAN).astype(np.int32)
    off = rng.integers(0, 10, (G, N))
    dead = off < 3  # ~30% culled
    sx = np.where(dead, 0, sx); sy = np.where(dead, 0, sy)
    tx0 = rng.integers(0, NSIDE, (G, N)).astype(np.int32)
    ty0 = rng.integers(0, NSIDE, (G, N)).astype(np.int32)
    tx0 = np.minimum(tx0, NSIDE - np.maximum(sx, 1))
    ty0 = np.minimum(ty0, NSIDE - np.maximum(sy, 1))
    return (jnp.asarray(sx), jnp.asarray(sy), jnp.asarray(tx0), jnp.asarray(ty0))


sx, sy, tx0, ty0 = make_inputs()
print("mean pairs:", float(jnp.mean(jnp.sum(sx * sy, axis=1))), flush=True)

pair_idx = jnp.arange(P, dtype=jnp.int32)


def common(span_x, span_y, tx0, ty0):
    counts = span_x * span_y
    ends = jnp.cumsum(counts)
    span1 = jnp.maximum(span_x, 1)
    return counts, ends, span1


def finish(pair_g, run_pos, span, tlx, tly, live):
    local = pair_idx - run_pos
    tile_x = tlx + local % span
    tile_y = tly + local // span
    return pair_g, jnp.where(live, tile_x, -1), jnp.where(live, tile_y, -1)


def v0(span_x, span_y, tx0, ty0):
    counts, ends, span1 = common(span_x, span_y, tx0, ty0)
    total = ends[-1]
    live = pair_idx < total
    marks = jnp.zeros((P,), jnp.int32).at[ends[:-1]].add(1, mode="drop")
    pair_g = jnp.minimum(jnp.cumsum(marks), N - 1)
    t_bits = 4
    meta_a = (span1 - 1) | (tx0 << 4)
    meta_b = ty0
    starts_idx = jnp.where(counts[1:] > 0, ends[:-1], P)
    ca = jnp.zeros((P,), jnp.int32).at[starts_idx].max(
        (starts_idx << (4 + t_bits)) | meta_a[1:], mode="drop")
    ca = ca.at[0].max(jnp.where(counts[0] > 0, meta_a[0], 0))
    cb = jnp.zeros((P,), jnp.int32).at[starts_idx].max(
        (starts_idx << t_bits) | meta_b[1:], mode="drop")
    cb = cb.at[0].max(jnp.where(counts[0] > 0, meta_b[0], 0))
    run_a = jax.lax.cummax(ca)
    run_b = jax.lax.cummax(cb)
    s = (run_a & 15) + 1
    return finish(pair_g, run_a >> (4 + t_bits), s,
                  (run_a >> 4) & ((1 << t_bits) - 1), run_b & ((1 << t_bits) - 1), live)


def v1(span_x, span_y, tx0, ty0):
    counts, ends, span1 = common(span_x, span_y, tx0, ty0)
    total = ends[-1]
    live = pair_idx < total
    marks = jnp.zeros((P,), jnp.int32).at[ends[:-1]].add(1, mode="drop")
    pair_g = jnp.minimum(jnp.cumsum(marks), N - 1)
    # pos(19) | span(4) | tx(4) | ty(4) = 31 bits
    meta = ((span1 - 1) << 8) | (tx0 << 4) | ty0
    starts_idx = jnp.where(counts[1:] > 0, ends[:-1], P)
    c = jnp.zeros((P,), jnp.int32).at[starts_idx].max(
        (starts_idx << 12) | meta[1:], mode="drop")
    c = c.at[0].max(jnp.where(counts[0] > 0, meta[0], 0))
    run = jax.lax.cummax(c)
    s = ((run >> 8) & 15) + 1
    return finish(pair_g, run >> 12, s, (run >> 4) & 15, run & 15, live)


def v2(span_x, span_y, tx0, ty0):
    counts, ends, span1 = common(span_x, span_y, tx0, ty0)
    total = ends[-1]
    live = pair_idx < total
    marks = jnp.zeros((P,), jnp.int32).at[ends[:-1]].add(1, mode="drop")
    pair_g = jnp.minimum(jnp.cumsum(marks), N - 1)
    offsets = ends - counts
    return finish(pair_g, offsets[pair_g], span1[pair_g], tx0[pair_g],
                  ty0[pair_g], live)


def _prefix_sum_mxu(x, blk=256):
    """Inclusive prefix sum over the last axis via hierarchical triangular
    matmuls (exact in fp32 for values < 2^24)."""
    P_ = x.shape[-1]
    nb = P_ // blk
    r = x.reshape(nb, blk).astype(jnp.float32)
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    tril = (ii <= jj).astype(jnp.float32)  # out[j] = sum_{i<=j} x[i] (inclusive)
    loc = jax.lax.dot_general(r, tril, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    tot = jnp.sum(r, axis=1)  # [nb]
    bt = jnp.cumsum(tot) - tot  # exclusive block offsets (nb small: XLA fine)
    return (loc + bt[:, None]).reshape(P_).astype(jnp.int32)


def v3(span_x, span_y, tx0, ty0):
    counts, ends, span1 = common(span_x, span_y, tx0, ty0)
    total = ends[-1]
    live = pair_idx < total
    marks = jnp.zeros((P,), jnp.int32).at[ends[:-1]].add(1, mode="drop")
    pair_g = jnp.minimum(_prefix_sum_mxu(marks), N - 1)
    meta = ((span1 - 1) << 8) | (tx0 << 4) | ty0
    starts_idx = jnp.where(counts[1:] > 0, ends[:-1], P)
    c = jnp.zeros((P,), jnp.int32).at[starts_idx].max(
        (starts_idx << 12) | meta[1:], mode="drop")
    c = c.at[0].max(jnp.where(counts[0] > 0, meta[0], 0))
    run = jax.lax.cummax(c)
    s = ((run >> 8) & 15) + 1
    return finish(pair_g, run >> 12, s, (run >> 4) & 15, run & 15, live)


def v4(span_x, span_y, tx0, ty0):
    counts, ends, span1 = common(span_x, span_y, tx0, ty0)
    total = ends[-1]
    live = pair_idx < total
    pair_g = jnp.minimum(
        jnp.searchsorted(ends, pair_idx, side="right").astype(jnp.int32), N - 1)
    offsets = ends - counts
    return finish(pair_g, offsets[pair_g], span1[pair_g], tx0[pair_g],
                  ty0[pair_g], live)


VARIANTS = {"v0-current": v0, "v1-packed": v1, "v2-gather": v2,
            "v3-mxu": v3, "v4-search": v4}

# correctness: all variants equal on row 0
ref = None
for name, fn in VARIANTS.items():
    out = jax.jit(fn)(sx[0], sy[0], tx0[0], ty0[0])
    out = tuple(np.asarray(o) for o in out)
    if ref is None:
        ref = out
    else:
        for a, b in zip(ref, out):
            np.testing.assert_array_equal(a, b, err_msg=name)
print("all variants bit-identical", flush=True)


def time_g8(fn, n=20, repeats=3):
    @jax.jit
    def chain(sx, sy, tx0, ty0):
        def body(carry, _):
            sx, sy = carry
            pg, tx, ty = jax.vmap(fn, in_axes=(0, 0, 0, 0))(sx, sy, tx0, ty0)
            # data-dependent feedback, keeps spans in range
            bump = (pg[:, :N] + tx[:, :N] + ty[:, :N]) & 1
            return (jnp.minimum(sx + bump, MAXSPAN), sy), None
        (sx, _), _ = jax.lax.scan(body, (sx, sy), None, length=n)
        return jnp.sum(sx)

    int(chain(sx, sy, tx0, ty0))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        int(chain(sx, sy, tx0, ty0))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


for name, fn in VARIANTS.items():
    t = time_g8(fn)
    print(f"{name:11s}: {t*1e3:7.2f} ms/G8  ({t/G*1e3:5.2f} ms/view)", flush=True)
