"""Tile-binned differentiable Gaussian splatting — the Pallas TPU kernels.

TPU-native replacement for the reference's CUDA rasterizer
(``diff-gaussian-rasterization`` submodule, consumed at core/gs.py:57-83).
Same visual model (EWA projection + depth-ordered alpha compositing over
16×16 pixel tiles) but re-architected for the TPU memory hierarchy:

  XLA (vectorized, MXU/VPU):
    1. project all N Gaussians → 2D means/inverse covariances/radii
    2. global depth argsort
    3. tile binning WITHOUT dynamic shapes: per-Gaussian tile-span counts →
       exclusive cumsum → ``jnp.repeat(..., total_repeat_length=P)`` expands
       to a fixed-capacity pair list in depth order; a stable sort by tile id
       yields per-tile contiguous, depth-ordered segments (adjacent tiles
       may share a boundary 512-pair chunk; kernels mask the overhang)
    4. gather pair payloads into a [16, capacity] lane-friendly buffer

  Pallas forward (per-tile grid):
    5. for each of the (S/16)² tiles: DMA pair-payload chunks HBM→VMEM,
       evaluate α(x) = min(.99, o·exp(-½ dᵀΣ'⁻¹d)) for 256 pixels × chunk,
       composite front-to-back with a carried transmittance (chunk-local
       cumulative products as ONE triangular matmul on the MXU), write the
       16×16 RGB+α tile.

  Pallas backward (per-tile grid, the custom VJP of step 5):
    6. re-walk the same chunks front-to-back, rebuild per-pair
       transmittances, and accumulate dL/d(mean2d, inv_cov, color, opacity)
       per pair into the dpayload chunks by read-modify-write (the TPU
       Pallas grid is SEQUENTIAL on one TensorCore, so accumulating into a
       boundary chunk shared with the neighbouring tile is race-free; the
       output is zero-initialized through input_output_aliasing). The
       suffix term Σ_{j>i} w_j c_j is C_total − (inclusive prefix), with the
       inclusive prefix again a triangular matmul. Gradients flow from
       pairs back to per-Gaussian attributes (and through projection to 3D
       params) via the VJP of the XLA gather/scatter in step 3-4 — pairs of
       the same Gaussian across tiles are combined by the scatter-add XLA
       derives automatically.

Capacity knobs: ``max_pairs`` (pair-list capacity; overflow drops the
deepest pairs — graceful degradation identical in spirit to the CUDA
renderer's buffer reallocation) and ``max_span`` (tile-span clamp per
Gaussian).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gaussian_splat import prepare_gaussians, project_gaussians, project_prepared

TILE = 16
PAIR_CHUNK = 512

# interpret-mode switch: lets the CPU test suite execute the kernel bodies
# (tests/test_pallas_kernels.py); always False in production
INTERPRET = False


def _pack2(a, b):
    """Truncate two fp32 arrays to bf16 and pack them into one fp32-typed
    lane (a in the high 16 bits, b in the low): halves payload-gather and
    kernel-DMA bytes for attributes that tolerate bf16 (colors, opacity).
    Unpacked in-kernel by integer masking + bitcast — bf16 is the top half
    of fp32, so no 16-bit types are needed anywhere."""
    ua = jax.lax.bitcast_convert_type(a.astype(jnp.float32), jnp.uint32)
    ub = jax.lax.bitcast_convert_type(b.astype(jnp.float32), jnp.uint32)
    return jax.lax.bitcast_convert_type(
        (ua & jnp.uint32(0xFFFF0000)) | (ub >> 16), jnp.float32
    )


def _unpack2(row):
    """Inverse of _pack2 for in-kernel use: [*, C] fp32 -> (hi, lo) fp32."""
    u = jax.lax.bitcast_convert_type(row, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    lo = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    return hi, lo


def _prefix_sum_mxu(x, blk: int = 256):
    """Inclusive int32 prefix sum over a 1-D axis as hierarchical triangular
    matmuls on the MXU: block-local tril contraction + block-total offsets.
    XLA lowers jnp.cumsum over a 300k axis to ~log2(P) strided passes; one
    [blk,blk] matmul per block plus a tiny block-level cumsum is ~25% faster
    at the binning shapes (scripts/probe_expand_variants.py: v3 vs v0).
    Exact while values stay < 2^24 (fp32 integer range)."""
    P = x.shape[-1]
    pad = (-P) % blk
    xf = x.astype(jnp.float32)
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad,), jnp.float32)])
    nb = xf.shape[0] // blk
    r = xf.reshape(nb, blk)
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    tril = (ii <= jj).astype(jnp.float32)  # out[j] = sum_{i<=j} x[i]
    loc = jax.lax.dot_general(r, tril, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    tot = jnp.sum(r, axis=1)
    off = jnp.cumsum(tot) - tot            # exclusive block offsets (nb small)
    return (loc + off[:, None]).reshape(-1)[:P].astype(jnp.int32)


def _rect_rank_excl(rx, ry, n_side: int, blk: int = 128):
    """Exclusive per-tile depth rank via cumulative rectangle coverage.

    ``rx``/``ry``: [N, n_side] interval indicators of each (depth-ordered)
    Gaussian's tile span. Returns ``(C_excl [N, T] , tile_counts [T])``
    where ``C_excl[g, t]`` = number of Gaussians before g covering tile t —
    i.e. g's within-tile depth rank. Computed hierarchically with
    triangular MATMULS on the MXU (XLA's native cumsum over a 65k axis is
    multi-pass and slow; two tril contractions are ~free): block-local
    exclusive prefix + exclusive prefix of block totals. Counts stay exact
    in fp32 (integers < 2^24)."""
    N = rx.shape[0]
    T = n_side * n_side
    pad = (-N) % blk
    rect = (ry[:, :, None] & rx[:, None, :]).reshape(N, T).astype(jnp.float32)
    if pad:
        rect = jnp.concatenate([rect, jnp.zeros((pad, T), jnp.float32)])
    nb = rect.shape[0] // blk
    r3 = rect.reshape(nb, blk, T)
    ii = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    l_in = (ii < jj).astype(jnp.float32)          # strict: j < i contributes
    pref = jnp.einsum("bjt,ji->bit", r3, l_in,
                      preferred_element_type=jnp.float32)
    btot = jnp.sum(r3, axis=1)                     # [nb, T]
    bi = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    bj = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    l_b = (bi < bj).astype(jnp.float32)
    bexcl = jnp.einsum("bt,bc->ct", btot, l_b,
                       preferred_element_type=jnp.float32)
    C_excl = (pref + bexcl[:, None, :]).reshape(-1, T)[:N]
    tile_counts = jnp.sum(btot, axis=0)
    return C_excl, tile_counts


def _bin_pairs(
    mean2d, inv_cov, depth, radius, color, opacity, valid,
    img_size: int, max_pairs: int, max_span: int, packed: bool = False,
    counting: bool = False, expand_mode: str | None = None,
):
    """Build the depth-ordered, tile-sorted, chunk-aligned pair list.

    ``packed=True`` emits the 8-row inference payload (positions and
    inverse covariance fp32; colors/opacity/depth bf16-packed pairs) —
    half the HBM bytes of the 16-row differentiable payload."""
    N = mean2d.shape[0]
    n_tiles_side = img_size // TILE
    n_tiles = n_tiles_side * n_tiles_side

    # depth order
    order = jnp.argsort(jnp.where(valid, depth, jnp.inf))
    mean2d = mean2d[order]
    inv_cov = inv_cov[order]
    color = color[order]
    opacity = jnp.where(valid[order], opacity[order], 0.0)
    radius = jnp.where(valid[order], radius[order], 0.0)
    depth = jnp.where(valid[order], depth[order], 0.0)

    # tile spans
    tx0 = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / TILE), 0, n_tiles_side - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((mean2d[:, 0] + radius) / TILE), 0, n_tiles_side - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / TILE), 0, n_tiles_side - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((mean2d[:, 1] + radius) / TILE), 0, n_tiles_side - 1).astype(jnp.int32)
    on_screen = (
        (mean2d[:, 0] + radius >= 0) & (mean2d[:, 0] - radius < img_size)
        & (mean2d[:, 1] + radius >= 0) & (mean2d[:, 1] - radius < img_size)
        & (radius > 0) & (opacity > 0)
    )
    span_x = jnp.where(on_screen, jnp.clip(tx1 - tx0 + 1, 0, max_span), 0)
    span_y = jnp.where(on_screen, jnp.clip(ty1 - ty0 + 1, 0, max_span), 0)
    counts = span_x * span_y

    # fixed-capacity expansion in depth order. pair_g[i] = #(run ends ≤ i)
    # via a scatter-add histogram + cumsum, and the per-run metadata
    # (span, tile origin) propagates by position-tagged cummax ("latest
    # run-start wins" becomes a max when the start position occupies the
    # high bits) — A/B-measured 2× faster than jnp.repeat(+searchsorted)
    # plus a per-pair meta gather (6.8 → 3.4 ms/view at the refine shapes;
    # scripts/ab_expand.py).
    ends = jnp.cumsum(counts)
    total = ends[-1]
    pair_idx = jnp.arange(max_pairs, dtype=jnp.int32)
    pair_live = pair_idx < total
    marks = jnp.zeros((max_pairs,), jnp.int32).at[ends[:-1]].add(1, mode="drop")
    if N < (1 << 24):
        pair_g = jnp.minimum(_prefix_sum_mxu(marks), N - 1)
    else:
        pair_g = jnp.minimum(jnp.cumsum(marks), N - 1)
    span1 = jnp.maximum(span_x, 1)

    pos_bits = (max_pairs - 1).bit_length()
    t_bits = max(1, (n_tiles_side - 1).bit_length())
    t_mask = (1 << t_bits) - 1
    if expand_mode is None:  # static tier choice by bit budget
        if pos_bits + 4 + 2 * t_bits <= 31 and max_span <= 16:
            expand_mode = "packed1"
        elif pos_bits + 4 + t_bits <= 31 and max_span <= 16:
            expand_mode = "packed2"
        else:
            expand_mode = "gather"
    if expand_mode == "packed1":
        # everything fits ONE tagged int32 (pos | span-1 | tx | ty): a
        # single scatter-max + cummax replaces the two of the branch below
        # (-26% on the expansion stage — scripts/probe_expand_variants.py
        # v1-packed vs v0). At the refine shapes: 19 + 4 + 4 + 4 = 31 bits.
        meta = ((span1 - 1) << (2 * t_bits)) | (tx0 << t_bits) | ty0
        sh = 4 + 2 * t_bits
        starts_idx = jnp.where(counts[1:] > 0, ends[:-1], max_pairs)
        c = jnp.zeros((max_pairs,), jnp.int32).at[starts_idx].max(
            (starts_idx << sh) | meta[1:], mode="drop")
        c = c.at[0].max(jnp.where(counts[0] > 0, meta[0], 0))
        run = jax.lax.cummax(c)
        s = ((run >> (2 * t_bits)) & 15) + 1
        local = pair_idx - (run >> sh)
        tile_x = ((run >> t_bits) & t_mask) + local % s
        tile_y = (run & t_mask) + local // s
    elif expand_mode == "packed2":
        meta_a = (span1 - 1) | (tx0 << 4)          # 4 + t_bits bits
        meta_b = ty0                               # t_bits bits
        # zero-count gaussians own no run — mask them out so scattered
        # start positions are unique (max would pick the wrong run's meta)
        starts_idx = jnp.where(counts[1:] > 0, ends[:-1], max_pairs)
        ca = jnp.zeros((max_pairs,), jnp.int32).at[starts_idx].max(
            (starts_idx << (4 + t_bits)) | meta_a[1:], mode="drop")
        ca = ca.at[0].max(jnp.where(counts[0] > 0, meta_a[0], 0))
        cb = jnp.zeros((max_pairs,), jnp.int32).at[starts_idx].max(
            (starts_idx << t_bits) | meta_b[1:], mode="drop")
        cb = cb.at[0].max(jnp.where(counts[0] > 0, meta_b[0], 0))
        run_a = jax.lax.cummax(ca)
        run_b = jax.lax.cummax(cb)
        s = (run_a & 15) + 1
        local = pair_idx - (run_a >> (4 + t_bits))
        tile_x = ((run_a >> 4) & t_mask) + local % s
        tile_y = (run_b & t_mask) + local // s
    else:  # huge capacity/resolution: per-pair [N,4] meta row-gather
        offsets = ends - counts
        meta = jnp.stack([offsets, span1, tx0, ty0], axis=1)
        m = meta[pair_g]  # [P, 4]
        local = pair_idx - m[:, 0]
        tile_x = m[:, 2] + local % m[:, 1]
        tile_y = m[:, 3] + local // m[:, 1]
    tile_id = jnp.where(pair_live, tile_y * n_tiles_side + tile_x, n_tiles)

    # counting placement needs the [N, T] rank table resident; beyond
    # ~128M entries (512² with 400k Gaussians) fall back to the sort.
    # A/B-measured SLOWER than the uint32 sort on TPU (26.6 vs 14.4 ms/view
    # at the refine shapes, 73.7 vs 30.8 at 512² — scripts/ab_counting_sort
    # .py, outputs bit-identical): the per-pair rank gather + position
    # scatter are scalar-access bound, exactly the access pattern the TPU
    # is worst at, while XLA's sort runs vectorized passes. Kept opt-in as
    # the documented negative result; default stays on the sort.
    if counting and n_tiles <= 4096 and N * n_tiles <= (1 << 27):
        # single-pass counting placement instead of a sort: each pair's
        # final tile-major position is tile_start[tile] + (within-tile
        # depth rank), with the rank read from the cumulative-rectangle
        # table (every Gaussian covers a RECTANGLE of tiles, so "earlier
        # Gaussians covering tile t" is an exclusive cumsum of rank-1
        # rect indicators — MXU triangular matmuls, no O(P log² P) sort
        # passes). Overflow keeps the depth-PREFIX of Gaussians that fit
        # entirely (the sort path additionally kept a partial boundary
        # Gaussian — visually identical, both drop only the deepest).
        keep = ends <= max_pairs
        si = jax.lax.broadcasted_iota(jnp.int32, (N, n_tiles_side), 1)
        rx = (si >= tx0[:, None]) & (si < (tx0 + span_x)[:, None]) & keep[:, None]
        ry = (si >= ty0[:, None]) & (si < (ty0 + span_y)[:, None])
        C_excl, tile_counts = _rect_rank_excl(rx, ry, n_tiles_side)
        tc = tile_counts.astype(jnp.int32)
        tile_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(tc)[:-1]])
        tile_count = tc

        tlin = jnp.clip(tile_id, 0, n_tiles - 1)
        rank = C_excl.reshape(-1)[pair_g * n_tiles + tlin].astype(jnp.int32)
        pair_ok = pair_live & keep[pair_g]
        pos = jnp.where(pair_ok, tile_start[tlin] + rank, max_pairs)
        perm = jnp.zeros((max_pairs,), jnp.int32).at[pos].set(
            pair_g, mode="drop")
        pair_sorted = perm
        # positions are tile-major dense: exactly sum(kept counts) are live
        pair_live = pair_idx < jnp.sum(jnp.where(keep, counts, 0))
    else:
        # stable sort by tile keeps the depth order within each tile. When
        # (tile_id, gaussian id) packs into 32 bits we sort ONE uint32 key
        # instead of carrying a second array through every pass. The
        # GAUSSIAN id (not the pair index) goes in the low bits: it is
        # depth-ordered after the argsort above, a (gaussian, tile) pair is
        # unique, so within-tile depth order is preserved by construction
        # AND the sorted key directly yields pair_sorted — no post-sort
        # gather.
        idx_bits = max(1, (N - 1).bit_length())
        idx_mask = (1 << idx_bits) - 1
        if (n_tiles + 1) << idx_bits <= 2**32:
            key = (tile_id.astype(jnp.uint32) << idx_bits) | pair_g.astype(jnp.uint32)
            key_sorted = jax.lax.sort(key)
            tile_sorted = (key_sorted >> idx_bits).astype(jnp.int32)
            pair_sorted = (key_sorted & idx_mask).astype(jnp.int32)
        else:
            tile_sorted, pair_sorted = jax.lax.sort(
                (tile_id, pair_g), num_keys=1, is_stable=True
            )

        starts = jnp.searchsorted(tile_sorted, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left")
        tile_start = starts[:-1].astype(jnp.int32)
        tile_count = (starts[1:] - starts[:-1]).astype(jnp.int32)

    # pair payload (attributes in sublanes, pairs in lanes — DMA slices are
    # lane-aligned 512-pair chunks at the aligned offsets).  Assemble the
    # per-Gaussian attribute matrix FIRST and do ONE row-gather to pair
    # order — N small column gathers over 2M pairs are ~4× slower on TPU.
    if packed:
        # [8, P]: mx, my, ica, icb, icc, r|g, b|op, depth|0
        attrs = jnp.concatenate([
            mean2d,                                       # 2
            inv_cov,                                      # 3
            _pack2(color[:, 0], color[:, 1])[:, None],    # 1
            _pack2(color[:, 2], opacity)[:, None],        # 1
            _pack2(depth, jnp.zeros_like(depth))[:, None],  # 1
        ], axis=1)
    else:
        # [16, P]: mx, my, ica, icb, icc, r, g, b, opacity, depth, pad×6
        attrs = jnp.concatenate([
            mean2d,                 # 2
            inv_cov,                # 3
            color,                  # 3
            opacity[:, None],       # 1
            depth[:, None],         # 1 (row 9: view-space depth for D out)
            jnp.zeros((N, 6), jnp.float32),  # pad to 16 (sublane-aligned)
        ], axis=1)
    payload = attrs[pair_sorted].T.astype(jnp.float32)
    # dead pairs get zero payload. Select, NOT multiply: packed rows are
    # raw bit patterns — a ×1.0 would flush denormal-looking packs to zero.
    payload = jnp.where(pair_live[None, :], payload, 0.0)

    return payload, tile_start, tile_count, n_tiles_side


def _pair_terms(data, px, py, start, count, off, packed: bool = False):
    """Shared fwd/bwd per-chunk math: α, masks, and the quadratic terms."""
    j = jax.lax.broadcasted_iota(jnp.int32, (1, PAIR_CHUNK), 1)
    gidx = off + j
    live = (gidx >= start) & (gidx < start + count)

    mx, my = data[0:1, :], data[1:2, :]
    ia, ib, ic = data[2:3, :], data[3:4, :], data[4:5, :]
    op = _unpack2(data[6:7, :])[1] if packed else data[8:9, :]

    dx = px - mx        # [256, CHUNK]
    dy = py - my
    power = -0.5 * (ia * dx * dx + ic * dy * dy) - ib * dx * dy
    expp = jnp.exp(power)
    raw = op * expp
    alpha = jnp.minimum(0.99, raw)
    dead = (power > 0.0) | (alpha < 1.0 / 255.0) | (~live)
    alpha = jnp.where(dead, 0.0, alpha)
    # where α is clamped at 0.99 it no longer depends on (o, power)
    gmask = (~dead) & (raw < 0.99)
    return alpha, gmask, expp, dx, dy, ia, ib, ic


def _tile_kernel(
    tile_start_ref, tile_count_ref,  # scalar prefetch [T]
    payload_hbm,                      # [16, P] in HBM/ANY
    out_ref,                          # out [1, 4, 256]: rgb rows + alpha row
    scratch, sem,                     # VMEM [rows, CHUNK], DMA sem
    *, n_tiles_side: int, packed: bool = False,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    ty = t // n_tiles_side
    tx = t % n_tiles_side

    # pixel coordinates: 256 flattened pixels in SUBLANES ([256, 1]); built
    # by modular arithmetic on a 2D iota (reshapes are unsupported in Mosaic)
    pidx = jax.lax.broadcasted_iota(jnp.int32, (TILE * TILE, 1), 0)
    px = (pidx % TILE + tx * TILE).astype(jnp.float32)
    py = (pidx // TILE + ty * TILE).astype(jnp.float32)

    # chunks are aligned to GLOBAL 512-pair boundaries so every DMA slice is
    # lane-aligned; the live-mask trims the head/tail overhang
    c0 = start // PAIR_CHUNK
    n_chunks = pl.cdiv(start + count, PAIR_CHUNK) - c0

    # strictly-upper-triangular ones: exclusive prefix along the pair (lane)
    # axis as one MXU matmul (cumprod/cumsum have no Pallas TPU lowering,
    # and the triangular matmul is faster than a log-step scan anyway)
    r_i = jax.lax.broadcasted_iota(jnp.int32, (PAIR_CHUNK, PAIR_CHUNK), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (PAIR_CHUNK, PAIR_CHUNK), 1)
    u_strict = (r_i < c_i).astype(jnp.float32)

    def body(ci, carry):
        T, C_rgbd = carry  # [256, 1], [256, 4]
        # div-mul form: Mosaic can PROVE the HBM slice offset is lane-aligned
        off = (c0 + ci) * PAIR_CHUNK
        copy = pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(off, PAIR_CHUNK)], scratch, sem
        )
        copy.start()
        copy.wait()

        data = scratch[:, :]  # [rows, CHUNK]
        alpha, _, _, _, _, _, _, _ = _pair_terms(
            data, px, py, start, count, off, packed=packed)

        logs = jnp.log1p(-alpha)  # alpha <= 0.99 keeps this finite
        prefix_excl = jax.lax.dot_general(
            logs, u_strict, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        T_excl = jnp.exp(prefix_excl) * T     # [256, CHUNK]
        w = alpha * T_excl
        # rgb + depth channels in one MXU contraction: [256,C] x [4,C] -> [256,4]
        if packed:
            r_, g_ = _unpack2(data[5:6, :])
            b_, _o = _unpack2(data[6:7, :])
            d_, _z = _unpack2(data[7:8, :])
            rgbd = jnp.concatenate([r_, g_, b_, d_], axis=0)
        else:
            rgbd = jnp.concatenate([data[5:8, :], data[9:10, :]], axis=0)
        C_rgbd = C_rgbd + jax.lax.dot_general(
            w, rgbd, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        T = T * jnp.exp(jnp.sum(logs, axis=1, keepdims=True))
        return (T, C_rgbd)

    T0 = jnp.ones((TILE * TILE, 1), jnp.float32)
    Z = jnp.zeros((TILE * TILE, 4), jnp.float32)
    T, C_rgbd = jax.lax.fori_loop(0, n_chunks, body, (T0, Z))

    # rows: rgb(3), alpha, depth
    out = jnp.concatenate([C_rgbd[:, :3], 1.0 - T, C_rgbd[:, 3:4]], axis=1)
    out_ref[0, :, :] = out.T


def _tile_bwd_kernel(
    tile_start_ref, tile_count_ref,   # scalar prefetch [T]
    payload_hbm,                       # [16, P] in HBM/ANY
    zeros_hbm,                         # [16, P] aliased to dpay_hbm (init)
    saved_ref,                         # [1, 5, 256] VMEM: fwd (C_rgb, A, D)
    grad_ref,                          # [1, 5, 256] VMEM: (gC, gA, gD)
    dpay_hbm,                          # out [16, P] in HBM/ANY (accumulated)
    scratch_in, scratch_out, sem_in, sem_out,
    *, n_tiles_side: int,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    ty = t // n_tiles_side
    tx = t % n_tiles_side

    pidx = jax.lax.broadcasted_iota(jnp.int32, (TILE * TILE, 1), 0)
    px = (pidx % TILE + tx * TILE).astype(jnp.float32)
    py = (pidx // TILE + ty * TILE).astype(jnp.float32)

    c0 = start // PAIR_CHUNK
    n_chunks = pl.cdiv(start + count, PAIR_CHUNK) - c0

    r_i = jax.lax.broadcasted_iota(jnp.int32, (PAIR_CHUNK, PAIR_CHUNK), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (PAIR_CHUNK, PAIR_CHUNK), 1)
    u_strict = (r_i < c_i).astype(jnp.float32)
    ones_px = jnp.ones((1, TILE * TILE), jnp.float32)

    saved = saved_ref[0]                      # [5, 256]: rgb, alpha, depth
    grad = grad_ref[0]                        # [5, 256]
    C_tot = jnp.concatenate([saved[:3, :], saved[4:5, :]], axis=0).T  # [256, 4]
    T_N = (1.0 - saved[3:4, :]).T             # [256, 1]
    gC = jnp.concatenate([grad[:3, :], grad[4:5, :]], axis=0).T       # [256, 4]
    gA = grad[3:4, :].T                       # [256, 1]
    # per-pixel Σ_ch gC·C_tot — the suffix term's constant part
    g_dot_Ctot = jnp.sum(gC * C_tot, axis=1, keepdims=True)  # [256, 1]
    gA_TN = gA * T_N                                          # [256, 1]

    def body(ci, carry):
        T, Cum_g = carry  # [256,1] transmittance in; [256,1] Σ_ch gC·Cum_in
        off = (c0 + ci) * PAIR_CHUNK  # provably lane-aligned
        copy = pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(off, PAIR_CHUNK)], scratch_in, sem_in
        )
        copy.start()
        # overlap: fetch the current accumulator chunk while payload lands
        acc_read = pltpu.make_async_copy(
            dpay_hbm.at[:, pl.ds(off, PAIR_CHUNK)], scratch_out, sem_out
        )
        acc_read.start()
        copy.wait()

        data = scratch_in[:, :]
        alpha, gmask, expp, dx, dy, ia, ib, ic = _pair_terms(
            data, px, py, start, count, off
        )
        rgbd = jnp.concatenate([data[5:8, :], data[9:10, :]], axis=0)  # [4, CHUNK]

        logs = jnp.log1p(-alpha)
        prefix_excl = jax.lax.dot_general(
            logs, u_strict, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        T_excl = jnp.exp(prefix_excl) * T
        w = alpha * T_excl                                    # [256, CHUNK]

        # dL/d(color,depth): [4, CHUNK] = gC^T @ w
        d_rgbd = jax.lax.dot_general(
            gC, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

        # G1(p,i) = Σ_ch gC_ch(p) c_ch(i):  [256,4] x [4,CHUNK]
        G1 = jax.lax.dot_general(
            gC, rgbd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

        # inclusive prefix of Σ_ch gC_ch w c_ch along the chunk: collapse the
        # channel sum FIRST (wg = Σ_ch gC_ch(p) c_ch(i) w(p,i) = G1·w), then
        # one triangular matmul gives the per-pair inclusive cumulation
        wg = G1 * w                                           # [256, CHUNK]
        u_incl = (r_i <= c_i).astype(jnp.float32)
        Gcum = jax.lax.dot_general(
            wg, u_incl, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) + Cum_g                                             # [256, CHUNK]

        one_minus = jnp.maximum(1.0 - alpha, 0.01)            # α ≤ 0.99
        # dL/dα_i(p) = gC·c_i T_i − (gC·C_tot − gC·Cum_i)/(1−α) + gA T_N/(1−α)
        dalpha = G1 * T_excl - (g_dot_Ctot - Gcum - gA_TN) / one_minus

        dpower = jnp.where(gmask, dalpha * alpha, 0.0)
        dop_px = jnp.where(gmask, dalpha * expp, 0.0)

        def colsum(m):  # [256, CHUNK] -> [1, CHUNK]
            return jax.lax.dot_general(
                ones_px, m, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        d_mx = colsum(dpower * (ia * dx + ib * dy))
        d_my = colsum(dpower * (ic * dy + ib * dx))
        d_ia = colsum(dpower * (-0.5 * dx * dx))
        d_ib = colsum(dpower * (-dx * dy))
        d_ic = colsum(dpower * (-0.5 * dy * dy))
        d_op = colsum(dop_px)

        zeros6 = jnp.zeros((6, PAIR_CHUNK), jnp.float32)
        contrib = jnp.concatenate(
            [d_mx, d_my, d_ia, d_ib, d_ic, d_rgbd[:3], d_op, d_rgbd[3:4], zeros6],
            axis=0,
        )
        # read-modify-write accumulate: a boundary chunk holds the tail of
        # the previous tile's segment — its masked positions contribute 0
        # here, so adding preserves the neighbour's gradients. Safe because
        # the TPU Pallas grid runs sequentially on one core.
        acc_read.wait()
        scratch_out[:, :] = scratch_out[:, :] + contrib
        wcopy = pltpu.make_async_copy(
            scratch_out, dpay_hbm.at[:, pl.ds(off, PAIR_CHUNK)], sem_out
        )
        wcopy.start()
        wcopy.wait()

        T_next = T * jnp.exp(jnp.sum(logs, axis=1, keepdims=True))
        Cum_g_next = Cum_g + jnp.sum(wg, axis=1, keepdims=True)
        return (T_next, Cum_g_next)

    T0 = jnp.ones((TILE * TILE, 1), jnp.float32)
    Z = jnp.zeros((TILE * TILE, 1), jnp.float32)
    jax.lax.fori_loop(0, n_chunks, body, (T0, Z))


def _composite_call(payload, tile_start, tile_count, n_tiles_side):
    """Raw forward pallas call → out_tiles [T, 5, 256] (C pre-bg, alpha, D).

    The payload's leading dim picks the layout: 8 rows = packed inference
    payload, 16 rows = differentiable fp32 payload."""
    n_tiles = n_tiles_side * n_tiles_side
    rows = payload.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 5, TILE * TILE), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, PAIR_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    capacity = payload.shape[1]
    return pl.pallas_call(
        functools.partial(
            _tile_kernel, n_tiles_side=n_tiles_side, packed=(rows == 8)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 5, TILE * TILE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=capacity * TILE * TILE * 20,
            bytes_accessed=capacity * rows * 4,
            transcendentals=capacity * TILE * TILE,
        ),
        interpret=INTERPRET,
    )(tile_start, tile_count, payload)


def _composite_bwd_call(payload, tile_start, tile_count, out_tiles, grad_tiles,
                        n_tiles_side):
    n_tiles = n_tiles_side * n_tiles_side
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 5, TILE * TILE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, TILE * TILE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((16, PAIR_CHUNK), jnp.float32),
            pltpu.VMEM((16, PAIR_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    capacity = payload.shape[1]
    # zero-init the accumulator by donating a zeros buffer into the output
    # (pallas outputs are otherwise uninitialized; the kernel RMW-accumulates)
    zeros = jnp.zeros((16, capacity), jnp.float32)
    return pl.pallas_call(
        functools.partial(_tile_bwd_kernel, n_tiles_side=n_tiles_side),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, capacity), jnp.float32),
        # arg 3 = zeros (after the 2 scalar-prefetch args and payload)
        input_output_aliases={3: 0},
        cost_estimate=pl.CostEstimate(
            flops=capacity * TILE * TILE * 40,
            bytes_accessed=capacity * 16 * 4 * 2,
            transcendentals=capacity * TILE * TILE,
        ),
        interpret=INTERPRET,
    )(tile_start, tile_count, payload, zeros, out_tiles, grad_tiles)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _composite(payload, tile_start, tile_count, n_tiles_side):
    return _composite_call(payload, tile_start, tile_count, n_tiles_side)


def _composite_fwd(payload, tile_start, tile_count, n_tiles_side):
    if payload.shape[0] != 16:
        raise ValueError(
            "differentiating the packed 8-row splat payload is unsupported — "
            "render with packed=False for training/gradient paths"
        )
    out = _composite_call(payload, tile_start, tile_count, n_tiles_side)
    return out, (payload, tile_start, tile_count, out)


def _composite_bwd(n_tiles_side, res, g):
    payload, tile_start, tile_count, out = res
    # chunks no tile walks (the dead-pair region) keep the aliased zeros
    dpay = _composite_bwd_call(payload, tile_start, tile_count, out, g, n_tiles_side)
    f0 = np.zeros((), jax.dtypes.float0)
    return (
        dpay,
        np.broadcast_to(f0, tile_start.shape),
        np.broadcast_to(f0, tile_count.shape),
    )


_composite.defvjp(_composite_fwd, _composite_bwd)


def _composite_tiles(payload, tile_start, tile_count, n_tiles_side):
    """Composite + untile: [16, P] pairs →
    (img [S,S,3] pre-bg, alpha [S,S], depth [S,S])."""
    out_tiles = _composite(payload, tile_start, tile_count, n_tiles_side)
    S = n_tiles_side * TILE
    nt = n_tiles_side
    tiles = out_tiles.reshape(nt, nt, 5, TILE, TILE)
    img = tiles[:, :, :3].transpose(0, 3, 1, 4, 2).reshape(S, S, 3)
    alpha = tiles[:, :, 3].transpose(0, 2, 1, 3).reshape(S, S)
    depth = tiles[:, :, 4].transpose(0, 2, 1, 3).reshape(S, S)
    return img, alpha, depth


def _rasterize_pallas_fwd_impl(
    gaussians: jnp.ndarray,
    cam_view: jnp.ndarray,
    cam_view_proj: jnp.ndarray,
    img_size: int,
    tan_half_fov: float,
    bg_color: jnp.ndarray,
    max_pairs: int,
    max_span: int,
):
    proj = project_gaussians(gaussians, cam_view, cam_view_proj, img_size, tan_half_fov)
    payload, tile_start, tile_count, n_tiles_side = _bin_pairs(
        *proj, img_size=img_size, max_pairs=max_pairs, max_span=max_span
    )
    img, alpha, depth = _composite_tiles(payload, tile_start, tile_count, n_tiles_side)
    img = img + (1.0 - alpha)[..., None] * bg_color[None, None, :]
    img = jnp.clip(img, 0.0, 1.0)
    return img.transpose(2, 0, 1), alpha[None], depth[None]


def rasterize_pallas(
    gaussians, cam_view, cam_view_proj, img_size, tan_half_fov, bg_color,
    max_pairs: int = 1 << 21, max_span: int = 16,
):
    """One view → (image [3,S,S], alpha [1,S,S], depth [1,S,S]).

    Fully differentiable: the Pallas composite carries a dedicated backward
    kernel; projection and binning autodiff through XLA (the pair gather's
    VJP scatter-adds per-tile gradients back onto each Gaussian)."""
    return _rasterize_pallas_fwd_impl(
        gaussians, cam_view, cam_view_proj, img_size, tan_half_fov, bg_color,
        max_pairs, max_span,
    )


def rasterize_pallas_batch(
    gaussians: jnp.ndarray,   # [B, N, 14]
    cam_view: jnp.ndarray,    # [B, V, 4, 4]
    cam_view_proj: jnp.ndarray,
    img_size: int,
    tan_half_fov: float,
    bg_color: jnp.ndarray,
    max_pairs: int = 1 << 21,
    max_span: int = 16,
    group_size: int = None,
    packed: bool = False,
):
    """Batched multi-view rendering: the scene-level Gaussian prep
    (quat→covariance factor) runs once per scene, the XLA projection+
    binning runs as ONE vmapped program over each group of views (batched
    sorts/gathers amortize the per-op dispatch overhead), then the Pallas
    kernel maps sequentially over the prepared views (manual-DMA kernels
    have no batching rule).

    ``group_size`` sets how many views share one vmapped binning program
    (and bounds the live pair-payload memory to G × rows × capacity
    floats); the measured sweet spot is the default G=8.

    Returns {"image": [B, V, 3, S, S], "alpha": [B, V, 1, S, S], "depth": ...}.
    """
    B, V = cam_view.shape[:2]
    n_tiles_side = img_size // TILE
    total = B * V

    if group_size is None:
        # measured at the refine shapes (48 views, cap 327680): G=8 is the
        # sweet spot — 17.2 ms/view vs 28.4 at G=48 (XLA's batched sort
        # degrades with batch) and 22.7 at G=4 (dispatch overhead) —
        # scripts/profile_splat_groups.py
        group_size = 8
    G = min(group_size, total)
    pad = (-total) % G

    # per-scene view-independent prep, then one flat per-view copy
    prep = jax.vmap(prepare_gaussians)(gaussians)  # dict of [B, ...]

    def bview(a):
        out = jnp.broadcast_to(a[:, None], (B, V) + a.shape[1:]).reshape(
            total, *a.shape[1:])
        if pad:
            out = jnp.concatenate(
                [out, jnp.zeros((pad,) + a.shape[1:], out.dtype)])
        return out

    prep_flat = {k: bview(v) for k, v in prep.items()}
    eye = jnp.broadcast_to(jnp.eye(4), (pad, 4, 4)) if pad else None
    cv_flat = jnp.concatenate(
        [cam_view.reshape(total, 4, 4)] + ([eye] if pad else []))
    cvp_flat = jnp.concatenate(
        [cam_view_proj.reshape(total, 4, 4)] + ([eye] if pad else []))

    def prep_one(pr, cv, cvp):
        proj = project_prepared(pr, cv, cvp, img_size, tan_half_fov)
        p, ts, tc, _ = _bin_pairs(
            *proj, img_size=img_size, max_pairs=max_pairs, max_span=max_span,
            packed=packed,
        )
        return p, ts, tc

    def one_view(args):
        payload, ts, tc = args
        img, alpha, depth = _composite_tiles(payload, ts, tc, n_tiles_side)
        img = img + (1.0 - alpha)[..., None] * bg_color[None, None, :]
        return jnp.clip(img, 0.0, 1.0).transpose(2, 0, 1), alpha[None], depth[None]

    def group(args):
        pr, cv, cvp = args
        payloads, starts, counts = jax.vmap(prep_one)(pr, cv, cvp)
        return jax.lax.map(one_view, (payloads, starts, counts))

    n_groups = (total + pad) // G
    imgs, alphas, depths = jax.lax.map(
        group,
        (
            {k: v.reshape(n_groups, G, *v.shape[1:]) for k, v in prep_flat.items()},
            cv_flat.reshape(n_groups, G, 4, 4),
            cvp_flat.reshape(n_groups, G, 4, 4),
        ),
    )
    imgs = imgs.reshape(-1, 3, img_size, img_size)[:total]
    alphas = alphas.reshape(-1, 1, img_size, img_size)[:total]
    depths = depths.reshape(-1, 1, img_size, img_size)[:total]
    return {
        "image": imgs.reshape(B, V, 3, img_size, img_size),
        "alpha": alphas.reshape(B, V, 1, img_size, img_size),
        "depth": depths.reshape(B, V, 1, img_size, img_size),
    }
