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

from .gaussian_splat import project_gaussians

TILE = 16
PAIR_CHUNK = 512

# interpret-mode switch: lets the CPU test suite execute the kernel bodies
# (tests/test_pallas_kernels.py); always False in production
INTERPRET = False


def _bin_pairs(
    mean2d, inv_cov, depth, radius, color, opacity, valid,
    img_size: int, max_pairs: int, max_span: int,
):
    """Build the depth-ordered, tile-sorted, chunk-aligned pair list."""
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

    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    # fixed-capacity expansion in depth order
    pair_g = jnp.repeat(
        jnp.arange(N, dtype=jnp.int32), counts, total_repeat_length=max_pairs
    )
    pair_idx = jnp.arange(max_pairs, dtype=jnp.int32)
    total = jnp.sum(counts)
    pair_live = pair_idx < total

    # per-pair metadata via ONE [N,4] row-gather — four separate scalar
    # gathers by pair_g measured 6× slower on TPU (28 vs 4.6 ms/view at
    # P=2^19; scripts/profile_bin_stages.py)
    meta = jnp.stack([offsets, jnp.maximum(span_x, 1), tx0, ty0], axis=1)
    m = meta[pair_g]  # [P, 4]
    local = pair_idx - m[:, 0]
    tile_x = m[:, 2] + local % m[:, 1]
    tile_y = m[:, 3] + local // m[:, 1]
    tile_id = jnp.where(pair_live, tile_y * n_tiles_side + tile_x, n_tiles)

    # stable sort by tile keeps the depth order within each tile. Sorting is
    # the binning bottleneck (XLA's TPU sort makes O(log²) passes over the
    # arrays), so when (tile_id, pair index) packs into 31 bits we sort ONE
    # int32 key instead of carrying a second array through every pass —
    # pair_idx is already depth-ordered, so packing it into the low bits
    # preserves stability by construction.
    idx_bits = (max_pairs - 1).bit_length()
    if (n_tiles + 1) << idx_bits <= 2**32:
        key = (tile_id.astype(jnp.uint32) << idx_bits) | pair_idx.astype(jnp.uint32)
        key_sorted = jax.lax.sort(key)
        tile_sorted = (key_sorted >> idx_bits).astype(jnp.int32)
        pair_sorted = pair_g[(key_sorted & (max_pairs - 1)).astype(jnp.int32)]
    else:
        tile_sorted, pair_sorted = jax.lax.sort(
            (tile_id, pair_g), num_keys=1, is_stable=True
        )

    starts = jnp.searchsorted(tile_sorted, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left")
    tile_start = starts[:-1].astype(jnp.int32)
    tile_count = (starts[1:] - starts[:-1]).astype(jnp.int32)

    # pair payload [16, P]: mx, my, ica, icb, icc, r, g, b, opacity, pad×7
    # (attributes in sublanes, pairs in lanes — DMA slices are lane-aligned
    # 512-pair chunks at the aligned offsets).  Assemble the per-Gaussian
    # attribute matrix FIRST and do ONE row-gather to pair order — N small
    # column gathers over 2M pairs are ~4× slower on TPU.
    attrs = jnp.concatenate([
        mean2d,                 # 2
        inv_cov,                # 3
        color,                  # 3
        opacity[:, None],       # 1
        depth[:, None],         # 1 (row 9: view-space depth for the D output)
        jnp.zeros((N, 6), jnp.float32),  # pad to 16 (sublane-aligned slices)
    ], axis=1)
    payload = attrs[pair_sorted].T.astype(jnp.float32)
    payload = payload * pair_live[None, :]  # dead pairs get zero payload

    return payload, tile_start, tile_count, n_tiles_side


def _pair_terms(data, px, py, start, count, off):
    """Shared fwd/bwd per-chunk math: α, masks, and the quadratic terms."""
    j = jax.lax.broadcasted_iota(jnp.int32, (1, PAIR_CHUNK), 1)
    gidx = off + j
    live = (gidx >= start) & (gidx < start + count)

    mx, my = data[0:1, :], data[1:2, :]
    ia, ib, ic = data[2:3, :], data[3:4, :], data[4:5, :]
    op = data[8:9, :]

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
    scratch, sem,                     # VMEM [16, CHUNK], DMA sem
    *, n_tiles_side: int,
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

        data = scratch[:, :]  # [16, CHUNK]
        alpha, _, _, _, _, _, _, _ = _pair_terms(data, px, py, start, count, off)

        logs = jnp.log1p(-alpha)  # alpha <= 0.99 keeps this finite
        prefix_excl = jax.lax.dot_general(
            logs, u_strict, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        T_excl = jnp.exp(prefix_excl) * T     # [256, CHUNK]
        w = alpha * T_excl
        # rgb + depth channels in one MXU contraction: [256,C] x [4,C] -> [256,4]
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
    """Raw forward pallas call → out_tiles [T, 4, 256] (C pre-bg, alpha)."""
    n_tiles = n_tiles_side * n_tiles_side
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 5, TILE * TILE), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((16, PAIR_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    capacity = payload.shape[1]
    return pl.pallas_call(
        functools.partial(_tile_kernel, n_tiles_side=n_tiles_side),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 5, TILE * TILE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=capacity * TILE * TILE * 20,
            bytes_accessed=capacity * 16 * 4,
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
):
    """Batched multi-view rendering: the XLA projection+binning runs as ONE
    vmapped program over all B·V views (batched sorts/gathers amortize the
    per-view dispatch overhead), then the Pallas kernel maps sequentially
    over the prepared views (manual-DMA kernels have no batching rule).

    Returns {"image": [B, V, 3, S, S], "alpha": [B, V, 1, S, S]}.
    """
    B, V = cam_view.shape[:2]
    n_tiles_side = img_size // TILE

    # group views so the vmapped prep amortizes sort/gather dispatch while
    # bounding the live pair-payload memory to G × 16 × capacity floats
    G = 8
    total = B * V
    pad = (-total) % G
    g_flat = jnp.concatenate(
        [jnp.broadcast_to(gaussians[:, None], (B, V) + gaussians.shape[1:])
            .reshape(total, *gaussians.shape[1:])]
        + ([jnp.zeros((pad,) + gaussians.shape[1:], gaussians.dtype)] if pad else []),
    )
    eye = jnp.broadcast_to(jnp.eye(4), (pad, 4, 4)) if pad else None
    cv_flat = jnp.concatenate(
        [cam_view.reshape(total, 4, 4)] + ([eye] if pad else []))
    cvp_flat = jnp.concatenate(
        [cam_view_proj.reshape(total, 4, 4)] + ([eye] if pad else []))

    def prep_one(g, cv, cvp):
        proj = project_gaussians(g, cv, cvp, img_size, tan_half_fov)
        p, ts, tc, _ = _bin_pairs(
            *proj, img_size=img_size, max_pairs=max_pairs, max_span=max_span
        )
        return p, ts, tc

    def one_view(args):
        payload, ts, tc = args
        img, alpha, depth = _composite_tiles(payload, ts, tc, n_tiles_side)
        img = img + (1.0 - alpha)[..., None] * bg_color[None, None, :]
        return jnp.clip(img, 0.0, 1.0).transpose(2, 0, 1), alpha[None], depth[None]

    def group(args):
        g, cv, cvp = args
        payloads, starts, counts = jax.vmap(prep_one)(g, cv, cvp)
        return jax.lax.map(one_view, (payloads, starts, counts))

    n_groups = (total + pad) // G
    imgs, alphas, depths = jax.lax.map(
        group,
        (
            g_flat.reshape(n_groups, G, *gaussians.shape[1:]),
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
