"""Tile-binned differentiable Gaussian splatting — the Pallas TPU kernel.

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
       yields per-tile contiguous, depth-ordered segments
    4. gather pair payloads into a [12, P] lane-friendly buffer

  Pallas (per-tile grid):
    5. for each of the (S/16)² tiles: DMA pair-payload chunks HBM→VMEM,
       evaluate α(x) = min(.99, o·exp(-½ dᵀΣ'⁻¹d)) for 256 pixels × chunk,
       composite front-to-back with a carried transmittance (chunk-local
       cumulative products), write the 16×16 RGB+α tile.

Capacity knobs: ``max_pairs`` (pair-list capacity; overflow drops the
deepest pairs — graceful degradation identical in spirit to the CUDA
renderer's buffer reallocation) and ``max_span`` (tile-span clamp per
Gaussian).

Backward: custom VJP via the dense reference implementation on the *same*
inputs (exact same math, so gradients are consistent); a dedicated Pallas
backward kernel is the next perf step for training-time rendering.
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

# interpret-mode switch: lets the CPU test suite execute the kernel body
# (tests/test_pallas_kernels.py); always False in production
INTERPRET = False


def _bin_pairs(
    mean2d, inv_cov, depth, radius, color, opacity, valid,
    img_size: int, max_pairs: int, max_span: int,
):
    """Build the depth-ordered, tile-sorted pair list (steps 2-4)."""
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

    local = pair_idx - offsets[pair_g]
    sx = jnp.maximum(span_x[pair_g], 1)
    tile_x = tx0[pair_g] + local % sx
    tile_y = ty0[pair_g] + local // sx
    tile_id = jnp.where(pair_live, tile_y * n_tiles_side + tile_x, n_tiles)

    # stable sort by tile keeps the depth order within each tile
    tile_sorted, pair_sorted = jax.lax.sort((tile_id, pair_g), num_keys=1, is_stable=True)

    starts = jnp.searchsorted(tile_sorted, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left")
    tile_start = starts[:-1].astype(jnp.int32)
    tile_count = (starts[1:] - starts[:-1]).astype(jnp.int32)

    # pair payload [16, P]: mx, my, ica, icb, icc, r, g, b, opacity, pad×7
    # (attributes in sublanes, pairs in lanes — DMA slices are lane-aligned
    # 512-pair chunks at global chunk boundaries).  Assemble the per-Gaussian
    # attribute matrix FIRST and do ONE row-gather to pair order — N small
    # column gathers over 2M pairs are ~4× slower on TPU.
    attrs = jnp.concatenate([
        mean2d,                 # 2
        inv_cov,                # 3
        color,                  # 3
        opacity[:, None],       # 1
        jnp.zeros((N, 7), jnp.float32),  # pad to 16 (sublane-aligned slices)
    ], axis=1)
    payload = attrs[pair_sorted].T.astype(jnp.float32)
    # dead pairs get zero opacity
    payload = payload * (pair_idx[None, :] < total)

    return payload, tile_start, tile_count, n_tiles_side


def _tile_kernel(
    tile_start_ref, tile_count_ref,  # scalar prefetch [T]
    payload_hbm,                      # [16, P] in HBM/ANY
    out_ref,                          # out [1, 4, 256]: rgb rows + alpha row
    scratch, sem,                     # VMEM [16, CHUNK], DMA sem
    *, n_tiles_side: int, max_pairs: int,
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
        T, C_rgb = carry  # [256, 1], [256, 3]
        off = (c0 + ci) * PAIR_CHUNK
        copy = pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(off, PAIR_CHUNK)], scratch, sem
        )
        copy.start()
        copy.wait()

        data = scratch[:, :]  # [16, CHUNK]
        j = jax.lax.broadcasted_iota(jnp.int32, (1, PAIR_CHUNK), 1)
        gidx = off + j
        live = (gidx >= start) & (gidx < start + count)

        mx = data[0:1, :]   # [1, CHUNK]
        my = data[1:2, :]
        ia = data[2:3, :]
        ib = data[3:4, :]
        ic = data[4:5, :]
        op = data[8:9, :]

        dx = px - mx        # [256, CHUNK]
        dy = py - my
        power = -0.5 * (ia * dx * dx + ic * dy * dy) - ib * dx * dy
        alpha = jnp.minimum(0.99, op * jnp.exp(power))
        alpha = jnp.where((power > 0.0) | (alpha < 1.0 / 255.0) | (~live), 0.0, alpha)

        logs = jnp.log1p(-alpha)  # alpha <= 0.99 keeps this finite
        prefix_excl = jax.lax.dot_general(
            logs, u_strict, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        T_excl = jnp.exp(prefix_excl) * T     # [256, CHUNK]
        w = alpha * T_excl
        # all three channels in one MXU contraction: [256,C] x [3,C] -> [256,3]
        rgb = data[5:8, :]
        C_rgb = C_rgb + jax.lax.dot_general(
            w, rgb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        T = T * jnp.exp(jnp.sum(logs, axis=1, keepdims=True))
        return (T, C_rgb)

    T0 = jnp.ones((TILE * TILE, 1), jnp.float32)
    Z = jnp.zeros((TILE * TILE, 3), jnp.float32)
    T, C_rgb = jax.lax.fori_loop(0, n_chunks, body, (T0, Z))

    out = jnp.concatenate([C_rgb, 1.0 - T], axis=1)  # [256, 4]
    out_ref[0, :, :] = out.T


def _composite_tiles(payload, tile_start, tile_count, n_tiles_side, max_pairs):
    """Run the per-tile Pallas compositing kernel for one prepared view."""
    n_tiles = n_tiles_side * n_tiles_side

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 4, TILE * TILE), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((16, PAIR_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    out_tiles = pl.pallas_call(
        functools.partial(
            _tile_kernel, n_tiles_side=n_tiles_side, max_pairs=max_pairs
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 4, TILE * TILE), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=max_pairs * TILE * TILE * 20,
            bytes_accessed=max_pairs * 12 * 4,
            transcendentals=max_pairs * TILE * TILE,
        ),
        interpret=INTERPRET,
    )(tile_start, tile_count, payload)

    # untile: [T, 4, 256] -> [S, S, 4]
    S = n_tiles_side * TILE
    nt = n_tiles_side
    tiles = out_tiles.reshape(nt, nt, 4, TILE, TILE)
    img = tiles[:, :, :3].transpose(0, 3, 1, 4, 2).reshape(S, S, 3)
    alpha = tiles[:, :, 3].transpose(0, 2, 1, 3).reshape(S, S)
    return img, alpha


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
    img, alpha = _composite_tiles(payload, tile_start, tile_count, n_tiles_side, max_pairs)
    img = img + (1.0 - alpha)[..., None] * bg_color[None, None, :]
    img = jnp.clip(img, 0.0, 1.0)
    return img.transpose(2, 0, 1), alpha[None]


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
    # bounding the live pair-payload memory to G × 16 × max_pairs floats
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
        return _bin_pairs(*proj, img_size=img_size, max_pairs=max_pairs, max_span=max_span)[:3]

    def one_view(args):
        payload, ts, tc = args
        img, alpha = _composite_tiles(payload, ts, tc, n_tiles_side, max_pairs)
        img = img + (1.0 - alpha)[..., None] * bg_color[None, None, :]
        return jnp.clip(img, 0.0, 1.0).transpose(2, 0, 1), alpha[None]

    def group(args):
        g, cv, cvp = args
        payloads, starts, counts = jax.vmap(prep_one)(g, cv, cvp)
        return jax.lax.map(one_view, (payloads, starts, counts))

    n_groups = (total + pad) // G
    imgs, alphas = jax.lax.map(
        group,
        (
            g_flat.reshape(n_groups, G, *gaussians.shape[1:]),
            cv_flat.reshape(n_groups, G, 4, 4),
            cvp_flat.reshape(n_groups, G, 4, 4),
        ),
    )
    imgs = imgs.reshape(-1, 3, img_size, img_size)[:total]
    alphas = alphas.reshape(-1, 1, img_size, img_size)[:total]
    return {
        "image": imgs.reshape(B, V, 3, img_size, img_size),
        "alpha": alphas.reshape(B, V, 1, img_size, img_size),
    }


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 6, 7)
)
def rasterize_pallas(
    gaussians, cam_view, cam_view_proj, img_size, tan_half_fov, bg_color,
    max_pairs: int = 1 << 21, max_span: int = 16,
):
    """One view → (image [3,S,S], alpha [1,S,S]) via the tile-binned kernel."""
    return _rasterize_pallas_fwd_impl(
        gaussians, cam_view, cam_view_proj, img_size, tan_half_fov, bg_color,
        max_pairs, max_span,
    )


def _fwd(gaussians, cam_view, cam_view_proj, img_size, tan_half_fov, bg_color,
         max_pairs, max_span):
    out = _rasterize_pallas_fwd_impl(
        gaussians, cam_view, cam_view_proj, img_size, tan_half_fov, bg_color,
        max_pairs, max_span,
    )
    return out, (gaussians, cam_view, cam_view_proj, bg_color)


def _bwd(img_size, tan_half_fov, max_pairs, max_span, res, g):
    from .gaussian_splat import rasterize_dense

    gaussians, cam_view, cam_view_proj, bg_color = res
    _, vjp = jax.vjp(
        lambda ga, cv, cvp, bg: rasterize_dense(
            ga, cv, cvp, img_size, tan_half_fov, bg
        ),
        gaussians, cam_view, cam_view_proj, bg_color,
    )
    return vjp(g)


rasterize_pallas.defvjp(_fwd, _bwd)
