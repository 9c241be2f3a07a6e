"""Differentiable 3D Gaussian splatting for TPU.

Replaces the reference's CUDA ``diff-gaussian-rasterization`` extension
(consumed at /root/reference/core/gs.py:7-10,57-83; ashawkey fork with
depth+alpha outputs).  Tensor contract preserved:

  gaussians [B, N, 14]  (pos 3 | opacity 1 | scale 3 | quat 4 | rgb 3)
  cam_view / cam_view_proj [B, V, 4, 4]  — ROW-VECTOR convention
    (p_h @ cam_view maps world→camera; built in
     videomv_tpu.data.cameras.prepare_gs_cameras exactly as the reference)
  cam_pos [B, V, 3]
  → {"image": [B, V, 3, S, S], "alpha": [B, V, 1, S, S], "depth": ...}

Math follows EWA splatting as implemented by 3DGS:
  Σ = R·diag(s)²·Rᵀ (quaternion wxyz),  Σ' = J·W·Σ·Wᵀ·Jᵀ + 0.3·I,
  α_i(x) = min(0.99, o_i · exp(-½ dᵀ Σ'⁻¹ d)),
  front-to-back alpha compositing in depth order, bg fill with residual
  transmittance.

This module holds the *dense* XLA implementation: exact, differentiable by
construction (the per-pixel transmittance cumprod autodiffs cleanly), and
memory-bounded by scanning Gaussian chunks against pixel tiles.  It is the
numerical ground truth for the Pallas tile-binned kernel
(``videomv_tpu.ops.splat_pallas``) which the dispatcher prefers on TPU.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["render_gaussians", "project_gaussians", "rasterize_dense"]


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w,x,y,z, normalized) -> [..., 3, 3] rotation matrices."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def project_gaussians(
    gaussians: jnp.ndarray,
    cam_view: jnp.ndarray,
    cam_view_proj: jnp.ndarray,
    img_size: int,
    tan_half_fov: float,
):
    """Project [N, 14] Gaussians through one view (row-vector matrices).

    Returns (mean2d [N,2] pixel coords, inv_cov2d [N,3] (a,b,c) of the
    symmetric inverse 2D covariance, depth [N], radius [N], color [N,3],
    opacity [N], valid [N])."""
    # geometry matmuls are tiny (K∈{3,4}) but feed exp(): keep them true
    # fp32 on TPU (default bf16 passes shift mean2d by ~1e-2 px → ~1e-1
    # image error through the alpha falloff)
    with jax.default_matmul_precision("highest"):
        pos = gaussians[:, 0:3]
        opacity = gaussians[:, 3]
        scale = gaussians[:, 4:7]
        quat = gaussians[:, 7:11]
        color = gaussians[:, 11:14]


        pos_h = jnp.concatenate([pos, jnp.ones_like(pos[:, :1])], axis=1)
        p_view = pos_h @ cam_view  # [N, 4]
        depth = p_view[:, 2]

        p_hom = pos_h @ cam_view_proj
        p_w = 1.0 / (p_hom[:, 3] + 1e-7)
        ndc = p_hom[:, :3] * p_w[:, None]
        # ndc2Pix: ((v + 1) * S - 1) * 0.5
        mean2d = ((ndc[:, :2] + 1.0) * img_size - 1.0) * 0.5

        # 3D covariance
        R = quat_to_rotmat(quat)
        M = R * scale[:, None, :]  # R @ diag(s)
        cov3d = M @ M.transpose(0, 2, 1)

        # EWA projection: world->camera rotation acts as p_view = p @ V[:3,:3]
        # so the row-vector W is V[:3,:3]; cov_cam = Wᵀ Σ W in row convention.
        W = cam_view[:3, :3]
        cov_cam = W.T[None] @ cov3d @ W[None]

        focal = img_size / (2.0 * tan_half_fov)
        tz = depth
        # clamp the tangent-plane coords like the CUDA kernel (1.3 · tan_fov)
        lim = 1.3 * tan_half_fov
        tx = jnp.clip(p_view[:, 0] / tz, -lim, lim) * tz
        ty = jnp.clip(p_view[:, 1] / tz, -lim, lim) * tz

        z2 = tz * tz
        J = jnp.zeros((pos.shape[0], 2, 3))
        J = J.at[:, 0, 0].set(focal / tz)
        J = J.at[:, 0, 2].set(-(focal * tx) / z2)
        J = J.at[:, 1, 1].set(focal / tz)
        J = J.at[:, 1, 2].set(-(focal * ty) / z2)

        cov2d = J @ cov_cam @ J.transpose(0, 2, 1)
        a = cov2d[:, 0, 0] + 0.3
        b = cov2d[:, 0, 1]
        c = cov2d[:, 1, 1] + 0.3

        det = a * c - b * b
        valid = (depth > 0.2) & (det > 0.0)
        det = jnp.where(det == 0.0, 1.0, det)
        inv_cov = jnp.stack([c / det, -b / det, a / det], axis=1)

        mid = 0.5 * (a + c)
        lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
        radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    return mean2d, inv_cov, depth, radius, color, opacity, valid


def _composite_tile(
    px: jnp.ndarray,  # [P, 2] pixel centers
    mean2d, inv_cov, color, opacity, depth, order,  # projected (sorted idx)
    chunk: int,
):
    """Exact front-to-back compositing of all Gaussians over P pixels,
    scanning depth-sorted chunks with a carried transmittance."""
    N = mean2d.shape[0]
    P = px.shape[0]
    n_chunks = (N + chunk - 1) // chunk
    pad = n_chunks * chunk - N
    order_p = jnp.concatenate([order, jnp.full((pad,), 0, order.dtype)])
    pad_mask = jnp.concatenate([jnp.ones((N,), bool), jnp.zeros((pad,), bool)])

    def body(carry, idx_chunk):
        T, C, D = carry
        idxs, live = idx_chunk
        m = mean2d[idxs]        # [K, 2]
        ic = inv_cov[idxs]      # [K, 3]
        col = color[idxs]       # [K, 3]
        op = opacity[idxs]      # [K]
        dep = depth[idxs]       # [K]

        d = px[None, :, :] - m[:, None, :]          # [K, P, 2]
        power = -0.5 * (
            ic[:, 0, None] * d[..., 0] ** 2
            + ic[:, 2, None] * d[..., 1] ** 2
        ) - ic[:, 1, None] * d[..., 0] * d[..., 1]
        alpha = jnp.minimum(0.99, op[:, None] * jnp.exp(power))  # [K, P]
        alpha = jnp.where((power > 0) | (alpha < 1.0 / 255.0), 0.0, alpha)
        alpha = jnp.where(live[:, None], alpha, 0.0)

        one_minus = 1.0 - alpha
        cp = jnp.cumprod(one_minus, axis=0)                     # [K, P]
        T_excl = jnp.concatenate([jnp.ones((1, P)), cp[:-1]], axis=0) * T[None]
        w = alpha * T_excl                                       # [K, P]
        C = C + jnp.einsum("kp,kc->pc", w, col)
        D = D + jnp.einsum("kp,k->p", w, dep)
        T_new = T * cp[-1]
        return (T_new, C, D), None

    T0 = jnp.ones((P,))
    C0 = jnp.zeros((P, 3))
    D0 = jnp.zeros((P,))
    idx_chunks = order_p.reshape(n_chunks, chunk)
    live_chunks = pad_mask.reshape(n_chunks, chunk)
    (T, C, D), _ = jax.lax.scan(body, (T0, C0, D0), (idx_chunks, live_chunks))
    return C, 1.0 - T, D


def rasterize_dense(
    gaussians: jnp.ndarray,  # [N, 14]
    cam_view: jnp.ndarray,  # [4, 4]
    cam_view_proj: jnp.ndarray,  # [4, 4]
    img_size: int,
    tan_half_fov: float,
    bg_color: jnp.ndarray,  # [3]
    chunk: int = 256,
    tile: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One view → (image [3,S,S], alpha [1,S,S], depth [1,S,S]). Dense."""
    mean2d, inv_cov, depth, radius, color, opacity, valid = project_gaussians(
        gaussians, cam_view, cam_view_proj, img_size, tan_half_fov
    )
    opacity = jnp.where(valid, opacity, 0.0)
    depth_c = jnp.where(valid, depth, 0.0)
    order = jnp.argsort(jnp.where(valid, depth, jnp.inf))

    S = img_size
    tile = min(tile, S)
    ys, xs = jnp.meshgrid(jnp.arange(S, dtype=jnp.float32),
                          jnp.arange(S, dtype=jnp.float32), indexing="ij")
    px_all = jnp.stack([xs, ys], axis=-1).reshape(-1, 2)  # [S*S, 2] (x, y)

    n_tiles = (S * S + tile * tile - 1) // (tile * tile)
    px_tiles = px_all.reshape(n_tiles, tile * tile, 2)

    comp = functools.partial(
        _composite_tile,
        mean2d=mean2d, inv_cov=inv_cov, color=color, opacity=opacity,
        depth=depth_c, order=order, chunk=chunk,
    )
    C, A, D = jax.lax.map(lambda p: comp(p), px_tiles)  # [T,P,3], [T,P], [T,P]
    C = C.reshape(S * S, 3)
    A = A.reshape(S * S)
    D = D.reshape(S * S)
    img = C + (1.0 - A)[:, None] * bg_color[None, :]
    img = jnp.clip(img, 0.0, 1.0)
    return (
        img.reshape(S, S, 3).transpose(2, 0, 1),
        A.reshape(1, S, S),
        D.reshape(1, S, S),
    )


def render_gaussians(
    gaussians: jnp.ndarray,  # [B, N, 14]
    cam_view: jnp.ndarray,  # [B, V, 4, 4]
    cam_view_proj: jnp.ndarray,  # [B, V, 4, 4]
    cam_pos: Optional[jnp.ndarray] = None,  # [B, V, 3] (API parity; unused)
    bg_color: Optional[jnp.ndarray] = None,
    img_size: int = 512,
    fovy_deg: float = 39.6,
    chunk: int = 256,
    tile: int = 64,
    backend: str = "auto",
    max_pairs: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """Batched multi-view rendering — the ``GaussianRenderer.render`` contract
    (reference core/gs.py:31-94), with the B×V python loop replaced by vmap.

    backend: 'auto' (Pallas kernel on TPU when available, else dense),
    'dense', or 'pallas'.
    """
    import numpy as np

    if bg_color is None:
        bg_color = jnp.ones((3,), jnp.float32)
    tan_half_fov = float(np.tan(0.5 * np.deg2rad(fovy_deg)))

    if backend == "auto":
        backend = "dense"
        if jax.default_backend() == "tpu":
            try:
                from . import splat_pallas  # noqa: F401

                backend = "pallas"
            except ImportError:
                pass

    if backend == "pallas":
        from .splat_pallas import rasterize_pallas_batch

        if max_pairs is None:
            # The binning sort/repeat/gather cost scales with this STATIC
            # capacity, not with the live pair count — size it to the scene:
            # ~8 tile-pairs per Gaussian of headroom (measured LGM scenes run
            # ~4), capped by the resolution-scaled ceiling. Overflow drops
            # the deepest pairs gracefully (back of scene), like the CUDA
            # rasterizer's bounded buffers.
            cap = (1 << 21) if img_size >= 512 else (1 << 20)
            need = 1 << max(14, (8 * int(gaussians.shape[1]) - 1).bit_length())
            max_pairs = min(cap, need)
        return rasterize_pallas_batch(
            gaussians, cam_view, cam_view_proj, img_size, tan_half_fov,
            bg_color, max_pairs=max_pairs,
        )

    def one_view(g, cv, cvp):
        return rasterize_dense(
            g, cv, cvp, img_size, tan_half_fov, bg_color, chunk=chunk, tile=tile
        )

    def per_batch(g, cvs, cvps):
        return jax.vmap(lambda cv, cvp: one_view(g, cv, cvp))(cvs, cvps)

    imgs, alphas, depths = jax.vmap(per_batch)(gaussians, cam_view, cam_view_proj)
    return {"image": imgs, "alpha": alphas, "depth": depths}
