"""Device-side (jittable) splat-camera preparation.

JAX re-derivation of the host prep in ``data/cameras.py::prepare_gs_training``
(reference ``tools/datasets/video_dataset.py:103-144``): starting from the
UNet's 16-float camera conditioning tensor it rebuilds, *inside the compiled
step*, everything the Gaussian renderer and the LGM need — canonicalized
poses, Plücker ray embeddings, and the colmap-convention view/view-proj
matrices.

Why on device: the host path ships ``[B,F,6,S,S]`` fp32 rays plus the 4×4
matrix blocks over the host→device wire every training step (37.7 MB per
sample at S=256, f=24 — dwarfing the actual learning signal).  The rays are
a pure function of the 16-float camera matrices that are *already* uploaded
as UNet conditioning, so the refine step computes them in-program from a
1.5 KB tensor instead.  All matmuls run at ``Precision.HIGHEST`` so the
result matches the host fp32 chain on TPU (where default matmul precision
is bf16) — parity asserted in ``tests/test_gs_cameras_dev.py``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST

# row-permutation + sign pattern of the training gs chain: negate row 1,
# then swap rows 1 and 2 (video_dataset.py:110-111 equivalent; see
# data/cameras.py::prepare_gs_training)
_ROW_PERM = np.array([0, 2, 1, 3])
_ROW_SIGN = np.array([1.0, 1.0, -1.0, 1.0], dtype=np.float32).reshape(4, 1)
# colmap convention: negate columns 1:3 of the rotation block
_COL_SIGN = np.ones((4, 4), dtype=np.float32)
_COL_SIGN[:3, 1:3] = -1.0


def proj_matrix(fovy_deg: float, znear: float, zfar: float) -> np.ndarray:
    """Row-major perspective matrix (reference core/gs.py:24-29)."""
    tan_half = math.tan(0.5 * math.radians(fovy_deg))
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = 1.0 / tan_half
    m[1, 1] = 1.0 / tan_half
    m[2, 2] = (zfar + znear) / (zfar - znear)
    m[3, 2] = -(zfar * znear) / (zfar - znear)
    m[2, 3] = 1.0
    return m


def canonical_gs_poses(camera_data: jnp.ndarray) -> jnp.ndarray:
    """[B, F, 16] camera conditioning → [B, F, 4, 4] canonicalized OpenGL
    c2w poses (view 0 at (0,0,cam_dis) looking at the origin).

    Mirrors ``prepare_gs_training``'s pose chain: per-sample row
    negate/swap, then left-multiply by T(z=cam_dis) @ inv(pose0).
    """
    cams = camera_data.reshape(*camera_data.shape[:-1], 4, 4)
    cams = cams[..., _ROW_PERM, :] * jnp.asarray(_ROW_SIGN)

    def _canon(c):  # c: [F, 4, 4]
        cam_dis = jnp.sqrt(jnp.sum(c[0, :3, 3] ** 2))
        t = jnp.eye(4, dtype=c.dtype).at[2, 3].set(cam_dis)
        transform = jnp.matmul(t, jnp.linalg.inv(c[0]), precision=_HI)
        return jnp.einsum("ij,fjk->fik", transform, c, precision=_HI)

    return jax.vmap(_canon)(cams.astype(jnp.float32))


def plucker_rays_dev(poses: jnp.ndarray, size: int, fovy_deg: float) -> jnp.ndarray:
    """[..., 4, 4] OpenGL poses → [..., 6, size, size] Plücker embeddings
    (reference core/utils.py:10-43 + core/models.py:76)."""
    x, y = np.meshgrid(np.arange(size), np.arange(size), indexing="xy")
    cxy = size * 0.5
    focal = size * 0.5 / math.tan(0.5 * math.radians(fovy_deg))
    dirs = np.stack(
        [
            (x.reshape(-1) - cxy + 0.5) / focal,
            -(y.reshape(-1) - cxy + 0.5) / focal,
            np.full(size * size, -1.0),
        ],
        axis=-1,
    ).astype(np.float32)  # [S*S, 3], OpenGL sign convention

    rot = poses[..., :3, :3]  # [..., 3, 3]
    rays_d = jnp.einsum("pj,...ij->...pi", jnp.asarray(dirs), rot, precision=_HI)
    rays_d = rays_d / jnp.clip(
        jnp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-20
    )
    rays_o = jnp.broadcast_to(poses[..., None, :3, 3], rays_d.shape)
    plucker = jnp.concatenate(
        [jnp.cross(rays_o, rays_d, axis=-1), rays_d], axis=-1
    )  # [..., S*S, 6]
    plucker = jnp.moveaxis(plucker, -1, -2)
    return plucker.reshape(*poses.shape[:-2], 6, size, size)


def colmap_from_poses(poses: jnp.ndarray, proj: np.ndarray):
    """Canonicalized poses [..., 4, 4] → (cam_view, cam_view_proj, cam_pos)
    in the renderer's row-vector colmap convention
    (video_dataset.py:127-137 equivalent)."""
    colmap = poses * jnp.asarray(_COL_SIGN)
    cam_view = jnp.swapaxes(jnp.linalg.inv(colmap), -1, -2)
    cam_view_proj = jnp.matmul(cam_view, jnp.asarray(proj), precision=_HI)
    cam_pos = -colmap[..., :3, 3]
    return cam_view, cam_view_proj, cam_pos
