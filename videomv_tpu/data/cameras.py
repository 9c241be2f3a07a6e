"""Camera and ray utilities (orbit poses, Plücker ray embeddings, rasterizer
camera matrices).

Parity targets:
  - orbit camera-to-world matrices: reference utils/camera_utils.py:4-62
    (OpenGL look-at, optional OpenGL→Blender axis flip)
  - pixel ray casting: reference core/utils.py:10-43
  - the inference-time gs_data preparation: reference
    tools/inferences/inference_text2video_entrance.py:184-236 (camera axis
    shuffles, pose canonicalization to put view 0 at (0,0,cam_dis), Plücker
    embeddings, colmap-convention view/proj matrices for the splat renderer).

All host-side prep is numpy float32; outputs feed jitted programs as inputs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np


def create_camera_to_world_matrix(
    elevation: float, azimuth: float, camera_distance: float = 1.0
) -> np.ndarray:
    """OpenGL-style orbit look-at c2w (utils/camera_utils.py:4-27)."""
    elevation = np.radians(elevation)
    azimuth = np.radians(azimuth)
    x = camera_distance * np.cos(elevation) * np.sin(azimuth)
    y = camera_distance * np.sin(elevation)
    z = camera_distance * np.cos(elevation) * np.cos(azimuth)

    camera_pos = np.array([x, y, z])
    up = np.array([0.0, 1.0, 0.0])
    forward = -camera_pos / np.linalg.norm(camera_pos)
    right = np.cross(forward, up)
    right /= np.linalg.norm(right)
    new_up = np.cross(right, forward)
    new_up /= np.linalg.norm(new_up)
    cam2world = np.eye(4)
    cam2world[:3, :3] = np.stack([right, new_up, -forward], axis=0).T
    cam2world[:3, 3] = camera_pos
    return cam2world


def convert_opengl_to_blender(camera_matrix: np.ndarray) -> np.ndarray:
    flip_yz = np.array(
        [[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=camera_matrix.dtype
    )
    return flip_yz @ camera_matrix


def get_camera(
    num_frames: int,
    elevation: float = 15,
    azimuth_start: float = 0,
    azimuth_span: float = 360,
    blender_coord: bool = True,
    camera_distance: float = 1.0,
) -> np.ndarray:
    """[num_frames, 16] flattened orbit c2w matrices (utils/camera_utils.py:46-62)."""
    angle_gap = azimuth_span / num_frames
    cameras = []
    for azimuth in np.arange(azimuth_start, azimuth_span + azimuth_start, angle_gap):
        m = create_camera_to_world_matrix(elevation, azimuth, camera_distance)
        if blender_coord:
            m = convert_opengl_to_blender(m)
        cameras.append(m.flatten())
    return np.stack(cameras, 0).astype(np.float32)


def get_rays(pose: np.ndarray, h: int, w: int, fovy: float, opengl: bool = True):
    """Per-pixel ray origins/directions for an OpenGL c2w pose
    (core/utils.py:10-43). Returns (rays_o [h,w,3], rays_d [h,w,3])."""
    x, y = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    x = x.flatten().astype(np.float32)
    y = y.flatten().astype(np.float32)

    cx, cy = w * 0.5, h * 0.5
    focal = h * 0.5 / np.tan(0.5 * np.deg2rad(fovy))

    sign = -1.0 if opengl else 1.0
    camera_dirs = np.stack(
        [
            (x - cx + 0.5) / focal,
            (y - cy + 0.5) / focal * sign,
            np.full_like(x, sign),
        ],
        axis=-1,
    )  # [hw, 3]

    rays_d = camera_dirs @ pose[:3, :3].T
    rays_o = np.broadcast_to(pose[:3, 3], rays_d.shape)

    rays_d = rays_d / np.clip(
        np.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-20, None
    )
    return rays_o.reshape(h, w, 3).astype(np.float32), rays_d.reshape(h, w, 3).astype(np.float32)


def plucker_rays(pose: np.ndarray, h: int, w: int, fovy: float) -> np.ndarray:
    """6-channel Plücker embedding [6, h, w]: (o × d, d) (core/models.py:76)."""
    rays_o, rays_d = get_rays(pose, h, w, fovy)
    plucker = np.concatenate([np.cross(rays_o, rays_d, axis=-1), rays_d], axis=-1)
    return plucker.transpose(2, 0, 1).astype(np.float32)


@dataclass(frozen=True)
class GSCameraSettings:
    """Splat-camera intrinsics (reference core/options.py 'big' + gs.py:23-29)."""

    fovy: float = 39.6
    znear: float = 0.5
    zfar: float = 2.5
    input_size: int = 256
    output_size: int = 512

    @property
    def tan_half_fov(self) -> float:
        return math.tan(0.5 * math.radians(self.fovy))

    @property
    def proj_matrix(self) -> np.ndarray:
        """Row-major perspective matrix as built in core/gs.py:24-29 (note the
        reference composes it as ``cam_view @ proj`` with row-vector
        convention). Single source of truth: ops.gs_cameras.proj_matrix —
        the device-side camera derivation uses the same function, so a
        znear/zfar/convention tweak cannot desync the two chains."""
        from ..ops.gs_cameras import proj_matrix

        return proj_matrix(self.fovy, self.znear, self.zfar)


def orbit_camera_for_t2v(num_frames: int = 24, elevation: float = 15,
                         camera_distance: float = 2.0) -> np.ndarray:
    """The UNet's camera conditioning tensor [1, F, 16]
    (inference_text2video_entrance.py:184-191): blender-coord orbit c2w with
    row-1 negated then rows 0/1 swapped."""
    cam = get_camera(num_frames, elevation=elevation, azimuth_start=0,
                     azimuth_span=360, camera_distance=camera_distance)
    cam = cam.reshape(num_frames, 4, 4).copy()
    cam[:, 1, :] *= -1
    cam[:, [0, 1], :] = cam[:, [1, 0], :]
    return cam.reshape(1, num_frames, 16)


def prepare_gs_training(
    c2w_opengl: np.ndarray,
    settings: GSCameraSettings = GSCameraSettings(),
    ray_size: int = 256,
) -> Dict[str, np.ndarray]:
    """The TRAINING-side gs camera prep (reference video_dataset.py:103-144):
    row-1 negate + rows-1/2 swap, canonicalize view 0 to (0,0,cam_dis)
    looking at the origin (OpenGL), Plücker rays, then colmap matrices.

    This is the geometrically self-consistent chain the LGM was trained
    with: every canonicalized camera keeps looking at the object at the
    origin.  NOTE: the reference's *inference* engine applies an extra
    column flip before canonicalization (inference_text2video_entrance.py:204)
    which mirrors the camera rig through the z=cam_dis plane relative to
    this chain — see ``prepare_gs_cameras`` below, kept for bit-exact
    reproduction; we default to the training-consistent variant.

    c2w_opengl: [V, 4, 4] or [1, V, 16] OpenGL look-at camera-to-world.
    """
    cams = np.asarray(c2w_opengl, dtype=np.float32).reshape(-1, 4, 4).copy()
    V = cams.shape[0]
    cams[:, 1] *= -1
    cams[:, [1, 2]] = cams[:, [2, 1]]
    cam_dis = np.sqrt(np.sum(cams[0, :3, 3] ** 2))
    transform = np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, cam_dis], [0, 0, 0, 1]],
        dtype=np.float32,
    ) @ np.linalg.inv(cams[0])
    cam_poses = transform[None] @ cams

    rays = np.stack(
        [plucker_rays(cam_poses[i], ray_size, ray_size, settings.fovy) for i in range(V)],
        axis=0,
    )

    cam_poses_colmap = cam_poses.copy()
    cam_poses_colmap[:, :3, 1:3] *= -1
    cam_view = np.linalg.inv(cam_poses_colmap).transpose(0, 2, 1)
    cam_view_proj = cam_view @ settings.proj_matrix
    cam_pos = -cam_poses_colmap[:, :3, 3]

    return {
        "input_rays": rays[None],
        "cam_view": cam_view[None].astype(np.float32),
        "cam_view_proj": cam_view_proj[None].astype(np.float32),
        "cam_pos": cam_pos[None].astype(np.float32),
    }


def orbit_c2w_opengl(num_frames: int, elevation: float = 15.0,
                     camera_distance: float = 2.0) -> np.ndarray:
    """Raw OpenGL look-at orbit c2w [V, 4, 4] (input to prepare_gs_training)."""
    return np.stack([
        create_camera_to_world_matrix(elevation, az, camera_distance)
        for az in np.arange(0, 360, 360 / num_frames)
    ]).astype(np.float32)


def prepare_gs_cameras(
    camera_data: np.ndarray,
    settings: GSCameraSettings = GSCameraSettings(),
    ray_size: int = 256,
) -> Dict[str, np.ndarray]:
    """REFERENCE-INFERENCE gs camera prep, kept for bit-exact reproduction
    (inference_text2video_entrance.py:196-236).

    WARNING: this chain applies an extra pre-canonicalization column flip
    (line 204) absent from the training-side ``prepare_gs`` it is meant to
    mirror; the result is the training camera rig reflected through the
    z=cam_dis plane (verified numerically — see tests/test_cameras.py).
    The LGM checkpoints were trained with the training chain, so
    ``prepare_gs_training`` is the default in our pipeline.

    camera_data: [1, V, 16] (output of ``orbit_camera_for_t2v``).
    Returns dict with 'input_rays' [1,V,6,h,w], 'cam_view' [1,V,4,4],
    'cam_view_proj' [1,V,4,4], 'cam_pos' [1,V,3].
    """
    gs_camera = camera_data.reshape(-1, 4, 4).astype(np.float32).copy()
    V = gs_camera.shape[0]

    gs_camera[:, 1] *= -1
    gs_camera[:, [1, 2]] = gs_camera[:, [2, 1]]
    gs_camera[:, :3, 1:3] *= -1

    cam_dis = np.sqrt(np.sum(gs_camera[0, :3, 3] ** 2))

    transform = np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, cam_dis], [0, 0, 0, 1]],
        dtype=np.float32,
    ) @ np.linalg.inv(gs_camera[0])
    cam_poses = transform[None] @ gs_camera  # [V, 4, 4]

    rays = np.stack(
        [plucker_rays(cam_poses[i], ray_size, ray_size, settings.fovy) for i in range(V)],
        axis=0,
    )  # [V, 6, h, w]

    cam_poses_colmap = cam_poses.copy()
    cam_poses_colmap[:, :3, 1:3] *= -1

    cam_view = np.linalg.inv(cam_poses_colmap).transpose(0, 2, 1)
    cam_view_proj = cam_view @ settings.proj_matrix
    cam_pos = -cam_poses_colmap[:, :3, 3]

    return {
        "input_rays": rays[None],
        "cam_view": cam_view[None].astype(np.float32),
        "cam_view_proj": cam_view_proj[None].astype(np.float32),
        "cam_pos": cam_pos[None].astype(np.float32),
    }
