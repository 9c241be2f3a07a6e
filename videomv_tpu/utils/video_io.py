"""Video/image output helpers (reference utils/video_op.py capability:
caption strips, grid mp4s, retrying safe-save paths).

Uses imageio for mp4 (libx264 via imageio-ffmpeg when present, falling back
to per-frame PNGs — the same degradation path as the reference's
``save_i2vgen_video_safe``, video_op.py:165-213).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def _caption_strip(caption: str, width: int, height: int = 60) -> np.ndarray:
    """White strip with the caption text (reference video_op.py:30-44)."""
    from PIL import Image, ImageDraw

    img = Image.new("RGB", (width, height), (255, 255, 255))
    draw = ImageDraw.Draw(img)
    draw.text((8, height // 3), caption[:120], fill=(0, 0, 0))
    return np.asarray(img)


def save_multiview_video(
    path: str,
    frames: np.ndarray,
    caption: Optional[str] = None,
    fps: int = 8,
    retries: int = 5,
) -> str:
    """frames uint8 [F, H, W, 3] → mp4 (or PNG frames on fallback)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if caption:
        strip = _caption_strip(caption, frames.shape[2])
        frames = np.concatenate(
            [np.repeat(strip[None], frames.shape[0], axis=0), frames], axis=1
        )
    for attempt in range(retries):
        try:
            import imageio

            imageio.mimwrite(path, list(frames), fps=fps, quality=8)
            return path
        except Exception as e:  # pragma: no cover - io fallback
            logger.warning("mp4 save attempt %d failed: %s", attempt, e)
    # PNG fallback
    from PIL import Image

    stem = os.path.splitext(path)[0]
    os.makedirs(stem, exist_ok=True)
    for i, f in enumerate(frames):
        Image.fromarray(f).save(os.path.join(stem, f"{i:04d}.png"))
    return stem


def save_video_grid(
    path: str,
    videos: Sequence[np.ndarray],
    captions: Optional[Sequence[str]] = None,
    fps: int = 8,
) -> str:
    """Stack multiple [F, H, W, 3] videos side-by-side into one grid mp4
    (reference video_op.py:46-105 grid behavior)."""
    F = min(v.shape[0] for v in videos)
    rows = [v[:F] for v in videos]
    grid = np.concatenate(rows, axis=2)  # side by side
    caption = " | ".join(captions) if captions else None
    return save_multiview_video(path, grid, caption=caption, fps=fps)
