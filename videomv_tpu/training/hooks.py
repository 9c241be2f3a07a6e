"""In-training visualization hook.

Parity with ``VisualTrainTextImageToVideo``
(/root/reference/tools/hooks/visual_train_it2v_video.py:15-123): every
``viz_interval`` steps, run the full CFG DDIM sampler on fixed validation
prompts with the CURRENT (or EMA) weights, decode, and write a grid video +
latent mosaics.  The de-facto integration test of the reference training
recipe (SURVEY.md §4) — "sudden convergence" is judged from these videos.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class VisualTrainHook:
    """Samples validation videos during training."""

    def __init__(
        self,
        pipeline_factory,
        prompts: Sequence[str],
        out_dir: str,
        guide_scale: float = 9.0,
        steps: int = 50,
        max_prompts: int = 4,
    ):
        self.pipeline_factory = pipeline_factory
        self.prompts = list(prompts)[:max_prompts]
        self.out_dir = out_dir
        self.guide_scale = guide_scale
        self.steps = steps
        self._pipe = None

    def __call__(self, step: int, params: Dict[str, Any]):
        from ..utils.video_io import save_video_grid

        if self._pipe is None:
            self._pipe = self.pipeline_factory()
        pipe = self._pipe
        # swap in the live training weights
        pipe._params["unet"] = params

        videos, captions = [], []
        for prompt in self.prompts:
            try:
                out = pipe.generate(
                    prompt, steps=self.steps, guide_scale=self.guide_scale, seed=step
                )
                videos.append(out["frames"])
                captions.append(prompt)
                # latent mosaic (visual_train_it2v_video.py:49-62)
                lat = out["latents"][0]  # [4, F, h, w]
                mosaic = lat.transpose(1, 2, 3, 0)[..., :3]
                mosaic = (mosaic - mosaic.min()) / (mosaic.ptp() + 1e-8)
                self._save_mosaic(mosaic, step, prompt)
            except Exception as e:  # visualization must never kill training
                logger.warning("viz failed for %r: %s", prompt, e)

        if videos:
            os.makedirs(self.out_dir, exist_ok=True)
            path = os.path.join(self.out_dir, f"viz_step_{step:08d}.mp4")
            save_video_grid(path, videos, captions)
            logger.info("wrote visualization %s", path)

    def _save_mosaic(self, mosaic: np.ndarray, step: int, prompt: str):
        from PIL import Image

        os.makedirs(self.out_dir, exist_ok=True)
        f, h, w, _ = mosaic.shape
        cols = min(f, 8)
        rows = (f + cols - 1) // cols
        grid = np.zeros((rows * h, cols * w, 3), np.float32)
        for i in range(f):
            r, c = divmod(i, cols)
            grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = mosaic[i]
        name = "".join(ch for ch in prompt[:40] if ch.isalnum() or ch == " ").replace(" ", "_")
        Image.fromarray((grid * 255).astype(np.uint8)).save(
            os.path.join(self.out_dir, f"latents_{step:08d}_{name}.png")
        )
