"""I2VPipeline end-to-end on CPU at micro scale: image → CLIP/VAE
conditioning → CFG DDIM → frames, with the GS-refine branch EXECUTED
(refine step index inside the tiny step budget) in both uncond modes.

The reference engine (inference_i2vgen_entrance.py:65-349) always refines
both CFG rows; ``gs_refine_uncond: shared`` is this repo's serving mode and
needs the I2V conditioning shim to feed b rows instead of 2b (i2v.py
unet_apply) — that branch is what these tests pin down.
"""

import os

import numpy as np
import pytest

from videomv_tpu.config import load_inference_config
from videomv_tpu.data.cameras import GSCameraSettings
from videomv_tpu.inference.i2v import I2VPipeline
from videomv_tpu.models.autoencoder import AutoencoderKL
from videomv_tpu.models.clip import CLIPTextTower, CLIPVisionTower, OpenCLIPTextVisual
from videomv_tpu.models.lgm import LGM, LGMOptions

SIZE = 32  # image/render resolution; latent 4x4 at scale 8
STEPS = 3  # DDIM steps; refine fires at loop index 2


class _TinyCLIP(OpenCLIPTextVisual):
    """Same (img, pooled, seq) contract at toy widths."""

    def setup(self):
        self.text = CLIPTextTower(
            width=64, heads=2, layers=2, embed_dim=64, dtype=self.dtype
        )
        self.visual = CLIPVisionTower(
            width=64, heads=2, layers=2, embed_dim=64, patch_size=32,
            dtype=self.dtype,
        )


_MICRO_LGM = LGMOptions(
    input_size=SIZE,
    down_channels=(32, 64),
    down_attention=(False, True),
    mid_attention=True,
    up_channels=(64, 32),
    up_attention=(True, False),
    splat_size=SIZE,
    output_size=SIZE,
    num_views=8,
    num_input_views=4,
)


def _build_pipe(uncond_mode: str) -> I2VPipeline:
    cfg = load_inference_config("configs/i2vgen_xl_infer_tiny.yaml")
    cfg.resolution = [SIZE, SIZE]
    cfg.UNet.use_lgm_refine = True
    cfg.UNet.context_dim = 64
    cfg.UNet.y_dim = 64
    cfg.gs_refine_uncond = uncond_mode
    cfg.gs_refine_steps = [2]          # fire inside the tiny step budget
    cfg.gs_refine_views = [0, 1, 2, 3]
    cfg.gs_input_size = SIZE
    cfg.gs_render_size = SIZE
    pipe = I2VPipeline(cfg, seed=0)
    # swap the production towers for micro ones BEFORE any param init
    pipe.vae = AutoencoderKL(ch=32, ch_mult=(1, 1, 1, 2), num_res_blocks=1)
    pipe.clip = _TinyCLIP()
    pipe.lgm = LGM(opt=_MICRO_LGM)
    pipe.gs_settings = GSCameraSettings(input_size=SIZE, output_size=SIZE)
    pipe.init_params(load=False)
    return pipe


@pytest.fixture(scope="module")
def pipe_shared():
    return _build_pipe("shared")


@pytest.fixture(scope="module")
def probe_image(tmp_path_factory):
    from PIL import Image

    path = os.fspath(tmp_path_factory.mktemp("i2v") / "probe.png")
    rng = np.random.default_rng(0)
    arr = np.full((SIZE, SIZE, 4), 255, np.uint8)
    arr[8:24, 8:24, :3] = rng.integers(0, 255, (16, 16, 3), np.uint8)
    Image.fromarray(arr, "RGBA").save(path)
    return path


@pytest.mark.slow
def test_i2v_refine_shared_e2e(pipe_shared, probe_image):
    plain = pipe_shared.generate_from_image(probe_image, steps=STEPS, seed=3)
    assert plain["frames"].shape == (8, SIZE, SIZE, 3)
    assert plain["frames"].dtype == np.uint8

    ref = pipe_shared.generate_from_image(
        probe_image, steps=STEPS, use_gs_refine=True, seed=3
    )
    assert ref["frames"].shape == (8, SIZE, SIZE, 3)
    assert np.isfinite(ref["latents"]).all()
    # the refine fired: a splat-render re-encode replaces x0 at step 2, so
    # refined latents must differ from the plain run
    assert not np.allclose(ref["latents"], plain["latents"])


def test_i2v_refine_shared_deterministic(pipe_shared, probe_image):
    # reuses the cached refined sampler from the test above — no recompile
    a = pipe_shared.generate_from_image(
        probe_image, steps=STEPS, use_gs_refine=True, seed=5
    )
    b = pipe_shared.generate_from_image(
        probe_image, steps=STEPS, use_gs_refine=True, seed=5
    )
    np.testing.assert_array_equal(a["latents"], b["latents"])


@pytest.mark.slow
def test_i2v_refine_full_mode_e2e(probe_image):
    pipe = _build_pipe("full")
    ref = pipe.generate_from_image(
        probe_image, steps=STEPS, use_gs_refine=True, seed=3
    )
    assert ref["frames"].shape == (8, SIZE, SIZE, 3)
    assert np.isfinite(ref["latents"]).all()


def test_i2v_frame_parallel_matches_single_device(pipe_shared, probe_image):
    """Frame-sharded I2V sampling (8 frames over the 8-device CPU mesh) is a
    pure placement change vs the single-device run."""
    base = pipe_shared.generate_from_image(probe_image, steps=STEPS, seed=7)
    fp = pipe_shared.generate_from_image(
        probe_image, steps=STEPS, seed=7, frame_parallel=True
    )
    assert pipe_shared._sp_mesh is not None
    assert pipe_shared._sp_mesh.shape["sp"] == 8
    np.testing.assert_allclose(
        fp["latents"], base["latents"], rtol=2e-4, atol=2e-5
    )


@pytest.mark.slow
def test_i2v_frame_parallel_with_refine(pipe_shared, probe_image):
    """fp + GS refine: the splat render runs as a shard_map over the view
    axis (each device rasterizes its local views); result must match the
    single-device refined run."""
    base = pipe_shared.generate_from_image(
        probe_image, steps=STEPS, use_gs_refine=True, seed=9
    )
    fp = pipe_shared.generate_from_image(
        probe_image, steps=STEPS, use_gs_refine=True, seed=9,
        frame_parallel=True,
    )
    assert np.isfinite(fp["latents"]).all()
    np.testing.assert_allclose(
        fp["latents"], base["latents"], rtol=5e-4, atol=5e-5
    )
