"""3D-asset export surface: frames → LGM → gaussians → .ply round-trip.

The reference constructs the same Gaussians transiently inside the refine
branch and never exposes them (core/gs.py:97 save_ply is dead code there);
``T2VPipeline.reconstruct_gaussians``/``export_ply`` make the asset a
first-class output using the same LGM + PLY compaction components."""

import pytest

import os

import jax
import jax.numpy as jnp
import numpy as np

from videomv_tpu.config import AttrDict
from videomv_tpu.data.cameras import GSCameraSettings
from videomv_tpu.inference.pipeline import T2VPipeline
from videomv_tpu.models.lgm import LGM, LGMOptions
from videomv_tpu.ops.ply_io import load_ply

TINY = LGMOptions(
    input_size=32,
    down_channels=(32, 64),
    down_attention=(False, True),
    mid_attention=True,
    up_channels=(64, 32),
    up_attention=(True, False),
    splat_size=32,
    output_size=32,
)


def _skeleton_pipe():
    pipe = T2VPipeline.__new__(T2VPipeline)
    pipe.cfg = AttrDict({})
    pipe.lgm = LGM(opt=TINY)
    pipe.gs_settings = GSCameraSettings(input_size=32, output_size=32)
    pipe.max_frames = 8
    pipe._camera_cache = {}
    pipe._lgm_fn = None
    x = jnp.zeros((1, 4, 9, 32, 32))
    pipe._params = {"lgm": jax.jit(pipe.lgm.init)(jax.random.PRNGKey(0), x)}
    return pipe


@pytest.mark.slow
def test_reconstruct_and_export_ply(tmp_path):
    pipe = _skeleton_pipe()
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)

    g = pipe.reconstruct_gaussians(frames)
    assert g.shape == (4 * 32 * 32, 14)
    assert np.isfinite(g).all()
    # activated ranges (opacity [0,1], rgb [0,1])
    assert g[:, 3].min() >= 0 and g[:, 3].max() <= 1
    assert g[:, 11:14].min() >= 0 and g[:, 11:14].max() <= 1

    path = os.fspath(tmp_path / "scene.ply")
    g2 = pipe.export_ply(frames, path)
    np.testing.assert_allclose(g2, g, rtol=1e-6, atol=1e-6)
    assert os.path.exists(path)

    loaded = np.asarray(load_ply(path))
    loaded = loaded[0] if loaded.ndim == 3 else loaded
    assert loaded.ndim == 2 and loaded.shape[1] == 14
    # save_ply prunes near-transparent gaussians; the survivors round-trip
    assert 0 < loaded.shape[0] <= g.shape[0]
