"""Orbax save/restore round-trip + video IO + tokenizer invariants."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np


def test_orbax_roundtrip():
    import orbax.checkpoint as ocp

    params = {
        "dense": {"kernel": jnp.arange(12.0).reshape(3, 4), "bias": jnp.zeros(4)},
        "norm": {"scale": jnp.ones(3)},
    }
    d = tempfile.mkdtemp()
    path = os.path.join(d, "step_00000042")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": params, "step": 42})
    ckptr.wait_until_finished()

    restored = ckptr.restore(path, {"params": jax.tree_util.tree_map(np.zeros_like, params), "step": 0})
    assert restored["step"] == 42
    np.testing.assert_array_equal(
        restored["params"]["dense"]["kernel"], np.arange(12.0).reshape(3, 4)
    )


def test_video_io_png_fallback(tmp_path):
    from videomv_tpu.utils.video_io import save_multiview_video, save_video_grid

    frames = (np.random.RandomState(0).rand(4, 32, 32, 3) * 255).astype(np.uint8)
    out = save_multiview_video(str(tmp_path / "test.mp4"), frames, caption="hello")
    assert os.path.exists(out)

    out2 = save_video_grid(
        str(tmp_path / "grid.mp4"), [frames, frames], captions=["a", "b"]
    )
    assert os.path.exists(out2)


def test_tokenizer_determinism_and_truncation():
    from videomv_tpu.data.tokenizer import CONTEXT_LENGTH, EOT_TOKEN, SOT_TOKEN, tokenize

    t1 = tokenize(["a chair"])
    t2 = tokenize(["a chair"])
    np.testing.assert_array_equal(t1, t2)
    long = tokenize(["word " * 200])
    assert long.shape == (1, CONTEXT_LENGTH)
    assert long[0, 0] == SOT_TOKEN
    assert long[0, -1] == EOT_TOKEN  # truncated with EOT at the end


def test_recenter_image(tmp_path):
    from PIL import Image

    from videomv_tpu.data.recenter import recenter_image

    rgba = np.zeros((100, 80, 4), np.uint8)
    rgba[40:60, 30:50] = [255, 0, 0, 255]  # small red square
    p = str(tmp_path / "obj.png")
    Image.fromarray(rgba, "RGBA").save(p)
    out = recenter_image(p, crop_size=200, image_size=256)
    assert out.shape == (256, 256, 3)
    # object upscaled to ~200px centered; corners are white bg
    np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-6)
    assert out[128, 128, 0] > 0.9 and out[128, 128, 1] < 0.1
