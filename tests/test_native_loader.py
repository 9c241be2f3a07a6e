"""Native C++ data loader vs PIL reference."""

import os
import tempfile

import numpy as np
import pytest

from videomv_tpu.data import native_loader


@pytest.fixture(scope="module")
def png_files():
    from PIL import Image

    d = tempfile.mkdtemp()
    paths = []
    rs = np.random.RandomState(0)
    for i in range(4):
        rgba = (rs.rand(64, 64, 4) * 255).astype(np.uint8)
        rgba[..., 3] = (rs.rand(64, 64) > 0.5).astype(np.uint8) * 255
        p = os.path.join(d, f"{i}.png")
        Image.fromarray(rgba, "RGBA").save(p)
        paths.append(p)
    return paths


def test_native_lib_builds_and_loads(png_files):
    assert native_loader.native_available(), "native lib must build in this image"


def test_native_matches_pil(png_files):
    rgb_n, mask_n, full_n, fmask_n = native_loader.load_views(
        png_files, out_size=64, background=128, full_size=32
    )
    assert rgb_n.shape == (4, 64, 64, 3)
    assert mask_n.shape == (4, 64, 64, 1)
    assert full_n.shape == (4, 32, 32, 3)

    # PIL reference at native resolution (no resize → exact composite math)
    from PIL import Image

    for i, p in enumerate(png_files):
        a = np.asarray(Image.open(p), np.float32) / 255.0
        expected = a[..., :3] * a[..., 3:] + (128 / 255.0) * (1 - a[..., 3:])
        np.testing.assert_allclose(rgb_n[i], expected, atol=1e-3)
        np.testing.assert_allclose(mask_n[i, ..., 0], a[..., 3], atol=1e-3)

    # values bounded
    assert rgb_n.min() >= 0 and rgb_n.max() <= 1
    assert full_n.min() >= 0 and full_n.max() <= 1


def test_native_error_on_missing_file(png_files):
    with pytest.raises(IOError):
        native_loader.load_views([png_files[0], "/nope/missing.png"], out_size=32)
