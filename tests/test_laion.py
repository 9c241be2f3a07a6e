"""Tar-shard LAION reader: grouping, filtering, crop, interleave."""

import io
import json
import os
import tarfile
import tempfile

import numpy as np
import pytest

from videomv_tpu.data.laion import (
    LaionFilterConfig,
    LaionImageDataset,
    interleave_image_video,
    iter_tar_samples,
)


@pytest.fixture(scope="module")
def shard():
    from PIL import Image

    d = tempfile.mkdtemp()
    path = os.path.join(d, "00000.tar")
    rs = np.random.RandomState(0)
    with tarfile.open(path, "w") as tf:
        def add(name, data):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

        for i in range(6):
            img = Image.fromarray((rs.rand(200, 300, 3) * 255).astype(np.uint8))
            buf = io.BytesIO()
            img.save(buf, "JPEG")
            add(f"{i:05d}.jpg", buf.getvalue())
            add(f"{i:05d}.txt", f"caption {i}".encode())
            meta = {"pwatermark": 0.9 if i == 3 else 0.1,
                    "punsafe": 0.9 if i == 4 else 0.0,
                    "aesthetic": 3.0 if i == 5 else 6.0}
            add(f"{i:05d}.json", json.dumps(meta).encode())
    return path


def test_tar_grouping(shard):
    samples = list(iter_tar_samples(shard))
    assert len(samples) == 6
    assert set(samples[0]) == {"jpg", "txt", "json"}


def test_filtering_and_shapes(shard):
    ds = LaionImageDataset(shards=[shard], resolution=(64, 64), max_frames=4)
    items = list(ds)
    # 3 of 6 filtered out (watermark, unsafe, aesthetic)
    assert len(items) == 3
    for it in items:
        assert it["video"].shape == (4, 3, 64, 64)
        # frame 0 populated, rest zero-padded
        assert np.abs(it["video"][0]).max() > 0
        assert np.abs(it["video"][1:]).max() == 0
        assert it["caption"].startswith("caption")


def test_interleave_schedule():
    img = iter([{"k": f"i{n}"} for n in range(10)])
    vid = iter([{"k": f"v{n}"} for n in range(10)])
    kinds = [k for k, _ in zip(
        (k for k, _ in interleave_image_video(img, vid, image_every=4)), range(8)
    )]
    assert kinds == ["video", "video", "video", "image"] * 2
