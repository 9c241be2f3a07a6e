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


@pytest.fixture(scope="module")
def shard_dir(shard):
    """Directory holding 3 shards named 00000..00002.tar."""
    import shutil

    d = os.path.dirname(shard)
    for i in (1, 2):
        shutil.copy(shard, os.path.join(d, f"{i:05d}.tar"))
    return d


def test_expand_shard_spec(shard_dir):
    from videomv_tpu.data.laion import expand_shard_spec

    d = shard_dir
    # numeric brace range, zero-padding preserved
    got = expand_shard_spec(os.path.join(d, "{00000..00002}.tar"))
    assert got == [os.path.join(d, f"{i:05d}.tar") for i in range(3)]
    # ranges wider than what exists keep only existing files
    assert len(expand_shard_spec(os.path.join(d, "{00000..01000}.tar"))) == 3
    # plain glob and literal paths still work
    assert len(expand_shard_spec(os.path.join(d, "*.tar"))) == 3
    assert expand_shard_spec(os.path.join(d, "00001.tar")) == [
        os.path.join(d, "00001.tar")
    ]
    assert expand_shard_spec(os.path.join(d, "nope.tar")) == []


def test_make_image_dataset_brace_spec(shard_dir):
    """The shipped t2v_train_laion.yaml spec shape ({00000..01000}.tar) must
    resolve through the engine; the old char-class glob rewrite never could."""
    from videomv_tpu.config import load_config
    from videomv_tpu.training.engine import T2VTrainer

    cfg = load_config("configs/t2v_train_tiny.yaml", opts=[])
    cfg["img_dataset"] = {
        "type": "LAIONImageDataset",
        "shards": [os.path.join(shard_dir, "{00000..01000}.tar")],
        "resolution": [64, 64],
    }
    ds = T2VTrainer(cfg).make_image_dataset()
    assert ds is not None and len(ds.shards) == 3


def test_cycle_epochs(shard_dir):
    """Finite image streams must restart per epoch with a fresh shuffle —
    the reference rebuilds its dataloader iterator on StopIteration
    (train_t2v_enterance.py:240-246) and webdataset reshuffles per epoch."""
    from videomv_tpu.data.datasets import cycle_epochs

    ds = LaionImageDataset(
        shards=[os.path.join(shard_dir, f"{i:05d}.tar") for i in range(3)],
        resolution=(32, 32),
    )
    per_epoch = 9  # 3 accepted items per shard
    stream = cycle_epochs(ds)
    e1 = [next(stream)["caption"] for _ in range(per_epoch)]
    e2 = [next(stream)["caption"] for _ in range(per_epoch)]
    e3_head = [next(stream)["caption"] for _ in range(4)]
    assert sorted(e1) == sorted(e2)  # same multiset every epoch
    assert e1 != e2  # seed bump reshuffles the order
    assert len(e3_head) == 4  # keeps producing indefinitely

    class Empty:
        def __iter__(self):
            return iter(())

    with pytest.raises(RuntimeError, match="no items"):
        next(cycle_epochs(Empty()))


@pytest.mark.slow
def test_joint_train_smoke(shard_dir):
    """Joint LAION+video training end-to-end: both the f=1 image stream and
    the f=4 video stream must actually feed train steps (reference
    heterogeneous frame_lens, train_t2v_enterance.py:99-103). The image
    batch size is sized so ONE epoch of shards holds a single batch — the
    second image step only exists if the engine cycles epochs."""
    from videomv_tpu.config import load_config
    from videomv_tpu.training.engine import T2VTrainer

    cfg = load_config("configs/t2v_train_tiny.yaml", opts=[])
    cfg["img_dataset"] = {
        "type": "LAIONImageDataset",
        "shards": [os.path.join(shard_dir, "{00000..00002}.tar")],
        "resolution": [64, 64],
    }
    cfg["image_every"] = 2
    cfg["batch_sizes"] = {"4": 2, "1": 8}  # 9 items/epoch -> 1 batch/epoch
    cfg["use_ema"] = False
    cfg["dp_devices"] = 2  # batch of 2 must divide the data mesh
    tr = T2VTrainer(cfg).init()

    seen_frames = []
    orig = tr.encode_batch

    def spy(batch):
        seen_frames.append(batch["video"].shape[1])
        return orig(batch)

    tr.encode_batch = spy
    loss = tr.train(num_steps=4)
    assert np.isfinite(loss)
    assert seen_frames == [4, 1, 4, 1], seen_frames
