"""Joint LAION+video training smoke ON HARDWARE (VERDICT r4 next-#8).

The alternating image/video schedule is CPU-proven (tests/test_laion.py::
test_joint_train_smoke); this runs the SHIPPED configs/t2v_train_laion.yaml
recipe on the v5e for a handful of alternating steps — two program shapes
(f=24 video / f=1 image, reference train_t2v_enterance.py:99-103 +
t2v_train_laion.yaml:96-99) — and reports both steady-state ms/step.

No real LAION shards exist in this image: fake webdataset tars are built
on the fly (same recipe as the CPU test); the video stream falls back to
the trainer's synthetic batches.  ~10 min budget (two full-size tunnel
compiles when cold).
"""
import io
import json
import os
import sys
import tarfile
import time

sys.path.insert(0, "/root/repo")
import logging

logging.basicConfig(level=logging.INFO)
import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from videomv_tpu.config import load_config
from videomv_tpu.training.engine import T2VTrainer


def make_shards(d, n_shards=2, per_shard=16):
    from PIL import Image

    os.makedirs(d, exist_ok=True)
    rs = np.random.RandomState(0)
    for s in range(n_shards):
        path = os.path.join(d, f"{s:05d}.tar")
        if os.path.exists(path):
            continue
        with tarfile.open(path, "w") as tf:
            def add(name, data):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))

            for i in range(per_shard):
                img = Image.fromarray((rs.rand(256, 256, 3) * 255).astype(np.uint8))
                buf = io.BytesIO()
                img.save(buf, "JPEG")
                add(f"{i:05d}.jpg", buf.getvalue())
                add(f"{i:05d}.txt", f"synthetic caption {s}-{i}".encode())
                add(f"{i:05d}.json", json.dumps(
                    {"pwatermark": 0.1, "punsafe": 0.0, "aesthetic": 6.0}).encode())
    return os.path.join(d, "{00000..%05d}.tar" % (n_shards - 1))


def main():
    shard_spec = make_shards("workspace/laion_shards")
    cfg = load_config("configs/t2v_train_laion.yaml", opts=[])
    cfg["img_dataset"]["shards"] = [shard_spec]
    cfg["save_ckp_interval"] = 0
    cfg["viz_interval"] = 0
    cfg["log_interval"] = 1
    cfg["use_ema"] = False  # isolate step cost; EMA adds a fixed epilogue
    cfg["optimizer"] = "adafactor"  # 16 GB HBM fit (CLAUDE.md)
    cfg["image_every"] = 3
    cfg["batch_sizes"] = {"24": 2, "1": 16}

    trainer = T2VTrainer(cfg).init()

    # one train() call keeps the interleave counter and prefetch pipeline
    # intact; the encode_batch spy timestamps each step boundary. dt between
    # consecutive encode calls = the enclosing step's wall time (async
    # dispatch makes per-step attribution approximate, but the scan of 9
    # steps settles into per-shape steady states after each shape's compile).
    kinds, stamps = [], []
    orig = trainer.encode_batch

    def spy(batch):
        kinds.append("image" if batch["video"].shape[1] == 1 else "video")
        stamps.append(time.time())
        return orig(batch)

    trainer.encode_batch = spy

    steps = 12  # image_every=3 → 8 video + 4 image steps
    loss = trainer.train(num_steps=steps)
    stamps.append(time.time())

    times = {"video": [], "image": []}
    for k, t0, t1 in zip(kinds, stamps, stamps[1:]):
        times[k].append(t1 - t0)
        print(f"{k}: {t1 - t0:.2f}s", flush=True)

    def steady(xs):
        # drop each shape's compile-bearing first occurrence
        return round(float(np.median(xs[1:] if len(xs) > 1 else xs)), 3)

    print(json.dumps({
        "metric": "joint_laion_video_train_step",
        "final_loss": round(float(loss), 4),
        "video_steps": len(times["video"]),
        "image_steps": len(times["image"]),
        "video_steady_s": steady(times["video"]),
        "image_steady_s": steady(times["image"]),
        "video_first_s": round(times["video"][0], 1) if times["video"] else None,
        "image_first_s": round(times["image"][0], 1) if times["image"] else None,
        "kinds": kinds,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
