"""CLI entry: training (API-compatible with the reference train_net.py).

Usage:
    python train_net.py --cfg configs/t2v_train.yaml [--debug] [k v ...]

--debug limits the run to a handful of steps on the synthetic dataset when
no assets are present (the reference's --debug single-process mode,
utils/config.py:40-45).
"""

from __future__ import annotations

import argparse
import logging


def parse_args():
    p = argparse.ArgumentParser(description="videomv_tpu training")
    p.add_argument("--cfg", dest="cfg_file", default="configs/t2v_train.yaml")
    p.add_argument("--debug", action="store_true", default=False)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO, format="[%(asctime)s] %(levelname)s: %(message)s")

    from videomv_tpu.config import load_config
    from videomv_tpu.training.engine import T2VTrainer

    cfg = load_config(args.cfg_file, opts=args.opts or [])
    cfg.debug = args.debug

    task = cfg.get("TASK_TYPE", "train_t2v_entrance")
    if task not in ("train_t2v_entrance", "train_i2v_entrance"):
        raise SystemExit(f"unknown TASK_TYPE {task}")

    import jax

    logging.info("backend=%s devices=%d", jax.default_backend(), jax.device_count())

    trainer = T2VTrainer(cfg).init()
    steps = args.steps if args.steps is not None else (3 if args.debug else None)
    bs = args.batch_size if args.batch_size is not None else (1 if args.debug else None)
    loss = trainer.train(num_steps=steps, batch_size=bs)
    logging.info("training done, final loss %.4f", loss)


if __name__ == "__main__":
    main()
