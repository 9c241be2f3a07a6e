"""CLI entry: text/image → multiview generation.

Usage (API-compatible with the reference inference.py):
    python inference.py --cfg configs/t2v_infer.yaml [--debug] [k v ...]

Reads the task YAML (merging its linked train YAML via ``vldm_cfg``), loads
prompts from ``test_list_path``, and writes one orbit-video mp4 per prompt
(plus a ``_gs`` variant when ``UNet.use_lgm_refine`` is on) under
``log_dir`` — mirroring tools/inferences/inference_text2video_entrance.py.
"""

from __future__ import annotations

import argparse
import logging
import os
import re
import sys
import time


def parse_args():
    p = argparse.ArgumentParser(description="videomv_tpu inference")
    p.add_argument("--cfg", dest="cfg_file", default="configs/t2v_infer.yaml")
    p.add_argument("--debug", action="store_true", default=False)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO, format="[%(asctime)s] %(levelname)s: %(message)s")

    from videomv_tpu.config import load_inference_config
    from videomv_tpu.inference import T2VPipeline
    from videomv_tpu.inference.i2v import I2VPipeline
    from videomv_tpu.utils.video_io import save_multiview_video

    cfg = load_inference_config(args.cfg_file, opts=args.opts or [])
    if args.seed is not None:
        cfg.seed = args.seed
    cfg.debug = args.debug

    task = cfg.get("TASK_TYPE", "inference_text2video_entrance")
    is_i2v = task == "inference_i2vgen_entrance"
    if task not in ("inference_text2video_entrance", "inference_i2vgen_entrance"):
        raise SystemExit(f"unknown TASK_TYPE {task}")

    import jax

    logging.info("backend=%s devices=%s", jax.default_backend(), jax.devices())

    pipe_cls = I2VPipeline if is_i2v else T2VPipeline
    pipe = pipe_cls(cfg, seed=int(cfg.get("seed", 0)))
    pipe.init_params()

    items = []
    lp = cfg.get("test_list_path")
    if lp and os.path.exists(lp):
        with open(lp) as f:
            items = [l.strip() for l in f if l.strip() and not l.startswith("#")]
    if not items:
        items = [] if is_i2v else ["a wooden chair"]
    if args.debug:
        items = items[:1]
    if not items:
        raise SystemExit(f"no inputs in {lp}")

    log_dir = cfg.get("log_dir", "workspace/visualization")
    os.makedirs(log_dir, exist_ok=True)
    use_refine = bool(cfg.get("UNet", {}).get("use_lgm_refine", False))
    rounds = 1 if args.debug else int(cfg.get("round", 1))
    steps = int(cfg.get("ddim_timesteps", 50))

    # frame_parallel: true shards each sample's frame axis over all local
    # devices (sequence-parallel serving, parallel/infer.py); no-op on one
    fp = bool(cfg.get("frame_parallel", False))

    def run(item, seed, refine):
        if is_i2v:
            return pipe.generate_from_image(item, steps=steps, use_gs_refine=refine,
                                            seed=seed, frame_parallel=fp)
        return pipe.generate(item, steps=steps, use_gs_refine=refine, seed=seed,
                             frame_parallel=fp)

    for r in range(rounds):
        for idx, item in enumerate(items):
            seed = int(cfg.get("seed", 0)) + r
            logging.info("[%d/%d] sampling %r (seed %d)", idx, len(items), item, seed)
            name = os.path.splitext(os.path.basename(item))[0] if is_i2v else item
            cap_name = re.sub(r"[^\w\s]", "", name).replace(" ", "_")[:60]

            t0 = time.time()
            out = run(item, seed, refine=False)
            path = os.path.join(log_dir, f"{idx:04d}_{cap_name}_{seed}.mp4")
            save_multiview_video(path, out["frames"], caption=name)
            logging.info("saved %s (%.1fs)", path, time.time() - t0)

            if use_refine:
                t0 = time.time()
                out_gs = run(item, seed, refine=True)
                path = os.path.join(log_dir, f"{idx:04d}_{cap_name}_{seed}_gs.mp4")
                save_multiview_video(path, out_gs["frames"], caption=name)
                logging.info("saved %s (%.1fs)", path, time.time() - t0)
                if bool(cfg.get("save_ply", False)) and not is_i2v:
                    ply = os.path.join(log_dir, f"{idx:04d}_{cap_name}_{seed}.ply")
                    pipe.export_ply(out_gs["frames"], ply)
                    logging.info("saved %s", ply)

    logging.info("inference complete")


if __name__ == "__main__":
    main()
