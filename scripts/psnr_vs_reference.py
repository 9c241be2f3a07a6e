"""Acceptance harness: per-view PSNR against reference outputs.

The north-star acceptance contract (BASELINE.md): sample the released
prompts with converted reference checkpoints and score per-view PSNR >= 30
dB against outputs regenerated from the same checkpoints on the reference
stack (producing path: /root/reference/tools/inferences/
inference_text2video_entrance.py:249-289 writes the 24-view grid).

Two modes:

1. **vs-reference** (weights + reference outputs available):
       python scripts/psnr_vs_reference.py \
           --cfg configs/t2v_infer.yaml \
           --ckpt_dir pretrained_models/ \
           --ref_dir /path/to/reference_outputs \
           --prompts data/prompts.txt [--fp32]
   Reference outputs are per-prompt image files: either `<prompt_idx>.png`
   holding the 1x24 frame grid the reference writes, or a
   `<prompt_idx>/view_{v:02d}.png` directory of single views.  Emits a
   per-view PSNR table plus min/mean, and PASS/FAIL against --threshold.

2. **self-consistency** (no weights in the image — runnable TODAY):
       python scripts/psnr_vs_reference.py --self_consistency
   Random-init weights, same seed: samples once on the bf16 tower path and
   once with `sampling_dtype: float32` + highest matmul precision, and
   reports the per-view PSNR between them.  This bounds the compounded
   bf16-vs-fp32 drift of OUR stack over the full 50-step trajectory — if
   that bound sits comfortably above 30 dB, bf16 sampling cannot be what
   breaks the acceptance bar once real weights exist (and --fp32 exists as
   the escape hatch if it ever is).

Run on the TPU (compile via the persistent cache); ~2 min warm.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a, b):
    import numpy as np

    a = np.asarray(a, np.float64) / 255.0
    b = np.asarray(b, np.float64) / 255.0
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(-10.0 * np.log10(mse))


def load_reference_views(path_base, num_frames, resolution):
    """Reference output for one prompt → [F, H, W, 3] uint8 or None."""
    import numpy as np
    from PIL import Image

    if os.path.isdir(path_base):
        views = []
        for v in range(num_frames):
            for name in (f"view_{v:02d}.png", f"{v:02d}.png", f"{v}.png"):
                p = os.path.join(path_base, name)
                if os.path.exists(p):
                    views.append(np.asarray(Image.open(p).convert("RGB")))
                    break
            else:
                return None
        return np.stack(views)
    for ext in (".png", ".jpg"):
        p = path_base + ext
        if os.path.exists(p):
            grid = np.asarray(Image.open(p).convert("RGB"))
            h = grid.shape[0]
            if grid.shape[1] % num_frames == 0 and grid.shape[1] // num_frames >= h // 2:
                w = grid.shape[1] // num_frames
                return np.stack([grid[:, i * w:(i + 1) * w] for i in range(num_frames)])
    return None


# Acceptance mode (VERDICT r3 #6): the with-weights run against A100
# reference outputs must measure reference parity with ZERO approximations
# stacked — not parity-plus-serving-shortcuts. These overrides force the
# reference-exact semantics (justifications reference file:line):
#   gs_refine_uncond=full        both CFG rows run the refine branch
#                                (diffusion_ddim.py:148-155 passes the
#                                autoencoder for cond AND uncond)
#   reference_inference_cameras  the inference engine's mirrored camera
#                                chain, bit-for-bit (inference_text2video_
#                                entrance.py:184-236)
#   gs_render_size=512           refine renders at output_size=512 then
#                                downsamples (unet_t2v.py:417-428)
#   sampling_dtype=float32       the A100 reference computes fp32
ACCEPTANCE_OVERRIDES = {
    "gs_refine_uncond": "full",
    "reference_inference_cameras": True,
    "gs_render_size": 512,
    "sampling_dtype": "float32",
}


def build_pipe(cfg_path, opts, fp32, seed, load, acceptance=False, ckpt_dir=None):
    import jax

    if fp32 or acceptance:
        # fp32 params alone are not enough on TPU: f32 matmuls still run
        # one-pass bf16 at default precision
        jax.config.update("jax_default_matmul_precision", "highest")
    from videomv_tpu.config import load_inference_config
    from videomv_tpu.inference import T2VPipeline

    cfg = load_inference_config(cfg_path, opts=list(opts))
    if ckpt_dir:
        _remap_ckpt_paths(cfg, ckpt_dir)
    if fp32:
        cfg["sampling_dtype"] = "float32"
    if acceptance:
        cfg.update(ACCEPTANCE_OVERRIDES)
    pipe = T2VPipeline(cfg, seed=seed)
    pipe.init_params(load=load)
    return pipe


def _remap_ckpt_paths(cfg, ckpt_dir):
    """Point the config's checkpoint paths at ``ckpt_dir``.

    Mirrors the reference layout: one directory holding the released files
    (inference_text2video_entrance.py:137-144 loads cfg.test_model etc.).
    Each path whose basename exists under ckpt_dir is remapped; if the
    config's exact basename is absent but the dir holds exactly one
    candidate for the family (``t2v``/``i2v`` → test_model, ``vae`` →
    auto_encoder, ``clip``/``open_clip`` → embedder, ``lgm`` →
    lgm_pretrain), that file is used — so synthetic exports with their own
    names drive the same plumbing."""
    import glob

    def pick(cur, *family):
        if cur:
            cand = os.path.join(ckpt_dir, os.path.basename(str(cur)))
            if os.path.exists(cand):
                return cand
        hits = sorted(
            p for p in glob.glob(os.path.join(ckpt_dir, "*"))
            if any(w in os.path.basename(p).lower() for w in family)
        )
        return hits[0] if len(hits) >= 1 else cur

    cfg["test_model"] = pick(cfg.get("test_model"), "t2v", "i2v")
    ae = cfg.get("auto_encoder", {})
    ae["pretrained"] = pick(ae.get("pretrained"), "vae", "autoencoder")
    cfg["auto_encoder"] = ae
    emb = cfg.get("embedder", {})
    emb["pretrained"] = pick(emb.get("pretrained"), "clip")
    cfg["embedder"] = emb
    if cfg.get("lgm_pretrain"):
        cfg["lgm_pretrain"] = pick(cfg.get("lgm_pretrain"), "lgm")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="configs/t2v_infer.yaml")
    ap.add_argument("--ckpt_dir", default=None,
                    help="directory holding the converted/reference checkpoints "
                         "(overrides the config's pretrained paths)")
    ap.add_argument("--ref_dir", default=None,
                    help="directory of reference outputs (one per prompt)")
    ap.add_argument("--prompts", default=None, help="prompt list file")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--seed", type=int, default=8888)
    ap.add_argument("--threshold", type=float, default=30.0)
    ap.add_argument("--fp32", action="store_true",
                    help="sample in float32 (escape hatch for bf16 drift)")
    ap.add_argument("--refine", action="store_true",
                    help="score the GS-refined pass instead of the plain one "
                         "(the reference writes both videos)")
    ap.add_argument("--self_consistency", action="store_true",
                    help="no weights needed: bf16-vs-fp32 drift bound")
    ap.add_argument("--make_ref_dir", default=None,
                    help="produce 'reference outputs' into this dir (view "
                         "pngs per prompt) instead of scoring — the dry-run "
                         "producer half of the acceptance plumbing")
    ap.add_argument("--limit", type=int, default=0,
                    help="score only the first N prompts (0 = all)")
    ap.add_argument("--acceptance", action="store_true",
                    help="pin reference-exact semantics for the with-weights "
                         "acceptance run: gs_refine_uncond=full, the "
                         "reference camera chain, 512-pixel refine renders, "
                         "fp32 (see ACCEPTANCE_OVERRIDES)")
    ap.add_argument("--opts", nargs="*", default=[])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    if args.self_consistency:
        # tiny-enough default so the drift probe runs in minutes; the full
        # t2v_infer.yaml path is exercised whenever --cfg is given explicitly
        prompt = "a wooden chair, 3d asset"
        results = {}
        for name, fp32 in (("bf16", False), ("fp32", True)):
            t0 = time.time()
            pipe = build_pipe(args.cfg, args.opts, fp32, args.seed, load=False)
            out = pipe.generate(prompt, steps=args.steps, seed=args.seed)
            results[name] = np.asarray(out["frames"])
            print(f"{name}: sampled in {time.time()-t0:.1f}s "
                  f"(dtype={pipe.dtype.__name__})", flush=True)
            # both towers don't fit 16 GB HBM at once (bf16 ~5.6 GB + fp32
            # ~11 GB params) — drop this pipeline's device buffers before
            # building the next (observed ResourceExhausted otherwise)
            del out, pipe
            import gc

            gc.collect()
        per_view = [psnr(results["bf16"][v], results["fp32"][v])
                    for v in range(results["bf16"].shape[0])]
        print("\nper-view PSNR bf16 vs fp32 (same seed, random init):")
        for v, p in enumerate(per_view):
            print(f"  view {v:02d}: {p:6.2f} dB")
        print(json.dumps({
            "mode": "self_consistency", "steps": args.steps,
            "psnr_min": round(min(per_view), 2),
            "psnr_mean": round(float(np.mean(per_view)), 2),
            "margin_vs_30dB": round(min(per_view) - 30.0, 2),
        }))
        return

    if not args.ref_dir and not args.make_ref_dir:
        raise SystemExit("--ref_dir required (or --make_ref_dir / --self_consistency)")
    pipe = build_pipe(args.cfg, args.opts, args.fp32, args.seed, load=True,
                      acceptance=args.acceptance, ckpt_dir=args.ckpt_dir)

    prompts = ["a wooden chair"]
    if args.prompts and os.path.exists(args.prompts):
        with open(args.prompts) as f:
            prompts = [l.strip() for l in f if l.strip() and not l.startswith("#")]
    elif pipe.cfg.get("test_list_path") and os.path.exists(pipe.cfg["test_list_path"]):
        with open(pipe.cfg["test_list_path"]) as f:
            prompts = [l.strip() for l in f if l.strip() and not l.startswith("#")]
    if args.limit:
        prompts = prompts[: args.limit]

    if args.make_ref_dir:
        # Dry-run producer (VERDICT r4 next-#7): regenerate "reference
        # outputs" on THIS stack under the acceptance semantics and write
        # them in the layout the scorer expects (<i>/view_XX.png).  With
        # real released weights this step instead comes from the reference
        # stack on A100; here it proves the full produce→score plumbing.
        from PIL import Image

        for i, prompt in enumerate(prompts):
            out = pipe.generate(prompt, steps=args.steps, seed=args.seed,
                                use_gs_refine=args.refine)
            d = os.path.join(args.make_ref_dir, str(i))
            os.makedirs(d, exist_ok=True)
            frames = np.asarray(out["frames"])
            for v in range(frames.shape[0]):
                Image.fromarray(frames[v]).save(
                    os.path.join(d, f"view_{v:02d}.png"))
            print(f"[{i}] wrote {frames.shape[0]} views for {prompt!r}")
        print(json.dumps({"mode": "make_ref_dir", "dir": args.make_ref_dir,
                          "prompts": len(prompts)}))
        return

    rows, all_psnr = [], []
    for i, prompt in enumerate(prompts):
        ref = load_reference_views(os.path.join(args.ref_dir, str(i)),
                                   pipe.max_frames, pipe.resolution)
        if ref is None:
            print(f"[{i}] no reference output found — skipped: {prompt!r}")
            continue
        out = pipe.generate(prompt, steps=args.steps, seed=args.seed,
                            use_gs_refine=args.refine)
        per_view = [psnr(out["frames"][v], ref[v]) for v in range(pipe.max_frames)]
        all_psnr.extend(per_view)
        rows.append((i, prompt, per_view))
        print(f"[{i}] {prompt!r}: min {min(per_view):.2f} "
              f"mean {np.mean(per_view):.2f} dB")
        for v, p in enumerate(per_view):
            print(f"    view {v:02d}: {p:6.2f} dB")

    if not all_psnr:
        raise SystemExit("no prompts scored — check --ref_dir layout")
    ok = min(all_psnr) >= args.threshold
    print(json.dumps({
        "mode": "vs_reference", "fp32": args.fp32,
        "acceptance": args.acceptance, "refine": args.refine,
        "psnr_min": round(min(all_psnr), 2),
        "psnr_mean": round(float(np.mean(all_psnr)), 2),
        "threshold": args.threshold,
        "pass": bool(ok),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
