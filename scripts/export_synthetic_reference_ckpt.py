"""Export RANDOM-INIT reference torch checkpoints at the shipped configs.

VERDICT r4 next-#7: the PSNR >= 30 acceptance run will load the released
`.pth` files exactly once — before real weights exist, prove the whole
load -> convert -> tokenize -> sample -> refine(full) -> PSNR plumbing by
exporting state dicts FROM THE REFERENCE TORCH MODEL CLASSES themselves
(so the key surface, shapes, and dtypes are exactly what the released
checkpoints carry; producing model ctors:
/root/reference/tools/modules/unet/unet_t2v.py:56-265,
/root/reference/tools/modules/autoencoder.py:33-74) and driving
`inference.py` / `scripts/psnr_vs_reference.py --acceptance` from them.

Writes (fp32, the released format):
  pretrained_models/t2v_synth_00000000.pth  — UNetSD_T2VBase + lgm_big.*
                                              (~1.8 B params, the bundle
                                              layout of t2v_00333000.pth)
  pretrained_models/vae_synth.pth           — SD KL-VAE at the shipped
                                              ddconfig

Usage:  python scripts/export_synthetic_reference_ckpt.py [--out_dir DIR]
CPU-only, ~2-4 min, ~9 GB of disk.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="pretrained_models")
    ap.add_argument("--cfg", default="configs/t2v_infer.yaml")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import torch

    from reference_oracle import load as load_ref
    from videomv_tpu.config import load_config

    torch.manual_seed(args.seed)
    os.makedirs(args.out_dir, exist_ok=True)

    # ---- reference GaussianRenderer/LPIPS allocate CUDA / fetch weights in
    # __init__ and own no converted parameters — stub them (same approach as
    # tests/test_shipped_scale_convert.py::_patch_lgm_deps)
    import types

    ref_models = load_ref("core.models")
    ref_models.GaussianRenderer = lambda opt: types.SimpleNamespace()

    class _DummyLPIPS(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    ref_models.LPIPS = _DummyLPIPS

    report = {}

    # ---- T2V UNet (+ lgm_big) at the shipped config, REAL torch init ----
    t0 = time.time()
    ref_unet = load_ref("tools.modules.unet.unet_t2v")
    cfg = load_config(args.cfg, opts=[])
    ucfg = {k: v for k, v in dict(cfg.UNet).items() if k != "type"}
    tmod = ref_unet.UNetSD_T2VBase(**ucfg)
    sd = tmod.state_dict()
    n_params = sum(int(v.numel()) for v in sd.values())
    unet_path = os.path.join(args.out_dir, "t2v_synth_00000000.pth")
    torch.save(sd, unet_path)
    report["unet"] = {
        "path": unet_path, "keys": len(sd), "params": n_params,
        "lgm_big_keys": sum(k.startswith("lgm_big.") for k in sd),
        "seconds": round(time.time() - t0, 1),
    }
    del tmod, sd

    # ---- SD KL-VAE at the shipped ddconfig (reference config.py:110-126) --
    t0 = time.time()
    ref_ae = load_ref("tools.modules.autoencoder")
    ddconfig = dict(
        double_z=True, z_channels=4, resolution=256, in_channels=3, out_ch=3,
        ch=128, ch_mult=[1, 2, 4, 4], num_res_blocks=2, attn_resolutions=[],
        dropout=0.0,
    )
    vmod = ref_ae.AutoencoderKL(ddconfig, embed_dim=4)
    sd = vmod.state_dict()
    vae_path = os.path.join(args.out_dir, "vae_synth.pth")
    torch.save(sd, vae_path)
    report["vae"] = {
        "path": vae_path, "keys": len(sd),
        "params": sum(int(v.numel()) for v in sd.values()),
        "seconds": round(time.time() - t0, 1),
    }

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
