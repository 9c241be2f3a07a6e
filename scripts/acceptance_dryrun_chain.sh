#!/bin/bash
# VERDICT r4 next-#7: end-to-end acceptance dry-run with synthetic released
# weights. Exports random-init torch state dicts FROM THE REFERENCE MODEL
# CLASSES at the shipped configs, then drives the full
# load -> convert -> tokenize -> sample(fp32) -> refine(full@512) -> PSNR
# plumbing through scripts/psnr_vs_reference.py --acceptance: once as the
# producer (--make_ref_dir) and once as the scorer (--ref_dir). Same stack +
# same seed => PSNR inf => PASS exit 0, proving every link the real
# acceptance run will use (reference producer:
# inference_text2video_entrance.py:137-144,249-289).
set -e
cd /root/repo
L=workspace/logs
echo "=== [1/3] export synthetic reference checkpoints ($(date +%T)) ==="
python scripts/export_synthetic_reference_ckpt.py --out_dir pretrained_models \
    2>&1 | tee $L/synth_export_r5.log
echo "=== [2/3] producer: acceptance sample from converted ckpt ($(date +%T)) ==="
python scripts/psnr_vs_reference.py --acceptance --ckpt_dir pretrained_models \
    --make_ref_dir workspace/synth_ref --limit 1 --refine \
    2>&1 | tee $L/acceptance_produce_r5.log
echo "=== [3/3] scorer: acceptance PSNR vs the produced outputs ($(date +%T)) ==="
python scripts/psnr_vs_reference.py --acceptance --ckpt_dir pretrained_models \
    --ref_dir workspace/synth_ref --limit 1 --refine \
    2>&1 | tee $L/acceptance_score_r5.log
echo "=== chain done ($(date +%T)) ==="
