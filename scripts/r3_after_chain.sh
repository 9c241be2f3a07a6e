#!/bin/bash
# Waits for the r3_chain_final.sh run (pid $1) to exit, then retries the
# PSNR drift probe with the OOM fix (free bf16 buffers before the fp32 arm).
set -x
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 60; done
bash scripts/tpu_gate.sh 21600 && timeout 7200 python scripts/psnr_vs_reference.py --self_consistency > workspace/logs/psnr_drift_r3b.log 2>&1
echo "psnr_drift exit=$?" >> workspace/logs/psnr_drift_r3b.log
echo AFTER_CHAIN_DONE
