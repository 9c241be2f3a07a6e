#!/bin/bash
# Round-3 final measurement chain (fresh machine — both compile caches were
# lost to migration; the bench prime run repopulates .jax_cache first).
# Waits for the already-running bench prime (pid $1), then runs the queue-5
# deliverables in value order. Serial — one python at a time on the one core.
set -x
cd /root/repo
mkdir -p workspace/logs
GATE="bash scripts/tpu_gate.sh 21600"

while kill -0 "$1" 2>/dev/null; do sleep 30; done

# prove compile_warm on the driver-identical program
$GATE && timeout 1800 python bench.py > workspace/logs/bench_r3_prove.log 2>&1
echo "bench_prove exit=$?" >> workspace/logs/bench_r3_prove.log

# VERDICT #2: refine e2e with shipped shared-uncond default + same-day plain control
$GATE && timeout 5400 python scripts/refine_e2e_tpu.py > workspace/logs/refine_e2e_r3.log 2>&1
echo "refine exit=$?" >> workspace/logs/refine_e2e_r3.log

# VERDICT missing #1: bf16-vs-fp32 50-step drift bound
$GATE && timeout 7200 python scripts/psnr_vs_reference.py --self_consistency > workspace/logs/psnr_drift_r3.log 2>&1
echo "psnr_drift exit=$?" >> workspace/logs/psnr_drift_r3.log

# VERDICT #8: 256-vs-512 refine render A/B
$GATE && timeout 7200 python scripts/ab_render_size.py > workspace/logs/ab_render_size_r3.log 2>&1
echo "ab_render exit=$?" >> workspace/logs/ab_render_size_r3.log

# VERDICT #9: batched serving B=4 throughput
$GATE && timeout 7200 python scripts/batch_throughput_tpu.py > workspace/logs/batch_tp_r3.log 2>&1
echo "batch_tp exit=$?" >> workspace/logs/batch_tp_r3.log

# VERDICT #7: LGM 512 train smoke on the Pallas backward
$GATE && timeout 5400 python scripts/train_smoke_lgm512_tpu.py > workspace/logs/lgm512_r3.log 2>&1
echo "lgm512 exit=$?" >> workspace/logs/lgm512_r3.log

# train-step knob A/B (remat_policy / prng_impl)
$GATE && timeout 7200 python scripts/train_ab_knobs.py > workspace/logs/train_ab_knobs_r3.log 2>&1
echo "train_ab exit=$?" >> workspace/logs/train_ab_knobs_r3.log

# full-size I2V e2e
$GATE && timeout 7200 python scripts/i2v_e2e_tpu.py > workspace/logs/i2v_e2e_r3.log 2>&1
echo "i2v exit=$?" >> workspace/logs/i2v_e2e_r3.log

# full CPU suite on this machine (cold host-keyed cache)
timeout 3600 python -m pytest tests/ -q > workspace/logs/pytest_r3_final.log 2>&1
echo "pytest_final exit=$?" >> workspace/logs/pytest_r3_final.log

echo ALL DONE
