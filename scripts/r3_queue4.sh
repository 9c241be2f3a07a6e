#!/bin/bash
# Round-3 TPU measurement chain #4 (serial; gated on tunnel liveness after
# the ~19:00Z outage that killed batch_tp/lgm512/ab_render/bench in chain #3):
#   0. CPU pytest of the round's new test files
#   1. train-step knob A/B (prng_impl=rbg, remat_policy=dots_no_batch)
#   2. bf16-vs-fp32 50-step drift bound (VERDICT r2 missing #1 deliverable)
#   3. full-size I2V e2e + refined-shared hardware run
#   4. retries: batch B=4, lgm512 smoke, ab_render_size
#   5. refine e2e with the shipped shared default
#   6. final full CPU suite
#   7. bench prime + prove (compile_warm protocol — LAST, after all
#      compute-path changes and with the tunnel warm)
set -x
cd /root/repo
mkdir -p workspace/logs
GATE="bash scripts/tpu_gate.sh 21600"

timeout 2700 python -m pytest tests/test_train_knobs.py tests/test_parallel.py tests/test_i2v_pipeline.py tests/test_refine_fn.py tests/test_config.py tests/test_frame_parallel.py -q > workspace/logs/pytest_knobs_r3.log 2>&1
echo "pytest_knobs exit=$?" >> workspace/logs/pytest_knobs_r3.log

$GATE && timeout 7200 python scripts/train_ab_knobs.py > workspace/logs/train_ab_knobs_r3.log 2>&1
echo "train_ab exit=$?" >> workspace/logs/train_ab_knobs_r3.log
$GATE && timeout 5400 python scripts/psnr_vs_reference.py --self_consistency > workspace/logs/psnr_drift_r3.log 2>&1
echo "psnr_drift exit=$?" >> workspace/logs/psnr_drift_r3.log
$GATE && timeout 7200 python scripts/i2v_e2e_tpu.py > workspace/logs/i2v_e2e_r3.log 2>&1
echo "i2v exit=$?" >> workspace/logs/i2v_e2e_r3.log
$GATE && timeout 5400 python scripts/batch_throughput_tpu.py > workspace/logs/batch_tp_r3b.log 2>&1
echo "batch_tp exit=$?" >> workspace/logs/batch_tp_r3b.log
$GATE && timeout 3600 python scripts/train_smoke_lgm512_tpu.py > workspace/logs/lgm512_r3b.log 2>&1
echo "lgm512 exit=$?" >> workspace/logs/lgm512_r3b.log
$GATE && timeout 5400 python scripts/ab_render_size.py > workspace/logs/ab_render_size_r3b.log 2>&1
echo "ab_render exit=$?" >> workspace/logs/ab_render_size_r3b.log
$GATE && timeout 3600 python scripts/refine_e2e_tpu.py > workspace/logs/refine_e2e_r3d.log 2>&1
echo "refine exit=$?" >> workspace/logs/refine_e2e_r3d.log

# full suite on the final round-3 tree
timeout 3600 python -m pytest tests/ -q > workspace/logs/pytest_r3_final.log 2>&1
echo "pytest_final exit=$?" >> workspace/logs/pytest_r3_final.log

# bench prime + prove, last
$GATE && timeout 2400 python bench.py > workspace/logs/bench_r3b_prime.log 2>&1
echo "bench_prime exit=$?" >> workspace/logs/bench_r3b_prime.log
$GATE && timeout 1200 python bench.py > workspace/logs/bench_r3b_prove.log 2>&1
echo "bench_prove exit=$?" >> workspace/logs/bench_r3b_prove.log
echo ALL DONE
