#!/bin/bash
# Round-3 TPU measurement chain #3 (serial; one python at a time).
# Prereq: full pytest green + uint8-download fix committed.
#   0. targeted CPU tests for the pipeline decode change
#   1. shared-mode refine + shared-vs-full PSNR  (VERDICT #2 lever)
#   2. full-mode refine e2e + same-day plain control, post-uint8-fix
#   3. post-overlap sustained train throughput   (validates ca93ff4)
#   4. B=4 batched serving throughput            (VERDICT #9 number)
#   5. 512^2 LGM-refine finetune smoke           (VERDICT #7)
#   6. gs_render_size 256-vs-512 A/B             (VERDICT #8)
#   7. bench.py prime + prove (compile_warm protocol)
set -x
cd /root/repo
mkdir -p workspace/logs
timeout 3600 python -m pytest tests/ -x -q > workspace/logs/pytest_r3d.log 2>&1
echo "pytest exit=$?" >> workspace/logs/pytest_r3d.log
timeout 3600 python scripts/refine_shared_tpu.py > workspace/logs/refine_shared_r3c.log 2>&1
echo "shared exit=$?" >> workspace/logs/refine_shared_r3c.log
timeout 3600 python scripts/refine_e2e_tpu.py > workspace/logs/refine_e2e_r3c.log 2>&1
echo "refine exit=$?" >> workspace/logs/refine_e2e_r3c.log
timeout 3000 python scripts/train_bench_tpu.py > workspace/logs/train_bench_r3.log 2>&1
echo "train_bench exit=$?" >> workspace/logs/train_bench_r3.log
timeout 5400 python scripts/batch_throughput_tpu.py > workspace/logs/batch_tp_r3.log 2>&1
echo "batch_tp exit=$?" >> workspace/logs/batch_tp_r3.log
timeout 3600 python scripts/train_smoke_lgm512_tpu.py > workspace/logs/lgm512_r3.log 2>&1
echo "lgm512 exit=$?" >> workspace/logs/lgm512_r3.log
timeout 5400 python scripts/ab_render_size.py > workspace/logs/ab_render_size_r3.log 2>&1
echo "ab_render exit=$?" >> workspace/logs/ab_render_size_r3.log
timeout 2400 python bench.py > workspace/logs/bench_r3_prime.log 2>&1
echo "bench_prime exit=$?" >> workspace/logs/bench_r3_prime.log
timeout 1200 python bench.py > workspace/logs/bench_r3_prove.log 2>&1
echo "bench_prove exit=$?" >> workspace/logs/bench_r3_prove.log
echo ALL DONE
