#!/bin/bash
# Round-3 TPU measurement chain #2 (serial; one python at a time):
#   1. isolated splat profile with the new packed1+MXU expansion
#   2. full-mode refine e2e + same-day plain control (new expand compiled in)
#   3. shared-mode refine + shared-vs-full PSNR
#   4. post-overlap sustained train throughput (validates ca93ff4)
#   5. 512^2 LGM-refine finetune smoke (VERDICT r2 #7)
#   6. gs_render_size 256-vs-512 A/B (VERDICT r2 #8)
set -x
cd /root/repo
mkdir -p workspace/logs
timeout 1800 python scripts/profile_refine_splat.py > workspace/logs/splat_profile_r3b.log 2>&1
echo "splat_profile exit=$?" >> workspace/logs/splat_profile_r3b.log
timeout 3600 python scripts/refine_e2e_tpu.py > workspace/logs/refine_e2e_r3b.log 2>&1
echo "refine exit=$?" >> workspace/logs/refine_e2e_r3b.log
timeout 3600 python scripts/refine_shared_tpu.py > workspace/logs/refine_shared_r3b.log 2>&1
echo "shared exit=$?" >> workspace/logs/refine_shared_r3b.log
timeout 3000 python scripts/train_bench_tpu.py > workspace/logs/train_bench_r3.log 2>&1
echo "train_bench exit=$?" >> workspace/logs/train_bench_r3.log
timeout 3600 python scripts/train_smoke_lgm512_tpu.py > workspace/logs/lgm512_r3.log 2>&1
echo "lgm512 exit=$?" >> workspace/logs/lgm512_r3.log
timeout 5400 python scripts/ab_render_size.py > workspace/logs/ab_render_size_r3.log 2>&1
echo "ab_render exit=$?" >> workspace/logs/ab_render_size_r3.log
echo ALL DONE
