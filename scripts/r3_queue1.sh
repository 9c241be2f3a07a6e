#!/bin/bash
# Round-3 TPU measurement chain #1 (cheap/cached programs first):
# same-day refine control, sort-strategy probe, refine_fn breakdown,
# bench warm-cache check (with cache-layer logging).
set -x
cd /root/repo
mkdir -p workspace/logs
timeout 3000 python scripts/refine_e2e_tpu.py   > workspace/logs/refine_e2e_r3.log 2>&1
echo "refine exit=$?" >> workspace/logs/refine_e2e_r3.log
timeout 1800 python scripts/probe_sort_strategies.py > workspace/logs/sort_probe_r3.log 2>&1
echo "probe exit=$?" >> workspace/logs/sort_probe_r3.log
timeout 1800 python scripts/profile_refine_fn.py > workspace/logs/refine_fn_r3.log 2>&1
echo "refine_fn exit=$?" >> workspace/logs/refine_fn_r3.log
VIDEOMV_CACHE_DEBUG=1 timeout 3000 python bench.py > workspace/logs/bench_r3a.log 2>&1
echo "bench exit=$?" >> workspace/logs/bench_r3a.log
echo ALL DONE
