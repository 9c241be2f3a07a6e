#!/bin/bash
# VERDICT r4 next-#3 (+#8): re-capture the four round-4 headline numbers
# whose evidence was deleted by the gitignored workspace/, with fresh
# same-day runs, logging into workspace/logs/ for copy into the tracked
# measurements/r5/. Serialized: ONE python at a time (1-core host, 1 chip).
cd /root/repo
L=workspace/logs
run() {
    name=$1; shift
    echo "=== $name ($(date +%T)) ==="
    timeout 2400 "$@" > "$L/$name.log" 2>&1
    echo "    exit=$? ($(date +%T))"
}
run drift_bound_r5   python scripts/psnr_vs_reference.py --self_consistency
run i2v_e2e_r5       python scripts/i2v_e2e_tpu.py
run lgm512_phases_r5 python scripts/probe_refine_step_phases.py
run batch_b4_r5      python scripts/batch_throughput_tpu.py
run laion_smoke_r5   python scripts/train_laion_smoke_tpu.py
echo "=== recapture chain done ($(date +%T)) ==="
