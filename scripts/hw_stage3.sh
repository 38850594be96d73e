#!/bin/bash
# Round-4 stage-3 hardware jobs: runs after scripts/hw_stage2.sh finishes.
# Gates the one post-stage-2 source change — the CTC kernel's shift/scatter
# dots pinned to HIGHEST precision (the stage-2 verify_fused2 run measured
# 8.4e-4 gradient error from default-MXU bf16 rounding of the 0/1 copy
# matmuls; results/r4_hw/verify_fused2.log) — with the full fused gate,
# the end-to-end drive, and a final bench.
#
# Usage: bash scripts/hw_stage3.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r4_hw

# wait for stage 2 to finish (marker line in its log), max 6 h
for i in $(seq 1 720); do
  grep -q "ALL STAGE2 JOBS DONE" results/r4_hw/watch.log 2>/dev/null && break
  sleep 30
done
echo "[stage3] starting $(date -u)" >> results/r4_hw/watch.log

run_job() {
  name=$1; tmo=$2; shift 2
  echo "[stage3] job $name start $(date -u)" >> results/r4_hw/watch.log
  timeout "$tmo" "$@" > "results/r4_hw/${name}.log" 2>&1
  echo "[stage3] job $name rc=$? end $(date -u)" >> results/r4_hw/watch.log
}

run_job verify_fused3 1800 python -u scripts/verify_fused.py
run_job verify_drive3 2400 python -u scripts/verify_drive.py 400
run_job bench_final3  1200 python -u bench.py
echo "[stage3] ALL STAGE3 JOBS DONE $(date -u)" >> results/r4_hw/watch.log
