#!/bin/bash
# Round-5 perf phase (run AFTER the paper-claim resume frees the chip):
#   * pipeline_ab   — cross-batch staged serving vs sequential (VERDICT 2)
#   * batch_bisect  — B=112/144 cliff bisected one impl knob at a time
#                     (VERDICT 3)
#   * beam_parts    — re-measure the beam decomposition once more to
#                     confirm the 1337 ms psi reading in
#                     results/r4_hw/bench_beam_parts4.log was a transient
#   * bench x3      — three consecutive headline runs; the new RTT-
#                     subtracted median vs_baseline must spread <10%
#                     (VERDICT 4)
# Usage: bash scripts/hw_stage_r5b.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r5_hw

run_job() {
  name=$1; tmo=$2; shift 2
  echo "[r5b] job $name start $(date -u)" >> results/r5_hw/watch.log
  timeout "$tmo" "$@" > "results/r5_hw/${name}.log" 2>&1
  echo "[r5b] job $name rc=$? end $(date -u)" >> results/r5_hw/watch.log
}

echo "[r5b] starting $(date -u)" >> results/r5_hw/watch.log
run_job pipeline_ab 2400 python -u scripts/bench_pipeline.py 12
run_job batch_bisect 3600 python -u scripts/bench_batch_bisect.py
run_job beam_parts 1200 python -u scripts/bench_beam_parts.py
run_job bench_a 2400 python -u bench.py
run_job bench_b 900 python -u bench.py
run_job bench_c 900 python -u bench.py
run_job mfu_report 2400 python -u scripts/mfu_report.py
echo "[r5b] ALL R5B JOBS DONE $(date -u)" >> results/r5_hw/watch.log
