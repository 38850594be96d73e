#!/bin/bash
# Round-4 stage-2 hardware jobs: runs after the stage-1 watcher
# (scripts/hw_watch.sh) finishes its queue. Covers the round-3 VERDICT
# items the stage-1 queue could not: the re-gated verify_fused (the
# precision-control restructure landed after stage 1 started), the
# layer-wavefront accept/reject measurement (#9), and the paper-claim
# protocol on the v3 hard task at toy AND reference scale with LM-fusion
# decode (#5).
#
# Usage: bash scripts/hw_stage2.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r4_hw

# wait for stage 1 to finish (marker line in its log), max 6 h
for i in $(seq 1 720); do
  grep -q "ALL JOBS DONE" results/r4_hw/watch.log 2>/dev/null && break
  sleep 30
done
echo "[stage2] starting $(date -u)" >> results/r4_hw/watch.log

run_job() {
  name=$1; tmo=$2; shift 2
  echo "[stage2] job $name start $(date -u)" >> results/r4_hw/watch.log
  timeout "$tmo" "$@" > "results/r4_hw/${name}.log" 2>&1
  echo "[stage2] job $name rc=$? end $(date -u)" >> results/r4_hw/watch.log
}

run_job verify_drive2     2400 python -u scripts/verify_drive.py 400
run_job verify_fused2     2400 python -u scripts/verify_fused.py
run_job bench_wavefront   2400 python -u scripts/bench_wavefront.py
run_job bench_beam_parts  2400 python -u scripts/bench_beam_parts.py
run_job adv_benefit_toy   3600 python -u scripts/adversarial_benefit.py 800 800
run_job adv_benefit_ref   5400 python -u scripts/adversarial_benefit.py 1500 1200 --scale reference --lm
echo "[stage2] ALL STAGE2 JOBS DONE $(date -u)" >> results/r4_hw/watch.log
