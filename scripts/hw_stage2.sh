#!/bin/bash
# Round-4 stage-2 hardware jobs: runs after the stage-1 watcher
# (scripts/hw_watch.sh) finishes its queue. Priority-ordered for the
# remaining round-4 wall clock — the short must-be-green gates first
# (the 09:49 verify_fused run failed on the since-replaced fixed
# tolerance; the restructured HIGHEST-precision gate needs a green
# on-chip log), then the paper-claim protocol on the v3 hard task (toy
# then reference scale with LM-fusion decode), then the measurement
# stragglers (wavefront accept/reject, fused-train at reference scale,
# beam stage attribution).
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

run_job verify_fused2     1800 python -u scripts/verify_fused.py
run_job verify_drive2     2400 python -u scripts/verify_drive.py 400
run_job adv_benefit_toy   2400 python -u scripts/adversarial_benefit.py 800 800
run_job adv_benefit_ref   5400 python -u scripts/adversarial_benefit.py 1500 1200 --scale reference --lm
run_job bench_wavefront   1800 python -u scripts/bench_wavefront.py
run_job train_scale_fused 2400 python -u scripts/bench_train_scale.py B32 B32_fused B64_fused
run_job bench_beam_parts  1800 python -u scripts/bench_beam_parts.py
echo "[stage2] ALL STAGE2 JOBS DONE $(date -u)" >> results/r4_hw/watch.log
