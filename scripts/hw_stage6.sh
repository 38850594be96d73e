#!/bin/bash
# Round-4 stage-6 hardware job: the stage-5 extended paper-claim run
# (8000/3000, results/r4_hw/adv_benefit_ref3.log) was killed at ASR step
# ~2500 by a VM restart — the script had no resume path, so the whole run
# was lost. Relaunch at a budget sized to finish inside the remaining
# session window (~1.3x the convergent ref2 budget rather than 2x), WITH
# the new checkpoint/resume support so any further preemption costs at
# most --save-every steps:
#   * --ckpt-dir exp/ab_ref_ckpt: framework-native atomic
#     checkpoints (utils/checkpoint.py) + per-stage WER sidecar, so a
#     rerun of this same script fast-forwards to where it died;
#   * eval set 3x the ref2 run (192 utts) for a tighter WER interval.
#
# Usage: bash scripts/hw_stage6.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r4_hw

run_job() {
  name=$1; tmo=$2; shift 2
  echo "[stage6] job $name start $(date -u)" >> results/r4_hw/watch.log
  timeout "$tmo" "$@" > "results/r4_hw/${name}.log" 2>&1
  echo "[stage6] job $name rc=$? end $(date -u)" >> results/r4_hw/watch.log
}

echo "[stage6] starting $(date -u)" >> results/r4_hw/watch.log
run_job adv_benefit_ref4 4800 python -u scripts/adversarial_benefit.py \
  3600 1200 --scale reference --lm --lr 3e-4 --warmup 600 --bs 32 \
  --eval-utts 192 --ckpt-dir exp/ab_ref_ckpt --save-every 400
echo "[stage6] ALL STAGE6 JOBS DONE $(date -u)" >> results/r4_hw/watch.log
