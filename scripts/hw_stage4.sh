#!/bin/bash
# Round-4 stage-4 hardware job: the convergent reference-scale paper-claim
# rerun. The first on-chip attempt (results/r4_hw/adv_benefit_ref.log,
# Adam 1e-3 / bs=16 / 1500+1200 steps) plateaued at acc~0.35 — the 36M
# model stalls under a cold 1e-3 Adam step — though joint adversarial
# training still cut TER 0.80->0.54. This rerun uses the gentler recipe
# (3e-4 peak LR, 600-step linear warmup, bs=32) and ~3x the optimization
# budget, targeting a word-level WER win (the round-3 VERDICT #5 "trained
# to convergence with beam+LM decode WER" bar).
#
# Usage: bash scripts/hw_stage4.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r4_hw

# wait for stage 3 to finish (marker line in its log), max 6 h
for i in $(seq 1 720); do
  grep -q "ALL STAGE3 JOBS DONE" results/r4_hw/watch.log 2>/dev/null && break
  sleep 30
done
echo "[stage4] starting $(date -u)" >> results/r4_hw/watch.log

run_job() {
  name=$1; tmo=$2; shift 2
  echo "[stage4] job $name start $(date -u)" >> results/r4_hw/watch.log
  timeout "$tmo" "$@" > "results/r4_hw/${name}.log" 2>&1
  echo "[stage4] job $name rc=$? end $(date -u)" >> results/r4_hw/watch.log
}

run_job adv_benefit_ref2 10800 python -u scripts/adversarial_benefit.py \
  4000 1500 --scale reference --lm --lr 3e-4 --warmup 600 --bs 32
echo "[stage4] ALL STAGE4 JOBS DONE $(date -u)" >> results/r4_hw/watch.log
