#!/bin/bash
# Round-4 stage-5 hardware job: extend the convergent reference-scale
# paper-claim run (results/r4_hw/adv_benefit_ref2.log: 15.7% WER joint,
# 14.9% with LM fusion, acc still climbing at the 1500-step cutoff) with
# 2x the optimization budget and a 4x eval set (256 utterances) for a
# tighter WER confidence interval. Same recipe that fixed the cold-LR
# stall: Adam 3e-4 peak, 600-step linear warmup, bs=32.
#
# Usage: bash scripts/hw_stage5.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r4_hw

run_job() {
  name=$1; tmo=$2; shift 2
  echo "[stage5] job $name start $(date -u)" >> results/r4_hw/watch.log
  timeout "$tmo" "$@" > "results/r4_hw/${name}.log" 2>&1
  echo "[stage5] job $name rc=$? end $(date -u)" >> results/r4_hw/watch.log
}

echo "[stage5] starting $(date -u)" >> results/r4_hw/watch.log
run_job adv_benefit_ref3 14400 python -u scripts/adversarial_benefit.py \
  8000 3000 --scale reference --lm --lr 3e-4 --warmup 600 --bs 32 \
  --eval-utts 256
echo "[stage5] ALL STAGE5 JOBS DONE $(date -u)" >> results/r4_hw/watch.log
