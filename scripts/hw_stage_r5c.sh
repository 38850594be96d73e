#!/bin/bash
# Round-5 science phase (after the perf phase):
#   * ab_ref_seed1 — SECOND reference-scale paper-claim run, seed 1
#                    (VERDICT 1b: the flagship number was single-seed);
#                    own ckpt dir, resumable, 192-utt eval with CIs.
#   * ab_seed1/2   — toy-scale seed replication at the recorded run's
#                    800/800 budget (recorded run = seed 0), so the
#                    no-enh > cascade > joint ordering is checked across
#                    3 seeds.
#   * ab_adadelta  — the reference's own optimizer recipe (SURVEY 2a:
#                    Adadelta + eps-decay) at toy scale (VERDICT 6).
# Usage: bash scripts/hw_stage_r5c.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r5_hw

run_job() {
  name=$1; tmo=$2; shift 2
  echo "[r5c] job $name start $(date -u)" >> results/r5_hw/watch.log
  timeout "$tmo" "$@" > "results/r5_hw/${name}.log" 2>&1
  echo "[r5c] job $name rc=$? end $(date -u)" >> results/r5_hw/watch.log
}

echo "[r5c] starting $(date -u)" >> results/r5_hw/watch.log
# 4000/1500 = the budget of the RECORDED flagship run
# (results/adversarial_benefit_reference.json r4 steps), so seed 1
# replicates that protocol exactly, with the tighter 192-utt eval.
run_job ab_ref_seed1 12000 python -u scripts/adversarial_benefit.py \
  4000 1500 --scale reference --lm --lr 3e-4 --warmup 600 --bs 32 \
  --eval-utts 192 --seed 1 --ckpt-dir exp/ab_ref_seed1 --save-every 400 \
  --out results/adversarial_benefit_reference_seed1.json
run_job ab_seed1 3600 python -u scripts/adversarial_benefit.py 800 800 \
  --seed 1 --out results/adversarial_benefit_seed1.json
run_job ab_seed2 3600 python -u scripts/adversarial_benefit.py 800 800 \
  --seed 2 --out results/adversarial_benefit_seed2.json
run_job ab_adadelta 3600 python -u scripts/adversarial_benefit.py 800 800 \
  --optimizer adadelta --lr 1.0 \
  --out results/adversarial_benefit_adadelta.json
echo "[r5c] ALL R5C JOBS DONE $(date -u)" >> results/r5_hw/watch.log
