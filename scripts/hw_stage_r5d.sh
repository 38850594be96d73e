#!/bin/bash
# Round-5 continuation queue. The VM restart at ~11:01 UTC killed the r5b
# queue mid-batch_bisect and wiped the untracked exp/ tree (including the
# trained exp/ab_ref_ckpt the production bench row reads). This queue
# reruns everything that never landed, reordered by VERDICT priority:
#   1. bench_a      — validate the NEW vs_baseline code path on chip
#                     (RTT-subtracted 64-iter median never ran on hw)
#   2. batch_bisect — B=112/144 cliff bisected one impl knob at a time
#                     (VERDICT 3)
#   3. ab_ref_seed1 — SECOND reference-scale paper-claim seed (VERDICT 1b);
#                     also regenerates a trained ckpt for the production row
#   4. ab_seed1/2   — toy-scale seed replication (3-seed ordering)
#   5. ab_adadelta  — the reference's own optimizer recipe (VERDICT 6)
#   6. beam_parts   — recheck the 1337 ms psi transient
#   7. bench_b/c    — reproducibility triple (VERDICT 4) + production row
# Usage: bash scripts/hw_stage_r5d.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r5_hw

run_job() {
  name=$1; tmo=$2; shift 2
  echo "[r5d] job $name start $(date -u)" >> results/r5_hw/watch.log
  timeout "$tmo" "$@" > "results/r5_hw/${name}.log" 2>&1
  echo "[r5d] job $name rc=$? end $(date -u)" >> results/r5_hw/watch.log
}

echo "[r5d] starting $(date -u)" >> results/r5_hw/watch.log
run_job bench_a 2400 python -u bench.py
run_job batch_bisect 3600 python -u scripts/bench_batch_bisect.py
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
run_job beam_parts 1200 python -u scripts/bench_beam_parts.py
run_job bench_b 1200 python -u bench.py
run_job bench_c 1200 python -u bench.py
echo "[r5d] ALL R5D JOBS DONE $(date -u)" >> results/r5_hw/watch.log
