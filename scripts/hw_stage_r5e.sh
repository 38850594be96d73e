#!/bin/bash
# Round-5 continuation queue, part 2 — chained after ab_ref_seed1 (the
# only survivor of the restructured r5d queue) releases the chip.
#   1. verify_drive — the /verify gate for this session's commits
#      (chunked-encode serving, batch-pad guard, bench changes)
#   2. pipeline_ab  — now a 3-way A/B: sequential vs staged vs the NEW
#      chunked-encode-in-scan schedule (the round's one remaining
#      serving lever, ceiling ~1.8x)
#   3. ab_seed1/2   — toy-scale seed replication (VERDICT 1b)
#   4. ab_adadelta  — the reference's own optimizer recipe (VERDICT 6)
#   5. bench_b      — second headline run for the <10% spread evidence
#   6. beam_parts   — recheck the 1337 ms psi transient
#   7. verify_fused — fused-kernel parity ritual (kernels untouched
#      this session; ordered last)
#   8. bench_c      — third headline run
# Usage: bash scripts/hw_stage_r5e.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r5_hw

run_job() {
  name=$1; tmo=$2; shift 2
  echo "[r5e] job $name start $(date -u)" >> results/r5_hw/watch.log
  timeout "$tmo" "$@" > "results/r5_hw/${name}.log" 2>&1
  echo "[r5e] job $name rc=$? end $(date -u)" >> results/r5_hw/watch.log
}

echo "[r5e] starting $(date -u)" >> results/r5_hw/watch.log
run_job verify_drive 1500 python -u scripts/verify_drive.py 400
run_job pipeline_ab3 3600 python -u scripts/bench_pipeline.py 12
run_job ab_seed1 3600 python -u scripts/adversarial_benefit.py 800 800 \
  --seed 1 --out results/adversarial_benefit_seed1.json
run_job ab_seed2 3600 python -u scripts/adversarial_benefit.py 800 800 \
  --seed 2 --out results/adversarial_benefit_seed2.json
run_job ab_adadelta 3600 python -u scripts/adversarial_benefit.py 800 800 \
  --optimizer adadelta --lr 1.0 \
  --out results/adversarial_benefit_adadelta.json
run_job bench_b 1200 python -u bench.py
run_job beam_parts 1200 python -u scripts/bench_beam_parts.py
run_job verify_fused 590 python -u scripts/verify_fused.py
run_job bench_c 900 python -u bench.py
echo "[r5e] ALL R5E JOBS DONE $(date -u)" >> results/r5_hw/watch.log
