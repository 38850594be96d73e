#!/bin/bash
# TPU-tunnel watcher: probe until a real computation completes, then run
# the queued round-3 hardware measurement jobs (BASELINE.md "late-session
# additions" section), mirroring logs into results/r3_hw/.
#
# Usage: bash scripts/hw_watch.sh [max_probe_minutes]
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r3_hw
MAX_MIN=${1:-120}
START=$(date +%s)

probe() {
  timeout 300 python -c "
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
np.asarray(jax.jit(lambda a: a @ a)(x))
print('probe ok')
" >/dev/null 2>&1
}

echo "[watch] probing tunnel from $(date -u)" >> results/r3_hw/watch.log
until probe; do
  now=$(date +%s)
  if [ $(( (now - START) / 60 )) -ge "$MAX_MIN" ]; then
    echo "[watch] gave up after ${MAX_MIN} min at $(date -u)" >> results/r3_hw/watch.log
    exit 2
  fi
  echo "[watch] probe failed at $(date -u); retrying" >> results/r3_hw/watch.log
  sleep 45
done
echo "[watch] tunnel UP at $(date -u)" >> results/r3_hw/watch.log

run_job() {
  name=$1; shift
  echo "[watch] job $name start $(date -u)" >> results/r3_hw/watch.log
  timeout 1200 "$@" > "results/r3_hw/${name}.log" 2>&1
  echo "[watch] job $name rc=$? end $(date -u)" >> results/r3_hw/watch.log
}

run_job verify_fused   python -u scripts/verify_fused.py
run_job verify_drive   python -u scripts/verify_drive.py
run_job bench          python -u bench.py
run_job bench_blstm    python -u scripts/bench_blstm.py
run_job bench_train    python -u scripts/bench_train.py
run_job bench_train_parts python -u scripts/bench_train_parts.py
run_job bench_beam_parts  python -u scripts/bench_beam_parts.py
run_job mfu_report     python -u scripts/mfu_report.py
run_job bench_batch_sweep python -u scripts/bench_batch_sweep.py
# warm the cache at the swept optimum, then the final headline number
run_job bench_final    python -u bench.py
echo "[watch] ALL JOBS DONE $(date -u)" >> results/r3_hw/watch.log
