#!/bin/bash
# TPU-tunnel watcher: probe until a real computation completes, then run
# the round-4 hardware gate + measurement jobs (round-3 VERDICT next-round
# items 1-4, 6-7), mirroring logs into results/r4_hw/.
#
# Job order is the VERDICT's priority order: the compile-only Mosaic smoke
# gate first (also pre-warms the persistent compilation cache), then the
# green-gate verify jobs, then the headline bench, then the measurement
# closures (kernel A/B, train-side, MFU, batch sweep).
#
# Per-job timeouts are per-job parameters (round-3 ADVICE: the flat 1200 s
# was tight against observed cold-cache costs — verify_drive's step 0 alone
# took 593 s cold).
#
# Usage: bash scripts/hw_watch.sh [max_probe_minutes]
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r4_hw
MAX_MIN=${1:-360}
START=$(date +%s)

probe() {
  timeout 300 python -c "
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
np.asarray(jax.jit(lambda a: a @ a)(x))
print('probe ok')
" >/dev/null 2>&1
}

echo "[watch] probing tunnel from $(date -u)" >> results/r4_hw/watch.log
until probe; do
  now=$(date +%s)
  if [ $(( (now - START) / 60 )) -ge "$MAX_MIN" ]; then
    echo "[watch] gave up after ${MAX_MIN} min at $(date -u)" >> results/r4_hw/watch.log
    exit 2
  fi
  echo "[watch] probe failed at $(date -u); retrying" >> results/r4_hw/watch.log
  sleep 45
done
echo "[watch] tunnel UP at $(date -u)" >> results/r4_hw/watch.log

run_job() {
  name=$1; tmo=$2; shift 2
  echo "[watch] job $name start $(date -u)" >> results/r4_hw/watch.log
  timeout "$tmo" "$@" > "results/r4_hw/${name}.log" 2>&1
  echo "[watch] job $name rc=$? end $(date -u)" >> results/r4_hw/watch.log
}

run_job smoke_compile     3000 python -u scripts/smoke_compile.py
run_job verify_fused      2400 python -u scripts/verify_fused.py
run_job verify_drive      2400 python -u scripts/verify_drive.py
run_job bench             2400 python -u bench.py
run_job bench_kernel_ab   3600 python -u scripts/bench_kernel_ab.py
run_job bench_train       2400 python -u scripts/bench_train.py
run_job bench_train_parts 2400 python -u scripts/bench_train_parts.py
run_job mfu_report        3600 python -u scripts/mfu_report.py
run_job bench_batch_sweep 3600 python -u scripts/bench_batch_sweep.py
# warm the cache at the swept optimum, then the final headline number
run_job bench_final       2400 python -u bench.py
echo "[watch] ALL JOBS DONE $(date -u)" >> results/r4_hw/watch.log
