"""Benchmark the fused Pallas BLSTM inference kernel vs the XLA scan path.

Measures single-layer forward latency at the decode pipeline's real shapes
(flagship config: enhancer 257-dim input at full frame rate, encoder
BLSTMP at 1/4 frame rate) on the attached TPU chip, for both the scan
implementation (models/rnn.py) and the fused kernel (ops/blstm_pallas.py).

Usage:  python scripts/bench_blstm.py [--iters 20]
Writes results/blstm_kernel.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from robust_e2e_gan_tpu.models.rnn import BLSTM
from robust_e2e_gan_tpu.utils.cache import enable_persistent_cache

CASES = [
    # (name, B, T, D, H) at flagship decode shapes (B=128 serving batch)
    ("enhancer", 128, 690, 257, 512),
    ("encoder_l1_vgg_out", 128, 172, 2560, 512),
    ("encoder_l2plus", 128, 172, 1024, 512),
]

TRAIN_CASES = [
    # (name, B, T, D, H) at flagship TRAIN shapes (B=32, ~2.9 s utts)
    ("enhancer", 32, 290, 257, 512),
    ("enhancer_l2", 32, 290, 1024, 512),
    ("encoder_l2plus", 32, 72, 512, 512),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    out = {"backend": jax.default_backend()}
    for name, b, t, d, h in CASES:
        x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
        lens = jnp.asarray(
            rng.integers(t // 2, t + 1, size=b).astype(np.int32)
        )
        mask = (jnp.arange(t)[None, :] < lens[:, None]).astype(jnp.float32)
        row = {}
        for impl in ("scan", "tiled"):
            m = BLSTM(h, dtype=jnp.bfloat16, impl=impl)
            params = m.init(jax.random.PRNGKey(0), x, mask)
            # scalar reduction: excludes output fetch from the timing
            f = jax.jit(
                lambda p, x, m=m: jnp.sum(
                    m.apply(p, x, mask).astype(jnp.float32)
                )
            )
            f(params, x).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = f(params, x)
            r.block_until_ready()
            row[impl] = round(
                (time.perf_counter() - t0) / args.iters * 1e3, 2
            )
        row["speedup"] = round(row["scan"] / row["tiled"], 2)
        out[name] = row
        print(f"{name}: scan {row['scan']} ms, tiled {row['tiled']} ms "
              f"({row['speedup']}x)")

    # ---- training (fwd+bwd) per-layer: scan vs fused custom-VJP ----
    for name, b, t, d, h in TRAIN_CASES:
      try:
        x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
        lens = jnp.asarray(
            rng.integers(t // 2, t + 1, size=b).astype(np.int32)
        )
        mask = (jnp.arange(t)[None, :] < lens[:, None]).astype(jnp.float32)
        row = {}
        for impl in ("scan", "fused"):
            m = BLSTM(h, dtype=jnp.bfloat16, impl=impl)
            params = m.init(jax.random.PRNGKey(0), x, mask)

            def loss(p, x, m=m):
                return jnp.sum(m.apply(p, x, mask).astype(jnp.float32))

            g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
            v, _ = g(params, x)
            v.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(args.iters):
                v, _ = g(params, x)
            np.asarray(v)  # hard host sync
            row[impl] = round(
                (time.perf_counter() - t0) / args.iters * 1e3, 2
            )
        row["speedup"] = round(row["scan"] / row["fused"], 2)
        out[f"train/{name}"] = row
        print(f"train/{name}: scan {row['scan']} ms, fused "
              f"{row['fused']} ms ({row['speedup']}x)")
      except Exception as e:  # one bad config must not kill the run
        out[f"train/{name}"] = {"error": str(e)[:160]}
        print(f"train/{name} FAILED: {str(e)[:160]}", flush=True)
    os.makedirs("results", exist_ok=True)
    with open("results/blstm_kernel.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
