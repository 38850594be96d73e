"""Joint-train-step throughput tuning on TPU (round-1 VERDICT next #10).

Times the full alternating G+D adversarial train step (flagship shapes,
B=32, ~2.9 s utterances) across:
  * LSTM scan unroll factors (models/rnn.py DEFAULT_UNROLL) — the serial
    recurrent chain is the measured latency floor; unrolling lets XLA
    software-pipeline several steps per loop iteration;
  * compute dtype f32 vs bf16 (f32 master weights either way), gated by a
    loss-parity check between the two dtypes' first step.

  PYTHONPATH=/root/repo python scripts/bench_train.py
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from robust_e2e_gan_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from __graft_entry__ import _flagship_config
from robust_e2e_gan_tpu.config import TrainConfig
from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, make_batch
from robust_e2e_gan_tpu.models import rnn as rnn_lib
from robust_e2e_gan_tpu.models.enhancement import Discriminator
from robust_e2e_gan_tpu.pipeline import RobustE2E, build_model
from robust_e2e_gan_tpu.train.steps import (
    init_train_state, make_joint_train_step,
)

B = 32
VOCAB = 52


def time_step(compute_dtype: str, unroll: int, lstm_impl: str = "scan"):
    rnn_lib.DEFAULT_UNROLL = unroll
    jcfg = dataclasses.replace(
        _flagship_config(VOCAB), compute_dtype=compute_dtype
    )
    # the decoder's teacher-forcing scan unrolls with the same sweep value
    # (mirrors the train CLI, where --scan-unroll drives both)
    jcfg = dataclasses.replace(
        jcfg,
        e2e=dataclasses.replace(
            jcfg.e2e,
            decoder=dataclasses.replace(
                jcfg.e2e.decoder, scan_unroll=unroll
            ),
        ),
    )
    if lstm_impl != "scan":
        jcfg = dataclasses.replace(
            jcfg,
            e2e=dataclasses.replace(
                jcfg.e2e,
                encoder=dataclasses.replace(
                    jcfg.e2e.encoder, lstm_impl=lstm_impl
                ),
            ),
            enhancer=dataclasses.replace(
                jcfg.enhancer, lstm_impl=lstm_impl
            ),
        )
    model = build_model(jcfg)
    disc = Discriminator(jcfg.discriminator)
    tcfg = TrainConfig(optimizer="adadelta")
    rng = np.random.default_rng(0)
    scfg = SyntheticConfig(vocab_size=VOCAB, min_tokens=20, max_tokens=24)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_batch(B, scfg, rng, ignore_id=-1).items()
    }
    state, opt_g, opt_d = init_train_state(model, disc, tcfg, batch, seed=0)
    step = make_joint_train_step(model, disc, jcfg, opt_g, opt_d,
                                 with_asr=True)
    state, metrics = step(state, batch)  # compile
    first = {k: float(v) for k, v in metrics.items()}

    n, t0 = 0, time.perf_counter()
    while True:
        for _ in range(4):
            state, metrics = step(state, batch)
        np.asarray(metrics["loss_g"])  # hard host sync
        n += 4
        dt = time.perf_counter() - t0
        if dt > 4.0:
            break
    return 1000 * dt / n, first


def main():
    results = {}
    base_first = None
    cases = [(d, u, "scan") for d in ("float32", "bfloat16")
             for u in (1, 2, 4)]
    # fused custom-VJP Pallas BLSTM (ops/blstm_train_pallas.py); the
    # frame loop lives in the kernel, so scan unroll is irrelevant
    cases += [("float32", 1, "fused"), ("bfloat16", 1, "fused")]
    for dtype, unroll, impl in cases:
        key = f"{dtype}/unroll{unroll}" + ("/fused" if impl != "scan"
                                           else "")
        try:
            ms, first = time_step(dtype, unroll, impl)
        except Exception as e:  # transient tunnel/backend errors
            results[key] = {"error": str(e)[:120]}
            print(key, "FAILED:", str(e)[:120], flush=True)
            continue
        results[key] = {
            "ms_per_step": round(ms, 1),
            "utt_per_s": round(B * 1000 / ms, 1),
        }
        print(key, results[key], flush=True)
        if dtype == "float32" and unroll == 1 and impl == "scan":
            base_first = first
        elif base_first is not None:
            # parity gate: first-step losses within tolerance of f32
            rel = abs(first["loss_g"] - base_first["loss_g"]) / max(
                abs(base_first["loss_g"]), 1e-9
            )
            results[key]["first_step_lossG_rel_diff"] = round(rel, 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
