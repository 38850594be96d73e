"""Reference-scale train-step tuning: remat and batch-size levers.

The round-3 MFU accounting (results/mfu.json) shows the reference-scale
joint G+D train step is BANDWIDTH-bound: 55% HBM utilization at 10% MFU.
The two levers that trade FLOPs (plentiful) for HBM traffic (scarce):

  * remat: jax.checkpoint each BLSTM layer — activations are recomputed in
    the backward instead of round-tripping HBM;
  * batch size: larger B raises arithmetic intensity of every matmul.

  python scripts/bench_train_scale.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from robust_e2e_gan_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from robust_e2e_gan_tpu.config import (
    AttentionConfig, DecoderConfig, DiscriminatorConfig, E2EConfig,
    EncoderConfig, EnhancerConfig, FrontendConfig, JointConfig, TrainConfig,
)
from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, make_batch
from robust_e2e_gan_tpu.models.enhancement import Discriminator
from robust_e2e_gan_tpu.pipeline import build_model
from robust_e2e_gan_tpu.train.steps import init_train_state, make_joint_train_step

VOCAB = 52


def ref_cfg(remat: bool, unroll: int = 4,
            gate_storage: str = "f32", lstm_impl: str = "scan") -> JointConfig:
    return JointConfig(
        e2e=E2EConfig(
            frontend=FrontendConfig(n_mels=80),
            encoder=EncoderConfig(
                input_dim=80, num_layers=3, hidden_dim=512, proj_dim=512,
                remat=remat, scan_unroll=unroll,
                gate_storage=gate_storage, lstm_impl=lstm_impl,
            ),
            attention=AttentionConfig(dim=512, conv_kernel=201),
            decoder=DecoderConfig(vocab_size=VOCAB, embed_dim=512,
                                  hidden_dim=512),
        ),
        enhancer=EnhancerConfig(input_dim=257, num_layers=2, hidden_dim=512,
                                remat=remat, scan_unroll=unroll,
                                gate_storage=gate_storage,
                                lstm_impl=lstm_impl),
        discriminator=DiscriminatorConfig(input_dim=80,
                                          channels=(32, 64, 128)),
        compute_dtype="bfloat16",
    )


def time_step(remat: bool, batch: int, unroll: int = 4,
              gate_storage: str = "f32", lstm_impl: str = "scan"):
    jcfg = ref_cfg(remat, unroll, gate_storage, lstm_impl)
    model = build_model(jcfg)
    disc = Discriminator(jcfg.discriminator)
    tcfg = TrainConfig(optimizer="adadelta", batch_size=batch)
    rng = np.random.default_rng(0)
    scfg = SyntheticConfig(vocab_size=VOCAB, min_tokens=20, max_tokens=24)
    b = {
        k: jnp.asarray(v)
        for k, v in make_batch(batch, scfg, rng, ignore_id=-1).items()
    }
    state, opt_g, opt_d = init_train_state(model, disc, tcfg, b, seed=0)
    step = make_joint_train_step(model, disc, jcfg, opt_g, opt_d,
                                 with_asr=True)
    state, m = step(state, b)  # compile + warm
    loss0 = float(np.asarray(m["loss_g"]))
    n, t0 = 0, time.perf_counter()
    while True:
        out = None
        for _ in range(8):
            state, m = step(state, b)
            out = m["loss_g"]
        np.asarray(out)
        n += 8
        dt = time.perf_counter() - t0
        if dt >= 4.0:
            break
    sec = dt / n
    return {"ms": round(sec * 1e3, 2), "utt_per_s": round(batch / sec, 1),
            "loss0": round(loss0, 3)}


ALL_CASES = (
    # name, remat, batch, gate_storage, lstm_impl
    ("B32", False, 32, "f32", "scan"),
    ("B32_remat", True, 32, "f32", "scan"),
    ("B64", False, 64, "f32", "scan"),
    ("B64_remat", True, 64, "f32", "scan"),
    ("B32_gates_bf16", False, 32, "compute", "scan"),
    ("B64_gates_bf16", False, 64, "compute", "scan"),
    # fused-train Pallas BLSTM kernels (round-4; the flagship-shape win is
    # 36.1 -> 25.0 ms, results/r4_hw/bench_train.log) at reference scale —
    # the VERDICT #3 "prove < 50.9 ms at 36M params" row
    ("B32_fused", False, 32, "f32", "fused"),
    ("B64_fused", False, 64, "f32", "fused"),
)


def main(argv=None):
    names = set((argv if argv is not None else sys.argv)[1:])
    # merge into the recorded sweep so a short re-run (e.g. just the fused
    # rows) keeps the older rows' numbers alongside
    out = {}
    if os.path.exists("results/train_scale.json"):
        with open("results/train_scale.json") as f:
            out = json.load(f)
    for name, remat, batch, gs, impl in ALL_CASES:
        if names and name not in names:
            continue
        try:
            out[name] = time_step(remat, batch, gate_storage=gs,
                                  lstm_impl=impl)
        except Exception as e:  # transient tunnel errors — record and go on
            out[name] = {"error": str(e)[:200]}
        print(name, out[name], flush=True)
    os.makedirs("results", exist_ok=True)
    with open("results/train_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
