"""Stage decomposition of the joint adversarial TRAIN step on TPU.

Complements scripts/bench_beam_parts.py (decode) and prices the remaining
perf work on the bandwidth-bound train step (results/mfu.json): times the
enhancer forward, the ASR forward, forward+backward of the G objective,
the D step, and the full alternating G+D program — for the scan BLSTM path
and the fused custom-VJP Pallas kernels (--lstm-impl comparison).

  PYTHONPATH=/root/repo python scripts/bench_train_parts.py
Writes results/train_parts.json.
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
from robust_e2e_gan_tpu.models.enhancement import Discriminator
from robust_e2e_gan_tpu.pipeline import RobustE2E, build_model
from robust_e2e_gan_tpu.train.steps import (
    init_train_state, make_joint_train_step,
)

B = 32
VOCAB = 52


def _timed(fn, min_seconds=3.0, chunk=8):
    np.asarray(jax.tree_util.tree_leaves(fn())[0])
    n, t0 = 0, time.perf_counter()
    while True:
        out = None
        for _ in range(chunk):
            out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        n += chunk
        dt = time.perf_counter() - t0
        if dt >= min_seconds:
            return round(dt / n * 1e3, 2)


def profile(lstm_impl: str):
    jcfg = dataclasses.replace(
        _flagship_config(VOCAB), compute_dtype="bfloat16"
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
    params = state.params_g
    wav, lens = batch["noisy_wav"], batch["wav_lengths"]
    ys = batch["labels"]
    row = {}

    # enhancer forward alone (power spectrum + mask)
    @jax.jit
    def enh_fwd(p):
        e, m, f = model.apply({"params": p}, wav, lens,
                              method=RobustE2E.enhance)
        return jnp.sum(e.astype(jnp.float32))

    row["enhance_fwd_ms"] = _timed(lambda: enh_fwd(params))

    # full ASR forward (enhancer + fbank + encoder + decoder scan + CTC)
    def asr_loss(p):
        out = model.apply({"params": p}, wav, lens, ys,
                          method=RobustE2E.asr_forward)
        return out["loss"]

    asr_fwd = jax.jit(asr_loss)
    row["asr_fwd_ms"] = _timed(lambda: asr_fwd(params))

    # ASR forward + backward (the G gradient without the GAN terms)
    asr_grad = jax.jit(jax.grad(asr_loss))
    row["asr_fwd_bwd_ms"] = _timed(lambda: asr_grad(params))

    # full joint alternating G+D step (the production program; state is
    # donated, so thread it through the timing closure)
    step = make_joint_train_step(model, disc, jcfg, opt_g, opt_d,
                                 with_asr=True)
    holder = {"s": state}

    def one():
        holder["s"], metrics = step(holder["s"], batch)
        return metrics

    t = _timed(one)
    row["joint_step_ms"] = t
    row["train_utt_per_s"] = round(B * 1000 / t, 1)
    return row


def main():
    out = {"backend": jax.default_backend(), "B": B}
    for impl in ("scan", "fused"):
        try:
            out[impl] = profile(impl)
        except Exception as e:
            out[impl] = {"error": str(e)[:200]}
        print(impl, json.dumps(out[impl]), flush=True)
    _os.makedirs("results", exist_ok=True)
    with open("results/train_parts.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
