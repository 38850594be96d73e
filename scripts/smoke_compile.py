"""Compile-only smoke gate for every fused Pallas kernel (round-3 VERDICT #6).

Round 3 proved interpret-mode equivalence cannot catch Mosaic verification
failures (the f32-iota kernel passed the whole interpret suite and failed
`tpu.iota` verification on the chip). This script lowers + compiles — no
execution — the real composite programs on the attached backend, covering
every fused kernel at BOTH the serving (bench.py) and the verify
(scripts/verify_fused.py) shapes:

  * serve_bench_fused : flagship bf16 beam search, B=128/beam 8/48 steps —
    fused attention step, fully-fused decoder step, tiled BLSTM inference,
    tiled CTC prefix, fused fbank.
  * serve_verify_fused: the verify-script model/shapes (B=16, beam 4).
  * train_flagship_fused: joint G+D train step, B=32, fused-train BLSTM
    (custom VJP fwd+bwd incl. the gate-stream VGG-out variant), fused CTC
    loss fwd+bwd, trainable fused fbank.
  * lm_step_fused     : fused RNNLM shallow-fusion step.

Failure names the program; the Mosaic traceback names the kernel. Run this
FIRST in every hardware window, ahead of the long jobs. Compile results
land in the persistent compilation cache, so this doubles as a cache
pre-warm for verify/bench. Exit 0 iff every program compiles.

Usage: PYTHONPATH=/root/repo python -u scripts/smoke_compile.py
"""

from __future__ import annotations

import dataclasses
import sys
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from robust_e2e_gan_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from __graft_entry__ import _flagship_config
from robust_e2e_gan_tpu.config import BeamSearchConfig, TrainConfig
from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, make_batch
from robust_e2e_gan_tpu.decode.beam import make_beam_searcher
from robust_e2e_gan_tpu.models.enhancement import Discriminator
from robust_e2e_gan_tpu.pipeline import RobustE2E, build_model
from robust_e2e_gan_tpu.train.steps import (
    init_train_state, make_joint_train_step,
)


def _abstract(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tree
    )


def _force_fused(jcfg):
    att = dataclasses.replace(jcfg.e2e.attention, score_impl="fused")
    dec = dataclasses.replace(jcfg.e2e.decoder, step_impl="fused")
    enc = dataclasses.replace(jcfg.e2e.encoder, lstm_impl="tiled")
    enh = dataclasses.replace(jcfg.enhancer, lstm_impl="tiled")
    return dataclasses.replace(
        jcfg,
        e2e=dataclasses.replace(jcfg.e2e, attention=att, decoder=dec,
                                encoder=enc),
        enhancer=enh,
    )


def serve_program(jcfg, batch_size, scfg, bcfg):
    """Lowerable (fn, abstract_args) for the fused beam-search program."""
    jcfg = _force_fused(jcfg)
    model = build_model(jcfg)
    rng = np.random.default_rng(0)
    seg = int(scfg.tone_ms * scfg.sample_rate / 1000.0)
    batch = make_batch(2, scfg, rng, ignore_id=-1,
                       pad_to_samples=scfg.max_tokens * seg)
    wav2 = jnp.asarray(batch["noisy_wav"])
    lens2 = jnp.asarray(batch["wav_lengths"])
    labels2 = jnp.asarray(batch["labels"])
    params = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), wav2, lens2, labels2,
            use_enhancer=True, method=RobustE2E.asr_forward,
        )
    )["params"]
    searcher = make_beam_searcher(model, jcfg.e2e, bcfg, use_enhancer=True)
    fn = jax.jit(lambda p, w, l: searcher(p, w, l).lengths)
    t = wav2.shape[1]
    args = (
        params,
        jax.ShapeDtypeStruct((batch_size, t), jnp.float32),
        jax.ShapeDtypeStruct((batch_size,), jnp.int32),
    )
    return fn, args


def case_serve_bench():
    vocab = 52
    jcfg = dataclasses.replace(_flagship_config(vocab),
                               compute_dtype="bfloat16")
    bcfg = BeamSearchConfig(beam_size=8, ctc_weight=0.3, max_steps=48,
                            early_exit=False, prefix_impl="tiled")
    scfg = SyntheticConfig(vocab_size=vocab, min_tokens=48, max_tokens=58)
    return serve_program(jcfg, 128, scfg, bcfg)


def case_serve_verify():
    from scripts.verify_drive import JCFG, SCFG
    bcfg = BeamSearchConfig(beam_size=4, ctc_weight=0.3, max_steps=10,
                            prefix_impl="tiled")
    return serve_program(JCFG, 16, SCFG, bcfg)


def case_train_fused():
    vocab = 52
    jcfg = dataclasses.replace(
        _flagship_config(vocab), compute_dtype="bfloat16"
    )
    jcfg = dataclasses.replace(
        jcfg,
        e2e=dataclasses.replace(
            jcfg.e2e,
            encoder=dataclasses.replace(jcfg.e2e.encoder, lstm_impl="fused"),
            ctc_impl="fused",
        ),
        enhancer=dataclasses.replace(jcfg.enhancer, lstm_impl="fused"),
    )
    model = build_model(jcfg)
    disc = Discriminator(jcfg.discriminator)
    tcfg = TrainConfig(optimizer="adadelta")
    rng = np.random.default_rng(0)
    scfg = SyntheticConfig(vocab_size=vocab, min_tokens=20, max_tokens=24)
    seg = int(scfg.tone_ms * scfg.sample_rate / 1000.0)
    pad = scfg.max_tokens * seg
    small = {
        k: jnp.asarray(v)
        for k, v in make_batch(2, scfg, rng, ignore_id=-1,
                               pad_to_samples=pad).items()
    }
    state, opt_g, opt_d = init_train_state(model, disc, tcfg, small, seed=0)
    step = make_joint_train_step(model, disc, jcfg, opt_g, opt_d,
                                 with_asr=True)
    big = _abstract({
        k: jax.ShapeDtypeStruct((32,) + tuple(np.shape(v)[1:]),
                                jnp.result_type(v))
        for k, v in small.items()
    })
    fn = step if hasattr(step, "lower") else jax.jit(step)
    return fn, (state, big)


def case_lm_fused():
    from robust_e2e_gan_tpu.models.lm import LMConfig, RNNLM

    lmc = LMConfig(vocab_size=52, embed_dim=256, hidden_dim=512,
                   step_impl="fused")
    lm = RNNLM(lmc)
    params = jax.eval_shape(
        lambda: lm.init(jax.random.PRNGKey(0), jnp.zeros((2, 4), jnp.int32))
    )
    n = 128 * 8  # bench-shape token lanes (B*K)
    fn = jax.jit(
        lambda p, h, c, t: lm.apply(p, (h, c), t, method=RNNLM.step)
    )
    args = (
        params,
        jax.ShapeDtypeStruct((1, n, 512), jnp.float32),
        jax.ShapeDtypeStruct((1, n, 512), jnp.float32),
        jax.ShapeDtypeStruct((n,), jnp.int32),
    )
    return fn, args


CASES = [
    ("serve_bench_fused", case_serve_bench),
    ("serve_verify_fused", case_serve_verify),
    ("train_flagship_fused", case_train_fused),
    ("lm_step_fused", case_lm_fused),
]


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    failed = []
    for name, build in CASES:
        t0 = time.perf_counter()
        try:
            fn, args = build()
            fn.lower(*args).compile()
            print(f"SMOKE PASS {name} ({time.perf_counter() - t0:.1f}s)",
                  flush=True)
        except Exception:
            print(f"SMOKE FAIL {name} ({time.perf_counter() - t0:.1f}s)",
                  flush=True)
            traceback.print_exc()
            failed.append(name)
    if failed:
        print("SMOKE COMPILE FAIL:", ", ".join(failed))
        sys.exit(1)
    print("SMOKE COMPILE PASS (all fused kernels lower + compile)")


if __name__ == "__main__":
    main()
