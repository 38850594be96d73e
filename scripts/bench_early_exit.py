"""Measure the beam-search early-exit latency win on short utterances.

Round-1 VERDICT #5's done-criterion: host-oracle equivalence (tested) AND a
measured latency cut at B=128 on short utterances. Early exit only helps
once hypotheses actually emit eos, so the model is first trained briefly on
the synthetic task; decode then runs with a deliberately generous
max_steps=48 while transcripts need only ~4-8 tokens — the while_loop
should stop after ~10 steps instead of always scanning 48.

  PYTHONPATH=/root/repo python scripts/bench_early_exit.py [train_steps]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from robust_e2e_gan_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from robust_e2e_gan_tpu.config import (
    AttentionConfig, BeamSearchConfig, DecoderConfig, DiscriminatorConfig,
    E2EConfig, EncoderConfig, EnhancerConfig, FrontendConfig, JointConfig,
    TrainConfig,
)
from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, make_batch
from robust_e2e_gan_tpu.decode.beam import make_beam_searcher
from robust_e2e_gan_tpu.models.enhancement import Discriminator
from robust_e2e_gan_tpu.pipeline import RobustE2E
from robust_e2e_gan_tpu.train.steps import (
    init_train_state, make_asr_pretrain_step,
)

VOCAB = 12
JCFG = JointConfig(
    e2e=E2EConfig(
        frontend=FrontendConfig(n_mels=40),
        encoder=EncoderConfig(input_dim=40, vgg_channels=(8, 16),
                              num_layers=1, hidden_dim=64, proj_dim=64),
        attention=AttentionConfig(dim=48, conv_channels=8, conv_kernel=31),
        decoder=DecoderConfig(vocab_size=VOCAB, embed_dim=32, hidden_dim=64),
    ),
    enhancer=EnhancerConfig(input_dim=257, num_layers=1, hidden_dim=64),
    discriminator=DiscriminatorConfig(input_dim=40, channels=(8, 16)),
)
SCFG = SyntheticConfig(vocab_size=VOCAB, min_tokens=4, max_tokens=8,
                       noise_snr_db=10.0)
SEG = int(SCFG.tone_ms * SCFG.sample_rate / 1000.0)
PAD_TO = SCFG.max_tokens * SEG
B = 128


def timed(fn, secs=4.0, chunk=4):
    np.asarray(fn())
    t0, n = time.perf_counter(), 0
    while time.perf_counter() - t0 < secs:
        out = None
        for _ in range(chunk):
            out = fn()
        np.asarray(out)
        n += chunk
    return (time.perf_counter() - t0) / n * 1000.0


def main(train_steps=400):
    print("backend:", jax.default_backend(), flush=True)
    model = RobustE2E(JCFG)
    disc = Discriminator(JCFG.discriminator)
    tcfg = TrainConfig(optimizer="adam", learning_rate=1e-3)
    rng = np.random.default_rng(0)
    sample = {k: jnp.asarray(v) for k, v in
              make_batch(16, SCFG, rng, pad_to_samples=PAD_TO,
                         ignore_id=-1).items()}
    state, opt_g, _ = init_train_state(model, disc, tcfg, sample, seed=0)
    step = make_asr_pretrain_step(model, opt_g, use_enhancer=False)
    for i in range(train_steps):
        b = {k: jnp.asarray(v) for k, v in
             make_batch(16, SCFG, rng, pad_to_samples=PAD_TO,
                        ignore_id=-1).items()}
        state, m = step(state, b)
    print(f"[asr] final acc={float(m['acc']):.3f}", flush=True)

    eval_b = make_batch(B, SCFG, np.random.default_rng(99),
                        pad_to_samples=PAD_TO, ignore_id=-1)
    wav = jnp.asarray(eval_b["clean_wav"])
    lens = jnp.asarray(eval_b["wav_lengths"])

    results = {}
    res_ref = None
    for mode, kw in (
        ("full_scan", dict(early_exit=False)),
        ("early_exit", dict(early_exit=True)),
        ("early_exit+end_detect", dict(early_exit=True, end_detect=True)),
    ):
        bcfg = BeamSearchConfig(beam_size=8, ctc_weight=0.3, max_steps=48,
                                **kw)
        searcher = make_beam_searcher(model, JCFG.e2e, bcfg,
                                      use_enhancer=False)
        res = searcher(state.params_g, wav, lens)
        ms = timed(lambda: searcher(state.params_g, wav, lens).lengths)
        results[mode] = {"ms_per_batch": round(ms, 2),
                         "utt_per_s": round(B * 1000 / ms, 1)}
        if res_ref is None:
            res_ref = np.asarray(res.tokens)
        else:
            results[mode]["tokens_match_full_scan"] = bool(
                np.array_equal(res_ref, np.asarray(res.tokens))
            )
        print(mode, results[mode], flush=True)

    summary = {
        "config": "B=128 beam 8, max_steps=48, ~4-8 token utterances",
        "results": results,
        "speedup_early_exit": round(
            results["full_scan"]["ms_per_batch"]
            / results["early_exit"]["ms_per_batch"], 2
        ),
    }
    print(json.dumps(summary))
    import os
    os.makedirs("results", exist_ok=True)
    with open("results/early_exit.json", "w") as f:
        json.dump(summary, f, indent=2)
    assert results["early_exit"]["tokens_match_full_scan"]


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400)
