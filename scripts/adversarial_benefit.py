"""Demonstrate the paper's core claim on the synthetic task.

The reference's result (SURVEY.md provenance note: "joint adversarial
training improves WER over both noisy-input and cascade-enhancement
baselines") reproduced end-to-end through the public API on real hardware:

  1. clean-ASR pretrain (train script a) -> near-0 WER on clean audio,
     degraded WER on noisy audio decoded WITHOUT enhancement;
  2. CASCADE baseline: enhancement-GAN pretrained separately (train script
     b, ASR untouched), then the clean ASR decodes its output;
  3. joint adversarial fine-tune (train script c) -> noisy WER recovered
     through the jointly-learned enhancer (paper: beats both baselines).

Writes a JSON summary. Usage:
  PYTHONPATH=/root/repo python scripts/adversarial_benefit.py [steps_a] [steps_c]
"""

from __future__ import annotations

import dataclasses
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
    hard_task, labels_to_list, make_batch, split_words,
)
from robust_e2e_gan_tpu.decode.beam import make_beam_searcher
from robust_e2e_gan_tpu.models.enhancement import Discriminator
from robust_e2e_gan_tpu.ops.editdistance import wer_details
from robust_e2e_gan_tpu.pipeline import RobustE2E
from robust_e2e_gan_tpu.train.steps import (
    init_train_state, make_asr_pretrain_step, make_joint_train_step,
)

# the non-saturating hard task (round-3 v3): 32-token vocab, multi-word
# transcripts, per-token duration jitter, SNR mixed over [-3, +5] dB, plus
# reverberation + nonstationary babble + channel tilt (round-2 VERDICT #7)
SCFG = hard_task(vocab_size=32)
VOCAB = SCFG.vocab_size
JCFG = JointConfig(
    e2e=E2EConfig(
        frontend=FrontendConfig(n_mels=40),
        encoder=EncoderConfig(input_dim=40, vgg_channels=(8, 16), num_layers=1,
                              hidden_dim=96, proj_dim=96),
        attention=AttentionConfig(dim=64, conv_channels=8, conv_kernel=31),
        decoder=DecoderConfig(vocab_size=VOCAB, embed_dim=48, hidden_dim=96),
    ),
    enhancer=EnhancerConfig(input_dim=257, num_layers=2, hidden_dim=128),
    discriminator=DiscriminatorConfig(input_dim=40, channels=(8, 16)),
    mu_enh=3.0,
)
# Stage-(b) loss weights: a separately-trained enhancement frontend is
# MSE-dominant (the adversarial term against a winning D only distorts an
# enhancer that gets no ASR gradient); the joint stage keeps JCFG's weights.
JCFG_CASCADE = dataclasses.replace(JCFG, lambda_adv=0.1, mu_enh=10.0)
TCFG = TrainConfig(optimizer="adam", learning_rate=1e-3)
PAD_TO = SCFG.max_samples


def batches(rng, n, bs=16):
    for _ in range(n):
        yield {k: jnp.asarray(v) for k, v in
               make_batch(bs, SCFG, rng, pad_to_samples=PAD_TO,
                          ignore_id=-1).items()}


def decode_wer(model, params, eval_b, use_enhancer):
    bcfg = BeamSearchConfig(beam_size=4, ctc_weight=0.3,
                            max_steps=SCFG.max_label_len + 2)
    searcher = make_beam_searcher(model, JCFG.e2e, bcfg,
                                  use_enhancer=use_enhancer)
    res = searcher(params, jnp.asarray(eval_b["noisy_wav"]),
                   jnp.asarray(eval_b["wav_lengths"]))
    hyps = [[int(x) for x in row if x != -1] for row in np.asarray(res.tokens)]
    refs = labels_to_list(eval_b["labels"])
    return {
        "ter": wer_details(refs, hyps)["error_rate"],
        "wer": wer_details(
            [split_words(r, SCFG.space_id) for r in refs],
            [split_words(h, SCFG.space_id) for h in hyps],
        )["error_rate"],
    }


def main(steps_a=400, steps_c=400):
    print("backend:", jax.default_backend(), flush=True)
    model = RobustE2E(JCFG)
    disc = Discriminator(JCFG.discriminator)
    rng = np.random.default_rng(0)
    sample = next(batches(rng, 1))
    state, opt_g, opt_d = init_train_state(model, disc, TCFG, sample, seed=0)

    # ---- stage (a): clean-ASR pretrain
    step_a = make_asr_pretrain_step(model, opt_g, use_enhancer=False)
    for i, b in enumerate(batches(rng, steps_a)):
        state, m = step_a(state, b)
        if i % 100 == 0:
            print(f"[asr] step {i} acc={float(m['acc']):.3f}", flush=True)
    print(f"[asr] final acc={float(m['acc']):.3f}", flush=True)

    eval_rng = np.random.default_rng(999)
    eval_b = make_batch(64, SCFG, eval_rng, pad_to_samples=PAD_TO,
                        ignore_id=-1)
    wer_noisy_raw = decode_wer(model, state.params_g, eval_b,
                               use_enhancer=False)
    print(f"noisy WER, no enhancement (baseline): {wer_noisy_raw}",
          flush=True)

    # ---- stage (b): GAN-only pretrain -> cascade baseline
    # (with_asr=False: the G objective has no ASR term, so ASR grads are
    # exactly zero and the recognizer stays the clean-trained one). The
    # enhancer needs more optimization than the joint stage to be a fair
    # cascade baseline (the paper's cascade uses a fully-trained frontend),
    # so it gets 2x the steps.
    step_b = make_joint_train_step(model, disc, JCFG_CASCADE, opt_g, opt_d,
                                   with_asr=False)
    for i, b in enumerate(batches(rng, 2 * steps_c)):
        state, m = step_b(state, b)
        if i % 200 == 0:
            print(f"[gan] step {i} d={float(m['loss_d']):.3f} "
                  f"enh={float(m['loss_enh']):.3f}", flush=True)
    wer_cascade = decode_wer(model, state.params_g, eval_b,
                             use_enhancer=True)
    print(f"noisy WER, cascade (separate enhancer + clean ASR): "
          f"{wer_cascade}", flush=True)

    # ---- stage (c): joint adversarial fine-tune from (a)+(b)
    step_c = make_joint_train_step(model, disc, JCFG, opt_g, opt_d,
                                   with_asr=True)
    for i, b in enumerate(batches(rng, steps_c)):
        state, m = step_c(state, b)
        if i % 100 == 0:
            print(f"[joint] step {i} acc={float(m['acc']):.3f} "
                  f"d={float(m['loss_d']):.3f}", flush=True)
    wer_joint = decode_wer(model, state.params_g, eval_b, use_enhancer=True)
    print(f"noisy WER, joint adversarial enhancement: {wer_joint}",
          flush=True)

    summary = {
        "task": "hard_task v3 (vocab=32, words, jitter, SNR -3..+5 dB, "
                "reverb T60 0.25 s, 3-stream babble, channel tilt)",
        "noisy_wer_no_enhancement": round(wer_noisy_raw["wer"], 4),
        "noisy_wer_cascade_enhancement": round(wer_cascade["wer"], 4),
        "noisy_wer_joint_adversarial": round(wer_joint["wer"], 4),
        "token_error_rates": {
            "no_enhancement": round(wer_noisy_raw["ter"], 4),
            "cascade": round(wer_cascade["ter"], 4),
            "joint": round(wer_joint["ter"], 4),
        },
        "relative_improvement": round(
            1.0 - wer_joint["wer"] / max(wer_noisy_raw["wer"], 1e-9), 4
        ),
        "steps": {"asr_pretrain": steps_a, "joint": steps_c},
        "snr_range_db": list(SCFG.snr_range_db),
        "reverb_t60": SCFG.reverb_t60,
        "babble_streams": SCFG.babble_streams,
        "channel_tilt": SCFG.channel_tilt,
    }
    print(json.dumps(summary))
    import os
    os.makedirs("results", exist_ok=True)
    with open("results/adversarial_benefit.json", "w") as f:
        json.dump(summary, f, indent=2)
    assert wer_joint["wer"] < wer_noisy_raw["wer"], summary
    print("ADVERSARIAL BENEFIT CONFIRMED")


if __name__ == "__main__":
    a = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    main(a, c)
