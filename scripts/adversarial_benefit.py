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
from robust_e2e_gan_tpu.ops.editdistance import bootstrap_wer_ci, wer_details
from robust_e2e_gan_tpu.pipeline import RobustE2E
from robust_e2e_gan_tpu.train.steps import (
    init_train_state, make_asr_pretrain_step, make_joint_train_step,
)

# the non-saturating hard task (round-3 v3): 32-token vocab, multi-word
# transcripts, per-token duration jitter, SNR mixed over [-3, +5] dB, plus
# reverberation + nonstationary babble + channel tilt (round-2 VERDICT #7)
SCFG = hard_task(vocab_size=32)
VOCAB = SCFG.vocab_size


def jcfg_for(scale: str) -> JointConfig:
    """"toy" = the fast CI-sized config; "reference" = the SURVEY.md 2a
    dims (3x512 BLSTMP encoder, 512 attention/decoder, 2x512 enhancer,
    80 mels) — the round-3 VERDICT asked for the paper-claim protocol at
    the scale the reference actually ran."""
    if scale == "reference":
        return JointConfig(
            e2e=E2EConfig(
                frontend=FrontendConfig(n_mels=80),
                encoder=EncoderConfig(input_dim=80, vgg_channels=(64, 128),
                                      num_layers=3, hidden_dim=512,
                                      proj_dim=512, scan_unroll=4),
                attention=AttentionConfig(dim=512, conv_channels=10,
                                          conv_kernel=201),
                decoder=DecoderConfig(vocab_size=VOCAB, embed_dim=512,
                                      hidden_dim=512),
            ),
            enhancer=EnhancerConfig(input_dim=257, num_layers=2,
                                    hidden_dim=512, scan_unroll=4),
            discriminator=DiscriminatorConfig(input_dim=80,
                                              channels=(32, 64, 128)),
            mu_enh=3.0,
            compute_dtype="bfloat16",
        )
    return JointConfig(
        e2e=E2EConfig(
            frontend=FrontendConfig(n_mels=40),
            encoder=EncoderConfig(input_dim=40, vgg_channels=(8, 16),
                                  num_layers=1, hidden_dim=96, proj_dim=96),
            attention=AttentionConfig(dim=64, conv_channels=8,
                                      conv_kernel=31),
            decoder=DecoderConfig(vocab_size=VOCAB, embed_dim=48,
                                  hidden_dim=96),
        ),
        enhancer=EnhancerConfig(input_dim=257, num_layers=2, hidden_dim=128),
        discriminator=DiscriminatorConfig(input_dim=40, channels=(8, 16)),
        mu_enh=3.0,
    )


# Default optimization recipe (toy scale). The reference-scale (36M-param)
# config needs the gentler recipe measured in round 4: the first on-chip
# run at Adam 1e-3 / bs=16 plateaued at acc~0.35 (results/r4_hw/
# adv_benefit_ref.log) — classic cold-high-LR stall of deep BLSTM stacks —
# so the stage-4 rerun passes --lr 3e-4 --warmup 600 --bs 32.
TCFG = TrainConfig(optimizer="adam", learning_rate=1e-3)
PAD_TO = SCFG.max_samples


def batches(rng, n, bs=16, skip_first=0, synth_skipped=True):
    """Synthetic batch stream. The first ``skip_first`` batches are
    yielded as None without the device transfer; with
    ``synth_skipped=True`` they are still synthesized so the rng stream
    advances bit-identically on resume. When the checkpoint carried the
    exact rng bit-generator state (``rng_state`` in extra), the caller
    restores it directly and passes ``synth_skipped=False`` — the
    fast-forward then costs nothing (4400 skipped batches of the
    reference-scale run otherwise resynthesize for ~17 min on this
    1-CPU host)."""
    for i in range(n):
        if i < skip_first:
            if synth_skipped:
                make_batch(bs, SCFG, rng, pad_to_samples=PAD_TO,
                           ignore_id=-1)
            yield None
        else:
            b = make_batch(bs, SCFG, rng, pad_to_samples=PAD_TO,
                           ignore_id=-1)
            yield {k: jnp.asarray(v) for k, v in b.items()}


def decode_wer(model, jcfg, params, eval_b, use_enhancer,
               lm=None, lm_params=None, lm_weight=0.0):
    bcfg = BeamSearchConfig(beam_size=4, ctc_weight=0.3,
                            max_steps=SCFG.max_label_len + 2,
                            lm_weight=lm_weight)
    searcher = make_beam_searcher(model, jcfg.e2e, bcfg,
                                  use_enhancer=use_enhancer,
                                  lm=lm, lm_params=lm_params)
    res = searcher(params, jnp.asarray(eval_b["noisy_wav"]),
                   jnp.asarray(eval_b["wav_lengths"]))
    hyps = [[int(x) for x in row if x != -1] for row in np.asarray(res.tokens)]
    refs = labels_to_list(eval_b["labels"])
    ref_w = [split_words(r, SCFG.space_id) for r in refs]
    hyp_w = [split_words(h, SCFG.space_id) for h in hyps]
    word_stats = wer_details(ref_w, hyp_w)
    ci = bootstrap_wer_ci(ref_w, hyp_w, n_resamples=1000)
    return {
        "ter": wer_details(refs, hyps)["error_rate"],
        "wer": word_stats["error_rate"],
        "ref_words": int(word_stats["ref_tokens"]),
        # 95% utterance-resampled bootstrap CI on the word WER — the eval
        # sets are small (64-192 utts), so ordering claims need intervals
        "wer_ci95": [round(ci["ci_low"], 4), round(ci["ci_high"], 4)],
    }


def train_char_lm(rng, steps=600, bs=64, seed=0):
    """Char RNNLM on the task's transcript distribution (shallow fusion)."""
    from robust_e2e_gan_tpu.data.synthetic import sample_transcript
    from robust_e2e_gan_tpu.models.lm import LMConfig, RNNLM
    from robust_e2e_gan_tpu.train.lm import init_lm_state, make_lm_train_step

    lmc = LMConfig(vocab_size=VOCAB, embed_dim=64, hidden_dim=256)
    lm = RNNLM(lmc)
    state, opt = init_lm_state(lm, TCFG, seed=seed)
    step = make_lm_train_step(lm, opt)

    def labels_batch():
        ys = np.full((bs, SCFG.max_label_len), -1, np.int32)
        for i in range(bs):
            toks = sample_transcript(SCFG, rng)
            ys[i, : len(toks)] = toks
        return ys

    for i in range(steps):
        state, m = step(state, jnp.asarray(labels_batch()))
    print(f"[lm] {steps} steps, ppl={float(m['ppl']):.2f}", flush=True)
    return lm, state.params, float(m["ppl"])


def main(steps_a=400, steps_c=400, scale="toy", with_lm=False,
         lr=1e-3, warmup=0, bs=16, eval_utts=64, ckpt_dir=None,
         save_every=500, out=None, seed=0, optimizer="adam"):
    print(f"backend: {jax.default_backend()} scale={scale} "
          f"lr={lr} warmup={warmup} bs={bs} eval_utts={eval_utts} "
          f"ckpt_dir={ckpt_dir} seed={seed} optimizer={optimizer}",
          flush=True)
    tcfg = dataclasses.replace(TCFG, optimizer=optimizer, learning_rate=lr,
                               warmup_steps=warmup, batch_size=bs)
    jcfg = jcfg_for(scale)
    # Stage-(b) loss weights: a separately-trained enhancement frontend is
    # MSE-dominant (the adversarial term against a winning D only distorts
    # an enhancer that gets no ASR gradient); the joint stage keeps jcfg's.
    jcfg_cascade = dataclasses.replace(jcfg, lambda_adv=0.1, mu_enh=10.0)
    model = RobustE2E(jcfg)
    disc = Discriminator(jcfg.discriminator)
    rng = np.random.default_rng(seed)
    sample = next(batches(rng, 1, bs=bs))
    state, opt_g, opt_d = init_train_state(model, disc, tcfg, sample,
                                           seed=seed)
    # Fast-forward correctness on resume depends on every value that shapes
    # the rng stream, stage boundaries, param tree, or eval-set identity;
    # stored in the checkpoint `extra` and validated at restore.
    run_args = {"bs": bs, "steps_a": steps_a, "steps_c": steps_c,
                "scale": scale, "eval_utts": eval_utts, "lr": lr,
                "warmup": warmup, "seed": seed, "optimizer": optimizer}

    # ---- resume support (the long reference-scale runs ride a preemptible
    # tunnel; a VM restart must cost at most `save_every` steps, not the
    # whole run). Checkpoints go through the framework's own atomic
    # best+latest writer; the per-stage WERs already measured are persisted
    # in a sidecar partial JSON so finished stages never re-decode. The
    # data stream stays bit-identical across resumes because skipped
    # batches still consume the same np.random.Generator draws.
    done_global = -1
    partial = {}
    partial_path = None
    rng_restored = False
    if ckpt_dir:
        from robust_e2e_gan_tpu.utils.checkpoint import (
            has_checkpoint, read_extra, restore_checkpoint, save_checkpoint,
        )
        import os as _o

        partial_path = _o.path.join(ckpt_dir, "partial_results.json")
        if has_checkpoint(ckpt_dir):
            state, done_step = restore_checkpoint(ckpt_dir, state)
            extra = read_extra(ckpt_dir)
            # save() records step=gstep+1 ("steps done") with
            # extra.global_step=gstep ("last completed index"); if extra
            # were ever absent the fallback must use the same convention.
            done_global = int(extra.get("global_step", done_step - 1))
            saved_args = extra.get("run_args")
            if saved_args is not None and saved_args != run_args:
                diff = {k: (saved_args.get(k), run_args[k])
                        for k in run_args if saved_args.get(k) != run_args[k]}
                raise SystemExit(
                    f"[resume] relaunch args differ from the checkpointed "
                    f"run (ckpt vs now): {diff} — resuming would silently "
                    f"fast-forward against a different data stream/stage "
                    f"layout. Relaunch with the original args or use a "
                    f"fresh --ckpt-dir.")
            if saved_args is None:
                print("[resume] WARNING: checkpoint predates run-arg "
                      "recording; cannot validate relaunch args match",
                      flush=True)
            if "rng_state" in extra:
                # exact bit-generator state: fast-forward costs nothing
                rng.bit_generator.state = extra["rng_state"]
                rng_restored = True
                print("[resume] rng state restored (skipping batch "
                      "resynthesis)", flush=True)
            if _o.path.exists(partial_path):
                try:
                    with open(partial_path) as f:
                        partial = json.load(f)
                except (json.JSONDecodeError, ValueError):
                    # a preemption mid-write of the pre-atomic era could
                    # leave truncated JSON; treat as empty, re-decode
                    print("[resume] WARNING: corrupt partial_results.json; "
                          "ignoring (stages will re-decode)", flush=True)
                    partial = {}
            print(f"[resume] restored global step {done_global}, "
                  f"stages done: {sorted(partial)}", flush=True)

    gstep = 0  # global step across stages a, b, c

    def run_stage(tag, step_fn, n_steps, log_every, fmt):
        """Run (or fast-forward) one training stage; returns last metrics."""
        nonlocal state, gstep
        m = None
        skip = min(max(done_global + 1 - gstep, 0), n_steps)
        for i, b in enumerate(batches(rng, n_steps, bs=bs, skip_first=skip,
                                      synth_skipped=not rng_restored)):
            if b is not None:
                state, m = step_fn(state, b)
                if i % log_every == 0:
                    print(f"[{tag}] step {i} " + fmt(m), flush=True)
                if ckpt_dir and (gstep + 1) % save_every == 0:
                    save_checkpoint(
                        ckpt_dir, state, gstep + 1, keep=1,
                        extra={"global_step": gstep,
                               "run_args": run_args,
                               # exact generator position: the next
                               # resume restores it and skips resynthesis
                               "rng_state": rng.bit_generator.state})
            gstep += 1
        return m

    def stage_eval(key, fn, label):
        """Decode-and-score once per run; resumed runs reuse the record."""
        if key in partial:
            print(f"{label} (resumed): {partial[key]}", flush=True)
            return partial[key]
        out = fn()
        print(f"{label}: {out}", flush=True)
        partial[key] = out
        if partial_path:
            # atomic (mkstemp + os.replace, same pattern as _save_hosted):
            # a preemption mid-write must not corrupt the resume sidecar
            import tempfile as _tf

            fd, tmp = _tf.mkstemp(dir=_os.path.dirname(partial_path),
                                  suffix=".tmp")
            with _os.fdopen(fd, "w") as f:
                json.dump(partial, f)
            _os.replace(tmp, partial_path)
        return out

    # ---- stage (a): clean-ASR pretrain
    step_a = make_asr_pretrain_step(model, opt_g, use_enhancer=False)
    m = run_stage("asr", step_a, steps_a, 100,
                  lambda m: f"acc={float(m['acc']):.3f}")
    if m is not None:
        print(f"[asr] final acc={float(m['acc']):.3f}", flush=True)

    # eval set is deliberately seed-INDEPENDENT (fixed rng 999): multi-seed
    # replication varies init + train stream while scoring on the identical
    # utterances, so across-seed WER spread measures training variance only
    eval_rng = np.random.default_rng(999)
    eval_b = make_batch(eval_utts, SCFG, eval_rng, pad_to_samples=PAD_TO,
                        ignore_id=-1)
    wer_noisy_raw = stage_eval(
        "noisy_raw",
        lambda: decode_wer(model, jcfg, state.params_g, eval_b,
                           use_enhancer=False),
        "noisy WER, no enhancement (baseline)")

    # ---- stage (b): GAN-only pretrain -> cascade baseline
    # (with_asr=False: the G objective has no ASR term, so ASR grads are
    # exactly zero and the recognizer stays the clean-trained one). The
    # enhancer needs more optimization than the joint stage to be a fair
    # cascade baseline (the paper's cascade uses a fully-trained frontend),
    # so it gets 2x the steps.
    step_b = make_joint_train_step(model, disc, jcfg_cascade, opt_g, opt_d,
                                   with_asr=False)
    run_stage("gan", step_b, 2 * steps_c, 200,
              lambda m: (f"d={float(m['loss_d']):.3f} "
                         f"enh={float(m['loss_enh']):.3f}"))
    wer_cascade = stage_eval(
        "cascade",
        lambda: decode_wer(model, jcfg, state.params_g, eval_b,
                           use_enhancer=True),
        "noisy WER, cascade (separate enhancer + clean ASR)")

    # ---- stage (c): joint adversarial fine-tune from (a)+(b)
    step_c = make_joint_train_step(model, disc, jcfg, opt_g, opt_d,
                                   with_asr=True)
    run_stage("joint", step_c, steps_c, 100,
              lambda m: (f"acc={float(m['acc']):.3f} "
                         f"d={float(m['loss_d']):.3f}"))
    wer_joint = stage_eval(
        "joint",
        lambda: decode_wer(model, jcfg, state.params_g, eval_b,
                           use_enhancer=True),
        "noisy WER, joint adversarial enhancement")

    wer_joint_lm, lm_ppl = None, None
    if with_lm:
        lm, lm_params, lm_ppl = train_char_lm(rng, seed=seed)
        wer_joint_lm = decode_wer(model, jcfg, state.params_g, eval_b,
                                  use_enhancer=True, lm=lm,
                                  lm_params=lm_params, lm_weight=0.3)
        print(f"noisy WER, joint + LM shallow fusion (0.3): {wer_joint_lm}",
              flush=True)

    n_params = sum(
        int(np.prod(np.shape(x)))
        for x in jax.tree_util.tree_leaves(state.params_g)
    )
    summary = {
        "task": "hard_task v3 (vocab=32, words, jitter, SNR -3..+5 dB, "
                "reverb T60 0.25 s, 3-stream babble, channel tilt)",
        "scale": scale,
        "model_params_m": round(n_params / 1e6, 1),
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
        "recipe": {"optimizer": optimizer, "lr": lr, "warmup_steps": warmup,
                   "batch_size": bs, "seed": seed},
        "eval_set": {"utterances": int(eval_b["labels"].shape[0]),
                     "ref_words": wer_joint.get("ref_words")},
        "snr_range_db": list(SCFG.snr_range_db),
        "reverb_t60": SCFG.reverb_t60,
        "babble_streams": SCFG.babble_streams,
        "channel_tilt": SCFG.channel_tilt,
    }
    if wer_joint_lm is not None:
        summary["noisy_wer_joint_plus_lm"] = round(wer_joint_lm["wer"], 4)
        summary["lm_ppl"] = round(lm_ppl, 2)
    print(json.dumps(summary))
    import os
    os.makedirs("results", exist_ok=True)
    if out is None:
        # default artifact names are the RECORDED results — smoke-test
        # invocations must pass --out to avoid clobbering them
        out = ("results/adversarial_benefit.json" if scale == "toy"
               else f"results/adversarial_benefit_{scale}.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    assert wer_joint["wer"] < wer_noisy_raw["wer"], summary
    print("ADVERSARIAL BENEFIT CONFIRMED")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("steps_a", nargs="?", type=int, default=400)
    ap.add_argument("steps_c", nargs="?", type=int, default=400)
    ap.add_argument("--scale", choices=("toy", "reference"), default="toy")
    ap.add_argument("--lm", action="store_true",
                    help="also decode with char-RNNLM shallow fusion")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--warmup", type=int, default=0,
                    help="linear LR warmup steps (adam)")
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--eval-utts", type=int, default=64,
                    help="eval-set size (utterances); larger tightens the "
                         "WER confidence interval")
    ap.add_argument("--ckpt-dir", default=None,
                    help="checkpoint/resume directory: periodic atomic "
                         "saves + per-stage WER records, so a preempted "
                         "run restarts where it left off")
    ap.add_argument("--save-every", type=int, default=500,
                    help="checkpoint period in train steps (with --ckpt-dir)")
    ap.add_argument("--out", default=None,
                    help="summary JSON path (default: the recorded "
                         "results/adversarial_benefit*.json artifact)")
    ap.add_argument("--seed", type=int, default=0,
                    help="seed for param init + train data stream (the "
                         "eval set stays fixed so WERs compare across "
                         "seeds)")
    ap.add_argument("--optimizer", choices=("adam", "adadelta"),
                    default="adam",
                    help="adadelta = the reference's own recipe "
                         "(SURVEY 2a: Adadelta, grad-clip, eps-decay)")
    args = ap.parse_args()
    main(args.steps_a, args.steps_c, scale=args.scale, with_lm=args.lm,
         lr=args.lr, warmup=args.warmup, bs=args.bs,
         eval_utts=args.eval_utts, ckpt_dir=args.ckpt_dir,
         save_every=args.save_every, out=args.out, seed=args.seed,
         optimizer=args.optimizer)
