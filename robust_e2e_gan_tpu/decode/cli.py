"""Decode + scoring CLI: batched beam search over a dataset, WER/CER report.

Reference parity: SURVEY.md L5 and call stack 3.2 — the reference's decode
script loads checkpoints, runs enhancer -> ASR beam search per utterance
(batch=1, host loop), writes hypothesis text, and scores WER with
Kaldi/sclite. Here whole batches decode in one compiled program (enhancer ->
fused fbank -> encoder -> batched joint CTC/attention beam search,
decode/beam.py) and scoring uses the native edit-distance kernel
(csrc/editdistance.cpp).

  python -m robust_e2e_gan_tpu.decode.cli \
      --manifest data/eval.jsonl --ckpt-dir exp/joint \
      --out exp/joint/decode_eval
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from robust_e2e_gan_tpu import config as cfg_lib
from robust_e2e_gan_tpu.config import BeamSearchConfig, JointConfig, TrainConfig
from robust_e2e_gan_tpu.data.dataset import (
    AudioTextDataset,
    BucketBatcher,
    CharTokenizer,
    load_tokenizer,
)
from robust_e2e_gan_tpu.decode.beam import (
    make_beam_searcher, pipelined_default, serving_schedule_default,
)
from robust_e2e_gan_tpu.models.enhancement import Discriminator
from robust_e2e_gan_tpu.ops.ctc import ctc_greedy_decode
from robust_e2e_gan_tpu.ops.editdistance import score_texts, wer_details
from robust_e2e_gan_tpu.pipeline import RobustE2E, build_model
from robust_e2e_gan_tpu.train.steps import init_train_state
from robust_e2e_gan_tpu.utils import checkpoint as ckpt_lib


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manifest", help="jsonl manifest")
    p.add_argument("--noisy-scp", help="Kaldi scp of waveforms (with --text)")
    p.add_argument("--feats-scp",
                   help="Kaldi feats.scp of PRECOMPUTED features (with "
                        "--text); requires an experiment trained with "
                        "--train-feats-scp. --length-buckets are frames.")
    p.add_argument("--text", help="Kaldi text file (with --noisy-scp)")
    p.add_argument("--serving-impls", choices=("auto", "fused", "xla"),
                   default="auto",
                   help="serving kernel selection: 'auto' uses the fused "
                        "Pallas kernels on TPU, 'fused' forces them "
                        "(interpret mode off-TPU), 'xla' disables them "
                        "(operational escape hatch)")
    p.add_argument("--index-cache",
                   help="persist probed utterance lengths here (reused "
                        "while the scp fingerprint matches)")
    p.add_argument("--utt2num-frames",
                   help="Kaldi utt2num_frames map for --feats-scp (skips "
                        "the header probe at index build)")
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--which", choices=("best", "latest"), default="best")
    p.add_argument("--out", help="output dir (default: ckpt_dir/decode)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--beam-size", type=int, default=8)
    p.add_argument("--ctc-weight", type=float, default=0.3)
    p.add_argument("--penalty", type=float, default=0.0)
    p.add_argument("--max-steps", type=int, default=128)
    p.add_argument("--maxlen-ratio", type=float, default=0.0,
                   help="cap output length at ratio * encoded length")
    p.add_argument("--minlen-ratio", type=float, default=0.0)
    p.add_argument("--greedy", action="store_true",
                   help="greedy CTC decode instead of beam search")
    p.add_argument("--lm-dir",
                   help="RNNLM experiment dir (train --mode lm) for shallow "
                        "fusion")
    p.add_argument("--lm-weight", type=float, default=0.0)
    p.add_argument("--end-detect", action="store_true",
                   help="ESPnet-style end detection (stops utterances whose "
                        "recent ended hypotheses stopped improving)")
    p.add_argument("--no-early-exit", action="store_true",
                   help="always scan max_steps instead of exiting when all "
                        "hypotheses finish")
    p.add_argument("--no-enhancer", action="store_true",
                   help="decode raw noisy features (cascade-off baseline)")
    p.add_argument("--utt2spk",
                   help="Kaldi utt2spk map for per-speaker CMVN (the "
                        "experiment's cmvn mode must be 'speaker'; stats "
                        "come from <ckpt-dir>/cmvn.ark or --cmvn-ark)")
    p.add_argument("--cmvn-ark",
                   help="speaker-keyed CMVN stats ark (default: "
                        "<ckpt-dir>/cmvn.ark)")
    p.add_argument("--length-buckets", default="32000,64000,112000,160000")
    p.add_argument("--mesh-data", type=int, default=0,
                   help="data-parallel serving: shard each decode batch "
                        "over this many devices (0 = single device); "
                        "batch size must divide it")
    p.add_argument("--pipelined", choices=("auto", "on", "off", "chunked"),
                   default="auto",
                   help="serving schedule. on = cross-batch staged (batch "
                        "i's beam loop + batch i+1's encode in one "
                        "program); chunked = batch i+1's encode runs "
                        "INSIDE batch i's beam scan, one chunk per decode "
                        "step (wav input, utterance/none CMVN; disables "
                        "the early-exit loop — results stay token-"
                        "identical). auto = whichever schedule the "
                        "on-chip A/B (results/pipeline_ab.json) measured "
                        "fastest; greedy/--dump-attention paths stay "
                        "sequential")
    p.add_argument("--nbest", type=int, default=0,
                   help="also write the top-N beam hypotheses per utterance "
                        "to nbest.jsonl")
    p.add_argument("--dump-attention", action="store_true",
                   help="save teacher-forced attention maps (per-utterance "
                        ".npy under <out>/att) — the reference's attention "
                        "visualization")
    return p


def load_experiment(ckpt_dir: str, which: str = "best",
                    serving_impls: str = "auto"):
    """Rebuild (model, disc, params, tokenizer) from a training run's dir.

    serving_impls: "auto" (fused Pallas kernels on TPU), "fused" (force
    them, interpret mode off-TPU), or "xla" (pure-XLA serving — the
    operational escape hatch if a platform miscompiles a kernel).
    """
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        saved = json.load(f)
    jcfg = cfg_lib.from_dict(JointConfig, saved["joint"])
    # scan_unroll is a TRAIN-side speed knob (train CLI --scan-unroll,
    # default 4); decode measures ~9% faster with unroll 1, and parameters
    # are unroll-independent, so always rebuild for decode with the default.
    import dataclasses as _dc

    # serving impls: the BLSTM frame loops, attention step, decoder step
    # (and the beam's CTC-prefix kernels via make_beam_searcher's default)
    # all resolve their fused Pallas kernels from these knobs; parameters
    # are impl-independent.
    lstm = {"auto": "auto", "fused": "tiled", "xla": "scan"}[serving_impls]
    step = {"auto": "auto", "fused": "fused", "xla": "xla"}[serving_impls]
    jcfg = _dc.replace(
        jcfg,
        e2e=_dc.replace(
            jcfg.e2e,
            encoder=_dc.replace(
                jcfg.e2e.encoder, scan_unroll=0, lstm_impl=lstm,
                gate_storage="f32",  # decode is forward-only: keep exact
            ),
            decoder=_dc.replace(jcfg.e2e.decoder, scan_unroll=0,
                                step_impl=step),
            attention=_dc.replace(jcfg.e2e.attention, score_impl=step),
        ),
        enhancer=_dc.replace(
            jcfg.enhancer, scan_unroll=0, lstm_impl=lstm,
            gate_storage="f32",
        ),
    )
    input_kind = saved.get("input_kind", "wav")
    tok_path = os.path.join(ckpt_dir, "tokenizer.json")
    # load_tokenizer dispatches CharTokenizer vs TableTokenizer (imported
    # reference checkpoints carry the reference's own id table)
    tok = load_tokenizer(tok_path) if os.path.exists(tok_path) else None

    cmvn_stats = None
    cmvn_ark = os.path.join(ckpt_dir, "cmvn.ark")
    if jcfg.e2e.frontend.cmvn == "global" and os.path.exists(cmvn_ark):
        from robust_e2e_gan_tpu.data.cmvn import (
            load_cmvn_ark, stats_to_mean_inv_std,
        )

        cmvn_stats = stats_to_mean_inv_std(load_cmvn_ark(cmvn_ark))
    log_domain = bool(saved.get("spec_log_domain", False))
    model = build_model(jcfg, cmvn_stats=cmvn_stats)
    disc = Discriminator(jcfg.discriminator)
    # template state from a tiny synthetic batch, then restore
    from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, make_batch

    rng = np.random.default_rng(0)
    scfg = SyntheticConfig(vocab_size=jcfg.e2e.decoder.vocab_size)
    sample = {
        k: jnp.asarray(v)
        for k, v in make_batch(2, scfg, rng, ignore_id=-1).items()
    }
    if input_kind == "feats":
        # feats-mode experiments hold ASR-only params; the template state
        # must be built the same way for restore to match
        sample = {
            "feats": jnp.zeros((2, 16, jcfg.e2e.frontend.n_mels),
                               jnp.float32),
            "feat_lengths": jnp.asarray([16, 16], jnp.int32),
            "labels": sample["labels"],
        }
    elif input_kind == "spec":
        sample = {
            "feats": jnp.full((2, 16, jcfg.e2e.frontend.n_freqs), 0.1,
                              jnp.float32),
            "clean_feats": jnp.full((2, 16, jcfg.e2e.frontend.n_freqs), 0.1,
                                    jnp.float32),
            "feat_lengths": jnp.asarray([16, 16], jnp.int32),
            "labels": sample["labels"],
        }
    if jcfg.e2e.frontend.cmvn == "speaker":
        # template-only stats; real per-utterance stats ride each batch
        d = jcfg.e2e.frontend.n_mels
        sample["cmvn_mean"] = jnp.zeros((2, d), jnp.float32)
        sample["cmvn_inv_std"] = jnp.ones((2, d), jnp.float32)
    tcfg = cfg_lib.from_dict(TrainConfig, saved["train"])
    state, _, _ = init_train_state(
        model, disc, tcfg, sample, seed=0,
        input_kind=input_kind if input_kind == "spec" else None,
        log_domain=log_domain,
    )
    if which == "best" and not ckpt_lib.has_checkpoint(ckpt_dir, "best"):
        # runs without a dev set never record a 'best' entry
        print("no 'best' checkpoint (no dev metric); using 'latest'")
        which = "latest"
    state, step = ckpt_lib.restore_checkpoint(ckpt_dir, state, which)
    return model, disc, state, jcfg, tok, step, input_kind, log_domain


def main(argv: Optional[list] = None) -> None:
    # the ambient kernel-mesh registration is process-global; clear it on
    # every exit path so in-process callers (tests, libraries) that invoke
    # main() don't inherit a stale mesh in later traces
    try:
        _main(argv)
    finally:
        from robust_e2e_gan_tpu.parallel.sharding import set_kernel_mesh

        set_kernel_mesh(None)


def _main(argv: Optional[list] = None) -> None:
    args = build_parser().parse_args(argv)
    from robust_e2e_gan_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    (model, disc, state, jcfg, tok, step, input_kind,
     log_domain) = load_experiment(args.ckpt_dir, args.which,
                                   serving_impls=args.serving_impls)
    print(f"restored step {step} from {args.ckpt_dir} ({args.which})")

    if args.manifest:
        ds = AudioTextDataset.from_jsonl(args.manifest, tokenizer=tok)
    elif args.feats_scp and args.text:
        if input_kind not in ("feats", "spec"):
            raise SystemExit("--feats-scp needs an experiment trained "
                             "with --train-feats-scp")
        ds = AudioTextDataset.from_kaldi_feats(
            args.feats_scp, args.text, tokenizer=tok,
            utt2num_frames=args.utt2num_frames,
            index_cache=args.index_cache,
        )
    elif args.noisy_scp and args.text:
        ds = AudioTextDataset.from_kaldi(args.noisy_scp, args.text,
                                         tokenizer=tok,
                                         index_cache=args.index_cache)
    else:
        raise SystemExit(
            "need --manifest, --noisy-scp/--text, or --feats-scp/--text"
        )
    if input_kind in ("feats", "spec") and not args.feats_scp:
        raise SystemExit("this experiment was trained on precomputed "
                         "features; decode it with --feats-scp/--text")
    buckets = tuple(int(x) for x in args.length_buckets.split(",") if x)
    speaker_cmvn = None
    if jcfg.e2e.frontend.cmvn == "speaker":
        if not args.utt2spk:
            raise SystemExit("cmvn mode 'speaker' requires --utt2spk")
        from robust_e2e_gan_tpu.data.cmvn import SpeakerCmvn

        cmvn_ark = args.cmvn_ark or os.path.join(args.ckpt_dir, "cmvn.ark")
        speaker_cmvn = SpeakerCmvn.load(cmvn_ark, args.utt2spk)
    # pad_final: serving keeps one static batch shape end to end — a
    # ragged last batch would recompile AND can land on a pathological
    # tile shape (B=112 measured 1.6x slower than B=128 on chip)
    batcher = BucketBatcher(ds, args.batch_size, buckets,
                            speaker_cmvn=speaker_cmvn, pad_final=True)

    prefix_impl = {"auto": "auto", "fused": "tiled",
                   "xla": "twopass"}[args.serving_impls]
    bcfg = BeamSearchConfig(
        beam_size=args.beam_size, ctc_weight=args.ctc_weight,
        penalty=args.penalty, max_steps=args.max_steps,
        maxlen_ratio=args.maxlen_ratio, minlen_ratio=args.minlen_ratio,
        lm_weight=args.lm_weight, end_detect=args.end_detect,
        early_exit=not args.no_early_exit,
        prefix_impl=prefix_impl,
    )
    lm = lm_params = None
    if args.lm_dir and args.lm_weight != 0.0:
        from robust_e2e_gan_tpu.train.lm import load_lm

        lm, lm_params = load_lm(args.lm_dir)
        if args.serving_impls != "auto":
            import dataclasses as _dc

            from robust_e2e_gan_tpu.models.lm import RNNLM

            lm = RNNLM(
                _dc.replace(
                    lm.cfg,
                    step_impl={"fused": "fused", "xla": "xla"}[
                        args.serving_impls
                    ],
                ),
                dtype=lm.dtype,
            )
        print(f"RNNLM shallow fusion from {args.lm_dir} "
              f"(weight {args.lm_weight})")
    use_enh = not args.no_enhancer
    searcher = make_beam_searcher(model, jcfg.e2e, bcfg, use_enhancer=use_enh,
                                  lm=lm, lm_params=lm_params,
                                  input_kind=input_kind,
                                  log_domain=log_domain)

    @jax.jit
    def greedy_fn(params, wav, lens, cmvn_batch=None):
        if input_kind == "feats":
            hs, hmask, hlens, ctc_logits, _ = model.apply(
                {"params": params}, wav, lens, cmvn_batch=cmvn_batch,
                method=RobustE2E.encode_for_decode_feats,
            )
        elif input_kind == "spec":
            hs, hmask, hlens, ctc_logits, _ = model.apply(
                {"params": params}, wav, lens, use_enh,
                cmvn_batch=cmvn_batch, log_domain=log_domain,
                method=RobustE2E.encode_for_decode_spec,
            )
        else:
            hs, hmask, hlens, ctc_logits, _ = model.apply(
                {"params": params}, wav, lens, use_enh,
                cmvn_batch=cmvn_batch,
                method=RobustE2E.encode_for_decode,
            )
        return ctc_greedy_decode(ctc_logits, hlens, jcfg.e2e.blank_id)

    if args.dump_attention:
        from robust_e2e_gan_tpu.models.e2e import add_sos_eos

        @jax.jit
        def attention_fn(params, wav, lens, ys_pad, cmvn_batch=None):
            if input_kind == "feats":
                hs, hmask, hlens, _, _ = model.apply(
                    {"params": params}, wav, lens, cmvn_batch=cmvn_batch,
                    method=RobustE2E.encode_for_decode_feats,
                )
            elif input_kind == "spec":
                hs, hmask, hlens, _, _ = model.apply(
                    {"params": params}, wav, lens, use_enh,
                    cmvn_batch=cmvn_batch, log_domain=log_domain,
                    method=RobustE2E.encode_for_decode_spec,
                )
            else:
                hs, hmask, hlens, _, _ = model.apply(
                    {"params": params}, wav, lens, use_enh,
                    cmvn_batch=cmvn_batch,
                    method=RobustE2E.encode_for_decode,
                )
            ys_in, _, _ = add_sos_eos(
                ys_pad, jcfg.e2e.sos_id, jcfg.e2e.eos_id, jcfg.e2e.ignore_id
            )

            def run_dec(mdl, h, hm, y):
                return mdl.asr.decoder(h, hm, y)

            _, atts = model.apply(
                {"params": params}, hs, hmask, ys_in, method=run_dec
            )
            return atts, hlens

    mesh = None
    if args.mesh_data > 1:
        from robust_e2e_gan_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh_data, 1)
        from robust_e2e_gan_tpu.parallel.sharding import set_kernel_mesh

        # Pallas kernel call sites (BLSTM/attention/CTC-prefix/fbank)
        # shard_map over this mesh — XLA cannot partition a pallas_call
        # and would otherwise all-gather every sharded batch
        set_kernel_mesh(mesh)
        print(f"data-parallel decode over {args.mesh_data} devices")

    def to_device(arrs):
        # ragged final batches fall back to single-device placement
        if mesh is not None and arrs[0].shape[0] % args.mesh_data == 0:
            from robust_e2e_gan_tpu.parallel import shard_batch

            return shard_batch(dict(enumerate(arrs)), mesh).values()
        return [jnp.asarray(a) for a in arrs]

    out_dir = args.out or os.path.join(args.ckpt_dir, "decode")
    os.makedirs(out_dir, exist_ok=True)
    refs, hyps, lines, nbest_rows = [], [], [], []
    ref_texts, hyp_texts = [], []

    def prepped_batches():
        for batch in batcher.epoch(shuffle=False):
            if input_kind in ("feats", "spec"):
                wav, lens = to_device(
                    [batch["feats"], batch["feat_lengths"]]
                )
            else:
                wav, lens = to_device(
                    [batch["noisy_wav"], batch["wav_lengths"]]
                )
            cmvn_batch = (
                (jnp.asarray(batch["cmvn_mean"]),
                 jnp.asarray(batch["cmvn_inv_std"]))
                if "cmvn_mean" in batch else None
            )
            yield batch, wav, lens, cmvn_batch

    schedule = "sequential"
    if (not args.greedy and not args.dump_attention
            and args.pipelined != "off"):
        if args.pipelined in ("on", "chunked"):
            schedule = ("pipelined" if args.pipelined == "on"
                        else "chunked")
        else:  # auto: whichever the on-chip A/B measured fastest
            schedule = serving_schedule_default()
    if schedule == "chunked" and (
            input_kind != "wav"
            or jcfg.e2e.frontend.cmvn not in ("utterance", "global",
                                              "none")):
        # chunked staging needs the wav->encode chain and batch-free
        # CMVN; the staged schedule has the same contract as sequential
        print("chunked schedule unavailable for this input/CMVN mode; "
              "using cross-batch staged")
        schedule = ("pipelined" if pipelined_default()
                    or args.pipelined == "chunked" else "sequential")
    if schedule == "chunked":
        import dataclasses as _dc

        from robust_e2e_gan_tpu.decode.beam import (
            make_chunked_pipelined_beam_searcher,
        )

        # the chunked aux schedule needs the full max_steps scan;
        # early-exit is token-exact, so disabling it changes nothing
        # but the schedule
        bcfg_c = _dc.replace(bcfg, early_exit=False)
        pipe_run = make_chunked_pipelined_beam_searcher(
            model, jcfg.e2e, bcfg_c, use_enhancer=use_enh,
            lm=lm, lm_params=lm_params,
        )
        print("chunked serving schedule (encode inside the beam scan)")
    elif schedule == "pipelined":
        from robust_e2e_gan_tpu.decode.beam import (
            make_pipelined_beam_searcher,
        )

        pipe_run = make_pipelined_beam_searcher(
            model, jcfg.e2e, bcfg, use_enhancer=use_enh,
            lm=lm, lm_params=lm_params, input_kind=input_kind,
            log_domain=log_domain,
        )
        print("pipelined serving schedule (cross-batch staged)")
    if schedule in ("pipelined", "chunked"):

        def iter_results():
            metas = []

            def dev_stream():
                for batch, wav, lens, cmvn in prepped_batches():
                    metas.append(batch)
                    if schedule == "chunked":
                        yield wav, lens  # cmvn is None in these modes
                    else:
                        yield wav, lens, cmvn

            for i, res in enumerate(pipe_run(state.params_g,
                                             dev_stream())):
                batch, metas[i] = metas[i], None  # free host refs as we go
                yield batch, None, None, None, res
    else:

        def iter_results():
            for batch, wav, lens, cmvn in prepped_batches():
                res = (None if args.greedy
                       else searcher(state.params_g, wav, lens, cmvn))
                yield batch, wav, lens, cmvn, res

    for batch, wav, lens, cmvn_batch, res in iter_results():
        if args.greedy:
            toks = np.asarray(
                greedy_fn(state.params_g, wav, lens, cmvn_batch)
            )
            batch_hyps = [[int(x) for x in row if x != -1] for row in toks]
        else:
            toks = np.asarray(res.tokens)
            batch_hyps = [[int(x) for x in row if x != -1] for row in toks]
            if args.nbest > 0:
                bt = np.asarray(res.beam_tokens)
                bl = np.asarray(res.beam_lengths)
                bs = np.asarray(res.beam_scores)
                order = np.argsort(-bs, axis=1)
                for j, uid in enumerate(batch["utt_ids"]):
                    entries = []
                    for k in order[j][: args.nbest]:
                        htoks = [
                            int(x) for x in bt[j, k, : bl[j, k]] if x != -1
                        ]
                        entries.append({
                            "tokens": htoks,
                            "text": tok.decode(htoks) if tok else None,
                            "score": float(bs[j, k]),
                        })
                    nbest_rows.append({"utt_id": uid, "nbest": entries})
        if args.dump_attention:
            atts, hlens = attention_fn(
                state.params_g, wav, lens, jnp.asarray(batch["labels"]),
                cmvn_batch,
            )
            atts = np.asarray(atts)
            os.makedirs(os.path.join(out_dir, "att"), exist_ok=True)
            for j, uid in enumerate(batch["utt_ids"]):
                n_lab = int(np.sum(batch["labels"][j] != -1)) + 1
                np.save(
                    os.path.join(out_dir, "att", f"{uid}.npy"),
                    atts[j, :n_lab, : int(hlens[j])],
                )
        for uid, lab_row, hyp in zip(
            batch["utt_ids"], batch["labels"], batch_hyps
        ):
            ref = [int(x) for x in lab_row if x != -1]
            refs.append(ref)
            hyps.append(hyp)
            text = tok.decode(hyp) if tok else " ".join(map(str, hyp))
            ref_texts.append(tok.decode(ref) if tok else "")
            hyp_texts.append(text)
            lines.append(f"{uid} {text}")

    if nbest_rows:
        with open(os.path.join(out_dir, "nbest.jsonl"), "w") as f:
            f.write("\n".join(json.dumps(r) for r in nbest_rows) + "\n")

    with open(os.path.join(out_dir, "hyp.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    # token-level rate (round-1 behavior) + word-level WER and char-level
    # CER from the decoded text — the reference's end metric is word WER
    # (SURVEY.md L5/section 6)
    report = {"token": wer_details(refs, hyps)}
    if tok is not None:
        report.update(score_texts(ref_texts, hyp_texts))
    report["n_utts"] = len(refs)
    report["decoder"] = "greedy" if args.greedy else f"beam{args.beam_size}"
    with open(os.path.join(out_dir, "wer.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
