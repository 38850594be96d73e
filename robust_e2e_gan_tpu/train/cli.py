"""Training CLI: clean-ASR pretrain / GAN pretrain / joint adversarial.

Reference parity: SURVEY.md L4 — the reference exposes per-regime train
scripts configured by pix2pix-style argparse option classes, with options
saved into the experiment dir. Here one CLI drives all three regimes
(``--mode asr|gan|joint``), flags override the frozen-dataclass config tree
(config.py), and the resolved config is serialized into the checkpoint dir.

Usage (CHiME-4-style data prepped as jsonl manifests or Kaldi scp):

  python -m robust_e2e_gan_tpu.train.cli --mode asr \
      --train-manifest data/train.jsonl --dev-manifest data/dev.jsonl \
      --ckpt-dir exp/asr_clean

  python -m robust_e2e_gan_tpu.train.cli --mode joint \
      --train-manifest data/train.jsonl --init-from exp/asr_clean \
      --ckpt-dir exp/joint --mesh-data 8

  python -m robust_e2e_gan_tpu.train.cli --mode joint --synthetic \
      --ckpt-dir /tmp/exp_demo --epochs 2      # no-corpus smoke run
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np

from robust_e2e_gan_tpu import config as cfg_lib
from robust_e2e_gan_tpu.config import (
    AttentionConfig,
    DecoderConfig,
    DiscriminatorConfig,
    E2EConfig,
    EncoderConfig,
    EnhancerConfig,
    FrontendConfig,
    JointConfig,
    TrainConfig,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=("asr", "gan", "joint", "lm"),
                   default="joint")
    # data
    p.add_argument("--train-manifest", help="jsonl manifest (data/dataset.py)")
    p.add_argument("--dev-manifest")
    p.add_argument("--train-noisy-scp", help="Kaldi scp of noisy waveforms")
    p.add_argument("--train-clean-scp")
    p.add_argument("--train-feats-scp",
                   help="Kaldi feats.scp of PRECOMPUTED features (with "
                        "--train-text; --mode asr only — the enhancer needs "
                        "waveforms). --length-buckets are then frame counts.")
    p.add_argument("--train-text")
    p.add_argument("--index-cache",
                   help="persist probed utterance lengths to this path; "
                        "reused while the scp fingerprint matches, making "
                        "repeat dataset builds O(one file read)")
    p.add_argument("--utt2num-frames",
                   help="Kaldi utt2num_frames map; skips even the header "
                        "probe when building the feats.scp index")
    p.add_argument("--feats-kind",
                   choices=("mel", "spectrogram", "log-spectrogram"),
                   default="mel",
                   help="what --train-feats-scp contains: 'mel' = offline "
                        "log-mel (ASR-only, no enhancer), 'spectrogram' = "
                        "linear power spectra at n_fft//2+1 dims, "
                        "'log-spectrogram' = Kaldi compute-spectrogram-"
                        "feats log power. Spectrogram kinds route through "
                        "the enhancer, so --mode gan/joint work on "
                        "precomputed inputs (with --train-clean-feats-scp)")
    p.add_argument("--train-clean-feats-scp",
                   help="clean spectrogram feats paired by utt key "
                        "(required for --mode gan/joint with a "
                        "spectrogram --feats-kind)")
    p.add_argument("--synthetic", action="store_true",
                   help="use the built-in synthetic learnable task")
    p.add_argument("--synthetic-utts", type=int, default=512)
    # model dims (reference option-class equivalents)
    p.add_argument("--n-mels", type=int, default=80)
    p.add_argument("--enc-layers", type=int, default=3)
    p.add_argument("--enc-hidden", type=int, default=512)
    p.add_argument("--enc-proj", type=int, default=512)
    p.add_argument("--att-dim", type=int, default=512)
    p.add_argument("--dec-hidden", type=int, default=512)
    p.add_argument("--dec-embed", type=int, default=512)
    p.add_argument("--enh-layers", type=int, default=2)
    p.add_argument("--enh-hidden", type=int, default=512)
    p.add_argument("--mtlalpha", type=float, default=0.5)
    p.add_argument("--label-smoothing", type=float, default=0.0)
    p.add_argument("--lambda-adv", type=float, default=1.0)
    p.add_argument("--mu-enh", type=float, default=1.0)
    p.add_argument("--compute-dtype", choices=("float32", "bfloat16"),
                   default="float32")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint BLSTM layers (HBM vs recompute)")
    p.add_argument("--scan-unroll", type=int, default=4,
                   help="LSTM scan unroll for TRAINING models (v5e-tuned "
                        "default 4; decode rebuilds with 1)")
    p.add_argument("--gate-storage", choices=("f32", "compute"),
                   default="f32",
                   help="storage dtype of the BLSTM scans' hoisted gate "
                        "projections — 'compute' halves the backward's "
                        "dominant HBM residual under --compute-dtype "
                        "bfloat16 (v5e numbers in BASELINE.md)")
    p.add_argument("--lstm-impl", choices=("auto", "scan", "fused"),
                   default="auto",
                   help="BLSTM frame-loop impl for TRAINING: 'fused' uses "
                        "the differentiable Pallas forward+backward "
                        "kernels (ops/blstm_train_pallas.py) on layers "
                        "that fit the VMEM budget, scan elsewhere. "
                        "'auto' (default) = fused on TPU (on-chip A/B: "
                        "flagship joint step 25.0 vs 36.1 ms, "
                        "results/r4_hw/bench_train.log; grads gated vs "
                        "scan at HIGHEST precision by "
                        "scripts/verify_fused.py), scan on other "
                        "backends")
    p.add_argument("--cmvn",
                   choices=("utterance", "global", "speaker", "none"),
                   default="utterance")
    p.add_argument("--fused-frontend", action="store_true",
                   help="fused Pallas fbank kernel on enhancer-free paths "
                        "(clean-ASR pretrain fwd+bwd, no-enhancer decode)")
    p.add_argument("--cmvn-ark",
                   help="Kaldi CMVN stats ark: global stats for --cmvn "
                        "global, speaker-keyed for --cmvn speaker "
                        "(data/cmvn.py layout)")
    p.add_argument("--utt2spk",
                   help="Kaldi utt2spk map (required for --cmvn speaker)")
    # optimization
    p.add_argument("--optimizer", choices=("adadelta", "adam"),
                   default="adadelta")
    p.add_argument("--lr", type=float, default=1.0)
    p.add_argument("--warmup-steps", type=int, default=0,
                   help="linear LR warmup steps (adam only; 0 = constant). "
                        "Needed for >10M-param configs — a cold 1e-3 adam "
                        "step destabilizes the deep BLSTM stacks")
    p.add_argument("--grad-clip", type=float, default=5.0)
    p.add_argument("--eps-decay", type=float, default=0.01)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--max-label-len", type=int, default=128)
    p.add_argument("--length-buckets", default="32000,64000,112000,160000")
    # infra
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--init-from", help="warm-start params from this ckpt dir")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--mesh-data", type=int, default=0,
                   help="data-parallel mesh size (0 = single device)")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--save-every-steps", type=int, default=0,
                   help="mid-epoch checkpoint every N steps (preemption "
                        "safety net; 0 = per-epoch only)")
    p.add_argument("--prefetch-depth", type=int, default=2,
                   help="host batch-prefetch queue depth")
    return p


def configs_from_args(args, vocab_size: int):
    # TRAIN-side "auto": the BLSTM config knob's own "auto" means the
    # forward-only tiled kernel (serving); for training it must resolve
    # here instead — fused custom-VJP kernels on TPU (the measured
    # winner), differentiable scan elsewhere (CPU Pallas = interpret
    # mode, far too slow to be a default).
    if args.lstm_impl == "auto":
        import jax

        args.lstm_impl = ("fused" if jax.default_backend() == "tpu"
                          else "scan")
    jcfg = JointConfig(
        e2e=E2EConfig(
            frontend=FrontendConfig(n_mels=args.n_mels, cmvn=args.cmvn,
                                    fused=args.fused_frontend),
            encoder=EncoderConfig(
                input_dim=args.n_mels, num_layers=args.enc_layers,
                hidden_dim=args.enc_hidden, proj_dim=args.enc_proj,
                remat=args.remat, scan_unroll=args.scan_unroll,
                gate_storage=args.gate_storage,
                lstm_impl=args.lstm_impl,
            ),
            attention=AttentionConfig(dim=args.att_dim),
            decoder=DecoderConfig(
                vocab_size=vocab_size, embed_dim=args.dec_embed,
                hidden_dim=args.dec_hidden,
                label_smoothing=args.label_smoothing,
                scan_unroll=args.scan_unroll,
            ),
            mtlalpha=args.mtlalpha,
        ),
        enhancer=EnhancerConfig(
            num_layers=args.enh_layers, hidden_dim=args.enh_hidden,
            remat=args.remat, scan_unroll=args.scan_unroll,
            gate_storage=args.gate_storage,
            lstm_impl=args.lstm_impl,
        ),
        discriminator=DiscriminatorConfig(input_dim=args.n_mels),
        lambda_adv=args.lambda_adv,
        mu_enh=args.mu_enh,
        compute_dtype=args.compute_dtype,
    )
    tcfg = TrainConfig(
        optimizer=args.optimizer, learning_rate=args.lr,
        warmup_steps=args.warmup_steps,
        grad_clip=args.grad_clip, eps_decay=args.eps_decay,
        batch_size=args.batch_size, num_epochs=args.epochs,
        seed=args.seed, max_label_len=args.max_label_len,
        length_buckets=tuple(
            int(x) for x in args.length_buckets.split(",") if x
        ),
        checkpoint_dir=args.ckpt_dir, log_every=args.log_every,
    )
    return jcfg, tcfg


def _synthetic_factories(args):
    from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, make_batch

    scfg = SyntheticConfig(seed=args.seed)
    steps = max(args.synthetic_utts // args.batch_size, 1)

    def train_batches():
        rng = np.random.default_rng(args.seed)
        for _ in range(steps):
            yield make_batch(args.batch_size, scfg, rng, ignore_id=-1)

    def dev_batches():
        rng = np.random.default_rng(args.seed + 1)
        for _ in range(max(steps // 8, 1)):
            yield make_batch(args.batch_size, scfg, rng, ignore_id=-1)

    return train_batches, dev_batches, scfg.vocab_size, None


def _corpus_factories(args):
    from robust_e2e_gan_tpu.data.dataset import AudioTextDataset, BucketBatcher

    if args.train_manifest:
        train_ds = AudioTextDataset.from_jsonl(args.train_manifest)
    elif args.train_feats_scp and args.train_text:
        spec = args.feats_kind != "mel"
        if args.mode != "asr" and not spec:
            raise SystemExit(
                "--train-feats-scp with --feats-kind mel supports --mode "
                "asr only (offline log-mel discarded the linear spectrum "
                "the enhancer needs); use --feats-kind spectrogram for "
                "gan/joint on precomputed inputs"
            )
        if args.mode in ("gan", "joint") and not args.train_clean_feats_scp:
            raise SystemExit(
                "--mode gan/joint on spectrogram feats needs paired clean "
                "spectra: --train-clean-feats-scp"
            )
        train_ds = AudioTextDataset.from_kaldi_feats(
            args.train_feats_scp, args.train_text,
            utt2num_frames=args.utt2num_frames,
            clean_scp=args.train_clean_feats_scp,
            index_cache=args.index_cache,
        )
    elif args.train_noisy_scp and args.train_text:
        train_ds = AudioTextDataset.from_kaldi(
            args.train_noisy_scp, args.train_text, args.train_clean_scp,
            index_cache=args.index_cache,
        )
    else:
        raise SystemExit(
            "need --train-manifest, --train-noisy-scp/--train-text, "
            "--train-feats-scp/--train-text, or --synthetic"
        )
    tok = train_ds.tokenizer
    buckets = tuple(int(x) for x in args.length_buckets.split(",") if x)

    speaker_cmvn = None
    if args.cmvn == "speaker":
        if not (args.cmvn_ark and args.utt2spk):
            raise SystemExit("--cmvn speaker requires --cmvn-ark (speaker-"
                             "keyed) and --utt2spk")
        from robust_e2e_gan_tpu.data.cmvn import SpeakerCmvn

        speaker_cmvn = SpeakerCmvn.load(args.cmvn_ark, args.utt2spk)

    # one batcher shared across epochs: its rng advances every .epoch()
    # call, so batch order reshuffles per epoch like the reference loop
    train_batcher = BucketBatcher(
        train_ds, args.batch_size, buckets, args.max_label_len,
        seed=args.seed, speaker_cmvn=speaker_cmvn,
    )

    def train_batches():
        return train_batcher.epoch(shuffle=True)

    dev_batches = None
    if args.dev_manifest:
        dev_ds = AudioTextDataset.from_jsonl(args.dev_manifest, tokenizer=tok)
        dev_batcher = BucketBatcher(
            dev_ds, args.batch_size, buckets, args.max_label_len,
            speaker_cmvn=speaker_cmvn,
        )

        def dev_batches():
            return dev_batcher.epoch(shuffle=False)

    return train_batches, dev_batches, tok.vocab_size, tok


def _lm_main(args) -> None:
    """--mode lm: train the shallow-fusion RNNLM on transcripts only
    (no audio I/O; the reference lineage's lm_train.py equivalent)."""
    from robust_e2e_gan_tpu.models.lm import LMConfig
    from robust_e2e_gan_tpu.train.lm import train_lm

    rng = np.random.default_rng(args.seed)
    if args.synthetic:
        from robust_e2e_gan_tpu.data.synthetic import (
            SyntheticConfig, sample_transcript,
        )

        scfg = SyntheticConfig(seed=args.seed)
        vocab, tok = scfg.vocab_size, None
        width = scfg.max_label_len
        steps = max(args.synthetic_utts // args.batch_size, 1)

        def label_batches():
            for _ in range(steps):
                ys = np.full((args.batch_size, width), -1, np.int32)
                for i in range(args.batch_size):
                    t = sample_transcript(scfg, rng)
                    ys[i, : len(t)] = t
                yield ys
    else:
        from robust_e2e_gan_tpu.data.dataset import AudioTextDataset

        ds = AudioTextDataset.from_jsonl(args.train_manifest)
        tok = ds.tokenizer
        vocab = tok.vocab_size
        encoded = [
            np.asarray(tok.encode(u.text)[: args.max_label_len], np.int32)
            for u in ds.utts
        ]

        def label_batches():
            order = rng.permutation(len(encoded))
            for s in range(0, len(order), args.batch_size):
                idxs = order[s : s + args.batch_size]
                ys = np.full(
                    (len(idxs), args.max_label_len), -1, np.int32
                )
                for j, i in enumerate(idxs):
                    ys[j, : len(encoded[i])] = encoded[i]
                yield ys

    lmcfg = LMConfig(
        vocab_size=vocab, embed_dim=args.dec_embed,
        hidden_dim=args.dec_hidden,
    )
    tcfg = TrainConfig(
        optimizer=args.optimizer, learning_rate=args.lr,
        warmup_steps=args.warmup_steps,
        grad_clip=args.grad_clip, batch_size=args.batch_size,
        num_epochs=args.epochs, seed=args.seed,
        max_label_len=args.max_label_len, checkpoint_dir=args.ckpt_dir,
        log_every=args.log_every,
    )
    os.makedirs(args.ckpt_dir, exist_ok=True)
    cfg_lib.save_config(
        {"lm": cfg_lib.to_dict(lmcfg), "train": cfg_lib.to_dict(tcfg),
         "mode": "lm"},
        os.path.join(args.ckpt_dir, "config.json"),
    )
    if tok is not None:
        tok.save(os.path.join(args.ckpt_dir, "tokenizer.json"))
    train_lm(lmcfg, tcfg, label_batches, log_dir=args.ckpt_dir,
             resume=not args.no_resume)


def _input_kind(args) -> str:
    if not args.train_feats_scp:
        return "wav"
    return "feats" if args.feats_kind == "mel" else "spec"


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
    if args.mode == "lm":
        _lm_main(args)
        return
    if args.synthetic:
        train_b, dev_b, vocab, tok = _synthetic_factories(args)
    else:
        train_b, dev_b, vocab, tok = _corpus_factories(args)

    jcfg, tcfg = configs_from_args(args, vocab)
    os.makedirs(args.ckpt_dir, exist_ok=True)
    cfg_lib.save_config(
        {"joint": cfg_lib.to_dict(jcfg), "train": cfg_lib.to_dict(tcfg),
         "mode": args.mode,
         "input_kind": _input_kind(args),
         "spec_log_domain": args.feats_kind == "log-spectrogram"},
        os.path.join(args.ckpt_dir, "config.json"),
    )
    if tok is not None:
        tok.save(os.path.join(args.ckpt_dir, "tokenizer.json"))

    cmvn_stats = None
    if args.cmvn == "global":
        if not args.cmvn_ark:
            raise SystemExit("--cmvn global requires --cmvn-ark")
        from robust_e2e_gan_tpu.data.cmvn import (
            load_cmvn_ark, stats_to_mean_inv_std,
        )
        import shutil

        cmvn_stats = stats_to_mean_inv_std(load_cmvn_ark(args.cmvn_ark))
        shutil.copy(args.cmvn_ark, os.path.join(args.ckpt_dir, "cmvn.ark"))
    elif args.cmvn == "speaker":
        import shutil

        # speaker-keyed stats travel with the experiment so decode can
        # reload them (decode/cli.py --utt2spk)
        shutil.copy(args.cmvn_ark, os.path.join(args.ckpt_dir, "cmvn.ark"))

    mesh = None
    if args.mesh_data > 1:
        from robust_e2e_gan_tpu.parallel import make_mesh
        from robust_e2e_gan_tpu.parallel.sharding import set_kernel_mesh

        mesh = make_mesh(args.mesh_data, 1)
        # Pallas kernel call sites shard_map over this mesh (XLA cannot
        # partition a pallas_call and would otherwise all-gather)
        set_kernel_mesh(mesh)

    from robust_e2e_gan_tpu.train.loop import train

    train(
        jcfg, tcfg, train_b, dev_batches=dev_b, mode=args.mode, mesh=mesh,
        log_dir=args.ckpt_dir, resume=not args.no_resume,
        init_from=args.init_from, cmvn_stats=cmvn_stats,
        input_kind=_input_kind(args),
        log_domain=args.feats_kind == "log-spectrogram",
        save_every_steps=args.save_every_steps,
        prefetch_depth=args.prefetch_depth,
    )


if __name__ == "__main__":
    main()
