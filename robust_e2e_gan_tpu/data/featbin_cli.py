"""Kaldi featbin equivalents: offline feature extraction and feats copying.

Reference parity: the reference's data prep ran Kaldi's featbin binaries
(SURVEY.md section 2b "Kaldi (featbin, compute-cmvn-stats, copy-feats,
scoring)") to produce the feats.scp its loaders consumed. cmvn_cli.py and
score_cli.py already cover compute-cmvn-stats and scoring; this module
closes the remaining two surfaces so a full Kaldi-free data prep exists:

  fbank       compute-fbank-feats / compute-spectrogram-feats equivalent —
              wav.scp (Kaldi waveform vectors) or a jsonl manifest of .npy
              waveforms -> feats ark(+scp), using the SAME on-device
              frontend as training (ops/fbank.py, no CMVN: Kaldi featbin
              writes raw features; normalization happens downstream via
              apply-cmvn / --cmvn-ark). --feats-kind spectrogram writes
              log power spectra at n_fft//2+1 dims, the input the
              precomputed-spectrogram enhancement path consumes
              (pipeline.joint_forward_spec, log_domain=True).
  copy-feats  stream feature matrices ark/scp -> ark(+scp), optionally
              re-encoding to Kaldi CompressedMatrix CM/CM2/CM3 (the
              copy-feats --compress workflow that shrinks disk feats).

Usage:
  python -m robust_e2e_gan_tpu fbank --wav-scp wav.scp \
      --out-ark feats.ark --out-scp feats.scp [--feats-kind spectrogram]
  python -m robust_e2e_gan_tpu copy-feats --feats-scp in.scp \
      --out-ark out.ark --out-scp out.scp --compress 1
"""

from __future__ import annotations

import argparse
from typing import Iterator, Tuple

import numpy as np

from robust_e2e_gan_tpu.config import FrontendConfig
from robust_e2e_gan_tpu.data import kaldi_io
from robust_e2e_gan_tpu.data.cmvn_cli import (
    _iter_manifest_wavs,
    _WAV_BUCKET,
)


def _make_frontend_fn(cfg: FrontendConfig, kind: str):
    """jitted (padded wav, true len) -> (feats, frame mask); no CMVN."""
    import jax
    import jax.numpy as jnp

    from robust_e2e_gan_tpu.ops import fbank as fbank_ops

    @jax.jit
    def run(wav: jnp.ndarray, wav_len: jnp.ndarray):
        if kind == "fbank":
            feats, mask = fbank_ops.fbank(
                wav[None, :], cfg, wav_lengths=wav_len[None], cmvn="none"
            )
            return feats[0], mask[0]
        # Kaldi compute-spectrogram-feats ships LOG power spectra; the
        # spec consumers invert this (pipeline._spec_mask log_domain).
        power = fbank_ops.stft_power(wav[None, :], cfg)
        feats = jnp.log(jnp.maximum(power, cfg.log_floor))
        t = feats.shape[-2]
        n_valid = fbank_ops.frame_lengths_from_wav_lengths(
            wav_len[None], cfg
        )
        mask = (
            jnp.arange(t, dtype=jnp.int32)[None, :] < n_valid[:, None]
        ).astype(feats.dtype)
        return feats[0], mask[0]

    return run


def _extract_iter(
    wavs: Iterator[Tuple[str, np.ndarray]], cfg: FrontendConfig, kind: str
) -> Iterator[Tuple[str, np.ndarray]]:
    """Per-utterance frontend with bucketed padding (bounded compile count)."""
    run = _make_frontend_fn(cfg, kind)
    for key, mat in wavs:
        wav = np.asarray(mat, np.float32).reshape(-1)
        n = wav.shape[0]
        pad = -n % _WAV_BUCKET
        if pad:
            wav = np.pad(wav, (0, pad))
        feats, mask = run(wav, np.int32(n))
        feats = np.asarray(feats)
        valid = np.asarray(mask) > 0
        yield key, feats[valid]


def main_fbank(argv=None) -> None:
    p = argparse.ArgumentParser(
        description="Offline feature extraction (Kaldi compute-fbank-feats / "
        "compute-spectrogram-feats equivalent) with the training frontend."
    )
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--wav-scp", help="Kaldi waveform scp")
    src.add_argument("--manifest", help="jsonl manifest of .npy waveforms")
    p.add_argument("--out-ark", required=True, help="output feature ark")
    p.add_argument("--out-scp", help="matching scp to write")
    p.add_argument(
        "--feats-kind", choices=("fbank", "spectrogram"), default="fbank",
        help="fbank: log-mel (no CMVN, apply downstream); spectrogram: log "
        "power spectra at n_fft//2+1 dims for the enhancement-capable "
        "precomputed path (train CLI --feats-kind spectrogram)",
    )
    p.add_argument("--n-mels", type=int, default=80)
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument(
        "--compress", type=int, choices=(0, 1, 2, 3), default=0,
        help="0: float32; 1/2/3: Kaldi CompressedMatrix CM/CM2/CM3",
    )
    args = p.parse_args(argv)

    cfg = FrontendConfig(n_mels=args.n_mels, sample_rate=args.sample_rate)
    wavs = (
        _iter_manifest_wavs(args.manifest)
        if args.manifest
        else kaldi_io.read_mat_scp(args.wav_scp)
    )
    n = kaldi_io.write_ark_scp(
        _extract_iter(wavs, cfg, args.feats_kind),
        args.out_ark, args.out_scp, compress=args.compress, atomic=True,
    )
    dim = cfg.n_mels if args.feats_kind == "fbank" else cfg.n_freqs
    print(
        f"extracted {n} {args.feats_kind} matrices (dim {dim}) "
        f"to {args.out_ark}"
    )


def main_copy(argv=None) -> None:
    p = argparse.ArgumentParser(
        description="Copy/re-encode feature matrices (Kaldi copy-feats "
        "equivalent): ark/scp in, ark(+scp) out, optional compression."
    )
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--feats-scp", help="input feature scp")
    src.add_argument("--feats-ark", help="input feature ark (sequential)")
    p.add_argument("--out-ark", required=True)
    p.add_argument("--out-scp")
    p.add_argument(
        "--compress", type=int, choices=(0, 1, 2, 3), default=0,
        help="0: float32; 1/2/3: Kaldi CompressedMatrix CM/CM2/CM3",
    )
    args = p.parse_args(argv)

    entries = (
        kaldi_io.read_mat_scp(args.feats_scp)
        if args.feats_scp
        else kaldi_io.read_mat_ark(args.feats_ark)
    )
    n = kaldi_io.write_ark_scp(entries, args.out_ark, args.out_scp,
                               compress=args.compress, atomic=True)
    print(f"copied {n} matrices to {args.out_ark}")


if __name__ == "__main__":
    main_fbank()
