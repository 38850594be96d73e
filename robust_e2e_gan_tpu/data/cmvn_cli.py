"""compute-cmvn-stats equivalent: produce cmvn.ark from a dataset.

Reference parity: the reference's recipes ran Kaldi ``compute-cmvn-stats``
(optionally ``--spk2utt`` for per-speaker stats) over feats.scp during data
prep (SURVEY.md L0, section 2b "Kaldi compute-cmvn-stats / apply-cmvn").
The train/decode CLIs here consume the resulting ark (``--cmvn-ark``); this
CLI produces it so the full workflow runs without Kaldi binaries.

Sources:
  --feats-scp   precomputed Kaldi feature matrices (the reference's case) —
                accumulated directly on host, streaming, O(1) memory.
  --wav-scp     Kaldi waveform vectors — features are computed with the SAME
                on-device fbank chain the training pipeline uses
                (ops/fbank.py, cmvn disabled), so the stats match what the
                model will see bit-for-bit.
  --manifest    jsonl manifest (data/dataset.py schema) of .npy waveforms.

With ``--utt2spk`` the output ark holds one Kaldi (2, D+1) stats matrix per
speaker (apply-cmvn --utt2spk layout consumed by data/cmvn.py::SpeakerCmvn);
otherwise a single "global" key (data/cmvn.py::load_cmvn_ark).

Usage:
  python -m robust_e2e_gan_tpu.data.cmvn_cli --feats-scp feats.scp \
      --out cmvn.ark [--utt2spk utt2spk]
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from robust_e2e_gan_tpu.config import FrontendConfig
from robust_e2e_gan_tpu.data import kaldi_io
from robust_e2e_gan_tpu.data.cmvn import CmvnAccumulator
from robust_e2e_gan_tpu.data.dataset import _read_kv_file

# Pad waveforms up to a multiple of this many samples before the jitted
# fbank call so the number of distinct compiled shapes stays O(max_len /
# bucket) instead of O(utterances).
_WAV_BUCKET = 16000


def _iter_feats_scp(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    yield from kaldi_io.read_mat_scp(path)


def _make_fbank_fn(cfg: FrontendConfig):
    import jax
    import jax.numpy as jnp

    from robust_e2e_gan_tpu.ops import fbank as fbank_ops

    @jax.jit
    def run(wav: jnp.ndarray, wav_len: jnp.ndarray):
        feats, mask = fbank_ops.fbank(
            wav[None, :], cfg, wav_lengths=wav_len[None], cmvn="none"
        )
        return feats[0], mask[0]

    return run


def _iter_feats_from_wavs(
    wavs: Iterator[Tuple[str, np.ndarray]], cfg: FrontendConfig
) -> Iterator[Tuple[str, np.ndarray]]:
    """Run the on-device frontend per utterance, masked, bucketed padding."""
    run = _make_fbank_fn(cfg)
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


def _iter_manifest_wavs(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    root = os.path.dirname(os.path.abspath(path))
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            p = d["noisy"]
            if not os.path.isabs(p):
                p = os.path.join(root, p)
            yield d["utt_id"], np.load(p).astype(np.float32).reshape(-1)


def compute_stats(
    feats_iter: Iterator[Tuple[str, np.ndarray]],
    utt2spk: Optional[Dict[str, str]] = None,
) -> Dict[str, np.ndarray]:
    """Accumulate -> {key: Kaldi (2, D+1) stats}; key 'global' or speakers."""
    accs: Dict[str, CmvnAccumulator] = {}
    n_utts = 0
    skipped = 0
    for utt_id, feats in feats_iter:
        if utt2spk is not None:
            spk = utt2spk.get(utt_id)
            if spk is None:
                skipped += 1
                continue
        else:
            spk = "global"
        acc = accs.get(spk)
        if acc is None:
            acc = accs[spk] = CmvnAccumulator(feats.shape[1])
        acc.add(feats)
        n_utts += 1
    if not accs:
        raise SystemExit("no utterances accumulated (empty source?)")
    if skipped:
        print(f"warning: {skipped} utterances missing from utt2spk, skipped")
    print(
        f"accumulated {n_utts} utterances into {len(accs)} stats "
        f"key(s), dim {next(iter(accs.values())).sum.shape[0]}"
    )
    return {k: acc.stats() for k, acc in sorted(accs.items())}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        description="Compute Kaldi-layout CMVN stats (compute-cmvn-stats "
        "equivalent) for --cmvn-ark consumption by the train/decode CLIs."
    )
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--feats-scp", help="precomputed Kaldi feature scp")
    src.add_argument("--wav-scp", help="Kaldi waveform scp (on-device fbank)")
    src.add_argument("--manifest", help="jsonl manifest of .npy waveforms")
    p.add_argument("--out", required=True, help="output cmvn ark path")
    p.add_argument("--utt2spk",
                   help="per-speaker stats keyed by this utt->spk map "
                        "(compute-cmvn-stats --spk2utt equivalent)")
    p.add_argument("--n-mels", type=int, default=80,
                   help="frontend mel bins for waveform sources")
    args = p.parse_args(argv)

    if args.feats_scp:
        feats_iter = _iter_feats_scp(args.feats_scp)
    else:
        cfg = FrontendConfig(n_mels=args.n_mels)
        wavs = (
            _iter_manifest_wavs(args.manifest)
            if args.manifest
            else kaldi_io.read_mat_scp(args.wav_scp)
        )
        feats_iter = _iter_feats_from_wavs(wavs, cfg)

    utt2spk = _read_kv_file(args.utt2spk) if args.utt2spk else None
    stats = compute_stats(feats_iter, utt2spk)

    tmp = args.out + ".tmp"
    with open(tmp, "wb") as f:
        for key, mat in stats.items():
            kaldi_io.write_mat(f, key, mat)
    os.replace(tmp, args.out)
    print(f"wrote {len(stats)} stats matrices to {args.out}")


if __name__ == "__main__":
    main()
