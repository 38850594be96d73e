"""Host data-pipeline throughput: can the loader outrun the device?

The jitted train step consumes ~950 utt/s/chip at B=32 (BASELINE.md), and
decode serving >2000 utt/s — the host loader (index build + collate + pad
+ optional C++ batch readers, overlapped by the Prefetcher) must sustain
more than that per process or the accelerator starves. This measures, on
a generated on-disk corpus, for each source kind the framework accepts
(SURVEY.md call stack 3.5):

  jsonl + .npy waveform files   (native C++ threaded npy batch loader)
  Kaldi wav.scp/ark + text      (python per-utterance ark reads)
  Kaldi feats.scp (CM2) + text  (native C++ threaded ark reader + decompress)

Reports dataset-construction time (O(header) index) and sustained collate
utt/s with and without the Prefetcher. Pure host — runs on any backend.
Writes results/loader.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from robust_e2e_gan_tpu.data import kaldi_io
from robust_e2e_gan_tpu.data.dataset import (
    AudioTextDataset, BucketBatcher, Prefetcher,
)

N_UTTS = int(os.environ.get("BENCH_LOADER_UTTS", "2000"))
BATCH = 32
BUCKETS = (16000, 32000, 48000)
ALPHABET = "abcdefghij"


def _make_corpus(root: str):
    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)
    utts = []
    for i in range(N_UTTS):
        n = int(rng.integers(8000, 48001))
        wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
        text = "".join(rng.choice(list(ALPHABET), size=8))
        utts.append((f"utt{i:05d}", wav, text))

    # jsonl + npy
    with open(os.path.join(root, "manifest.jsonl"), "w") as f:
        for key, wav, text in utts:
            np.save(os.path.join(root, key + ".npy"), wav)
            f.write(json.dumps({
                "utt_id": key, "noisy": key + ".npy", "clean": key + ".npy",
                "text": text, "n_samples": int(len(wav)),
            }) + "\n")

    # Kaldi wav ark/scp (one row per waveform) + text
    kaldi_io.write_ark_scp(
        ((k, w[None, :]) for k, w, _ in utts),
        os.path.join(root, "wav.ark"), os.path.join(root, "wav.scp"),
    )
    with open(os.path.join(root, "text"), "w") as f:
        for k, _, text in utts:
            f.write(f"{k} {' '.join(text)}\n")

    # Kaldi CM2-compressed feature ark (~1-3 s at 100 fps, 40-dim)
    def feats():
        r2 = np.random.default_rng(1)
        for k, w, _ in utts:
            t = max(8, len(w) // 160)
            yield k, r2.standard_normal((t, 40)).astype(np.float32)

    kaldi_io.write_ark_scp(
        feats(), os.path.join(root, "feats.ark"),
        os.path.join(root, "feats.scp"), compress=2,
    )
    return utts


def _drain(batcher, prefetch: int):
    n = 0
    t0 = time.perf_counter()
    if prefetch:
        with Prefetcher(batcher.epoch(shuffle=False), depth=prefetch) as it:
            for b in it:
                n += len(b["utt_ids"])
    else:
        for b in batcher.epoch(shuffle=False):
            n += len(b["utt_ids"])
    dt = time.perf_counter() - t0
    return n, dt


def _case(name, build):
    t0 = time.perf_counter()
    ds = build()
    t_index = time.perf_counter() - t0
    frame_buckets = name == "kaldi_feats_cm2"
    batcher = BucketBatcher(
        ds, BATCH,
        length_buckets=(160, 320, 480) if frame_buckets else BUCKETS,
        max_label_len=16,
    )
    _drain(batcher, 0)  # warm the page cache / lazy native build
    n, dt = _drain(batcher, 0)
    npf, dtpf = _drain(batcher, 4)
    row = {
        "source": name,
        "n_utts": n,
        "index_build_s": round(t_index, 3),
        "collate_utt_per_s": round(n / dt, 1),
        "prefetched_utt_per_s": round(npf / dtpf, 1),
    }
    print(row, flush=True)
    return row


def main():
    root = tempfile.mkdtemp(prefix="rg_loader_bench_")
    try:
        _make_corpus(root)
        tok_src = AudioTextDataset.from_jsonl(
            os.path.join(root, "manifest.jsonl"))
        tok = tok_src.tokenizer
        rows = [
            _case("jsonl_npy", lambda: AudioTextDataset.from_jsonl(
                os.path.join(root, "manifest.jsonl"), tokenizer=tok)),
            _case("kaldi_wav_scp", lambda: AudioTextDataset.from_kaldi(
                os.path.join(root, "wav.scp"),
                os.path.join(root, "text"), tokenizer=tok)),
            _case("kaldi_feats_cm2", lambda: AudioTextDataset.from_kaldi_feats(
                os.path.join(root, "feats.scp"),
                os.path.join(root, "text"), tokenizer=tok)),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)

    out = {"n_utts": N_UTTS, "batch": BATCH, "cases": rows}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "loader.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
