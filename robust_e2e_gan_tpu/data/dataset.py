"""Dataset/loader: paired noisy/clean utterances -> padded static-shape batches.

Reference parity: SURVEY.md section 2a "Dataset/Loader" — pair noisy and
clean utterances (CHiME-4 multi-condition), sort/bucket by length, pad to
batch, map text -> token ids via a char dict, label padding ignore_id -1
(the ESPnet converter convention). Call stack 3.5: read feats/text ->
build char dict -> sort by length -> batch bins -> collate.

TPU-first re-design:
  * The loader yields RAW WAVEFORMS (the differentiable frontend runs on
    device), padded to a small static set of length buckets
    (SURVEY.md section 5 "Long-context" row: bucketed padding to static
    lengths so XLA compiles once per bucket, no recompilation storms).
  * Double-buffered background prefetch thread overlaps host I/O + padding
    with device steps (the >=10x throughput target demands it, SURVEY.md
    section 7 "Hard parts").
  * Sources: native npz/jsonl manifests, or Kaldi scp/ark via
    data/kaldi_io.py so existing Kaldi-prepped corpora drop in.
"""

from __future__ import annotations

import json
import os
import queue
import threading
import warnings
from dataclasses import dataclass
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from robust_e2e_gan_tpu.data import kaldi_io


class CharTokenizer:
    """Character dictionary: blank=0, sos/eos=1, unk=2, chars from 3.

    The reference builds its char dict from the training transcripts
    (SURVEY.md call stack 3.5); ids 0/1 match E2EConfig.blank_id/sos_id.
    """

    BLANK, SOS_EOS, UNK = 0, 1, 2
    _SPECIALS = ["<blank>", "<sos/eos>", "<unk>"]

    def __init__(self, chars: Sequence[str]):
        self.chars = list(chars)
        self._to_id = {c: i + 3 for i, c in enumerate(self.chars)}

    @classmethod
    def from_texts(cls, texts: Sequence[str]) -> "CharTokenizer":
        charset = sorted({c for t in texts for c in t})
        return cls(charset)

    @property
    def vocab_size(self) -> int:
        return 3 + len(self.chars)

    def encode(self, text: str) -> List[int]:
        return [self._to_id.get(c, self.UNK) for c in text]

    def decode(self, ids: Sequence[int]) -> str:
        out = []
        for i in ids:
            i = int(i)
            if i >= 3:
                out.append(self.chars[i - 3])
            elif i == self.UNK:
                out.append("<unk>")
        return "".join(out)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"chars": self.chars}, f)

    @classmethod
    def load(cls, path: str) -> "CharTokenizer":
        with open(path) as f:
            return cls(json.load(f)["chars"])


class TableTokenizer:
    """Explicit token<->id table for reference/Kaldi id layouts.

    An imported reference checkpoint's embedding/CTC rows follow the
    REFERENCE's id assignment (ESPnet-era: blank=0, units at their
    units.txt ids, shared <sos>/<eos> appended at vocab-1), which the
    fixed-layout CharTokenizer cannot represent. This tokenizer carries
    the table verbatim; E2EConfig.{blank,sos,eos}_id carry the special
    ids (tools/import_reference_ckpt.py --units wires both).
    """

    def __init__(self, id2tok: Dict[int, str], blank_id: int = 0,
                 sos_eos_id: Optional[int] = None, unk_id: Optional[int] = None):
        self.id2tok = {int(k): v for k, v in id2tok.items()}
        self.blank_id = blank_id
        self.sos_eos_id = (max(self.id2tok) + 1 if sos_eos_id is None
                           else sos_eos_id)
        self.unk_id = unk_id
        self._to_id = {v: k for k, v in self.id2tok.items()}

    @classmethod
    def from_units(cls, path: str) -> "TableTokenizer":
        """Kaldi/ESPnet units.txt: one "token id" pair per line; blank=0
        implicit, <sos>/<eos> appended after the last unit id."""
        id2tok = {}
        with open(path) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                tok, idx = parts[0], int(parts[1])
                id2tok[idx] = tok
        unk = next((i for i, t in id2tok.items() if t.lower() == "<unk>"),
                   None)
        return cls(id2tok, blank_id=0, unk_id=unk)

    @property
    def vocab_size(self) -> int:
        return self.sos_eos_id + 1

    def encode(self, text: str) -> List[int]:
        unk = self.unk_id if self.unk_id is not None else self.blank_id
        return [self._to_id.get(c, unk) for c in text]

    def decode(self, ids: Sequence[int]) -> str:
        skip = {self.blank_id, self.sos_eos_id}
        return "".join(
            self.id2tok.get(int(i), "<unk>")
            for i in ids if int(i) not in skip
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({
                "kind": "table",
                "id2tok": {str(k): v for k, v in self.id2tok.items()},
                "blank_id": self.blank_id,
                "sos_eos_id": self.sos_eos_id,
                "unk_id": self.unk_id,
            }, f)

    @classmethod
    def load(cls, path: str) -> "TableTokenizer":
        with open(path) as f:
            d = json.load(f)
        return cls(d["id2tok"], d.get("blank_id", 0), d.get("sos_eos_id"),
                   d.get("unk_id"))


def load_tokenizer(path: str):
    """Dispatch on the saved JSON layout (CharTokenizer vs TableTokenizer)."""
    with open(path) as f:
        d = json.load(f)
    if d.get("kind") == "table":
        return TableTokenizer(d["id2tok"], d.get("blank_id", 0),
                              d.get("sos_eos_id"), d.get("unk_id"))
    return CharTokenizer(d["chars"])


@dataclass
class Utterance:
    utt_id: str
    text: str
    n_samples: int
    # exactly one of (noisy_path, noisy_ark, feats_ark) is set per source
    # kind; for feats_ark utterances n_samples counts FRAMES, not samples
    noisy_path: Optional[str] = None
    clean_path: Optional[str] = None
    noisy_ark: Optional[Tuple[str, int]] = None
    clean_ark: Optional[Tuple[str, int]] = None
    feats_ark: Optional[Tuple[str, int]] = None
    clean_feats_ark: Optional[Tuple[str, int]] = None  # spec-joint pairing

    def load_feats(self) -> np.ndarray:
        """(T, D) precomputed feature matrix (Kaldi feats.scp source)."""
        return kaldi_io.read_mat_at(*self.feats_ark).astype(np.float32)

    def load_clean_feats(self) -> np.ndarray:
        return kaldi_io.read_mat_at(*self.clean_feats_ark).astype(np.float32)

    def load(self) -> Tuple[np.ndarray, np.ndarray]:
        if self.noisy_path is not None:
            noisy = np.load(self.noisy_path).astype(np.float32).reshape(-1)
            clean = (
                np.load(self.clean_path).astype(np.float32).reshape(-1)
                if self.clean_path else noisy
            )
        else:
            noisy = kaldi_io.read_mat_at(*self.noisy_ark).reshape(-1)
            clean = (
                kaldi_io.read_mat_at(*self.clean_ark).reshape(-1)
                if self.clean_ark else noisy
            )
        return noisy.astype(np.float32), clean.astype(np.float32)


def _read_kv_file(path: str) -> Dict[str, str]:
    """Kaldi `text`-style ``<key> <value...>`` map."""
    out: Dict[str, str] = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split(None, 1)
            if len(parts) == 2:
                out[parts[0]] = parts[1]
    return out


def _read_len_file(path: str) -> Dict[str, int]:
    """``<utt> <int>`` map (utt2num_frames / utt2num_samples)."""
    return {k: int(v) for k, v in _read_kv_file(path).items()}


# one open handle per ark during index construction (scp files group
# entries by ark, so probing reuses the handle instead of reopening)
_probe_files: Dict[str, object] = {}


def _probe_shape(ark: str, off: int) -> Tuple[int, int]:
    f = _probe_files.get(ark)
    if f is None:
        f = _probe_files[ark] = open(ark, "rb")
    f.seek(off)
    return kaldi_io.read_shape(f)


def _close_probes() -> None:
    for f in _probe_files.values():
        f.close()
    _probe_files.clear()


def _scp_fingerprint(scp_path: str) -> Dict[str, Any]:
    st = os.stat(scp_path)
    return {
        "scp": os.path.abspath(scp_path),
        "size": st.st_size,
        "mtime_ns": st.st_mtime_ns,
    }


def _load_length_cache(
    scp_path: str, cache_path: Optional[str]
) -> Dict[str, int]:
    """Lengths from an on-disk index cache, iff it matches the scp's
    current fingerprint (path/size/mtime). Stale or missing -> {}."""
    if not cache_path or not os.path.exists(cache_path):
        return {}
    try:
        with open(cache_path) as f:
            d = json.load(f)
        if d.get("fingerprint") == _scp_fingerprint(scp_path):
            return {k: int(v) for k, v in d["lengths"].items()}
    except (OSError, ValueError, KeyError):
        pass
    return {}


def _write_length_cache(
    scp_path: str, cache_path: Optional[str], lengths: Dict[str, int]
) -> None:
    if not cache_path:
        return
    tmp = cache_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"fingerprint": _scp_fingerprint(scp_path),
             "lengths": lengths}, f
        )
    os.replace(tmp, cache_path)


class AudioTextDataset:
    """Paired (noisy, clean, transcript) utterances from disk."""

    def __init__(self, utts: List[Utterance], tokenizer: CharTokenizer):
        self.utts = utts
        self.tokenizer = tokenizer

    def __len__(self) -> int:
        return len(self.utts)

    @classmethod
    def from_jsonl(
        cls, manifest_path: str, tokenizer: Optional[CharTokenizer] = None
    ) -> "AudioTextDataset":
        """jsonl manifest: one {"utt_id","noisy","clean","text","n_samples"}
        per line; "noisy"/"clean" are .npy paths (clean optional)."""
        root = os.path.dirname(os.path.abspath(manifest_path))

        def resolve(p):
            return p if os.path.isabs(p) else os.path.join(root, p)

        utts = []
        with open(manifest_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                d = json.loads(line)
                utts.append(Utterance(
                    utt_id=d["utt_id"],
                    text=d["text"],
                    n_samples=int(d["n_samples"]),
                    noisy_path=resolve(d["noisy"]),
                    clean_path=resolve(d["clean"]) if d.get("clean") else None,
                ))
        if tokenizer is None:
            tokenizer = CharTokenizer.from_texts([u.text for u in utts])
        return cls(utts, tokenizer)

    @classmethod
    def from_kaldi(
        cls,
        noisy_scp: str,
        text_path: str,
        clean_scp: Optional[str] = None,
        tokenizer: Optional[CharTokenizer] = None,
        lengths_path: Optional[str] = None,
        index_cache: Optional[str] = None,
    ) -> "AudioTextDataset":
        """Kaldi-format source: scp files of waveform vectors + `text`.

        The reference consumed Kaldi-prepped CHiME-4 dirs (SURVEY.md L0/L1);
        here the scp entries point at float vectors (one per utterance).

        Lengths come from ``lengths_path`` (a Kaldi-style ``<utt> <n>`` map
        of sample counts, e.g. utt2num_samples) when given, else from an
        O(header) probe of each blob — never a full matrix read, so index
        construction is O(entries) (SURVEY.md call stack 3.5). With
        ``index_cache``, probed lengths are persisted to that path and
        reloaded on rebuild while the scp's size/mtime fingerprint
        matches, making repeat startups O(one file read).
        """
        noisy_idx = kaldi_io.read_scp_index(noisy_scp)
        clean_idx = kaldi_io.read_scp_index(clean_scp) if clean_scp else {}
        texts = _read_kv_file(text_path)
        lengths = _read_len_file(lengths_path) if lengths_path else {}
        cached = _load_length_cache(noisy_scp, index_cache)
        probed: Dict[str, int] = {}
        utts = []
        for key, (ark, off) in noisy_idx.items():
            if key not in texts:
                continue
            n = lengths.get(key)
            if n is None:
                n = cached.get(key)
            if n is None:
                r, c = _probe_shape(ark, off)
                n = probed[key] = r * c
            utts.append(Utterance(
                utt_id=key, text=texts[key], n_samples=n,
                noisy_ark=(ark, off), clean_ark=clean_idx.get(key),
            ))
        _close_probes()
        if probed:
            _write_length_cache(
                noisy_scp, index_cache, {**cached, **probed}
            )
        if tokenizer is None:
            tokenizer = CharTokenizer.from_texts([u.text for u in utts])
        return cls(utts, tokenizer)

    @classmethod
    def from_kaldi_feats(
        cls,
        feats_scp: str,
        text_path: str,
        tokenizer: Optional[CharTokenizer] = None,
        utt2num_frames: Optional[str] = None,
        clean_scp: Optional[str] = None,
        index_cache: Optional[str] = None,
    ) -> "AudioTextDataset":
        """Kaldi PRECOMPUTED-features source: feats.scp of (T, D) matrices.

        This is what the reference actually consumed (SURVEY.md L1: the
        loader yields padded feature batches from Kaldi feats.scp;
        compressed CM* arks decode transparently). Batches carry
        "feats"/"feat_lengths" instead of waveforms and train/decode
        bypass the on-device frontend (and the enhancer — enhancement
        needs the linear spectrum, which offline fbank has discarded).

        Frame counts come from ``utt2num_frames`` (the standard Kaldi file)
        when given, else from an O(header) probe — the CM* payload is never
        decompressed at construction time.

        ``clean_scp`` pairs clean feature matrices by key (the spectrogram
        joint-adversarial path, which needs a noisy/clean pair like the
        waveform source; SURVEY.md section 2a Dataset/Loader).
        """
        idx = kaldi_io.read_scp_index(feats_scp)
        clean_idx = kaldi_io.read_scp_index(clean_scp) if clean_scp else {}
        texts = _read_kv_file(text_path)
        frames = _read_len_file(utt2num_frames) if utt2num_frames else {}
        cached = _load_length_cache(feats_scp, index_cache)
        probed: Dict[str, int] = {}
        utts = []
        for key, (ark, off) in idx.items():
            if key not in texts:
                continue
            t = frames.get(key)
            if t is None:
                t = cached.get(key)
            if t is None:
                t = probed[key] = _probe_shape(ark, off)[0]
            utts.append(Utterance(
                utt_id=key, text=texts[key], n_samples=t,
                feats_ark=(ark, off), clean_feats_ark=clean_idx.get(key),
            ))
        _close_probes()
        if probed:
            _write_length_cache(
                feats_scp, index_cache, {**cached, **probed}
            )
        if tokenizer is None:
            tokenizer = CharTokenizer.from_texts([u.text for u in utts])
        return cls(utts, tokenizer)


def _bucket_for(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class BucketBatcher:
    """Length-sorted, bucket-padded batches with static shapes.

    Sorts utterances by length (the reference's sort/bucket strategy, call
    stack 3.5), groups consecutive runs into batches, pads each batch's
    waveforms to its length bucket and labels to max_label_len. Each epoch
    shuffles batch ORDER (not contents), like the reference's epoch loop.
    """

    def __init__(
        self,
        dataset: AudioTextDataset,
        batch_size: int,
        length_buckets: Sequence[int] = (32000, 64000, 112000, 160000),
        max_label_len: int = 128,
        ignore_id: int = -1,
        seed: int = 0,
        drop_overlong: bool = True,
        speaker_cmvn=None,
        pad_final: bool = False,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        # pad_final: fill a ragged final batch up to batch_size by
        # repeating its last utterance. utt_ids keeps only the real
        # utterances, and every consumer (decode/enhance/score loops)
        # iterates utt_ids, so the duplicate rows are computed and
        # discarded. Serving wants this on: a ragged batch both triggers
        # a fresh XLA compile and can land on a pathologically slow tile
        # shape (on-chip fine sweep: B=112 costs 101.5 ms vs 61.6 at
        # B=128 — results/r4_hw/bench_batch_sweep_fine2.log).
        self.pad_final = pad_final
        self.buckets = sorted(length_buckets)
        self.max_label_len = max_label_len
        self.ignore_id = ignore_id
        # data/cmvn.py::SpeakerCmvn -> per-batch (cmvn_mean, cmvn_inv_std)
        self.speaker_cmvn = speaker_cmvn
        self.rng = np.random.default_rng(seed)
        self.n_clipped = 0
        order = sorted(
            range(len(dataset)), key=lambda i: dataset.utts[i].n_samples
        )
        if drop_overlong:
            order = [
                i for i in order
                if dataset.utts[i].n_samples <= self.buckets[-1]
                and len(dataset.tokenizer.encode(dataset.utts[i].text))
                <= max_label_len
            ]
        self.batches = [
            order[i : i + batch_size]
            for i in range(0, len(order), batch_size)
        ]

    def __len__(self) -> int:
        return len(self.batches)

    def _collate(self, idxs: List[int]) -> Dict[str, np.ndarray]:
        n_real = len(idxs)
        if self.pad_final and n_real < self.batch_size:
            idxs = list(idxs) + [idxs[-1]] * (self.batch_size - n_real)
        utts = [self.ds.utts[i] for i in idxs]
        pad_to = _bucket_for(
            max(u.n_samples for u in utts), self.buckets
        )
        clipped = [u.utt_id for u in utts if u.n_samples > pad_to]
        if clipped:
            # only reachable with drop_overlong=False: the waveform tail
            # beyond the top bucket is cut — never silently (VERDICT round 1)
            self.n_clipped += len(clipped)
            warnings.warn(
                f"{len(clipped)} utterance(s) longer than the top length "
                f"bucket ({pad_to} samples) truncated, e.g. {clipped[0]!r}; "
                f"{self.n_clipped} total so far. Raise length_buckets or "
                "use drop_overlong=True.",
                stacklevel=2,
            )
        b = len(utts)
        labels = np.full((b, self.max_label_len), self.ignore_id, np.int32)
        ids = []
        for j, u in enumerate(utts):
            toks = self.ds.tokenizer.encode(u.text)[: self.max_label_len]
            labels[j, : len(toks)] = toks
            ids.append(u.utt_id)

        if all(u.feats_ark is not None for u in utts):
            # precomputed-features source: (B, T_bucket, D) batches; the
            # length buckets are frame counts for this source kind. Native
            # hot path: threaded C++ ark reader incl. CM* decompression
            # (csrc/kaldi_reader.cpp); None -> no toolchain, fall back.
            if not hasattr(self, "_feat_dim"):
                self._feat_dim = kaldi_io.read_shape_at(
                    *utts[0].feats_ark
                )[1]
            dim = self._feat_dim
            from robust_e2e_gan_tpu.utils.native import (
                native_load_kaldi_feats_batch,
            )

            def load_batch(entries):
                res = native_load_kaldi_feats_batch(entries, pad_to, dim)
                if res is not None:
                    m, nrows = res
                    return m, np.minimum(nrows, pad_to).astype(np.int32)
                m = np.zeros((b, pad_to, dim), np.float32)
                ls = np.zeros((b,), np.int32)
                for j, e in enumerate(entries):
                    mat = kaldi_io.read_mat_at(*e).astype(np.float32)
                    n = min(mat.shape[0], pad_to)
                    m[j, :n] = mat[:n]
                    ls[j] = n
                return m, ls

            feats, flens = load_batch([u.feats_ark for u in utts])
            batch = {
                "feats": feats,
                "feat_lengths": flens,
                "labels": labels,
                "utt_ids": ids[:n_real],
            }
            if all(u.clean_feats_ark is not None for u in utts):
                batch["clean_feats"], _ = load_batch(
                    [u.clean_feats_ark for u in utts]
                )
            if self.speaker_cmvn is not None:
                mean, inv_std = self.speaker_cmvn.lookup(ids)
                batch["cmvn_mean"] = mean
                batch["cmvn_inv_std"] = inv_std
            return batch

        loaded = None
        if all(u.noisy_path is not None for u in utts):
            # native hot path: threaded C++ .npy batch read + pad
            # (csrc/dataloader.cpp); None -> no toolchain, fall back.
            from robust_e2e_gan_tpu.utils.native import native_load_npy_batch

            res = native_load_npy_batch(
                [u.noisy_path for u in utts], pad_to
            )
            if res is not None:
                noisy, nlens = res
                clean, _ = native_load_npy_batch(
                    [u.clean_path or u.noisy_path for u in utts], pad_to
                )
                lengths = np.minimum(nlens, pad_to).astype(np.int32)
                loaded = (noisy, clean, lengths)

        if loaded is None:
            noisy = np.zeros((b, pad_to), np.float32)
            clean = np.zeros((b, pad_to), np.float32)
            lengths = np.zeros((b,), np.int32)
            for j, u in enumerate(utts):
                nw, cw = u.load()
                n = min(len(nw), pad_to)
                noisy[j, :n] = nw[:n]
                clean[j, :n] = cw[:n]
                lengths[j] = n
            loaded = (noisy, clean, lengths)

        noisy, clean, lengths = loaded
        batch = {
            "noisy_wav": noisy,
            "clean_wav": clean,
            "wav_lengths": lengths,
            "labels": labels,
            "utt_ids": ids[:n_real],
        }
        if self.speaker_cmvn is not None:
            mean, inv_std = self.speaker_cmvn.lookup(ids)
            batch["cmvn_mean"] = mean
            batch["cmvn_inv_std"] = inv_std
        return batch

    def epoch(self, shuffle: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        order = list(range(len(self.batches)))
        if shuffle:
            self.rng.shuffle(order)
        for bi in order:
            yield self._collate(self.batches[bi])


class Prefetcher:
    """Background-thread prefetch: overlap host collation with device steps."""

    _DONE = object()

    def __init__(self, it: Iterator, depth: int = 2):
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self.err: Optional[BaseException] = None
        self._stop = threading.Event()

        def work():
            try:
                for item in it:
                    while not self._stop.is_set():
                        try:
                            self.q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # surfaced on next()
                self.err = e
            finally:
                # blocking put (bounded by _stop): _DONE must reach the
                # consumer even when the queue is momentarily full, or a
                # draining consumer would wait forever
                while not self._stop.is_set():
                    try:
                        self.q.put(self._DONE, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self.t = threading.Thread(target=work, daemon=True)
        self.t.start()

    def close(self) -> None:
        """Release the worker without draining: consumers that abandon
        iteration early (exceptions, early exit) call this so the thread
        isn't left blocked on a full queue holding file handles open."""
        self._stop.set()
        while True:  # unblock a worker waiting on put()
            try:
                self.q.get_nowait()
            except queue.Empty:
                break
        self.t.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is self._DONE:
            if self.err is not None:
                raise self.err
            raise StopIteration
        return item
