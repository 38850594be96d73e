"""Data-layer tests: Kaldi ark/scp I/O round-trips, tokenizer, bucketing
loader (SURVEY.md section 2a "Kaldi I/O" / "Dataset-Loader")."""

import json
import os

import numpy as np
import pytest

from robust_e2e_gan_tpu.data import kaldi_io
from robust_e2e_gan_tpu.data.dataset import (
    AudioTextDataset,
    BucketBatcher,
    CharTokenizer,
    Prefetcher,
)


def test_ark_scp_roundtrip(tmp_path, rng):
    mats = {
        "utt1": rng.standard_normal((5, 13)).astype(np.float32),
        "utt2": rng.standard_normal((3, 13)).astype(np.float32),
        "vec1": rng.standard_normal((7,)).astype(np.float32),
    }
    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    kaldi_io.write_ark_scp(iter(mats.items()), ark, scp)

    got = dict(kaldi_io.read_mat_ark(ark))
    assert set(got) == set(mats)
    for k in mats:
        np.testing.assert_array_equal(got[k], mats[k])

    got_scp = dict(kaldi_io.read_mat_scp(scp))
    for k in mats:
        np.testing.assert_array_equal(got_scp[k], mats[k])

    idx = kaldi_io.read_scp_index(scp)
    np.testing.assert_array_equal(
        kaldi_io.read_mat_at(*idx["utt2"]), mats["utt2"]
    )


def test_text_ark_read(tmp_path):
    p = tmp_path / "cmvn.ark"
    p.write_bytes(b"spk1  [\n  1.0 2.0 3.0\n  4.0 5.0 6.0 ]\n")
    key, mat = next(kaldi_io.read_mat_ark(str(p)))
    assert key == "spk1"
    np.testing.assert_allclose(mat, [[1, 2, 3], [4, 5, 6]])


def test_char_tokenizer(tmp_path):
    tok = CharTokenizer.from_texts(["hello world", "abc"])
    ids = tok.encode("hello")
    assert all(i >= 3 for i in ids)
    assert tok.decode(ids) == "hello"
    assert tok.encode("z") == [CharTokenizer.UNK]
    p = str(tmp_path / "dict.json")
    tok.save(p)
    tok2 = CharTokenizer.load(p)
    assert tok2.decode(tok2.encode("world")) == "world"
    assert tok2.vocab_size == tok.vocab_size


def _write_manifest(tmp_path, rng, n=7):
    entries = []
    for i in range(n):
        ns = int(rng.integers(1000, 9000))
        noisy = rng.standard_normal(ns).astype(np.float32)
        clean = rng.standard_normal(ns).astype(np.float32)
        np.save(tmp_path / f"n{i}.npy", noisy)
        np.save(tmp_path / f"c{i}.npy", clean)
        entries.append({
            "utt_id": f"utt{i}", "noisy": f"n{i}.npy", "clean": f"c{i}.npy",
            "text": "ab" * (i + 1), "n_samples": ns,
        })
    mf = tmp_path / "manifest.jsonl"
    mf.write_text("\n".join(json.dumps(e) for e in entries))
    return str(mf)


def test_bucket_batcher(tmp_path, rng):
    mf = _write_manifest(tmp_path, rng)
    ds = AudioTextDataset.from_jsonl(mf)
    batcher = BucketBatcher(
        ds, batch_size=3, length_buckets=(4000, 9000), max_label_len=20,
    )
    seen = set()
    for batch in batcher.epoch(shuffle=True):
        assert batch["noisy_wav"].shape[1] in (4000, 9000)
        assert batch["noisy_wav"].shape == batch["clean_wav"].shape
        assert batch["labels"].shape[1] == 20
        for j, uid in enumerate(batch["utt_ids"]):
            seen.add(uid)
            n = batch["wav_lengths"][j]
            assert n <= batch["noisy_wav"].shape[1]
            toks = [t for t in batch["labels"][j] if t != -1]
            i = int(uid[3:])
            assert ds.tokenizer.decode(toks) == "ab" * (i + 1)
    assert seen == {f"utt{i}" for i in range(7)}


def test_bucket_batcher_pad_final(tmp_path, rng):
    """pad_final fills the ragged last batch to the static batch size by
    repeating its final utterance; utt_ids keeps only the real rows (so
    every utt_ids-driven consumer silently drops the duplicates)."""
    mf = _write_manifest(tmp_path, rng)  # 7 utts
    ds = AudioTextDataset.from_jsonl(mf)
    batcher = BucketBatcher(
        ds, batch_size=3, length_buckets=(9000,), max_label_len=20,
        pad_final=True,
    )
    batches = list(batcher.epoch(shuffle=False))
    # every batch has the full static row count
    assert all(b["noisy_wav"].shape[0] == 3 for b in batches)
    assert all(b["labels"].shape[0] == 3 for b in batches)
    # real utterances exactly once across utt_ids
    all_ids = [u for b in batches for u in b["utt_ids"]]
    assert sorted(all_ids) == sorted(f"utt{i}" for i in range(7))
    # the 7th utt's batch: rows beyond n_real are copies of the last real
    ragged = [b for b in batches if len(b["utt_ids"]) == 1]
    assert len(ragged) == 1
    rb = ragged[0]
    np.testing.assert_array_equal(rb["noisy_wav"][1], rb["noisy_wav"][0])
    np.testing.assert_array_equal(rb["labels"][2], rb["labels"][0])
    assert rb["wav_lengths"][1] == rb["wav_lengths"][0]
    # default (pad_final=False) keeps ragged batches
    b2 = BucketBatcher(ds, batch_size=3, length_buckets=(9000,))
    assert list(b2.epoch(shuffle=False))[-1]["noisy_wav"].shape[0] == 1


def test_kaldi_dataset(tmp_path, rng):
    # waveforms as Kaldi float vectors + text file
    entries = {}
    texts = []
    for i in range(4):
        wav = rng.standard_normal(2000 + 100 * i).astype(np.float32)
        entries[f"utt{i}"] = wav
        texts.append(f"utt{i} hey{i}")
    ark = str(tmp_path / "wav.ark")
    scp = str(tmp_path / "wav.scp")
    kaldi_io.write_ark_scp(iter(entries.items()), ark, scp)
    (tmp_path / "text").write_text("\n".join(texts))

    ds = AudioTextDataset.from_kaldi(scp, str(tmp_path / "text"))
    assert len(ds) == 4
    b = BucketBatcher(ds, batch_size=2, length_buckets=(4000,))
    batches = list(b.epoch(shuffle=False))
    assert sum(len(x["utt_ids"]) for x in batches) == 4
    nw, cw = ds.utts[0].load()
    np.testing.assert_array_equal(nw, cw)  # clean falls back to noisy


def test_prefetcher(tmp_path, rng):
    mf = _write_manifest(tmp_path, rng, n=5)
    ds = AudioTextDataset.from_jsonl(mf)
    batcher = BucketBatcher(ds, batch_size=2, length_buckets=(9000,))
    direct = list(batcher.epoch(shuffle=False))
    fetched = list(Prefetcher(batcher.epoch(shuffle=False)))
    assert len(fetched) == len(direct)
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(a["noisy_wav"], b["noisy_wav"])


def test_cmvn_stats_roundtrip(tmp_path, rng):
    """Global CMVN accumulate -> Kaldi stats layout -> mean/inv_std
    (reference Kaldi compute-cmvn-stats/apply-cmvn parity)."""
    from robust_e2e_gan_tpu.data.cmvn import (
        CmvnAccumulator,
        load_cmvn_ark,
        save_cmvn_ark,
        stats_to_mean_inv_std,
    )

    feats = [rng.standard_normal((t, 5)).astype(np.float32) * 3.0 + 1.5
             for t in (10, 17, 4)]
    acc = CmvnAccumulator(5)
    for f in feats:
        acc.add(f)
    allf = np.concatenate(feats)
    mean, inv_std = acc.mean_inv_std()
    np.testing.assert_allclose(mean, allf.mean(0), rtol=1e-5)
    np.testing.assert_allclose(inv_std, 1.0 / allf.std(0), rtol=1e-3)

    p = str(tmp_path / "cmvn.ark")
    save_cmvn_ark(acc.stats(), p)
    stats = load_cmvn_ark(p)
    m2, s2 = stats_to_mean_inv_std(stats)
    np.testing.assert_allclose(m2, mean, rtol=1e-5)
    np.testing.assert_allclose(s2, inv_std, rtol=1e-4)

    # masked accumulation excludes pad rows
    acc2 = CmvnAccumulator(5)
    f = rng.standard_normal((8, 5)).astype(np.float32)
    mask = np.array([1, 1, 1, 0, 0, 1, 0, 0], np.float32)
    acc2.add(f, mask)
    np.testing.assert_allclose(
        acc2.mean_inv_std()[0], f[mask > 0].mean(0), rtol=1e-5
    )


def test_epoch_reshuffle_advances(tmp_path, rng):
    """One batcher reused across epochs reshuffles batch order per epoch
    (round-1 ADVICE: same-seed recreation froze the order)."""
    mf = _write_manifest(tmp_path, rng, n=12)
    ds = AudioTextDataset.from_jsonl(mf)
    batcher = BucketBatcher(ds, batch_size=1, length_buckets=(9000,), seed=3)
    orders = [
        tuple(b["utt_ids"][0] for b in batcher.epoch(shuffle=True))
        for _ in range(3)
    ]
    assert len(set(orders)) > 1  # rng advanced -> orders differ


def test_overlong_truncation_warns(tmp_path, rng):
    """drop_overlong=False clips to the top bucket but never silently
    (round-1 VERDICT weak #7)."""
    import warnings as warnings_mod

    mf = _write_manifest(tmp_path, rng, n=3)
    ds = AudioTextDataset.from_jsonl(mf)
    b = BucketBatcher(
        ds, batch_size=3, length_buckets=(2000,), drop_overlong=False,
    )
    with pytest.warns(UserWarning, match="truncated"):
        batches = list(b.epoch(shuffle=False))
    assert b.n_clipped > 0
    for batch in batches:
        assert batch["noisy_wav"].shape[1] == 2000
        assert (batch["wav_lengths"] <= 2000).all()
    # the drop_overlong=True default stays silent
    b2 = BucketBatcher(ds, batch_size=3, length_buckets=(9000,))
    with warnings_mod.catch_warnings():
        warnings_mod.simplefilter("error")
        list(b2.epoch(shuffle=False))


def test_hard_task_synthetic():
    """Round-2 non-saturating benchmark task: multi-word transcripts with a
    space token, per-utterance SNR mix, per-token duration jitter."""
    from robust_e2e_gan_tpu.data.synthetic import (
        hard_task, make_batch, split_words, synth_utterance,
        sample_transcript,
    )

    cfg = hard_task(vocab_size=32)
    rng = np.random.default_rng(0)
    batch = make_batch(8, cfg, rng, ignore_id=-1)
    assert batch["labels"].shape[1] == cfg.max_label_len
    assert batch["noisy_wav"].shape[1] == cfg.max_samples
    assert (batch["wav_lengths"] <= cfg.max_samples).all()
    # transcripts contain the space token and several words
    n_spaces = int((batch["labels"] == cfg.space_id).sum())
    assert n_spaces >= 8  # >= min_words-1 per utt
    for row in batch["labels"]:
        toks = [int(t) for t in row if t != -1]
        words = split_words(toks, cfg.space_id)
        assert cfg.min_words <= len(words) <= cfg.max_words
        for w in words:
            assert all(cfg.first_token <= t < cfg.vocab_size for t in w)
    # duration jitter: same transcript renders to different lengths
    tr = sample_transcript(cfg, rng)
    lens = {synth_utterance(tr, cfg, np.random.default_rng(s))[0].shape[0]
            for s in range(5)}
    assert len(lens) > 1
    # mixed SNR: the [-3, +5] dB draw is exact on the round-2 variant
    # (reverb/babble off — there x - c IS the additive noise)
    legacy = hard_task(vocab_size=32, reverb=False, babble=False)
    snrs = []
    for s in range(12):
        c, x = synth_utterance(tr, legacy, np.random.default_rng(s))
        noise = x - c
        snrs.append(10 * np.log10(np.mean(c**2) / np.mean(noise**2)))
    assert max(snrs) - min(snrs) > 3.0
    assert -4.0 < min(snrs) and max(snrs) < 6.0
    # round-3 realism: reverberation + babble make the received channel
    # strictly more corrupted than the additive-noise-only variant
    hard_snrs = []
    for s in range(12):
        c, x = synth_utterance(tr, cfg, np.random.default_rng(s))
        mism = x - c  # additive noise + reverb tail + channel tilt
        hard_snrs.append(10 * np.log10(np.mean(c**2) / np.mean(mism**2)))
        assert np.isfinite(x).all()
    assert np.mean(hard_snrs) < np.mean(snrs) - 1.0
    assert cfg.reverb_t60 > 0 and cfg.babble_streams > 0


def test_synthetic_backward_compat():
    """Default (non-words) task is bit-identical to round 1: same rng
    stream, same shapes."""
    from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, make_batch

    cfg = SyntheticConfig(vocab_size=12, min_tokens=2, max_tokens=4)
    b = make_batch(3, cfg, np.random.default_rng(7), ignore_id=-1)
    assert b["labels"].shape == (3, 4)
    seg = int(cfg.tone_ms * cfg.sample_rate / 1000.0)
    assert b["noisy_wav"].shape == (3, 4 * seg)
    # max_tokens override still narrows both labels and padding
    b2 = make_batch(3, cfg, np.random.default_rng(7), max_tokens=3,
                    ignore_id=-1)
    assert b2["labels"].shape == (3, 3)
    assert b2["noisy_wav"].shape == (3, 3 * seg)


def test_kaldi_compressed_matrix_roundtrip(tmp_path, rng):
    """CM/CM2/CM3 compressed Kaldi matrices decode within quantization
    error; handcrafted blob decodes to exact known values (round-1 VERDICT
    missing #4 — real Kaldi dirs ship compressed feats)."""
    import struct

    mat = (rng.standard_normal((20, 13)) * 4.0 + 1.0).astype(np.float32)
    rng_span = float(mat.max() - mat.min())
    tol = {1: rng_span / 60.0, 2: rng_span / 30000.0, 3: rng_span / 120.0}
    for fmt in (1, 2, 3):
        p = str(tmp_path / f"cm{fmt}.ark")
        with open(p, "wb") as f:
            kaldi_io.write_compressed_mat(f, "utt1", mat, fmt=fmt)
            kaldi_io.write_compressed_mat(f, "utt2", mat * 0.5, fmt=fmt)
        got = dict(kaldi_io.read_mat_ark(p))
        assert set(got) == {"utt1", "utt2"}
        assert got["utt1"].shape == mat.shape
        assert np.abs(got["utt1"] - mat).max() <= tol[fmt], fmt
        assert np.abs(got["utt2"] - mat * 0.5).max() <= tol[fmt], fmt

    # handcrafted format-1 blob: 2 rows, 1 col, known percentiles/codes
    blob = b"utt " + b"\x00B" + b"CM "
    blob += struct.pack("<ffii", 0.0, 10.0, 2, 1)  # min=0, range=10
    # percentiles on the u16 global scale: p0=0, p25=6553(->1.0),
    # p75=45875(->7.0), p100=65535(->10.0)
    blob += struct.pack("<4H", 0, 6553, 45875, 65535)
    blob += bytes([32, 224])  # code 32 -> p0+(p25-p0)*32/64; 224 -> hi seg
    p = str(tmp_path / "hand.ark")
    with open(p, "wb") as f:
        f.write(blob)
    key, m = next(kaldi_io.read_mat_ark(p))
    p25 = 10.0 * 6553 / 65535.0
    p75 = 10.0 * 45875 / 65535.0
    exp0 = 0.0 + (p25 - 0.0) * 32 / 64.0
    exp1 = p75 + (10.0 - p75) * (224 - 192) / 63.0
    np.testing.assert_allclose(m[:, 0], [exp0, exp1], rtol=1e-6)

    # an scp pointing at a compressed entry resolves too
    scp = str(tmp_path / "cm1.scp")
    ark = str(tmp_path / "cm1.ark")
    with open(ark, "rb") as f:
        pass
    with open(scp, "w") as f:
        f.write(f"utt1 {ark}:5\n")  # 'utt1 ' is 5 bytes
    key, m = next(kaldi_io.read_mat_scp(scp))
    assert m.shape == mat.shape


def test_lexicon_words_task():
    """lexicon_size constrains words to a fixed deterministic vocabulary
    (gives the synthetic language LM-exploitable structure)."""
    import dataclasses

    from robust_e2e_gan_tpu.data.synthetic import (
        hard_task, lexicon, sample_transcript, split_words,
    )

    cfg = dataclasses.replace(hard_task(32), lexicon_size=20)
    lex = set(lexicon(cfg))
    assert len(lex) == 20
    # deterministic across config instances (train/dev/eval agree)
    assert set(lexicon(dataclasses.replace(cfg))) == lex
    rng = np.random.default_rng(0)
    for _ in range(10):
        tr = sample_transcript(cfg, rng)
        for w in split_words([int(t) for t in tr], cfg.space_id):
            assert w in lex
    # unconstrained config unaffected
    free = hard_task(32)
    tr = sample_transcript(free, np.random.default_rng(0))
    assert len(tr) > 0


def test_read_shape_header_only(tmp_path, rng):
    """read_shape_at reports (rows, cols) for FM/FV and all CM* formats
    without decoding payloads (round-2 VERDICT missing #2: dataset
    construction must be O(entries), not O(corpus bytes))."""
    mat = rng.standard_normal((17, 13)).astype(np.float32)
    vec = rng.standard_normal((23,)).astype(np.float32)
    ark = str(tmp_path / "mix.ark")
    scp = str(tmp_path / "mix.scp")
    kaldi_io.write_ark_scp(iter([("m", mat), ("v", vec)]), ark, scp)
    idx = kaldi_io.read_scp_index(scp)
    assert kaldi_io.read_shape_at(*idx["m"]) == (17, 13)
    assert kaldi_io.read_shape_at(*idx["v"]) == (23, 1)

    for fmt in (1, 2, 3):
        p = str(tmp_path / f"cm{fmt}.ark")
        with open(p, "wb") as f:
            off = kaldi_io.write_compressed_mat(f, "u", mat, fmt=fmt)
        assert kaldi_io.read_shape_at(p, off) == (17, 13)


def test_dataset_construction_o_header(tmp_path, rng, monkeypatch):
    """from_kaldi / from_kaldi_feats never read full matrices at index
    build time — only blob headers (or the lengths file)."""
    wavs = {f"u{i}": rng.standard_normal(1000 + i).astype(np.float32)
            for i in range(5)}
    feats = {f"u{i}": rng.standard_normal((30 + i, 8)).astype(np.float32)
             for i in range(5)}
    wav_ark, wav_scp = str(tmp_path / "w.ark"), str(tmp_path / "w.scp")
    ft_ark, ft_scp = str(tmp_path / "f.ark"), str(tmp_path / "f.scp")
    kaldi_io.write_ark_scp(iter(wavs.items()), wav_ark, wav_scp)
    kaldi_io.write_ark_scp(iter(feats.items()), ft_ark, ft_scp)
    text = str(tmp_path / "text")
    with open(text, "w") as f:
        f.write("\n".join(f"u{i} hi{i}" for i in range(5)))

    def banned(*a, **k):
        raise AssertionError("full matrix read during index construction")

    monkeypatch.setattr(kaldi_io, "read_mat_at", banned)
    ds = AudioTextDataset.from_kaldi(wav_scp, text)
    assert sorted(u.n_samples for u in ds.utts) == [1000 + i for i in range(5)]
    dsf = AudioTextDataset.from_kaldi_feats(ft_scp, text)
    assert sorted(u.n_samples for u in dsf.utts) == [30 + i for i in range(5)]

    # with utt2num_frames even the header probe is skipped
    u2nf = str(tmp_path / "utt2num_frames")
    with open(u2nf, "w") as f:
        f.write("\n".join(f"u{i} {30 + i}" for i in range(5)))
    monkeypatch.setattr(kaldi_io, "read_shape", banned)
    dsf2 = AudioTextDataset.from_kaldi_feats(ft_scp, text,
                                             utt2num_frames=u2nf)
    assert {u.utt_id: u.n_samples for u in dsf2.utts} == {
        f"u{i}": 30 + i for i in range(5)
    }


def test_prefetcher_close(tmp_path, rng):
    """Abandoning iteration + close() releases the worker thread (round-2
    VERDICT weak #5: no shutdown path left the thread blocked on put)."""
    mf = _write_manifest(tmp_path, rng, n=7)
    ds = AudioTextDataset.from_jsonl(mf)
    batcher = BucketBatcher(ds, batch_size=1, length_buckets=(9000,))
    pf = Prefetcher(batcher.epoch(shuffle=False), depth=1)
    next(pf)  # consume one, leave the rest queued / producer blocked
    pf.close()
    assert not pf.t.is_alive()

    # context-manager form and full drain still work
    with Prefetcher(batcher.epoch(shuffle=False)) as pf2:
        n = sum(1 for _ in pf2)
    assert n == len(batcher)
    pf2.t.join(timeout=5.0)
    assert not pf2.t.is_alive()


def test_dataset_index_cache(tmp_path, rng, monkeypatch):
    """index_cache: first build probes headers and persists the lengths;
    a rebuild reads NO blob headers; modifying the scp invalidates it."""
    import os
    import time

    feats = {f"u{i}": rng.standard_normal((30 + i, 8)).astype(np.float32)
             for i in range(5)}
    ft_ark, ft_scp = str(tmp_path / "f.ark"), str(tmp_path / "f.scp")
    kaldi_io.write_ark_scp(iter(feats.items()), ft_ark, ft_scp)
    text = str(tmp_path / "text")
    with open(text, "w") as f:
        f.write("\n".join(f"u{i} hi{i}" for i in range(5)))
    cache = str(tmp_path / "f.idx.json")

    ds = AudioTextDataset.from_kaldi_feats(ft_scp, text, index_cache=cache)
    lengths1 = {u.utt_id: u.n_samples for u in ds.utts}
    assert os.path.exists(cache)

    def banned(*a, **k):
        raise AssertionError("header probe despite a valid index cache")

    monkeypatch.setattr(kaldi_io, "read_shape", banned)
    ds2 = AudioTextDataset.from_kaldi_feats(ft_scp, text, index_cache=cache)
    assert {u.utt_id: u.n_samples for u in ds2.utts} == lengths1
    monkeypatch.undo()

    # stale cache: rewriting the scp (new mtime/size) forces re-probe
    time.sleep(0.01)
    feats["u5"] = rng.standard_normal((99, 8)).astype(np.float32)
    kaldi_io.write_ark_scp(iter(feats.items()), ft_ark, ft_scp)
    with open(text, "a") as f:
        f.write("\nu5 hi5")
    ds3 = AudioTextDataset.from_kaldi_feats(ft_scp, text, index_cache=cache)
    assert {u.utt_id: u.n_samples for u in ds3.utts}["u5"] == 99

    # wav variant caches sample counts the same way
    wavs = {f"u{i}": rng.standard_normal(1000 + i).astype(np.float32)
            for i in range(4)}
    w_ark, w_scp = str(tmp_path / "w.ark"), str(tmp_path / "w.scp")
    kaldi_io.write_ark_scp(iter(wavs.items()), w_ark, w_scp)
    wcache = str(tmp_path / "w.idx.json")
    AudioTextDataset.from_kaldi(w_scp, text, index_cache=wcache)
    monkeypatch.setattr(kaldi_io, "read_shape", banned)
    dsw = AudioTextDataset.from_kaldi(w_scp, text, index_cache=wcache)
    assert sorted(u.n_samples for u in dsw.utts) == [1000 + i
                                                     for i in range(4)]
