"""Native (C++) scoring kernel tests: build via g++, ctypes binding, parity
with the pure-Python Levenshtein (SURVEY.md L5 scoring)."""

import numpy as np
import pytest

from robust_e2e_gan_tpu.ops.editdistance import edit_distance, wer_details
from robust_e2e_gan_tpu.utils import native


def _py_edit(ref, hyp):
    n, m = len(ref), len(hyp)
    dp = list(range(m + 1))
    for i in range(1, n + 1):
        prev_diag, dp[0] = dp[0], i
        for j in range(1, m + 1):
            cur = min(
                dp[j] + 1, dp[j - 1] + 1,
                prev_diag + (0 if ref[i - 1] == hyp[j - 1] else 1),
            )
            prev_diag, dp[j] = dp[j], cur
    return dp[m]


def test_native_builds_and_matches():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    rng = np.random.default_rng(0)
    for _ in range(30):
        r = list(rng.integers(0, 5, size=rng.integers(0, 20)))
        h = list(rng.integers(0, 5, size=rng.integers(0, 20)))
        assert native.native_edit_distance(r, h) == _py_edit(r, h)


def test_native_corpus_matches():
    if native.get_lib() is None:
        pytest.skip("no C++ toolchain available")
    rng = np.random.default_rng(1)
    refs = [list(rng.integers(0, 8, size=rng.integers(1, 30)))
            for _ in range(50)]
    hyps = [list(rng.integers(0, 8, size=rng.integers(0, 30)))
            for _ in range(50)]
    per, total = native.native_edit_distance_corpus(refs, hyps, n_threads=4)
    expect = [_py_edit(r, h) for r, h in zip(refs, hyps)]
    assert list(per) == expect
    assert total == sum(expect)


def test_edit_distance_strings():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([], [1, 2]) == 2
    d = wer_details([["a", "b"], ["c"]], [["a"], ["c"]])
    assert d["errors"] == 1.0 and d["ref_tokens"] == 3.0


def test_native_npy_batch_loader(tmp_path):
    """Threaded C++ .npy batch reader == numpy loads, incl. f8 + truncation."""
    if native.get_lib() is None:
        pytest.skip("no C++ toolchain available")
    rng = np.random.default_rng(3)
    paths, arrays = [], []
    for i, (n, dt) in enumerate([(100, np.float32), (250, np.float64),
                                 (7, np.float32), (300, np.float32)]):
        a = rng.standard_normal(n).astype(dt)
        p = str(tmp_path / f"w{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a.astype(np.float32))
    pad_to = 200
    out, lens = native.native_load_npy_batch(paths, pad_to)
    assert out.shape == (4, pad_to) and out.dtype == np.float32
    for i, a in enumerate(arrays):
        assert lens[i] == len(a)
        n = min(len(a), pad_to)
        np.testing.assert_allclose(out[i, :n], a[:n], rtol=1e-6)
        assert np.all(out[i, n:] == 0.0)

    # ill-formed file raises (identifies the culprit)
    bad = str(tmp_path / "bad.npy")
    open(bad, "wb").write(b"not-npy")
    with pytest.raises(IOError, match="bad.npy"):
        native.native_load_npy_batch([paths[0], bad], 50)


def test_batcher_native_matches_python(tmp_path):
    """BucketBatcher collation identical with and without the native path."""
    import json as _json

    from robust_e2e_gan_tpu.data import dataset as ds_mod
    from robust_e2e_gan_tpu.data.dataset import AudioTextDataset, BucketBatcher

    rng = np.random.default_rng(5)
    entries = []
    for i in range(5):
        n = int(rng.integers(500, 3000))
        np.save(tmp_path / f"n{i}.npy", rng.standard_normal(n).astype(np.float32))
        np.save(tmp_path / f"c{i}.npy", rng.standard_normal(n).astype(np.float32))
        entries.append({"utt_id": f"u{i}", "noisy": f"n{i}.npy",
                        "clean": f"c{i}.npy", "text": "ab", "n_samples": n})
    mf = tmp_path / "m.jsonl"
    mf.write_text("\n".join(_json.dumps(e) for e in entries))
    ds = AudioTextDataset.from_jsonl(str(mf))

    def run():
        b = BucketBatcher(ds, batch_size=3, length_buckets=(4000,))
        return list(b.epoch(shuffle=False))

    native_batches = run()
    # force the Python fallback
    import robust_e2e_gan_tpu.utils.native as nat
    orig = nat.native_load_npy_batch
    nat.native_load_npy_batch = lambda *a, **k: None
    try:
        py_batches = run()
    finally:
        nat.native_load_npy_batch = orig
    assert len(native_batches) == len(py_batches)
    for a, b in zip(native_batches, py_batches):
        for k in ("noisy_wav", "clean_wav", "wav_lengths", "labels"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_score_texts_word_and_char():
    from robust_e2e_gan_tpu.ops.editdistance import score_texts

    refs = ["the cat sat", "hello world"]
    hyps = ["the cat sat", "hello word"]
    r = score_texts(refs, hyps)
    assert r["wer"]["ref_tokens"] == 5.0  # words
    assert r["wer"]["errors"] == 1.0  # world->word substitution
    assert r["cer"]["ref_tokens"] == float(
        len("thecatsat") + len("helloworld")
    )
    assert r["cer"]["errors"] == 1.0  # one deleted char
    # perfect hyp scores zero on both
    p = score_texts(["a b"], ["a b"])
    assert p["wer"]["error_rate"] == 0.0 and p["cer"]["error_rate"] == 0.0


def test_score_texts_sdi_breakdown():
    from robust_e2e_gan_tpu.ops.editdistance import score_texts

    r = score_texts(["a b c", "x y"], ["a q c d", "x"])
    # b->q substitution, d inserted, y deleted
    assert r["wer"]["sub"] == 1.0
    assert r["wer"]["ins"] == 1.0
    assert r["wer"]["del"] == 1.0
    assert r["wer"]["errors"] == 3.0


def test_native_kaldi_feats_batch(tmp_path):
    """C++ threaded Kaldi feats reader == Python kaldi_io decode for FM,
    DM, and all three compressed formats; batch equals Python collation."""
    import numpy as np

    from robust_e2e_gan_tpu.data import kaldi_io
    from robust_e2e_gan_tpu.utils.native import (
        get_lib, native_load_kaldi_feats_batch,
    )

    if get_lib() is None:
        import pytest

        pytest.skip("no native toolchain")

    rng = np.random.default_rng(0)
    ark = str(tmp_path / "m.ark")
    entries = []
    mats = []
    with open(ark, "wb") as f:
        for i, fmt in enumerate(("fm", "cm1", "cm2", "cm3", "fm")):
            t = 10 + 7 * i
            m = (rng.standard_normal((t, 12)) * 3).astype(np.float32)
            if fmt == "fm":
                off = kaldi_io.write_mat(f, f"u{i}", m)
            else:
                off = kaldi_io.write_compressed_mat(
                    f, f"u{i}", m, fmt=int(fmt[2])
                )
            entries.append((ark, off))
            mats.append(m)

    pad_to = 48
    res = native_load_kaldi_feats_batch(entries, pad_to, 12)
    assert res is not None
    batch, lens = res
    assert batch.shape == (5, pad_to, 12)
    for i, m in enumerate(mats):
        assert lens[i] == m.shape[0]
        ref = kaldi_io.read_mat_at(*entries[i])  # Python decode (oracle)
        n = min(ref.shape[0], pad_to)
        np.testing.assert_allclose(batch[i, :n], ref[:n], rtol=1e-5,
                                   atol=1e-5)
        assert np.all(batch[i, n:] == 0.0)

    # truncation path: pad_to below the longest matrix
    res2 = native_load_kaldi_feats_batch(entries, 8, 12)
    batch2, lens2 = res2
    assert batch2.shape == (5, 8, 12)
    assert lens2[1] == mats[1].shape[0]  # true rows reported, data clipped


def test_bootstrap_wer_ci_closed_form():
    """Percentile bootstrap vs closed-form cases.

    (1) Identical utterances: every resample has the same WER, so the CI
        collapses to the point estimate exactly.
    (2) Two utterances, one perfect (0/1) and one fully wrong (1/1):
        a size-2 resample takes WER values {0, 1/2, 1} with probabilities
        {1/4, 1/2, 1/4}; the 2.5th/97.5th percentiles of that discrete
        distribution are 0 and 1, so with enough resamples the 95% CI must
        be exactly [0, 1].
    """
    from robust_e2e_gan_tpu.ops.editdistance import bootstrap_wer_ci

    # (1) degenerate: 8 copies of the same (1 error / 2 words) utterance
    refs = [["a", "b"]] * 8
    hyps = [["a", "x"]] * 8
    ci = bootstrap_wer_ci(refs, hyps, n_resamples=500, seed=1)
    assert ci["error_rate"] == 0.5
    assert ci["ci_low"] == 0.5 and ci["ci_high"] == 0.5

    # (2) two-point distribution: closed-form percentiles
    refs = [["a"], ["b"]]
    hyps = [["a"], ["x"]]
    ci = bootstrap_wer_ci(refs, hyps, n_resamples=4000, seed=0)
    assert ci["error_rate"] == 0.5
    assert ci["ci_low"] == 0.0 and ci["ci_high"] == 1.0
    assert ci["confidence"] == 0.95 and ci["n_utts"] == 2

    # determinism under a fixed seed
    ci2 = bootstrap_wer_ci(refs, hyps, n_resamples=4000, seed=0)
    assert ci == ci2
