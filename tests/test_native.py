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
