"""WER/CER scoring: Levenshtein edit distance.

Replaces the reference's Kaldi/sclite scoring step (SURVEY.md L5 "Eval /
scoring"). Pure-Python implementation here; a C++ implementation with a
ctypes binding lives in csrc/ (robust_e2e_gan_tpu.utils.native) and is used
automatically when built — scoring happens on host after decode, so it is
deliberately not a JAX op.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance between two token sequences."""
    try:
        from robust_e2e_gan_tpu.utils.native import native_edit_distance

        d = native_edit_distance(ref, hyp)
        if d is not None:
            return d
    except Exception:
        pass
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        ri = ref[i - 1]
        for j in range(1, m + 1):
            cost = 0 if ri == hyp[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[m]


def wer_details(
    refs: List[Sequence], hyps: List[Sequence]
) -> Dict[str, float]:
    """Corpus-level error rate: sum(edit) / sum(ref_len).

    Works for WER (word sequences) or CER (char sequences) depending on how
    the caller tokenizes.
    """
    if len(refs) != len(hyps):
        raise ValueError("refs and hyps must have equal length")
    total = sum(len(r) for r in refs)
    errs = None
    try:
        from robust_e2e_gan_tpu.utils.native import native_edit_distance_corpus

        res = native_edit_distance_corpus(refs, hyps)
        if res is not None:
            errs = res[1]
    except Exception:
        pass
    if errs is None:
        errs = sum(edit_distance(r, h) for r, h in zip(refs, hyps))
    return {
        "errors": float(errs),
        "ref_tokens": float(total),
        "error_rate": errs / max(total, 1),
    }


def bootstrap_wer_ci(
    refs: List[Sequence],
    hyps: List[Sequence],
    n_resamples: int = 1000,
    alpha: float = 0.05,
    seed: int = 0,
) -> Dict[str, float]:
    """Percentile-bootstrap confidence interval on the corpus error rate.

    The reference's Kaldi/sclite workflow reports only point WER; small
    eval sets (e.g. the synthetic paper-claim runs at a few hundred words)
    need an interval before two systems can honestly be ordered. Utterances
    are resampled with replacement (the standard unit for ASR bootstrap,
    Bisani & Ney 2004); per-utterance edit distances are computed once, so
    resampling is O(n_utts) per replicate.
    """
    if len(refs) != len(hyps):
        raise ValueError("refs and hyps must have equal length")
    import numpy as np

    errs = np.array(
        [edit_distance(r, h) for r, h in zip(refs, hyps)], dtype=np.float64
    )
    lens = np.array([len(r) for r in refs], dtype=np.float64)
    n = len(refs)
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n, size=(n_resamples, n))
    rates = errs[idx].sum(axis=1) / np.maximum(lens[idx].sum(axis=1), 1.0)
    lo, hi = np.quantile(rates, [alpha / 2, 1 - alpha / 2])
    return {
        "error_rate": float(errs.sum() / max(lens.sum(), 1.0)),
        "ci_low": float(lo),
        "ci_high": float(hi),
        "confidence": 1.0 - alpha,
        "n_resamples": int(n_resamples),
        "n_utts": int(n),
    }


def score_texts(
    ref_texts: List[str], hyp_texts: List[str]
) -> Dict[str, Dict[str, float]]:
    """Word-level WER + char-level CER from plain-text refs/hyps.

    The reference's end metric is word-level WER via Kaldi/sclite scoring
    (SURVEY.md L5/section 6); round-1 scoring was char-token-level only
    (effectively CER). WER splits on whitespace; CER scores the character
    sequence with whitespace removed (Kaldi score_cer convention).
    """
    ref_words = [t.split() for t in ref_texts]
    hyp_words = [t.split() for t in hyp_texts]
    ref_chars = [list("".join(t.split())) for t in ref_texts]
    hyp_chars = [list("".join(t.split())) for t in hyp_texts]
    wer = wer_details(ref_words, hyp_words)
    # Kaldi/sclite-style S/D/I breakdown on the word alignment
    subs = dels = ins = 0
    for r, h in zip(ref_words, hyp_words):
        s, d, i = align_stats(r, h)
        subs += s
        dels += d
        ins += i
    wer.update({"sub": float(subs), "del": float(dels), "ins": float(ins)})
    return {
        "wer": wer,
        "cer": wer_details(ref_chars, hyp_chars),
    }


def align_stats(ref: Sequence, hyp: Sequence) -> Tuple[int, int, int]:
    """(substitutions, deletions, insertions) from a full DP backtrace."""
    n, m = len(ref), len(hyp)
    dp = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        dp[i][0] = i
    for j in range(m + 1):
        dp[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            dp[i][j] = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1, dp[i - 1][j - 1] + cost)
    subs = dels = ins = 0
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0 and dp[i][j] == dp[i - 1][j - 1] + (
            0 if ref[i - 1] == hyp[j - 1] else 1
        ):
            if ref[i - 1] != hyp[j - 1]:
                subs += 1
            i, j = i - 1, j - 1
        elif i > 0 and dp[i][j] == dp[i - 1][j] + 1:
            dels += 1
            i -= 1
        else:
            ins += 1
            j -= 1
    return subs, dels, ins
