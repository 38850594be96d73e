"""Global CMVN statistics: accumulate, save/load (Kaldi format), apply.

Reference parity: the reference's offline pipeline ran Kaldi
compute-cmvn-stats and apply-cmvn (SURVEY.md L0, section 2b); feature
normalization stats were consumed from `cmvn` arks. This module reproduces
the stats layout — a (2, dim+1) matrix with row0 = [sum(x), count] and
row1 = [sum(x^2), 0] — so stats interchange with Kaldi tooling, while the
application path is ops.fbank.apply_cmvn on device.
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

import numpy as np

from robust_e2e_gan_tpu.data import kaldi_io


class CmvnAccumulator:
    """Streaming accumulator over (T, D) feature matrices."""

    def __init__(self, dim: int):
        self.sum = np.zeros(dim, np.float64)
        self.sumsq = np.zeros(dim, np.float64)
        self.count = 0.0

    def add(self, feats: np.ndarray, mask: Optional[np.ndarray] = None):
        f = np.asarray(feats, np.float64)
        if f.ndim != 2:
            raise ValueError(f"expected (T, D), got {f.shape}")
        if mask is not None:
            f = f[np.asarray(mask) > 0]
        self.sum += f.sum(axis=0)
        self.sumsq += (f * f).sum(axis=0)
        self.count += f.shape[0]

    def stats(self) -> np.ndarray:
        """Kaldi-layout (2, D+1) stats matrix."""
        d = self.sum.shape[0]
        out = np.zeros((2, d + 1), np.float64)
        out[0, :d] = self.sum
        out[0, d] = self.count
        out[1, :d] = self.sumsq
        return out.astype(np.float32)

    def mean_inv_std(self, eps: float = 1e-8) -> Tuple[np.ndarray, np.ndarray]:
        return stats_to_mean_inv_std(self.stats(), eps)


def stats_to_mean_inv_std(
    stats: np.ndarray, eps: float = 1e-8
) -> Tuple[np.ndarray, np.ndarray]:
    """Kaldi (2, D+1) stats -> (mean, inv_std) for ops.fbank.apply_cmvn."""
    stats = np.asarray(stats, np.float64)
    d = stats.shape[1] - 1
    count = max(stats[0, d], 1.0)
    mean = stats[0, :d] / count
    var = np.maximum(stats[1, :d] / count - mean * mean, eps)
    return mean.astype(np.float32), (1.0 / np.sqrt(var)).astype(np.float32)


def compute_cmvn_stats(
    feature_iter: Iterable[np.ndarray], dim: int
) -> np.ndarray:
    """Accumulate over an iterator of (T, D) matrices -> Kaldi stats."""
    acc = CmvnAccumulator(dim)
    for f in feature_iter:
        acc.add(f)
    return acc.stats()


def save_cmvn_ark(stats: np.ndarray, path: str, key: str = "global") -> None:
    with open(path, "wb") as f:
        kaldi_io.write_mat(f, key, stats)


def load_cmvn_ark(path: str) -> np.ndarray:
    _, stats = next(kaldi_io.read_mat_ark(path))
    return stats
