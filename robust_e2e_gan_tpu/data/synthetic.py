"""Synthetic CHiME-4-shaped dataset: learnable toy audio for tests and bench.

The real CHiME-4 corpus is licensed and not present in this image, so the
framework ships a deterministic synthetic task with the same *shape* as the
reference's data (paired noisy/clean utterances + character transcripts,
SURVEY.md section 2a "Dataset/Loader"): each token is rendered as a fixed
tone+harmonic segment, so transcripts are exactly recoverable from clean
audio and the full train/decode stack can be validated end to end (loss ->
~0, WER -> 0 on clean audio). Noise is additive white + babble-ish AM tones.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np


@dataclass(frozen=True)
class SyntheticConfig:
    vocab_size: int = 12  # ids 0=blank, 1=sos/eos, 2.. = real tokens
    sample_rate: int = 16000
    tone_ms: float = 120.0  # duration of one token's tone segment
    min_tokens: int = 2
    max_tokens: int = 10
    base_freq: float = 220.0
    freq_step: float = 180.0
    noise_snr_db: float = 0.0
    seed: int = 0

    @property
    def first_token(self) -> int:
        return 2

    @property
    def num_real_tokens(self) -> int:
        return self.vocab_size - self.first_token


def _token_wave(token: int, n: int, cfg: SyntheticConfig) -> np.ndarray:
    """Tone + one harmonic, Hann-enveloped, unique per token id."""
    f = cfg.base_freq + (token - cfg.first_token) * cfg.freq_step
    t = np.arange(n) / cfg.sample_rate
    env = np.hanning(n)
    return (np.sin(2 * np.pi * f * t) + 0.5 * np.sin(4 * np.pi * f * t)) * env


def synth_utterance(
    tokens: np.ndarray, cfg: SyntheticConfig, rng: np.random.Generator
) -> Tuple[np.ndarray, np.ndarray]:
    """tokens -> (clean_wav, noisy_wav), float32."""
    seg = int(cfg.tone_ms * cfg.sample_rate / 1000.0)
    clean = np.concatenate([_token_wave(int(tk), seg, cfg) for tk in tokens])
    clean = clean.astype(np.float32)
    sig_pow = float(np.mean(clean**2) + 1e-9)
    noise_pow = sig_pow / (10.0 ** (cfg.noise_snr_db / 10.0))
    noise = rng.standard_normal(clean.shape).astype(np.float32)
    # AM-modulated tone interference ("babble"-ish structured noise)
    t = np.arange(clean.shape[0]) / cfg.sample_rate
    am = (1 + np.sin(2 * np.pi * 3.0 * t)) * np.sin(
        2 * np.pi * (500 + 400 * rng.random()) * t
    )
    noise = noise + am.astype(np.float32)
    noise *= np.sqrt(noise_pow / (np.mean(noise**2) + 1e-9))
    return clean, (clean + noise).astype(np.float32)


def make_batch(
    batch_size: int,
    cfg: SyntheticConfig,
    rng: np.random.Generator,
    max_tokens: Optional[int] = None,
    pad_to_samples: Optional[int] = None,
    ignore_id: int = -1,
) -> Dict[str, np.ndarray]:
    """A padded batch: noisy/clean wav, lengths, padded labels."""
    max_tokens = max_tokens or cfg.max_tokens
    seg = int(cfg.tone_ms * cfg.sample_rate / 1000.0)
    pad_to = pad_to_samples or (max_tokens * seg)
    ys = np.full((batch_size, max_tokens), ignore_id, np.int32)
    clean = np.zeros((batch_size, pad_to), np.float32)
    noisy = np.zeros((batch_size, pad_to), np.float32)
    lengths = np.zeros((batch_size,), np.int32)
    for i in range(batch_size):
        n_tok = int(rng.integers(cfg.min_tokens, max_tokens + 1))
        tokens = rng.integers(
            cfg.first_token, cfg.vocab_size, size=(n_tok,)
        ).astype(np.int32)
        c, x = synth_utterance(tokens, cfg, rng)
        n = min(len(c), pad_to)
        clean[i, :n] = c[:n]
        noisy[i, :n] = x[:n]
        lengths[i] = n
        ys[i, :n_tok] = tokens
    return {
        "clean_wav": clean,
        "noisy_wav": noisy,
        "wav_lengths": lengths,
        "labels": ys,
    }


def batch_iterator(
    batch_size: int,
    cfg: SyntheticConfig,
    steps: int,
    **kwargs,
) -> Iterator[Dict[str, np.ndarray]]:
    rng = np.random.default_rng(cfg.seed)
    for _ in range(steps):
        yield make_batch(batch_size, cfg, rng, **kwargs)


def labels_to_list(ys: np.ndarray, ignore_id: int = -1) -> List[List[int]]:
    return [[int(t) for t in row if t != ignore_id] for row in ys]
