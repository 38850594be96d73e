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
    # ---- hard-task knobs (round-2: the default task saturated at 0% WER,
    # so round deltas meant nothing; see hard_task() below) ----
    # per-utterance SNR drawn uniformly from this range (overrides
    # noise_snr_db when set), e.g. (-3.0, 5.0) dB
    snr_range_db: Optional[Tuple[float, float]] = None
    # multi-word transcripts: words of real tokens separated by a space
    # token (id 2) rendered as a silence gap, so word-level WER is defined
    words: bool = False
    min_words: int = 2
    max_words: int = 5
    min_word_len: int = 1
    max_word_len: int = 4
    # per-token duration jitter (fraction of tone_ms, uniform +/-) so the
    # model cannot segment by fixed position
    tone_jitter: float = 0.0
    # words mode only: draw words from a FIXED lexicon of this many entries
    # instead of uniformly random token strings — gives the language real
    # sequence structure an RNNLM can exploit (None = unconstrained words)
    lexicon_size: Optional[int] = None

    @property
    def space_id(self) -> int:
        return 2  # only emitted when words=True

    @property
    def first_token(self) -> int:
        return 3 if self.words else 2

    @property
    def num_real_tokens(self) -> int:
        return self.vocab_size - self.first_token

    @property
    def max_label_len(self) -> int:
        if self.words:
            return self.max_words * self.max_word_len + self.max_words - 1
        return self.max_tokens

    @property
    def max_samples(self) -> int:
        """Upper bound on one utterance's sample count (for padding)."""
        seg = int(self.tone_ms * self.sample_rate / 1000.0)
        longest = int(np.ceil(seg * (1.0 + self.tone_jitter)))
        return self.max_label_len * longest


def hard_task(vocab_size: int = 32, seed: int = 0) -> SyntheticConfig:
    """Non-saturating benchmark task (round-1 VERDICT missing #3).

    Harder than the default along every axis the verdict named: 29 real
    tokens packed 110 Hz apart (vs 10 tokens 180 Hz apart), multi-word
    transcripts up to ~27 labels (vs 10), utterances up to ~3.5 s (vs
    1.2 s), per-token duration jitter, and per-utterance SNR mixed over
    [-3, +5] dB. Joint adversarial training no longer reaches 0% WER, so
    round-over-round deltas are measurable.
    """
    return SyntheticConfig(
        vocab_size=vocab_size,
        tone_ms=80.0,
        base_freq=220.0,
        freq_step=110.0,  # keeps the 2nd harmonic under Nyquist at vocab 32
        snr_range_db=(-3.0, 5.0),
        words=True,
        min_words=2,
        max_words=7,
        min_word_len=1,
        max_word_len=3,
        tone_jitter=0.3,
        seed=seed,
    )


def _token_wave(token: int, n: int, cfg: SyntheticConfig) -> np.ndarray:
    """Tone + one harmonic, Hann-enveloped, unique per token id."""
    f = cfg.base_freq + (token - cfg.first_token) * cfg.freq_step
    t = np.arange(n) / cfg.sample_rate
    env = np.hanning(n)
    return (np.sin(2 * np.pi * f * t) + 0.5 * np.sin(4 * np.pi * f * t)) * env


def lexicon(cfg: SyntheticConfig) -> List[Tuple[int, ...]]:
    """Deterministic word lexicon for ``lexicon_size`` configs (unique
    words, derived from the config seed so train/dev/eval agree)."""
    rng = np.random.default_rng(cfg.seed + 7777)
    words: List[Tuple[int, ...]] = []
    seen = set()
    while len(words) < cfg.lexicon_size:
        wl = int(rng.integers(cfg.min_word_len, cfg.max_word_len + 1))
        w = tuple(
            int(t) for t in
            rng.integers(cfg.first_token, cfg.vocab_size, size=(wl,))
        )
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def sample_transcript(
    cfg: SyntheticConfig, rng: np.random.Generator
) -> np.ndarray:
    """Draw a transcript: flat token run, or space-separated words."""
    if not cfg.words:
        n_tok = int(rng.integers(cfg.min_tokens, cfg.max_tokens + 1))
        return rng.integers(
            cfg.first_token, cfg.vocab_size, size=(n_tok,)
        ).astype(np.int32)
    lex = lexicon(cfg) if cfg.lexicon_size else None
    n_words = int(rng.integers(cfg.min_words, cfg.max_words + 1))
    out: List[int] = []
    for w in range(n_words):
        if w:
            out.append(cfg.space_id)
        if lex is not None:
            out.extend(lex[int(rng.integers(len(lex)))])
        else:
            wl = int(rng.integers(cfg.min_word_len, cfg.max_word_len + 1))
            out.extend(
                int(t) for t in
                rng.integers(cfg.first_token, cfg.vocab_size, size=(wl,))
            )
    return np.asarray(out, np.int32)


def synth_utterance(
    tokens: np.ndarray, cfg: SyntheticConfig, rng: np.random.Generator
) -> Tuple[np.ndarray, np.ndarray]:
    """tokens -> (clean_wav, noisy_wav), float32."""
    seg = int(cfg.tone_ms * cfg.sample_rate / 1000.0)
    pieces = []
    for tk in tokens:
        n = seg
        if cfg.tone_jitter > 0.0:
            n = int(round(seg * (
                1.0 + cfg.tone_jitter * (2.0 * rng.random() - 1.0)
            )))
        if cfg.words and int(tk) == cfg.space_id:
            pieces.append(np.zeros(n))  # inter-word silence gap
        else:
            pieces.append(_token_wave(int(tk), n, cfg))
    clean = np.concatenate(pieces).astype(np.float32)
    snr_db = cfg.noise_snr_db
    if cfg.snr_range_db is not None:
        lo, hi = cfg.snr_range_db
        snr_db = float(lo + (hi - lo) * rng.random())
    sig_pow = float(np.mean(clean**2) + 1e-9)
    noise_pow = sig_pow / (10.0 ** (snr_db / 10.0))
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
    if max_tokens is not None and not cfg.words:
        from dataclasses import replace

        cfg = replace(cfg, max_tokens=max_tokens)
    label_w = cfg.max_label_len
    pad_to = pad_to_samples or cfg.max_samples
    ys = np.full((batch_size, label_w), ignore_id, np.int32)
    clean = np.zeros((batch_size, pad_to), np.float32)
    noisy = np.zeros((batch_size, pad_to), np.float32)
    lengths = np.zeros((batch_size,), np.int32)
    for i in range(batch_size):
        tokens = sample_transcript(cfg, rng)
        c, x = synth_utterance(tokens, cfg, rng)
        n = min(len(c), pad_to)
        clean[i, :n] = c[:n]
        noisy[i, :n] = x[:n]
        lengths[i] = n
        ys[i, : len(tokens)] = tokens
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


def split_words(ids, space_id: int) -> List[Tuple[int, ...]]:
    """Token ids -> word tuples (split on the space token) for word-WER."""
    words: List[Tuple[int, ...]] = []
    cur: List[int] = []
    for t in ids:
        if int(t) == space_id:
            if cur:
                words.append(tuple(cur))
                cur = []
        else:
            cur.append(int(t))
    if cur:
        words.append(tuple(cur))
    return words
