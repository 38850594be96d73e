"""Fused Pallas frontend parity vs the pure-JAX chain (BASELINE north-star:
fbank parity; SURVEY.md section 7 step 1). Runs in interpret mode on the CPU
test platform; the same kernel compiles on TPU (driven by scripts/)."""

import numpy as np
import jax.numpy as jnp

from robust_e2e_gan_tpu.config import FrontendConfig
from robust_e2e_gan_tpu.ops.fbank import fbank
from robust_e2e_gan_tpu.ops.fbank_pallas import fbank_fused

CFG = FrontendConfig(n_mels=40)


def _signal(rng, b, n):
    t = np.arange(n) / CFG.sample_rate
    x = np.stack([
        np.sin(2 * np.pi * (200 + 40 * i) * t)
        + 0.3 * rng.standard_normal(n)
        for i in range(b)
    ])
    return x.astype(np.float32)


def test_fused_matches_pure_jax(rng):
    wav = jnp.asarray(_signal(rng, 2, 16000))
    ref, _ = fbank(wav, CFG, cmvn="utterance")
    got, mask = fbank_fused(wav, CFG)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-3, atol=2e-3
    )
    assert float(jnp.mean((got - ref) ** 2)) < 1e-7  # parity MSE metric


def test_fused_ragged_lengths(rng):
    wav = jnp.asarray(_signal(rng, 3, 12000))
    lengths = jnp.asarray([12000, 7000, 4800], jnp.int32)
    ref, ref_mask = fbank(wav, CFG, wav_lengths=lengths, cmvn="utterance")
    got, mask = fbank_fused(wav, CFG, wav_lengths=lengths)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref_mask))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-3, atol=2e-3
    )
    # pad frames are exact zeros
    assert np.all(np.asarray(got)[np.asarray(mask) == 0.0] == 0.0)


def test_fused_short_and_empty(rng):
    # shorter than one frame -> zero frames
    wav = jnp.zeros((2, 300), jnp.float32)
    feats, mask = fbank_fused(wav, CFG)
    assert feats.shape == (2, 0, CFG.n_mels)

    # exactly one frame
    wav = jnp.asarray(_signal(rng, 1, CFG.frame_length))
    ref, _ = fbank(wav, CFG, cmvn="utterance")
    got, _ = fbank_fused(wav, CFG)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-3, atol=2e-3
    )


def test_fused_no_var_norm(rng):
    wav = jnp.asarray(_signal(rng, 2, 8000))
    from robust_e2e_gan_tpu.ops.fbank import log_mel, stft_power, utterance_cmvn

    power = stft_power(wav, CFG)
    ref = utterance_cmvn(log_mel(power, CFG), None, norm_var=False)
    got, _ = fbank_fused(wav, CFG, norm_var=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-3, atol=2e-3
    )
