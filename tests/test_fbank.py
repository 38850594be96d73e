"""Feature frontend tests: Kaldi-semantics fbank chain.

Golden-vector strategy (SURVEY.md section 4 / section 7 step 1): the pure-JAX
chain is validated against an independent numpy re-derivation using
np.fft.rfft (different algorithm: true FFT vs DFT-as-matmul), plus invariance
and gradient-flow checks. The Pallas fused kernel is separately parity-tested
against this module in test_fbank_pallas.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from robust_e2e_gan_tpu.config import FrontendConfig
import robust_e2e_gan_tpu.ops.fbank as F


CFG = FrontendConfig()


def numpy_fbank_reference(wav: np.ndarray, cfg: FrontendConfig) -> np.ndarray:
    """Independent numpy implementation with a true FFT (float64)."""
    n = wav.shape[-1]
    t = F.num_frames(n, cfg)
    win = F.window_fn(cfg).astype(np.float64)
    frames = np.stack(
        [wav[i * cfg.frame_shift : i * cfg.frame_shift + cfg.frame_length] for i in range(t)]
    ).astype(np.float64)
    if cfg.remove_dc:
        frames -= frames.mean(axis=-1, keepdims=True)
    if cfg.preemphasis > 0:
        prev = np.concatenate([frames[:, :1], frames[:, :-1]], axis=-1)
        frames = frames - cfg.preemphasis * prev
    frames = frames * win
    spec = np.fft.rfft(frames, n=cfg.n_fft, axis=-1)
    power = np.abs(spec) ** 2
    fb = F.mel_filterbank(cfg).astype(np.float64)
    mel = power @ fb
    return np.log(np.maximum(mel, cfg.log_floor))


def test_num_frames_snip_edges():
    assert F.num_frames(400, CFG) == 1
    assert F.num_frames(399, CFG) == 0
    assert F.num_frames(560, CFG) == 2
    assert F.num_frames(16000, CFG) == 98


def test_fbank_matches_numpy_fft_reference(rng):
    wav = rng.standard_normal(16000).astype(np.float32)
    ref = numpy_fbank_reference(wav, CFG)
    power = F.stft_power(jnp.asarray(wav), CFG)
    got = np.asarray(F.log_mel(power, CFG))
    assert got.shape == ref.shape == (98, CFG.n_mels)
    # DFT-as-matmul in f32 vs FFT in f64; log compresses the error.
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_stft_power_parseval(rng):
    """Parseval sanity: sum of power spectrum ~= n_fft * frame energy."""
    wav = rng.standard_normal(4000).astype(np.float32)
    frames = F.frame_signal(jnp.asarray(wav), CFG)
    frames = np.asarray(frames)
    cfg = FrontendConfig(remove_dc=False, preemphasis=0.0)
    power = np.asarray(F.stft_power(jnp.asarray(wav), cfg))
    win = F.window_fn(cfg)
    for i in range(frames.shape[0]):
        x = frames[i] * win
        lhs = power[i, 0] + power[i, -1] + 2 * power[i, 1:-1].sum()
        rhs = cfg.n_fft * (x**2).sum()
        np.testing.assert_allclose(lhs, rhs, rtol=1e-3)


def test_batched_matches_single(rng):
    wavs = rng.standard_normal((3, 8000)).astype(np.float32)
    batched, _ = F.fbank(jnp.asarray(wavs), CFG, cmvn="none")
    for i in range(3):
        single, _ = F.fbank(jnp.asarray(wavs[i : i + 1]), CFG, cmvn="none")
        # batched vs single matmuls reduce in different orders in f32
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single[0]), rtol=1e-3, atol=1e-3
        )


def test_utterance_cmvn_masked(rng):
    feats = rng.standard_normal((2, 50, 8)).astype(np.float32)
    mask = np.zeros((2, 50), np.float32)
    mask[0, :30] = 1
    mask[1, :50] = 1
    out = np.asarray(F.utterance_cmvn(jnp.asarray(feats), jnp.asarray(mask)))
    # valid region of utt 0: zero mean, unit var over first 30 frames
    np.testing.assert_allclose(out[0, :30].mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(out[0, :30].std(axis=0), 1.0, atol=1e-3)
    # pad region zeroed
    assert np.abs(out[0, 30:]).max() == 0.0
    # stats of utt 0 must not depend on its pad content
    feats2 = feats.copy()
    feats2[0, 30:] = 123.0
    out2 = np.asarray(F.utterance_cmvn(jnp.asarray(feats2), jnp.asarray(mask)))
    np.testing.assert_allclose(out[0, :30], out2[0, :30], rtol=1e-5, atol=1e-6)


def test_fbank_full_chain_with_lengths(rng):
    wavs = rng.standard_normal((2, 16000)).astype(np.float32)
    lengths = jnp.asarray([16000, 8000])
    feats, mask = F.fbank(jnp.asarray(wavs), CFG, wav_lengths=lengths)
    assert feats.shape == (2, 98, CFG.n_mels)
    assert mask.shape == (2, 98)
    n1 = F.num_frames(8000, CFG)
    assert int(mask[1].sum()) == n1
    assert np.abs(np.asarray(feats)[1, n1:]).max() == 0.0


def test_gradients_flow_to_waveform(rng):
    """The whole chain must be differentiable (joint training requirement:
    ASR loss backprops through fbank into the enhancer, SURVEY.md L2)."""
    wav = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32))

    def loss(w):
        feats, _ = F.fbank(w, CFG, cmvn="none")
        return jnp.sum(feats**2)

    g = jax.grad(loss)(wav)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_jit_static_shapes(rng):
    f = jax.jit(lambda w: F.fbank(w, CFG, cmvn="none")[0])
    wav = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
    out1 = f(wav)
    out2 = f(wav + 1e-3)
    assert out1.shape == out2.shape


def test_mel_filterbank_properties():
    fb = F.mel_filterbank(CFG)
    assert fb.shape == (CFG.n_freqs, CFG.n_mels)
    assert (fb >= 0).all()
    assert fb.max() <= 1.0 + 1e-6
    # every filter has support
    assert (fb.sum(axis=0) > 0).all()
