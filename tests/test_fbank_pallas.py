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


def test_fused_trainable_gradient_parity(rng):
    """custom_vjp backward kernel == autodiff through the pure-JAX chain
    (round-1 VERDICT missing #5), including ragged lengths."""
    import jax

    from robust_e2e_gan_tpu.ops.fbank_pallas import fbank_fused_trainable

    wav = jnp.asarray(_signal(rng, 3, 9600))
    lengths = jnp.asarray([9600, 6000, 4800], jnp.int32)
    # a generic scalar readout so every output element gets a distinct
    # cotangent
    w = jnp.asarray(
        rng.standard_normal((58, CFG.n_mels)).astype(np.float32)
    )

    def loss_fused(x):
        feats, _ = fbank_fused_trainable(x, CFG, wav_lengths=lengths)
        return jnp.sum(feats * w[None, : feats.shape[1]])

    def loss_ref(x):
        feats, _ = fbank(x, CFG, wav_lengths=lengths, cmvn="utterance")
        return jnp.sum(feats * w[None, : feats.shape[1]])

    v_f, g_f = jax.value_and_grad(loss_fused)(wav)
    v_r, g_r = jax.value_and_grad(loss_ref)(wav)
    np.testing.assert_allclose(float(v_f), float(v_r), rtol=1e-4)
    g_f, g_r = np.asarray(g_f), np.asarray(g_r)
    denom = np.abs(g_r).max()
    np.testing.assert_allclose(g_f / denom, g_r / denom, rtol=1e-4,
                               atol=1e-4)
    # samples past each utterance's length get zero gradient on both sides
    for i, n in enumerate([9600, 6000, 4800]):
        # frames cover ceil-ish boundaries; beyond last full frame -> 0
        assert np.all(g_f[i, n:] == 0.0)


def test_fused_trainable_no_var_norm_grad(rng):
    import jax

    from robust_e2e_gan_tpu.ops.fbank import log_mel, stft_power, utterance_cmvn
    from robust_e2e_gan_tpu.ops.fbank_pallas import fbank_fused_trainable

    wav = jnp.asarray(_signal(rng, 2, 8000))

    def loss_fused(x):
        feats, _ = fbank_fused_trainable(x, CFG, norm_var=False)
        return jnp.sum(jnp.tanh(feats))

    def loss_ref(x):
        power = stft_power(x, CFG)
        feats = utterance_cmvn(log_mel(power, CFG), None, norm_var=False)
        return jnp.sum(jnp.tanh(feats))

    g_f = np.asarray(jax.grad(loss_fused)(wav))
    g_r = np.asarray(jax.grad(loss_ref)(wav))
    denom = np.abs(g_r).max()
    np.testing.assert_allclose(g_f / denom, g_r / denom, rtol=1e-4,
                               atol=1e-4)


def test_fused_frontend_pipeline_parity(rng):
    """FrontendConfig.fused routes the clean-ASR pretrain forward through
    the trainable fused kernel with matching losses AND gradients."""
    import dataclasses

    import jax

    from robust_e2e_gan_tpu.config import (
        AttentionConfig, DecoderConfig, DiscriminatorConfig, E2EConfig,
        EncoderConfig, EnhancerConfig, JointConfig,
    )
    from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, make_batch
    from robust_e2e_gan_tpu.pipeline import RobustE2E

    def jcfg(fused):
        return JointConfig(
            e2e=E2EConfig(
                frontend=FrontendConfig(n_mels=24, fused=fused),
                encoder=EncoderConfig(input_dim=24, vgg_channels=(4, 8),
                                      num_layers=1, hidden_dim=32,
                                      proj_dim=32),
                attention=AttentionConfig(dim=24, conv_channels=4,
                                          conv_kernel=11),
                decoder=DecoderConfig(vocab_size=12, embed_dim=16,
                                      hidden_dim=32),
            ),
            enhancer=EnhancerConfig(input_dim=257, num_layers=1,
                                    hidden_dim=32),
            discriminator=DiscriminatorConfig(input_dim=24, channels=(4, 8)),
        )

    scfg = SyntheticConfig(vocab_size=12, min_tokens=2, max_tokens=3)
    batch = make_batch(2, scfg, np.random.default_rng(0), ignore_id=-1)
    wav = jnp.asarray(batch["noisy_wav"])
    lens = jnp.asarray(batch["wav_lengths"])
    ys = jnp.asarray(batch["labels"])

    m_ref = RobustE2E(jcfg(False))
    m_fused = RobustE2E(jcfg(True))
    params = m_ref.init(
        jax.random.PRNGKey(0), wav, lens, ys, use_enhancer=False,
        method=RobustE2E.asr_forward,
    )["params"]

    def loss(model, p):
        out = model.apply({"params": p}, wav, lens, ys, use_enhancer=False,
                          method=RobustE2E.asr_forward)
        return out["loss"]

    l_ref, g_ref = jax.value_and_grad(lambda p: loss(m_ref, p))(params)
    l_fus, g_fus = jax.value_and_grad(lambda p: loss(m_fused, p))(params)
    np.testing.assert_allclose(float(l_fus), float(l_ref), rtol=1e-4)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    flat_f = jax.tree_util.tree_leaves(g_fus)
    for a, b in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
