"""Mixed-precision (bfloat16), rematerialization, and global-CMVN tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from robust_e2e_gan_tpu.config import (
    AttentionConfig,
    DecoderConfig,
    DiscriminatorConfig,
    E2EConfig,
    EncoderConfig,
    EnhancerConfig,
    FrontendConfig,
    JointConfig,
    TrainConfig,
)
from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, make_batch
from robust_e2e_gan_tpu.models.enhancement import Discriminator
from robust_e2e_gan_tpu.pipeline import RobustE2E, build_model
from robust_e2e_gan_tpu.train.steps import init_train_state, make_joint_train_step

VOCAB = 12


def _jcfg(**kw):
    return JointConfig(
        e2e=E2EConfig(
            frontend=FrontendConfig(n_mels=24, **kw.get("frontend", {})),
            encoder=EncoderConfig(
                input_dim=24, vgg_channels=(4, 8), num_layers=1,
                hidden_dim=32, proj_dim=32,
                remat=kw.get("remat", False),
            ),
            attention=AttentionConfig(dim=24, conv_channels=4, conv_kernel=11),
            decoder=DecoderConfig(vocab_size=VOCAB, embed_dim=16, hidden_dim=32),
        ),
        enhancer=EnhancerConfig(input_dim=257, num_layers=1, hidden_dim=32,
                                remat=kw.get("remat", False)),
        discriminator=DiscriminatorConfig(input_dim=24, channels=(4, 8)),
        compute_dtype=kw.get("compute_dtype", "float32"),
    )


def _batch(n=2):
    rng = np.random.default_rng(0)
    scfg = SyntheticConfig(vocab_size=VOCAB, max_tokens=3, min_tokens=2)
    return {
        k: jnp.asarray(v)
        for k, v in make_batch(n, scfg, rng, ignore_id=-1).items()
    }


def test_bfloat16_train_step_finite():
    """bf16 compute path: params stay f32, losses finite, step runs."""
    jcfg = _jcfg(compute_dtype="bfloat16")
    model = build_model(jcfg)
    assert model.dtype == jnp.bfloat16
    disc = Discriminator(jcfg.discriminator, dtype=jnp.bfloat16)
    tcfg = TrainConfig(optimizer="adam", learning_rate=1e-3)
    batch = _batch()
    state, opt_g, opt_d = init_train_state(model, disc, tcfg, batch, seed=0)
    # master params are float32 (mixed precision)
    for leaf in jax.tree_util.tree_leaves(state.params_g):
        assert leaf.dtype == jnp.float32, leaf.dtype
    step = make_joint_train_step(model, disc, jcfg, opt_g, opt_d)
    state, metrics = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)


def test_remat_matches_no_remat():
    """jax.checkpoint on BLSTM layers changes memory, not math: same loss
    and same grads as the plain path."""
    batch = _batch()
    tcfg = TrainConfig(optimizer="adam", learning_rate=1e-3)
    results = {}
    for remat in (False, True):
        jcfg = _jcfg(remat=remat)
        model = build_model(jcfg)
        disc = Discriminator(jcfg.discriminator)
        state, opt_g, opt_d = init_train_state(model, disc, tcfg, batch, seed=0)
        step = make_joint_train_step(model, disc, jcfg, opt_g, opt_d)
        _, metrics = step(state, batch)
        results[remat] = {k: float(v) for k, v in metrics.items()}
    for k in results[False]:
        np.testing.assert_allclose(
            results[True][k], results[False][k], rtol=5e-4, atol=5e-5,
            err_msg=k,
        )


def test_global_cmvn_path():
    """cmvn='global' applies provided stats and matches manual normalize."""
    from robust_e2e_gan_tpu.ops.fbank import log_mel, stft_power

    jcfg = _jcfg(frontend={"cmvn": "global"})
    mean = np.linspace(-1, 1, 24).astype(np.float32)
    inv_std = np.linspace(0.5, 2.0, 24).astype(np.float32)
    model = RobustE2E(jcfg, cmvn_stats=(mean, inv_std))
    batch = _batch()
    params = model.init(
        jax.random.PRNGKey(0), batch["clean_wav"], batch["wav_lengths"],
        batch["labels"], method=RobustE2E.asr_forward,
    )["params"]
    power, fmask = model.apply(
        {"params": params}, batch["clean_wav"], batch["wav_lengths"],
        method=RobustE2E.noisy_power,
    )
    feats = model.apply(
        {"params": params}, power, fmask,
        method=RobustE2E.features_from_power,
    )
    expect = (np.asarray(log_mel(power, jcfg.e2e.frontend)) - mean) * inv_std
    expect *= np.asarray(fmask)[..., None]
    np.testing.assert_allclose(np.asarray(feats), expect, rtol=1e-5, atol=1e-5)

    # missing stats -> clear error
    model2 = RobustE2E(jcfg)
    with pytest.raises(ValueError, match="cmvn_stats"):
        model2.apply(
            {"params": params}, power, fmask,
            method=RobustE2E.features_from_power,
        )
