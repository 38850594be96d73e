"""End-to-end pipeline tests: BASELINE configs 1-2 and the alternating
adversarial step (SURVEY.md section 4: 'GAN-step determinism tests under
fixed PRNG keys'; section 7 steps 2/4)."""

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
from robust_e2e_gan_tpu.ops.ctc import ctc_greedy_decode
from robust_e2e_gan_tpu.pipeline import RobustE2E
from robust_e2e_gan_tpu.train.steps import (
    init_train_state,
    make_asr_pretrain_step,
    make_joint_train_step,
)

VOCAB = 12
FCFG = FrontendConfig(n_mels=24)
JCFG = JointConfig(
    e2e=E2EConfig(
        frontend=FCFG,
        encoder=EncoderConfig(input_dim=24, vgg_channels=(4, 8), num_layers=1,
                              hidden_dim=32, proj_dim=32),
        attention=AttentionConfig(dim=24, conv_channels=4, conv_kernel=11),
        decoder=DecoderConfig(vocab_size=VOCAB, embed_dim=16, hidden_dim=32),
    ),
    enhancer=EnhancerConfig(input_dim=257, num_layers=1, hidden_dim=32),
    discriminator=DiscriminatorConfig(input_dim=24, channels=(4, 8)),
)
SCFG = SyntheticConfig(vocab_size=VOCAB, max_tokens=4, min_tokens=2)
TCFG = TrainConfig(optimizer="adam", learning_rate=1e-3, batch_size=2)


@pytest.fixture(scope="module")
def setup():
    model = RobustE2E(JCFG)
    disc = Discriminator(JCFG.discriminator)
    rng = np.random.default_rng(0)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_batch(2, SCFG, rng, ignore_id=-1).items()
    }
    state, opt_g, opt_d = init_train_state(model, disc, TCFG, batch, seed=0)
    return model, disc, batch, state, opt_g, opt_d


def test_config1_single_utterance_greedy_ctc(setup):
    """BASELINE config 1: fbank frontend + greedy CTC decode, batch=1."""
    model, _, batch, state, _, _ = setup
    wav = batch["clean_wav"][:1]
    lens = batch["wav_lengths"][:1]
    hs, hmask, hlens, ctc_logits, enc_proj = model.apply(
        {"params": state.params_g}, wav, lens,
        use_enhancer=False, method=RobustE2E.encode_for_decode,
    )
    assert ctc_logits.shape[-1] == VOCAB
    hyp = ctc_greedy_decode(ctc_logits, hlens)
    assert hyp.shape == ctc_logits.shape[:2]  # on-device, dense output


def test_config2_enhancer_inference(setup):
    """BASELINE config 2: mask-based denoising of a noisy batch."""
    model, _, batch, state, _, _ = setup
    enhanced, tf_mask, fmask = model.apply(
        {"params": state.params_g},
        batch["noisy_wav"], batch["wav_lengths"],
        method=RobustE2E.enhance,
    )
    assert enhanced.shape == tf_mask.shape
    assert enhanced.shape[-1] == JCFG.enhancer.input_dim
    m = np.asarray(tf_mask)
    fm = np.asarray(fmask) > 0
    assert (m[fm] >= 0).all() and (m[fm] <= 1).all()


def test_asr_pretrain_step_runs_and_descends(setup):
    model, disc, batch, _, opt_g, opt_d = setup
    # fresh state: jitted steps donate their input state
    s, _, _ = init_train_state(model, disc, TCFG, batch, seed=1)
    step = make_asr_pretrain_step(model, opt_g)
    losses = []
    for _ in range(5):
        s, metrics = step(s, batch)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]  # same batch: must descend


def test_joint_train_step_runs(setup):
    model, disc, batch, _, opt_g, opt_d = setup
    state, _, _ = init_train_state(model, disc, TCFG, batch, seed=2)
    step = make_joint_train_step(model, disc, JCFG, opt_g, opt_d)
    s, metrics = step(state, batch)
    for k in ("loss_g", "loss_d", "loss_adv", "loss_enh", "loss_asr", "acc"):
        assert np.isfinite(float(metrics[k])), k
    assert int(s.step) == 1


def test_joint_step_determinism(setup):
    """Same state + same batch -> bitwise-identical metrics (fixed PRNG)."""
    model, disc, batch, _, opt_g, opt_d = setup
    # fresh states (the fixture's state may have been donated)
    s1, og, od = init_train_state(model, disc, TCFG, batch, seed=7)
    s2, _, _ = init_train_state(model, disc, TCFG, batch, seed=7)
    step = make_joint_train_step(model, disc, JCFG, og, od)
    _, m1 = step(s1, batch)
    m1 = {k: float(v) for k, v in m1.items()}
    _, m2 = step(s2, batch)
    m2 = {k: float(v) for k, v in m2.items()}
    assert m1 == m2


def test_gan_pretrain_regime(setup):
    """with_asr=False: enhancement-GAN pretraining (train script (b))."""
    model, disc, batch, _, opt_g, opt_d = setup
    s, _, _ = init_train_state(model, disc, TCFG, batch, seed=3)
    step = make_joint_train_step(model, disc, JCFG, opt_g, opt_d, with_asr=False)
    s, metrics = step(s, batch)
    assert "loss_asr" not in metrics
    assert np.isfinite(float(metrics["loss_g"]))
    # enh loss should descend on a repeated batch
    l0 = float(metrics["loss_enh"])
    for _ in range(4):
        s, metrics = step(s, batch)
    assert float(metrics["loss_enh"]) < l0
