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


def _spec_batch(model, state, batch):
    """Precompute linear power spectra from the synthetic waveforms (what a
    Kaldi spectrogram feats.scp would ship, in the linear domain)."""
    noisy, fmask = model.apply(
        {"params": state.params_g}, batch["noisy_wav"],
        batch["wav_lengths"], method=RobustE2E.noisy_power,
    )
    clean, _ = model.apply(
        {"params": state.params_g}, batch["clean_wav"],
        batch["wav_lengths"], method=RobustE2E.noisy_power,
    )
    flens = jnp.sum(fmask, axis=-1).astype(jnp.int32)
    return {
        "feats": noisy, "clean_feats": clean, "feat_lengths": flens,
        "labels": batch["labels"],
    }


def test_spec_joint_matches_wav_joint(setup):
    """Precomputed-SPECTROGRAM joint path == waveform joint path when the
    spectra come from the same frontend (round-2 VERDICT missing #3: the
    joint adversarial objective on precomputed inputs)."""
    model, disc, batch, state, _, _ = setup
    sb = _spec_batch(model, state, batch)
    out_wav = model.apply(
        {"params": state.params_g}, batch["noisy_wav"], batch["clean_wav"],
        batch["wav_lengths"], batch["labels"],
        method=RobustE2E.joint_forward,
    )
    out_spec = model.apply(
        {"params": state.params_g}, sb["feats"], sb["clean_feats"],
        sb["feat_lengths"], batch["labels"],
        method=RobustE2E.joint_forward_spec,
    )
    for k in ("loss", "loss_ctc", "loss_att", "acc"):
        np.testing.assert_allclose(
            float(out_wav[k]), float(out_spec[k]), rtol=1e-5, atol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(out_wav["enhanced_power"]),
        np.asarray(out_spec["enhanced_power"]), rtol=1e-5, atol=1e-6,
    )

    # log-domain input round-trips through exp
    out_log = model.apply(
        {"params": state.params_g},
        jnp.log(jnp.maximum(sb["feats"], 1e-10)),
        jnp.log(jnp.maximum(sb["clean_feats"], 1e-10)),
        sb["feat_lengths"], batch["labels"], log_domain=True,
        method=RobustE2E.joint_forward_spec,
    )
    np.testing.assert_allclose(
        float(out_spec["loss"]), float(out_log["loss"]), rtol=1e-4
    )


def test_spec_joint_train_step_grads_reach_G(setup):
    """input_kind='spec' joint train step: gradients flow into the enhancer
    and the step descends — the headline adversarial capability on
    precomputed features."""
    import jax as _jax
    import optax

    model, disc, batch, state0, _, _ = setup
    sb = _spec_batch(model, state0, batch)
    state, opt_g, opt_d = init_train_state(
        model, disc, TCFG, sb, seed=4, input_kind="spec"
    )

    # direct gradient check: d loss_g / d enhancer params != 0
    from robust_e2e_gan_tpu.train.steps import _gan_terms

    def g_loss(params_g):
        loss_g, _, _, _, _ = _gan_terms(
            model, disc, JCFG, params_g, state.params_d, sb,
            with_asr=True, input_kind="spec",
        )
        return loss_g

    grads = _jax.grad(g_loss)(state.params_g)
    enh_norm = optax.global_norm(grads["enhancer"])
    assert float(enh_norm) > 0.0

    step = make_joint_train_step(model, disc, JCFG, opt_g, opt_d,
                                 with_asr=True, input_kind="spec")
    losses = []
    for _ in range(4):
        state, metrics = step(state, sb)
        losses.append(float(metrics["loss_asr"]))
        for k in ("loss_g", "loss_d", "loss_adv", "loss_enh"):
            assert np.isfinite(float(metrics[k])), k
    assert losses[-1] < losses[0]


def test_spec_decode_matches_wav_decode(setup):
    """encode_for_decode_spec on precomputed spectra == encode_for_decode
    on the source waveforms; the beam searcher runs through it."""
    from robust_e2e_gan_tpu.config import BeamSearchConfig
    from robust_e2e_gan_tpu.decode.beam import make_beam_searcher

    model, disc, batch, state, _, _ = setup
    sb = _spec_batch(model, state, batch)
    hs_w, _, hlens_w, ctc_w, _ = model.apply(
        {"params": state.params_g}, batch["noisy_wav"],
        batch["wav_lengths"], True, method=RobustE2E.encode_for_decode,
    )
    hs_s, _, hlens_s, ctc_s, _ = model.apply(
        {"params": state.params_g}, sb["feats"], sb["feat_lengths"], True,
        method=RobustE2E.encode_for_decode_spec,
    )
    np.testing.assert_array_equal(np.asarray(hlens_w), np.asarray(hlens_s))
    np.testing.assert_allclose(
        np.asarray(ctc_w), np.asarray(ctc_s), rtol=1e-4, atol=1e-4
    )

    bcfg = BeamSearchConfig(beam_size=3, ctc_weight=0.3, max_steps=6)
    search_w = make_beam_searcher(model, JCFG.e2e, bcfg, use_enhancer=True)
    search_s = make_beam_searcher(model, JCFG.e2e, bcfg, use_enhancer=True,
                                  input_kind="spec")
    r_w = search_w(state.params_g, batch["noisy_wav"], batch["wav_lengths"])
    r_s = search_s(state.params_g, sb["feats"], sb["feat_lengths"])
    np.testing.assert_array_equal(
        np.asarray(r_w.tokens), np.asarray(r_s.tokens)
    )
