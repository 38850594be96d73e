"""Model-layer tests: shapes, masking invariance, gradient flow
(SURVEY.md section 4: 'attention/encoder shape+gradient tests')."""

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
)
from robust_e2e_gan_tpu.models.rnn import BLSTM, BLSTMP, LSTMScan
from robust_e2e_gan_tpu.models.encoder import Encoder, subsampled_lengths
from robust_e2e_gan_tpu.models.decoder import Decoder, decoder_cross_entropy
from robust_e2e_gan_tpu.models.e2e import E2E, add_sos_eos
from robust_e2e_gan_tpu.models.enhancement import (
    Discriminator,
    EnhanceNet,
    adversarial_losses,
    enhancement_loss,
)

# Small dims so tests are fast on CPU.
ECFG = EncoderConfig(input_dim=16, vgg_channels=(4, 8), num_layers=2,
                     hidden_dim=32, proj_dim=32)
ACFG = AttentionConfig(dim=24, conv_channels=4, conv_kernel=11)
DCFG = DecoderConfig(vocab_size=11, embed_dim=16, hidden_dim=32)
E2ECFG = E2EConfig(encoder=ECFG, attention=ACFG, decoder=DCFG)


def test_lstm_scan_mask_freezes_state(rng):
    """Output at pad frames is zero and state carries through masked spans."""
    x = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    mask = np.ones((2, 10), np.float32)
    mask[1, 6:] = 0.0
    m = LSTMScan(hidden_dim=12)
    params = m.init(jax.random.PRNGKey(0), x, jnp.asarray(mask))
    y = m.apply(params, x, jnp.asarray(mask))
    assert y.shape == (2, 10, 12)
    assert np.abs(np.asarray(y)[1, 6:]).max() == 0.0
    # valid prefix must not depend on pad content
    x2 = np.asarray(x).copy()
    x2[1, 6:] = 77.0
    y2 = m.apply(params, jnp.asarray(x2), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(y)[1, :6], np.asarray(y2)[1, :6],
                               rtol=1e-5, atol=1e-6)


def test_blstm_backward_direction_pad_invariant(rng):
    """Backward scan over the flipped padded sequence must match running the
    unpadded sequence (the mask-gated reversal correctness claim)."""
    m = BLSTM(hidden_dim=8)
    x_short = rng.standard_normal((1, 5, 6)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(1), jnp.asarray(x_short), None)
    y_short = np.asarray(m.apply(params, jnp.asarray(x_short), None))
    x_pad = np.concatenate([x_short, np.full((1, 4, 6), 9.0, np.float32)], axis=1)
    mask = np.zeros((1, 9), np.float32)
    mask[0, :5] = 1.0
    y_pad = np.asarray(m.apply(params, jnp.asarray(x_pad), jnp.asarray(mask)))
    np.testing.assert_allclose(y_short[0], y_pad[0, :5], rtol=1e-5, atol=1e-5)
    assert np.abs(y_pad[0, 5:]).max() == 0.0


def test_encoder_shapes_and_lengths(rng):
    feats = jnp.asarray(rng.standard_normal((2, 37, 16)).astype(np.float32))
    lengths = jnp.asarray([37, 21])
    enc = Encoder(ECFG)
    params = enc.init(jax.random.PRNGKey(0), feats, lengths)
    hs, hmask, hlens = enc.apply(params, feats, lengths)
    t_sub = ((37 + 1) // 2 + 1) // 2
    assert hs.shape == (2, t_sub, ECFG.proj_dim)
    assert list(np.asarray(hlens)) == [
        int(subsampled_lengths(jnp.asarray([37]))[0]),
        int(subsampled_lengths(jnp.asarray([21]))[0]),
    ]
    # masked region zero
    l1 = int(np.asarray(hlens)[1])
    assert np.abs(np.asarray(hs)[1, l1:]).max() == 0.0


def test_add_sos_eos():
    ys = jnp.asarray(np.array([[3, 4, 5, -1, -1], [2, -1, -1, -1, -1]], np.int32))
    ys_in, ys_out, lens = add_sos_eos(ys, sos=1, eos=1, ignore_id=-1)
    np.testing.assert_array_equal(np.asarray(lens), [3, 1])
    np.testing.assert_array_equal(
        np.asarray(ys_in), [[1, 3, 4, 5, 0, 0], [1, 2, 0, 0, 0, 0]]
    )
    np.testing.assert_array_equal(
        np.asarray(ys_out), [[3, 4, 5, 1, -1, -1], [2, 1, -1, -1, -1, -1]]
    )


def test_decoder_forward_and_mask(rng):
    b, t, s = 2, 9, 5
    enc = jnp.asarray(rng.standard_normal((b, t, ECFG.proj_dim)).astype(np.float32))
    enc_mask = np.ones((b, t), np.float32)
    enc_mask[1, 6:] = 0.0
    ys_in = jnp.asarray(rng.integers(0, DCFG.vocab_size, (b, s)).astype(np.int32))
    dec = Decoder(DCFG, ACFG)
    params = dec.init(jax.random.PRNGKey(0), enc, jnp.asarray(enc_mask), ys_in)
    logits, atts = dec.apply(params, enc, jnp.asarray(enc_mask), ys_in)
    assert logits.shape == (b, s, DCFG.vocab_size)
    assert atts.shape == (b, s, t)
    a = np.asarray(atts)
    # attention never attends to padding; rows sum to 1
    assert np.abs(a[1, :, 6:]).max() == 0.0
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-5)
    # changing padded encoder frames must not change logits
    enc2 = np.asarray(enc).copy()
    enc2[1, 6:] = 55.0
    logits2, _ = dec.apply(params, jnp.asarray(enc2), jnp.asarray(enc_mask), ys_in)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits2), rtol=1e-5, atol=1e-5
    )


def test_decoder_cross_entropy_masking():
    logits = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 7)).astype(np.float32))
    ys = jnp.asarray(np.array([[1, 2, -1, -1], [3, 4, 5, 6]], np.int32))
    loss, acc = decoder_cross_entropy(logits, ys)
    assert np.isfinite(float(loss)) and 0.0 <= float(acc) <= 1.0
    # perturbing ignored positions must not change the loss
    logits2 = np.asarray(logits).copy()
    logits2[0, 2:] = 100.0
    loss2, _ = decoder_cross_entropy(jnp.asarray(logits2), ys)
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-6)


def test_e2e_forward_and_grads(rng):
    b, t, d, s = 2, 37, 16, 5
    feats = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    lengths = jnp.asarray([37, 25])
    ys = np.full((b, s), -1, np.int32)
    ys[0, :4] = [3, 4, 5, 6]
    ys[1, :2] = [7, 8]
    model = E2E(E2ECFG)
    params = model.init(jax.random.PRNGKey(0), feats, lengths, jnp.asarray(ys))
    out = model.apply(params, feats, lengths, jnp.asarray(ys))
    for k in ("loss", "loss_ctc", "loss_att", "acc"):
        assert np.isfinite(float(out[k])), k

    def loss_fn(p):
        return model.apply(p, feats, lengths, jnp.asarray(ys))["loss"]

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    total = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert total > 0


def test_enhancer_mask_and_grads(rng):
    cfg = EnhancerConfig(input_dim=16, num_layers=1, hidden_dim=16)
    noisy = jnp.asarray(
        np.abs(rng.standard_normal((2, 12, 16))).astype(np.float32)
    )
    fm = np.ones((2, 12), np.float32)
    fm[1, 8:] = 0.0
    g = EnhanceNet(cfg)
    params = g.init(jax.random.PRNGKey(0), noisy, jnp.asarray(fm))
    enhanced, tf_mask = g.apply(params, noisy, jnp.asarray(fm))
    assert enhanced.shape == noisy.shape
    m = np.asarray(tf_mask)
    valid = m[np.asarray(fm) > 0]
    assert (valid >= 0).all() and (valid <= 1).all()
    assert np.abs(np.asarray(enhanced)[1, 8:]).max() == 0.0


def test_discriminator_and_gan_losses(rng):
    cfg = DiscriminatorConfig(input_dim=16, channels=(4, 8))
    feats = jnp.asarray(rng.standard_normal((3, 20, 16)).astype(np.float32))
    fm = np.ones((3, 20), np.float32)
    fm[2, 10:] = 0.0
    d = Discriminator(cfg)
    params = d.init(jax.random.PRNGKey(0), feats, jnp.asarray(fm))
    score = d.apply(params, feats, jnp.asarray(fm))
    assert score.shape == (3,)
    # pad-invariance of the score
    f2 = np.asarray(feats).copy()
    f2[2, 10:] = -40.0
    score2 = d.apply(params, jnp.asarray(f2), jnp.asarray(fm))
    np.testing.assert_allclose(np.asarray(score), np.asarray(score2),
                               rtol=1e-4, atol=1e-5)
    for lt in ("lsgan", "bce"):
        ld, lg = adversarial_losses(score, score + 1.0, loss_type=lt)
        assert np.isfinite(float(ld)) and np.isfinite(float(lg))


def test_enhancement_loss_masked(rng):
    a = jnp.asarray(np.abs(rng.standard_normal((2, 10, 8))).astype(np.float32))
    b = jnp.asarray(np.abs(rng.standard_normal((2, 10, 8))).astype(np.float32))
    fm = np.ones((2, 10), np.float32)
    fm[0, 5:] = 0.0
    l1 = enhancement_loss(a, b, jnp.asarray(fm))
    a2 = np.asarray(a).copy()
    a2[0, 5:] = 1e6
    l2 = enhancement_loss(jnp.asarray(a2), b, jnp.asarray(fm))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_attention_variants(rng):
    """AttAdd/AttDot parity of interface with AttLoc (SURVEY.md section 2a
    'possibly AttDot/AttAdd variants'): shapes, masking, normalization."""
    import dataclasses

    from robust_e2e_gan_tpu.models.attention import (
        EncoderProjection, initial_alignment, make_attention,
    )

    enc = jnp.asarray(rng.standard_normal((2, 7, 16)).astype(np.float32))
    mask = np.ones((2, 7), np.float32)
    mask[1, 4:] = 0.0
    mask = jnp.asarray(mask)
    dec_z = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32))

    for variant in ("location", "add", "dot"):
        acfg = dataclasses.replace(ACFG, variant=variant)
        proj = EncoderProjection(acfg)
        pv = proj.init(jax.random.PRNGKey(0), enc)
        ep = proj.apply(pv, enc)
        att_mod = make_attention(acfg)
        av = att_mod.init(
            jax.random.PRNGKey(1), enc, ep, mask, dec_z,
            initial_alignment(mask),
        )
        ctx, att = att_mod.apply(
            av, enc, ep, mask, dec_z, initial_alignment(mask)
        )
        assert ctx.shape == (2, 16) and att.shape == (2, 7)
        att_np = np.asarray(att)
        assert np.all(att_np[1, 4:] == 0.0), variant
        np.testing.assert_allclose(att_np.sum(-1), 1.0, rtol=1e-5)

    with pytest.raises(ValueError):
        make_attention(dataclasses.replace(ACFG, variant="nope"))


def test_decoder_variant_end_to_end(rng):
    """E2E forward works with each attention variant."""
    import dataclasses

    feats = jnp.asarray(rng.standard_normal((2, 12, 16)).astype(np.float32))
    flens = jnp.asarray([12, 9], jnp.int32)
    ys = jnp.asarray([[2, 3, -1], [4, 5, 6]], jnp.int32)
    for variant in ("add", "dot"):
        cfg = dataclasses.replace(
            E2ECFG, attention=dataclasses.replace(ACFG, variant=variant)
        )
        m = E2E(cfg)
        v = m.init(jax.random.PRNGKey(0), feats, flens, ys)
        out = m.apply(v, feats, flens, ys)
        assert np.isfinite(float(out["loss"]))


def test_scheduled_sampling(rng):
    """sampling_probability=1 must differ from teacher forcing; rngs make it
    deterministic per key (SURVEY.md section 2a 'scheduled sampling')."""
    import dataclasses

    dcfg = dataclasses.replace(DCFG, sampling_probability=1.0)
    dec = Decoder(dcfg, ACFG)
    enc = jnp.asarray(rng.standard_normal((2, 9, 24)).astype(np.float32))
    mask = jnp.ones((2, 9), jnp.float32)
    ys_in = jnp.asarray([[1, 2, 3, 4], [1, 5, 6, 7]], jnp.int32)
    v = dec.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        enc, mask, ys_in,
    )
    tf_logits, _ = dec.apply(v, enc, mask, ys_in, deterministic=True)
    ss_logits, _ = dec.apply(
        v, enc, mask, ys_in, deterministic=False,
        rngs={"sampling": jax.random.PRNGKey(2)},
    )
    # step 0 identical (no previous prediction to sample)
    np.testing.assert_allclose(
        np.asarray(tf_logits[:, 0]), np.asarray(ss_logits[:, 0]),
        rtol=1e-5, atol=1e-6,
    )
    # later steps diverge (model predictions != gold with random params)
    assert np.abs(np.asarray(tf_logits[:, 1:]) -
                  np.asarray(ss_logits[:, 1:])).max() > 1e-4
    # same rng -> same result
    ss2, _ = dec.apply(
        v, enc, mask, ys_in, deterministic=False,
        rngs={"sampling": jax.random.PRNGKey(2)},
    )
    np.testing.assert_array_equal(np.asarray(ss_logits), np.asarray(ss2))


def test_scan_unroll_invariance():
    """scan_unroll is a scheduling knob: outputs are identical for any
    unroll (v5e tuning made it a train-config option, round-1 VERDICT #10)."""
    import jax
    import jax.numpy as jnp

    from robust_e2e_gan_tpu.models.rnn import BLSTMP

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 13, 6)).astype(np.float32)
    )
    mask = jnp.asarray([[1.0] * 13, [1.0] * 7 + [0.0] * 6], jnp.float32)
    m1 = BLSTMP(num_layers=1, hidden_dim=8, proj_dim=8, unroll=1)
    m4 = BLSTMP(num_layers=1, hidden_dim=8, proj_dim=8, unroll=4)
    params = m1.init(jax.random.PRNGKey(0), x, mask)["params"]
    y1 = m1.apply({"params": params}, x, mask)
    y4 = m4.apply({"params": params}, x, mask)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y4),
                               rtol=1e-6, atol=1e-6)

    # config plumbing reaches the scan
    from robust_e2e_gan_tpu.config import EncoderConfig
    from robust_e2e_gan_tpu.models.encoder import Encoder

    cfg = EncoderConfig(input_dim=6, vgg_channels=(2, 4), num_layers=1,
                        hidden_dim=8, proj_dim=8, scan_unroll=4)
    enc = Encoder(cfg)
    feats = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 16, 6)).astype(np.float32)
    )
    p = enc.init(jax.random.PRNGKey(0), feats, jnp.asarray([16, 10]))["params"]
    hs, hmask, hlens = enc.apply({"params": p}, feats,
                                 jnp.asarray([16, 10]))
    assert np.isfinite(np.asarray(hs)).all()


def test_gate_storage_compute(rng):
    """gate_storage="compute" rounds only the hoisted gate projections:
    bf16 outputs stay within bf16 rounding of the f32-storage run, grads
    still flow, and f32 compute is bit-identical (the cast is a no-op)."""
    import jax
    import jax.numpy as jnp

    from robust_e2e_gan_tpu.models.rnn import BLSTM

    x = jnp.asarray(rng.standard_normal((3, 11, 8)).astype(np.float32))
    mask = jnp.asarray(
        (np.arange(11)[None, :] < np.array([[11], [6], [9]])).astype(
            np.float32
        )
    )
    # f32 compute: storage knob must be a no-op
    m_exact = BLSTM(16, gate_storage="f32")
    m_cmp = BLSTM(16, gate_storage="compute")
    params = m_exact.init(jax.random.PRNGKey(0), x, mask)
    y0 = m_exact.apply(params, x, mask)
    y1 = m_cmp.apply(params, x, mask)
    assert np.array_equal(np.asarray(y0), np.asarray(y1))

    # bf16 compute: rounding-level difference only, grads flow
    m_bf = BLSTM(16, dtype=jnp.bfloat16, gate_storage="f32")
    m_bfc = BLSTM(16, dtype=jnp.bfloat16, gate_storage="compute")
    yb0 = m_bf.apply(params, x, mask).astype(jnp.float32)
    yb1 = m_bfc.apply(params, x, mask).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(yb0), np.asarray(yb1),
                               rtol=0, atol=5e-2)

    def loss(p):
        return jnp.sum(m_bfc.apply(p, x, mask).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(bool((np.asarray(l) != 0).any()) for l in leaves)
