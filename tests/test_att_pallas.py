"""Equivalence tests for the fused beam-mode attention kernel.

The fused Pallas step (ops/att_pallas.py) must match the XLA beam path of
models/attention.py::AttLoc on identical parameters — ragged lengths,
non-128-multiple attention dims, small beam sizes, and both compute
dtypes. Runs in Pallas interpret mode on the CPU test mesh; on-chip
timings live in BASELINE.md (decoder chain 26.4 -> 18.9 ms at bench
shapes).

Reference parity: SURVEY.md section 2a "Attention" (ESPnet AttLoc) — the
XLA path is the semantics oracle, the kernel is the serving fast path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_e2e_gan_tpu.config import AttentionConfig
from robust_e2e_gan_tpu.models.attention import AttLoc


def _case(b, k, t, a, e, c, ker, dt, seed=0):
    rng = np.random.default_rng(seed)
    enc = jnp.asarray(
        rng.standard_normal((b, t, e)).astype(np.float32)
    ).astype(dt)
    ep = jnp.asarray(
        rng.standard_normal((b, t, a)).astype(np.float32)
    ).astype(dt)
    dec_z = jnp.asarray(
        rng.standard_normal((b, k, 64)).astype(np.float32)
    ).astype(dt)
    lens = rng.integers(max(1, t // 2), t + 1, size=b).astype(np.int32)
    mask = jnp.asarray(
        (np.arange(t)[None, :] < lens[:, None]).astype(np.float32)
    )
    ap = jnp.asarray(rng.random((b, k, t)).astype(np.float32)) * mask[:, None]
    return enc, ep, dec_z, mask, ap


@pytest.mark.parametrize(
    "b,k,t,a,e,c,ker",
    [
        (4, 8, 37, 256, 256, 10, 31),  # bench-like dims, ragged T
        (3, 4, 17, 48, 64, 8, 11),  # unaligned A/E (pad to 128)
        (5, 2, 29, 128, 96, 10, 21),  # tiny beam, odd batch
    ],
)
def test_fused_matches_xla(b, k, t, a, e, c, ker):
    enc, ep, dec_z, mask, ap = _case(b, k, t, a, e, c, ker, jnp.float32)
    mx = AttLoc(AttentionConfig(dim=a, conv_channels=c, conv_kernel=ker,
                                score_impl="xla"))
    mf = AttLoc(AttentionConfig(dim=a, conv_channels=c, conv_kernel=ker,
                                score_impl="fused"))
    params = mx.init(jax.random.PRNGKey(0), enc, ep, mask, dec_z, ap)
    ctx0, att0 = mx.apply(params, enc, ep, mask, dec_z, ap)
    ctx1, att1 = mf.apply(params, enc, ep, mask, dec_z, ap)
    np.testing.assert_allclose(
        np.asarray(ctx0), np.asarray(ctx1), rtol=0, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(att0), np.asarray(att1), rtol=0, atol=2e-6
    )


def test_fused_bf16():
    enc, ep, dec_z, mask, ap = _case(
        2, 8, 174, 256, 256, 10, 101, jnp.bfloat16, seed=1
    )
    cfg = dict(dim=256, conv_channels=10, conv_kernel=101)
    mx = AttLoc(AttentionConfig(**cfg, score_impl="xla"), dtype=jnp.bfloat16)
    mf = AttLoc(AttentionConfig(**cfg, score_impl="fused"),
                dtype=jnp.bfloat16)
    params = mx.init(jax.random.PRNGKey(0), enc, ep, mask, dec_z, ap)
    ctx0, att0 = mx.apply(params, enc, ep, mask, dec_z, ap)
    ctx1, att1 = mf.apply(params, enc, ep, mask, dec_z, ap)
    # (ep + loc) + dec becomes (loc + dec) + ep inside the fused matmul:
    # bf16-rounding-level differences only
    np.testing.assert_allclose(
        np.asarray(ctx0).astype(np.float32),
        np.asarray(ctx1).astype(np.float32), rtol=0, atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(att0), np.asarray(att1), rtol=0, atol=2e-3
    )


def test_fused_alignment_properties():
    enc, ep, dec_z, mask, ap = _case(4, 8, 37, 256, 256, 10, 31,
                                     jnp.float32, seed=2)
    mf = AttLoc(AttentionConfig(dim=256, conv_channels=10, conv_kernel=31,
                                score_impl="fused"))
    params = mf.init(jax.random.PRNGKey(0), enc, ep, mask, dec_z, ap)
    _, att = mf.apply(params, enc, ep, mask, dec_z, ap)
    att = np.asarray(att)
    m = np.asarray(mask)
    # exact zeros on pad frames; rows sum to 1 over valid frames
    assert np.all(att * (1.0 - m[:, None]) == 0.0)
    np.testing.assert_allclose(att.sum(-1), 1.0, rtol=0, atol=1e-5)


def test_auto_resolves_to_xla_off_tpu():
    # on the CPU test platform "auto" must score through the XLA path
    # (exact-parity oracle); assert bit-identical outputs
    enc, ep, dec_z, mask, ap = _case(2, 4, 19, 128, 64, 10, 11,
                                     jnp.float32, seed=3)
    cfg = dict(dim=128, conv_channels=10, conv_kernel=11)
    ma = AttLoc(AttentionConfig(**cfg, score_impl="auto"))
    mx = AttLoc(AttentionConfig(**cfg, score_impl="xla"))
    params = ma.init(jax.random.PRNGKey(0), enc, ep, mask, dec_z, ap)
    ctx_a, att_a = ma.apply(params, enc, ep, mask, dec_z, ap)
    ctx_x, att_x = mx.apply(params, enc, ep, mask, dec_z, ap)
    assert np.array_equal(np.asarray(ctx_a), np.asarray(ctx_x))
    assert np.array_equal(np.asarray(att_a), np.asarray(att_x))


def test_fused_oversize_falls_back():
    # beam*frames far past the lane budget: att_loc_fused returns None and
    # the module must fall back to the XLA path with identical params
    from robust_e2e_gan_tpu.ops.att_pallas import att_loc_fused

    b, k, t, a, e, c = 1, 126, 64, 128, 64, 10  # cp + k > 128
    rng = np.random.default_rng(4)
    feat = jnp.asarray(rng.standard_normal((b, k, t, c)).astype(np.float32))
    out = att_loc_fused(
        feat,
        jnp.zeros((b, t, a), jnp.float32),
        jnp.zeros((b, t, e), jnp.float32),
        jnp.zeros((b, k, a), jnp.float32),
        jnp.zeros((c, a), jnp.float32),
        jnp.zeros((a,), jnp.float32),
        jnp.ones((b, t), jnp.float32),
        2.0,
    )
    assert out is None


def test_fused_decoder_step_matches_xla():
    """att_dec_step_fused through DecoderStep: logits, alignment and the
    new LSTM state match the XLA step (fused-attention scoring in both,
    so the only delta is the post-attention stage) on ragged masks."""
    import dataclasses

    from robust_e2e_gan_tpu.config import DecoderConfig
    from robust_e2e_gan_tpu.models.attention import (
        EncoderProjection, initial_alignment,
    )
    from robust_e2e_gan_tpu.models.decoder import DecoderStep

    b, k, t, e_dim = 4, 3, 20, 40
    v, emb, h, a = 12, 16, 24, 24
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal((b, t, e_dim)).astype(np.float32))
    lens = jnp.asarray([20, 13, 7, 16], jnp.int32)
    mask = (jnp.arange(t)[None, :] < lens[:, None]).astype(jnp.float32)
    acfg = AttentionConfig(dim=a, conv_channels=4, conv_kernel=11,
                           score_impl="fused")
    dcfg_x = DecoderConfig(vocab_size=v, embed_dim=emb, hidden_dim=h,
                           step_impl="xla")
    dcfg_f = dataclasses.replace(dcfg_x, step_impl="fused")

    n = b * k
    tok = jnp.asarray(rng.integers(0, v, size=(n,)), jnp.int32)
    h0 = jnp.asarray(rng.standard_normal((1, n, h)).astype(np.float32)) * 0.3
    c0 = jnp.asarray(rng.standard_normal((1, n, h)).astype(np.float32)) * 0.3
    att0 = jnp.broadcast_to(
        initial_alignment(mask)[:, None, :], (b, k, t)
    ).reshape(n, t)
    carry = (h0, c0, att0, jnp.full((n,), -1, jnp.int32))

    ep_mod = EncoderProjection(acfg)
    enc_proj = ep_mod.apply(ep_mod.init(jax.random.PRNGKey(0), enc), enc)

    mx = DecoderStep(dcfg_x, acfg)
    mf = DecoderStep(dcfg_f, acfg)
    params = mx.init(jax.random.PRNGKey(1), carry, tok, enc, enc_proj, mask)
    cx, (lx, ax) = mx.apply(params, carry, tok, enc, enc_proj, mask)
    cf, (lf, af) = mf.apply(params, carry, tok, enc, enc_proj, mask)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lf),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ax), np.asarray(af),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cx[0]), np.asarray(cf[0]),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cx[1]), np.asarray(cf[1]),
                               rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(cx[3]), np.asarray(cf[3]))


def test_fused_decoder_step_fallbacks():
    """Large vocab (>128: multi-lane-block one-hot) runs FUSED and matches
    XLA; num_layers>1 is a structural gate and falls back to the XLA cell
    (identical results, since scoring stays fused either way)."""
    import dataclasses

    from robust_e2e_gan_tpu.config import DecoderConfig
    from robust_e2e_gan_tpu.models.attention import (
        EncoderProjection, initial_alignment,
    )
    from robust_e2e_gan_tpu.models.decoder import DecoderStep
    from robust_e2e_gan_tpu.ops.att_pallas import att_dec_plan

    # vocab no longer gates the plan; absurd shapes still do
    assert att_dec_plan(4, 3, 20, 4, 24, 40, 200, 16, 24,
                        jnp.float32) is not None
    assert att_dec_plan(4, 3, 20, 4, 2048, 4096, 60000, 2048, 2048,
                        jnp.float32) is None

    b, k, t, e_dim = 2, 2, 16, 24
    v, emb, h, a = 200, 8, 16, 16
    rng = np.random.default_rng(1)
    enc = jnp.asarray(rng.standard_normal((b, t, e_dim)).astype(np.float32))
    mask = jnp.ones((b, t), jnp.float32)
    acfg = AttentionConfig(dim=a, conv_channels=4, conv_kernel=11,
                           score_impl="fused")
    n = b * k
    tok = jnp.asarray(rng.integers(0, v, size=(n,)), jnp.int32)
    att0 = jnp.broadcast_to(
        initial_alignment(mask)[:, None, :], (b, k, t)
    ).reshape(n, t)

    for layers in (1, 2):
        dcfg_x = DecoderConfig(vocab_size=v, embed_dim=emb, hidden_dim=h,
                               num_layers=layers, step_impl="xla")
        dcfg_f = dataclasses.replace(dcfg_x, step_impl="fused")
        h0 = jnp.zeros((layers, n, h), jnp.float32)
        carry = (h0, h0, att0, jnp.full((n,), -1, jnp.int32))
        ep_mod = EncoderProjection(acfg)
        enc_proj = ep_mod.apply(ep_mod.init(jax.random.PRNGKey(0), enc),
                                enc)
        mx = DecoderStep(dcfg_x, acfg)
        mf = DecoderStep(dcfg_f, acfg)
        params = mx.init(jax.random.PRNGKey(1), carry, tok, enc, enc_proj,
                         mask)
        _, (lx, _) = mx.apply(params, carry, tok, enc, enc_proj, mask)
        _, (lf, _) = mf.apply(params, carry, tok, enc, enc_proj, mask)
        if layers == 2:  # structural gate: XLA both -> exact
            np.testing.assert_array_equal(np.asarray(lx), np.asarray(lf))
        else:  # fused large-vocab step vs XLA: f32 tolerance
            np.testing.assert_allclose(
                np.asarray(lx), np.asarray(lf), rtol=0, atol=1e-5
            )


def test_fused_decoder_step_bf16_close():
    """bf16 compute: the fused step's gate math rounds the f32 LSTM state
    to bf16 for the recurrent dot (the XLA cell promotes wh to f32
    instead) — logits/state must stay within bf16-rounding tolerance of
    the XLA step; WER-level parity on chip is gated by verify_drive."""
    import dataclasses

    from robust_e2e_gan_tpu.config import DecoderConfig
    from robust_e2e_gan_tpu.models.attention import (
        EncoderProjection, initial_alignment,
    )
    from robust_e2e_gan_tpu.models.decoder import DecoderStep

    b, k, t, e_dim = 3, 3, 18, 32
    v, emb, h, a = 12, 16, 24, 24
    rng = np.random.default_rng(5)
    enc = jnp.asarray(
        rng.standard_normal((b, t, e_dim)).astype(np.float32)
    ).astype(jnp.bfloat16)
    lens = jnp.asarray([18, 9, 13], jnp.int32)
    mask = (jnp.arange(t)[None, :] < lens[:, None]).astype(jnp.float32)
    acfg = AttentionConfig(dim=a, conv_channels=4, conv_kernel=11,
                           score_impl="fused")
    dcfg_x = DecoderConfig(vocab_size=v, embed_dim=emb, hidden_dim=h,
                           step_impl="xla")
    dcfg_f = dataclasses.replace(dcfg_x, step_impl="fused")

    n = b * k
    tok = jnp.asarray(rng.integers(0, v, size=(n,)), jnp.int32)
    h0 = jnp.asarray(rng.standard_normal((1, n, h)).astype(np.float32)) * 0.3
    c0 = jnp.asarray(rng.standard_normal((1, n, h)).astype(np.float32)) * 0.3
    att0 = jnp.broadcast_to(
        initial_alignment(mask)[:, None, :], (b, k, t)
    ).reshape(n, t)
    carry = (h0, c0, att0, jnp.full((n,), -1, jnp.int32))

    ep_mod = EncoderProjection(acfg, dtype=jnp.bfloat16)
    enc_proj = ep_mod.apply(ep_mod.init(jax.random.PRNGKey(0), enc), enc)

    mx = DecoderStep(dcfg_x, acfg, dtype=jnp.bfloat16)
    mf = DecoderStep(dcfg_f, acfg, dtype=jnp.bfloat16)
    params = mx.init(jax.random.PRNGKey(1), carry, tok, enc, enc_proj, mask)
    cx, (lx, _) = mx.apply(params, carry, tok, enc, enc_proj, mask)
    cf, (lf, _) = mf.apply(params, carry, tok, enc, enc_proj, mask)
    lx = np.asarray(lx, np.float32)
    lf = np.asarray(lf, np.float32)
    scale = np.abs(lx).max() + 1e-6
    assert np.abs(lx - lf).max() / scale < 3e-2, np.abs(lx - lf).max()
    for i in (0, 1):
        a_, b_ = np.asarray(cx[i], np.float32), np.asarray(cf[i], np.float32)
        assert np.abs(a_ - b_).max() < 3e-2, np.abs(a_ - b_).max()
