"""Equivalence tests for the differentiable fused Pallas BLSTM.

The fused train path (ops/blstm_train_pallas.py) must match the scan BLSTM
(models/rnn.py) on identical parameters in BOTH directions of autodiff:
forward values and every gradient (dx, dwx, dwh, dbias) — including ragged
lengths, unaligned batch/hidden dims, and chunk sizes that force Tp > T
padding. Runs in Pallas interpret mode on the CPU test mesh; on-chip
numbers live in scripts/bench_blstm.py.

Reference parity: SURVEY.md section 2b "cuDNN LSTM via PyTorch" — this
covers the training analogue (cudnnRNNBackwardData/Weights semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_e2e_gan_tpu.models.rnn import BLSTM, BLSTMP
from robust_e2e_gan_tpu.ops.blstm_train_pallas import (
    blstm_train, fused_train_fits,
)


def _case(b, t, d, h, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    lens = jnp.asarray(rng.integers(1, t + 1, size=b).astype(np.int32))
    mask = (jnp.arange(t)[None, :] < lens[:, None]).astype(jnp.float32)
    r = jnp.asarray(rng.standard_normal((b, t, 2 * h)).astype(np.float32))
    return x, lens, mask, r


def _grads(module, params, x, mask, r):
    def loss(params, x):
        y = module.apply(params, x, mask).astype(jnp.float32)
        return jnp.sum(y * r)

    g_params, g_x = jax.grad(loss, argnums=(0, 1))(params, x)
    flat = {
        jax.tree_util.keystr(k): np.asarray(v, np.float32)
        for k, v in jax.tree_util.tree_flatten_with_path(g_params)[0]
    }
    flat["x"] = np.asarray(g_x, np.float32)
    return flat


@pytest.mark.parametrize(
    "b,t,d,h,chunk",
    [
        (4, 37, 64, 96, None),  # unaligned H (Hp=128) + ragged T
        (5, 16, 40, 128, 2),  # unaligned B (Bp=8), Tp == T
        (3, 13, 24, 96, 4),  # Tp > T (chunk padding tail)
        (3, 13, 24, 96, 8),  # chunk > half of T (deep tail padding)
        (4, 7, 16, 96, 1),  # single-frame chunks (max drain pressure)
    ],
)
def test_fused_grads_match_scan(b, t, d, h, chunk):
    """Module-level default-chunk parity, then the SAME shapes through
    blstm_train with the explicit chunk override (the module has no chunk
    knob, so the parametrized sizes exercise the kernel directly)."""
    x, lens, mask, r = _case(b, t, d, h)
    m_scan = BLSTM(h, impl="scan")
    m_fused = BLSTM(h, impl="fused")
    params = m_scan.init(jax.random.PRNGKey(0), x, mask)

    y0 = m_scan.apply(params, x, mask)
    y1 = m_fused.apply(params, x, mask)
    np.testing.assert_allclose(
        np.asarray(y0), np.asarray(y1), rtol=0, atol=2e-5
    )

    g0 = _grads(m_scan, params, x, mask, r)
    g1 = _grads(m_fused, params, x, mask, r)
    assert g0.keys() == g1.keys()
    for k in g0:
        scale = np.abs(g0[k]).max() + 1e-6
        np.testing.assert_allclose(
            g1[k] / scale, g0[k] / scale, rtol=0, atol=5e-6,
            err_msg=f"gradient mismatch for {k}",
        )

    if chunk is None:
        return
    p = params["params"]
    lengths = jnp.sum(mask > 0, axis=1).astype(jnp.int32)

    def loss_direct(x, wx, wh, bias):
        y = blstm_train(x, lengths, wx, wh, bias, chunk=chunk)
        return jnp.sum(y.astype(jnp.float32) * r)

    y2 = blstm_train(x, lengths, p["wx"], p["wh"], p["bias"], chunk=chunk)
    np.testing.assert_allclose(
        np.asarray(y0), np.asarray(y2), rtol=0, atol=2e-5
    )
    g2 = jax.grad(loss_direct, argnums=(0, 1, 2, 3))(
        x, p["wx"], p["wh"], p["bias"]
    )
    for k, v in zip(("x", "['params']['wx']", "['params']['wh']",
                     "['params']['bias']"), g2):
        scale = np.abs(g0[k]).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(v, np.float32) / scale, g0[k] / scale,
            rtol=0, atol=5e-6,
            err_msg=f"gradient mismatch for {k} at chunk={chunk}",
        )


def test_fused_bf16_grads_close_to_scan_bf16():
    """bf16 compute: same operand roundings, tolerance covers schedule-
    order differences in the f32 accumulations."""
    x, lens, mask, r = _case(3, 16, 40, 128, seed=1)
    m_scan = BLSTM(128, dtype=jnp.bfloat16, impl="scan")
    m_fused = BLSTM(128, dtype=jnp.bfloat16, impl="fused")
    params = m_scan.init(jax.random.PRNGKey(0), x, mask)
    g0 = _grads(m_scan, params, x, mask, r)
    g1 = _grads(m_fused, params, x, mask, r)
    for k in g0:
        scale = np.abs(g0[k]).max() + 1e-6
        np.testing.assert_allclose(
            g1[k] / scale, g0[k] / scale, rtol=0, atol=3e-2,
            err_msg=f"gradient mismatch for {k}",
        )


def test_pad_frame_cotangents_are_ignored():
    """dy on pad frames must not leak into any gradient (the scan path
    masks them via y = h*m; the kernel must do the same)."""
    b, t, d, h = 4, 12, 24, 96
    x, lens, mask, r = _case(b, t, d, h, seed=2)
    lens = jnp.asarray([5, 7, 12, 3], jnp.int32)
    mask = (jnp.arange(t)[None, :] < lens[:, None]).astype(jnp.float32)
    m_fused = BLSTM(h, impl="fused")
    params = m_fused.init(jax.random.PRNGKey(0), x, mask)

    r_pad = r + 100.0 * (1.0 - mask[..., None])  # huge pad cotangents

    def loss(params, x, rr):
        y = m_fused.apply(params, x, mask).astype(jnp.float32)
        return jnp.sum(y * rr)

    g_a = jax.grad(loss, argnums=(0, 1))(params, x, r * mask[..., None])
    g_b = jax.grad(loss, argnums=(0, 1))(params, x, r_pad * 1.0)
    # pad outputs are exactly zero, so both losses see identical valid
    # cotangents -> identical gradients
    for a, bb in zip(jax.tree_util.tree_leaves(g_a),
                     jax.tree_util.tree_leaves(g_b)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=0, atol=1e-6
        )


def test_oversize_layer_direct_api_refuses():
    """The Wx-resident kernel's direct API refuses oversize shapes (the
    module routes them to the gate-stream variant instead — see
    test_fused_impl_oversize_uses_gx_variant)."""
    assert not fused_train_fits(2, 8, 70000, 128)
    b, t, d, h = 2, 6, 16, 8
    assert fused_train_fits(b, t, d, h)
    # direct API refuses oversize shapes
    with pytest.raises(ValueError, match="VMEM budget"):
        rng = np.random.default_rng(0)
        blstm_train(
            jnp.zeros((2, 8, 70000)), jnp.asarray([8, 8], jnp.int32),
            jnp.zeros((2, 70000, 4 * 128)), jnp.zeros((2, 128, 4 * 128)),
            jnp.zeros((2, 4 * 128)),
        )


def test_blstmp_stack_trains_with_fused_impl():
    """BLSTMP with impl='fused': the full projected stack is
    differentiable and matches the scan stack."""
    b, t, d, h, proj = 3, 14, 20, 96, 32
    x, lens, mask, r = _case(b, t, d, h, seed=3)
    r = r[..., :proj]
    m_scan = BLSTMP(2, h, proj, impl="scan")
    m_fused = BLSTMP(2, h, proj, impl="fused")
    params = m_scan.init(jax.random.PRNGKey(1), x, mask)

    def loss(module, params):
        y = module.apply(params, x, mask).astype(jnp.float32)
        return jnp.sum(y * r)

    l0, g0 = jax.value_and_grad(lambda p: loss(m_scan, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(m_fused, p))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for a, bb in zip(jax.tree_util.tree_leaves(g0),
                     jax.tree_util.tree_leaves(g1)):
        scale = np.abs(np.asarray(a)).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(bb) / scale, np.asarray(a) / scale,
            rtol=0, atol=1e-5,
        )


@pytest.mark.parametrize("b,t,d,h,chunk", [
    (4, 13, 24, 16, 2),   # generic small
    (3, 9, 40, 96, 4),    # Tp > T, unaligned H
])
def test_gx_variant_grads_match_scan(b, t, d, h, chunk):
    """blstm_train_gx (gate-stream variant): value + all gradients match
    scan — the input projection lives outside, so dwx/dx/dbias flow
    through XLA autodiff while the kernels own the recursion."""
    from robust_e2e_gan_tpu.ops.blstm_train_pallas import blstm_train_gx

    x, lens, mask, r = _case(b, t, d, h)
    lengths = jnp.sum(mask > 0, axis=1).astype(jnp.int32)
    m_scan = BLSTM(h, impl="scan")
    params = m_scan.init(jax.random.PRNGKey(0), x, mask)
    p = params["params"]

    y0 = m_scan.apply(params, x, mask)
    y1 = blstm_train_gx(x, lengths, p["wx"], p["wh"], p["bias"],
                        chunk=chunk)
    np.testing.assert_allclose(
        np.asarray(y0), np.asarray(y1), rtol=0, atol=2e-5
    )

    g0 = _grads(m_scan, params, x, mask, r)

    def loss(x, wx, wh, bias):
        y = blstm_train_gx(x, lengths, wx, wh, bias, chunk=chunk)
        return jnp.sum(y.astype(jnp.float32) * r)

    g1 = jax.grad(loss, argnums=(0, 1, 2, 3))(
        x, p["wx"], p["wh"], p["bias"]
    )
    for k, v in zip(("x", "['params']['wx']", "['params']['wh']",
                     "['params']['bias']"), g1):
        scale = np.abs(g0[k]).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(v, np.float32) / scale, g0[k] / scale,
            rtol=0, atol=5e-6, err_msg=f"gx gradient mismatch for {k}",
        )


def test_fused_impl_oversize_uses_gx_variant():
    """BLSTM impl='fused' on a layer exceeding the W_x VMEM budget now
    routes to the gate-stream kernel (scan-identical grads) instead of
    falling back to scan."""
    from robust_e2e_gan_tpu.ops.blstm_train_pallas import fused_train_fits

    b, t, d, h = 2, 6, 70000, 8  # W_x alone exceeds the budget
    assert not fused_train_fits(b, t, d, h)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    mask = jnp.ones((b, t), jnp.float32)
    r = jnp.asarray(rng.standard_normal((b, t, 2 * h)).astype(np.float32))
    m_scan = BLSTM(h, impl="scan")
    m_fused = BLSTM(h, impl="fused")
    params = m_scan.init(jax.random.PRNGKey(0), x, mask)
    g0 = _grads(m_scan, params, x, mask, r)
    g1 = _grads(m_fused, params, x, mask, r)
    for k in g0:
        scale = np.abs(g0[k]).max() + 1e-6
        np.testing.assert_allclose(
            g1[k] / scale, g0[k] / scale, rtol=0, atol=5e-6,
            err_msg=f"gradient mismatch for {k}",
        )


def test_fused_impl_beyond_gx_budget_falls_back_to_scan(monkeypatch):
    """When even the gx kernel's W_h + dW_h working set exceeds VMEM,
    impl='fused' must train via the scan path rather than launching a
    kernel that cannot compile. The kernels are stubbed out to prove the
    fallback is taken; the fit predicates are asserted on real shapes."""
    from robust_e2e_gan_tpu.ops import blstm_train_pallas as btp

    # real-shape sanity for the predicate itself
    assert btp.gx_train_fits(8, 320)          # reference scale fits
    assert not btp.gx_train_fits(8, 4096)     # W_h + dW_h blow the budget

    def _boom(*a, **kw):
        raise AssertionError("fused kernel invoked beyond the VMEM budget")

    monkeypatch.setattr(btp, "fused_train_fits", lambda *a, **kw: False)
    monkeypatch.setattr(btp, "gx_train_fits", lambda *a, **kw: False)
    monkeypatch.setattr(btp, "blstm_train", _boom)
    monkeypatch.setattr(btp, "blstm_train_gx", _boom)

    b, t, d, h = 3, 11, 16, 32
    x, lens, mask, r = _case(b, t, d, h)
    m_scan = BLSTM(h, impl="scan")
    m_fused = BLSTM(h, impl="fused")
    params = m_scan.init(jax.random.PRNGKey(0), x, mask)
    y0 = m_scan.apply(params, x, mask)
    y1 = m_fused.apply(params, x, mask)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    g0 = _grads(m_scan, params, x, mask, r)
    g1 = _grads(m_fused, params, x, mask, r)
    for k in g0:
        np.testing.assert_array_equal(g0[k], g1[k])
