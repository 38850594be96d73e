"""Equivalence tests for the fused Pallas BLSTM inference kernels.

The tiled path (ops/blstm_pallas.py) must match the differentiable scan
BLSTM (models/rnn.py) on identical parameters — including ragged lengths,
non-multiple-of-8 batch, non-multiple-of-128 hidden/input dims, and the
large-D gate-stream fallback variant. Runs in Pallas interpret mode on the
CPU test mesh; the on-chip numbers live in scripts/bench_blstm.py.

Reference parity: SURVEY.md section 2b "cuDNN LSTM via PyTorch" — the
scan path is the semantics oracle, the kernel is the serving fast path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_e2e_gan_tpu.models.rnn import BLSTM
from robust_e2e_gan_tpu.ops.blstm_pallas import blstm_infer


def _case(b, t, d, h, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    lens = jnp.asarray(rng.integers(1, t + 1, size=b).astype(np.int32))
    mask = (jnp.arange(t)[None, :] < lens[:, None]).astype(jnp.float32)
    return x, lens, mask


@pytest.mark.parametrize(
    "b,t,d,h",
    [
        (4, 37, 64, 96),  # unaligned H (Hp=128 padding) + ragged T
        (8, 23, 257, 128),  # enhancer-like input dim
        (5, 16, 40, 256),  # unaligned B (Bp=8 padding)
        (2, 11, 2560, 128),  # large D -> gx fallback variant
    ],
)
def test_tiled_matches_scan(b, t, d, h):
    x, lens, mask = _case(b, t, d, h)
    m_scan = BLSTM(h, impl="scan")
    m_tile = BLSTM(h, impl="tiled")
    params = m_scan.init(jax.random.PRNGKey(0), x, mask)
    y0 = m_scan.apply(params, x, mask)
    y1 = m_tile.apply(params, x, mask)
    assert y1.shape == (b, t, 2 * h)
    np.testing.assert_allclose(
        np.asarray(y0), np.asarray(y1), rtol=0, atol=2e-5
    )


def test_tiled_bf16_matches_scan_bf16():
    x, lens, mask = _case(3, 16, 40, 256, seed=1)
    m_scan = BLSTM(256, dtype=jnp.bfloat16, impl="scan")
    m_tile = BLSTM(256, dtype=jnp.bfloat16, impl="tiled")
    params = m_scan.init(jax.random.PRNGKey(0), x, mask)
    y0 = np.asarray(m_scan.apply(params, x, mask)).astype(np.float32)
    y1 = np.asarray(m_tile.apply(params, x, mask)).astype(np.float32)
    # identical operand dtypes and f32 accumulation; tolerance covers the
    # bf16 output rounding of intermediates the two schedules order
    # differently
    np.testing.assert_allclose(y0, y1, rtol=0, atol=3 * np.spacing(
        np.float32(np.abs(y0).max()) , dtype=np.float32) + 1e-2)


def test_pad_frames_are_zero_and_state_transparent():
    b, t, d, h = 4, 19, 32, 128
    x, lens, mask = _case(b, t, d, h, seed=2)
    m = BLSTM(h, impl="tiled")
    params = m.init(jax.random.PRNGKey(0), x, mask)
    y = np.asarray(m.apply(params, x, mask))
    lens_np = np.asarray(lens)
    for i in range(b):
        assert np.all(y[i, lens_np[i]:] == 0.0)
    # corrupting pad frames must not change valid outputs
    x2 = x.at[:, :, :].set(
        jnp.where(mask[:, :, None] > 0, x, 1e3)
    )
    y2 = np.asarray(m.apply(params, x2, mask))
    np.testing.assert_allclose(y, y2, rtol=0, atol=1e-5)


def test_direct_api_full_lengths():
    b, t, d, h = 2, 9, 16, 128
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    wx = jnp.asarray(rng.standard_normal((2, d, 4 * h)).astype(np.float32) * 0.1)
    wh = jnp.asarray(rng.standard_normal((2, h, 4 * h)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((2, 4 * h)).astype(np.float32))
    lens = jnp.full((b,), t, jnp.int32)
    y = blstm_infer(x, lens, wx, wh, bias, interpret=True)
    assert y.shape == (b, t, 2 * h)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_auto_resolves_to_scan_off_tpu():
    # on the CPU test platform "auto" must take the differentiable scan
    # path (grads flow); "tiled" is forward-only by design
    b, t, d, h = 2, 7, 12, 16
    x, lens, mask = _case(b, t, d, h, seed=4)
    m = BLSTM(h, impl="auto")
    params = m.init(jax.random.PRNGKey(0), x, mask)

    def loss(p):
        return jnp.sum(m.apply(p, x, mask) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(bool(jnp.any(l != 0)) for l in leaves)


def test_tiled_impl_beyond_budget_falls_back_to_scan(monkeypatch):
    """impl='tiled' with a hidden dim whose W_h + carries exceed the
    serving VMEM budget must run the XLA scan instead of launching an
    uncompilable kernel (kernel stubbed out to prove the route)."""
    import jax

    from robust_e2e_gan_tpu.models.rnn import BLSTM
    from robust_e2e_gan_tpu.ops import blstm_pallas as bp

    assert bp.infer_fits(8, 320)         # reference scale fits
    assert not bp.infer_fits(8, 4096)    # W_h alone blows the budget

    def _boom(*a, **kw):
        raise AssertionError("tiled kernel invoked beyond the VMEM budget")

    monkeypatch.setattr(bp, "infer_fits", lambda *a, **kw: False)
    monkeypatch.setattr(bp, "blstm_infer", _boom)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 9, 12)).astype(np.float32))
    mask = jnp.ones((3, 9), jnp.float32)
    m_scan = BLSTM(16, impl="scan")
    m_tiled = BLSTM(16, impl="tiled")
    params = m_scan.init(jax.random.PRNGKey(0), x, mask)
    y0 = m_scan.apply(params, x, mask)
    y1 = m_tiled.apply(params, x, mask)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
