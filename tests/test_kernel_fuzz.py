"""Randomized shape fuzzing for the Pallas kernel stack (interpret mode).

The dedicated kernel test files pin down behavior at hand-picked shapes;
this file sweeps seeded-random shape tuples (plus forced b=1 / t=1 edges)
through each fused kernel vs its XLA/scan oracle, so padding and rounding
paths (bp=8, hp/dp=128, chunked Tp) get exercised at combinations nobody
thought to write down. Failures print the offending tuple.

Reference parity: same oracles as tests/test_{ctc,blstm,lm}_pallas.py —
SURVEY.md sections 2b (warp-ctc, cuDNN LSTM) and call stack 3.2.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_e2e_gan_tpu.models.rnn import BLSTM
from robust_e2e_gan_tpu.ops.ctc import ctc_loss


def _shapes(seed, n, lo_hi):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        out.append(tuple(int(rng.integers(lo, hi + 1)) for lo, hi in lo_hi))
    return out


# ---------------------------------------------------------------- CTC ----

CTC_SHAPES = _shapes(11, 5, [(1, 6), (8, 36), (3, 18), (1, 6)]) + [
    (1, 5, 3, 1),   # b=1, near-minimal
    (2, 3, 4, 1),   # T == 2S+1 feasibility edge
]


@pytest.mark.parametrize("b,t,v,s", CTC_SHAPES)
def test_fuzz_ctc_fused_matches_scan(b, t, v, s):
    rng = np.random.default_rng(100 * b + 10 * t + v + s)
    s = min(s, max(1, (t - 1) // 2))  # keep alignments feasible
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    llen = rng.integers(max(1, 2 * s + 1), t + 1, size=b).astype(np.int32)
    slen = rng.integers(0, s + 1, size=b).astype(np.int32)
    labels = rng.integers(1, v, size=(b, s)).astype(np.int32)
    args = (jnp.asarray(logits), jnp.asarray(llen), jnp.asarray(labels),
            jnp.asarray(slen))
    a = np.asarray(ctc_loss(*args, reduction="none", impl="scan"))
    f = np.asarray(ctc_loss(*args, reduction="none", impl="fused"))
    np.testing.assert_allclose(a, f, rtol=0, atol=2e-5,
                               err_msg=f"shape {(b, t, v, s)}")


# ------------------------------------------------------- BLSTM serving ----

BLSTM_SHAPES = _shapes(13, 4, [(1, 6), (2, 30), (1, 48), (4, 48)]) + [
    (1, 1, 3, 8),    # single frame, single utterance
    (7, 2, 130, 40),  # D > 128 (dp rounding), T=2 == default chunk
]


@pytest.mark.parametrize("b,t,d,h", BLSTM_SHAPES)
def test_fuzz_blstm_tiled_matches_scan(b, t, d, h):
    rng = np.random.default_rng(1000 + 97 * b + t + d + h)
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    lens = rng.integers(1, t + 1, size=b).astype(np.int32)
    mask = jnp.asarray(
        (np.arange(t)[None, :] < lens[:, None]).astype(np.float32)
    )
    m_scan = BLSTM(h, impl="scan")
    m_tile = BLSTM(h, impl="tiled")
    params = m_scan.init(jax.random.PRNGKey(0), x, mask)
    y0 = np.asarray(m_scan.apply(params, x, mask))
    y1 = np.asarray(m_tile.apply(params, x, mask))
    np.testing.assert_allclose(y0, y1, rtol=0, atol=2e-5,
                               err_msg=f"shape {(b, t, d, h)}")


# ------------------------------------------------------ BLSTM training ----

BLSTM_TRAIN_SHAPES = _shapes(17, 3, [(1, 5), (2, 14), (2, 24), (4, 40)]) + [
    (1, 1, 2, 8),   # minimal everything
]


@pytest.mark.parametrize("b,t,d,h", BLSTM_TRAIN_SHAPES)
def test_fuzz_blstm_fused_train_grads(b, t, d, h):
    rng = np.random.default_rng(2000 + 89 * b + t + d + h)
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    lens = rng.integers(1, t + 1, size=b).astype(np.int32)
    mask = jnp.asarray(
        (np.arange(t)[None, :] < lens[:, None]).astype(np.float32)
    )
    r = jnp.asarray(rng.standard_normal((b, t, 2 * h)).astype(np.float32))
    m_scan = BLSTM(h, impl="scan")
    m_fused = BLSTM(h, impl="fused")
    params = m_scan.init(jax.random.PRNGKey(0), x, mask)

    def loss(module):
        def f(p, xx):
            return jnp.sum(module.apply(p, xx, mask).astype(jnp.float32) * r)
        return jax.grad(f, argnums=(0, 1))(params, x)

    g0, gx0 = loss(m_scan)
    g1, gx1 = loss(m_fused)
    flat0 = jax.tree_util.tree_leaves(g0) + [gx0]
    flat1 = jax.tree_util.tree_leaves(g1) + [gx1]
    for a, bb in zip(flat0, flat1):
        scale = np.abs(np.asarray(a)).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(bb) / scale, np.asarray(a) / scale,
            rtol=0, atol=5e-6, err_msg=f"shape {(b, t, d, h)}",
        )


# ---------------------------------------------------------- LM step ----

LM_SHAPES = _shapes(19, 3, [(1, 3), (1, 10), (8, 40), (8, 40), (3, 30)]) + [
    (1, 1, 8, 8, 2),  # single lane, tiny dims
]


@pytest.mark.parametrize("layers,n,hid,emb,vocab_off", LM_SHAPES)
def test_fuzz_lm_fused_step(layers, n, hid, emb, vocab_off):
    import dataclasses

    from robust_e2e_gan_tpu.models.lm import LMConfig, RNNLM

    vocab = 2 + vocab_off
    rng = np.random.default_rng(3000 + layers + n + hid + emb + vocab)
    cfg_x = LMConfig(vocab_size=vocab, embed_dim=emb, hidden_dim=hid,
                     num_layers=layers, step_impl="xla")
    cfg_f = dataclasses.replace(cfg_x, step_impl="fused")
    tok = jnp.asarray(rng.integers(0, vocab, size=(n,)), jnp.int32)
    h0 = jnp.asarray(
        rng.standard_normal((layers, n, hid)).astype(np.float32)) * 0.3
    c0 = jnp.asarray(
        rng.standard_normal((layers, n, hid)).astype(np.float32)) * 0.3

    def run(cfg):
        lm = RNNLM(cfg, dtype=jnp.float32)
        params = lm.init(jax.random.PRNGKey(0),
                         tok[None, : max(2, n)][:, :2].repeat(1, 0))
        (h, c), logits = lm.apply(params, (h0, c0), tok, method=RNNLM.step)
        return np.asarray(h), np.asarray(c), np.asarray(logits)

    hx, cx, lx = run(cfg_x)
    hf, cf, lf = run(cfg_f)
    np.testing.assert_allclose(lx, lf, rtol=0, atol=1e-5,
                               err_msg=f"{(layers, n, hid, emb, vocab)}")
    np.testing.assert_allclose(hx, hf, rtol=0, atol=1e-6)
    np.testing.assert_allclose(cx, cf, rtol=0, atol=1e-6)
