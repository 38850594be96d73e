"""Fused Pallas CTC loss (ops/ctc_pallas.py) vs the scan oracle and torch.

The fused alpha recursion + hand-derived adjoint must match the
lax.scan implementation (ops/ctc.py, itself torch-oracle-verified) on
values bit-for-bit-ish and gradients to f32 tolerance — including repeats
(skip-rule), ragged logit/label lengths, zero-length labels, and the
T near S feasibility edge. Interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from robust_e2e_gan_tpu.ops.ctc import ctc_loss


def torch_ctc(logits, logit_lens, labels, label_lens, blank=0):
    lp = torch.log_softmax(torch.tensor(logits), dim=-1).transpose(0, 1)
    return torch.nn.functional.ctc_loss(
        lp, torch.tensor(labels), torch.tensor(logit_lens),
        torch.tensor(label_lens), blank=blank, reduction="none",
        zero_infinity=False,
    ).numpy()


def _both(logits, llen, labels, slen, reduction="none"):
    args = (jnp.asarray(logits), jnp.asarray(llen), jnp.asarray(labels),
            jnp.asarray(slen))
    a = ctc_loss(*args, reduction=reduction, impl="scan")
    b = ctc_loss(*args, reduction=reduction, impl="fused")
    return np.asarray(a), np.asarray(b)


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_matches_scan_and_torch(seed):
    rng = np.random.default_rng(seed)
    b, t, v, s = 4, 30, 12, 8
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    llen = np.array([30, 25, 18, 30], np.int32)
    slen = np.array([8, 5, 3, 1], np.int32)
    labels = rng.integers(1, v, size=(b, s)).astype(np.int32)
    a, bb = _both(logits, llen, labels, slen)
    np.testing.assert_allclose(a, bb, rtol=0, atol=1e-5)
    ref = torch_ctc(logits, llen, labels, slen)
    np.testing.assert_allclose(bb, ref, rtol=1e-4, atol=1e-4)


def test_fused_repeats_and_edges():
    rng = np.random.default_rng(3)
    b, t, v, s = 4, 20, 6, 6
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    labels = np.array(
        [[2, 2, 3, 3, 2, 1], [1, 1, 1, 1, 1, 1], [4, 5, 4, 5, 4, 5],
         [3, 0, 0, 0, 0, 0]],
        np.int32,
    )
    llen = np.array([20, 20, 15, 7], np.int32)
    slen = np.array([6, 6, 6, 0], np.int32)  # incl. empty label sequence
    a, bb = _both(logits, llen, labels, slen)
    np.testing.assert_allclose(a, bb, rtol=0, atol=1e-5)


def test_fused_gradients_match_scan():
    rng = np.random.default_rng(7)
    b, t, v, s = 3, 24, 10, 7
    logits = jnp.asarray(rng.standard_normal((b, t, v)).astype(np.float32))
    llen = jnp.asarray([24, 16, 20], jnp.int32)
    slen = jnp.asarray([7, 2, 5], jnp.int32)
    labels = jnp.asarray(rng.integers(1, v, size=(b, s)), jnp.int32)

    def loss(impl):
        return lambda x: ctc_loss(x, llen, labels, slen, impl=impl)

    g0 = jax.grad(loss("scan"))(logits)
    g1 = jax.grad(loss("fused"))(logits)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g0), rtol=0, atol=2e-6
    )
    # gradient exactness vs torch autograd as well
    tl = torch.tensor(np.asarray(logits), requires_grad=True)
    lp = torch.log_softmax(tl, dim=-1).transpose(0, 1)
    tloss = torch.nn.functional.ctc_loss(
        lp, torch.tensor(np.asarray(labels)),
        torch.tensor(np.asarray(llen)), torch.tensor(np.asarray(slen)),
        blank=0, reduction="mean", zero_infinity=False,
    )
    tloss.backward()
    np.testing.assert_allclose(
        np.asarray(g1), tl.grad.numpy(), rtol=1e-3, atol=1e-4
    )


def test_fused_fits_gate():
    from robust_e2e_gan_tpu.ops.ctc_pallas import ctc_alpha_fits

    assert ctc_alpha_fits(172, 32, 128)  # flagship train bucket
    assert not ctc_alpha_fits(4000, 256, 512)  # absurd -> scan fallback
    # unfittable shapes still compute (scan fallback inside impl='fused')
    rng = np.random.default_rng(1)
    b, t, v, s = 2, 10, 5, 3
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    llen = np.array([10, 8], np.int32)
    slen = np.array([3, 2], np.int32)
    labels = rng.integers(1, v, size=(b, s)).astype(np.int32)
    a, bb = _both(logits, llen, labels, slen)
    np.testing.assert_allclose(a, bb, rtol=0, atol=1e-5)


def test_fused_ctc_under_data_mesh_no_gather():
    """impl='fused' under the ambient kernel mesh: per-shard shard_map,
    no all-gathers, gradients equal the unsharded scan run."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from robust_e2e_gan_tpu.parallel.sharding import kernel_mesh, make_mesh

    rng = np.random.default_rng(11)
    b, t, v, s = 8, 16, 8, 4
    logits = jnp.asarray(rng.standard_normal((b, t, v)).astype(np.float32))
    llen = jnp.asarray(rng.integers(s + 2, t + 1, size=b), jnp.int32)
    slen = jnp.asarray(rng.integers(1, s + 1, size=b), jnp.int32)
    labels = jnp.asarray(rng.integers(1, v, size=(b, s)), jnp.int32)

    g_ref = jax.grad(
        lambda x: ctc_loss(x, llen, labels, slen, impl="scan")
    )(logits)

    mesh = make_mesh(8, 1)
    sh = NamedSharding(mesh, P("data"))
    xs = jax.device_put(logits, sh)
    ll = jax.device_put(llen, sh)
    lb = jax.device_put(labels, sh)
    sl = jax.device_put(slen, sh)
    with kernel_mesh(mesh):
        g = jax.jit(jax.grad(
            lambda x, a, c, d: ctc_loss(x, a, c, d, impl="fused")
        ))
        txt = g.lower(xs, ll, lb, sl).compile().as_text()
        assert txt.count("all-gather") == 0
        gv = g(xs, ll, lb, sl)
    np.testing.assert_allclose(
        np.asarray(gv), np.asarray(g_ref), rtol=0, atol=2e-6
    )
