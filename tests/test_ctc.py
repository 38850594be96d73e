"""CTC loss tests against the torch.nn.CTCLoss oracle (SURVEY.md section 4:
'CTC loss vs a scipy/numpy oracle' — torch-cpu is the strongest oracle in
this image) plus gradient and masking checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from robust_e2e_gan_tpu.ops.ctc import ctc_loss, ctc_greedy_decode


def torch_ctc(logits, logit_lens, labels, label_lens, blank=0, reduction="none"):
    lp = torch.log_softmax(torch.tensor(logits), dim=-1).transpose(0, 1)  # (T,B,V)
    return torch.nn.functional.ctc_loss(
        lp,
        torch.tensor(labels),
        torch.tensor(logit_lens),
        torch.tensor(label_lens),
        blank=blank,
        reduction=reduction,
        zero_infinity=False,
    ).numpy()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_torch(seed):
    rng = np.random.default_rng(seed)
    b, t, v, s = 4, 30, 12, 8
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    logit_lens = np.array([30, 25, 18, 30], np.int32)
    label_lens = np.array([8, 5, 3, 1], np.int32)
    labels = rng.integers(1, v, size=(b, s)).astype(np.int32)
    # avoid adjacent repeats mattering: keep arbitrary (rule handled by both)
    ours = np.asarray(
        ctc_loss(
            jnp.asarray(logits),
            jnp.asarray(logit_lens),
            jnp.asarray(labels),
            jnp.asarray(label_lens),
            reduction="none",
        )
    )
    ref = torch_ctc(logits, logit_lens, labels, label_lens)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_matches_torch_with_repeats():
    rng = np.random.default_rng(3)
    b, t, v, s = 3, 20, 6, 6
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    labels = np.array(
        [[2, 2, 3, 3, 2, 1], [1, 1, 1, 1, 1, 1], [4, 5, 4, 5, 4, 5]], np.int32
    )
    logit_lens = np.array([20, 20, 15], np.int32)
    label_lens = np.array([6, 6, 6], np.int32)
    ours = np.asarray(
        ctc_loss(
            jnp.asarray(logits),
            jnp.asarray(logit_lens),
            jnp.asarray(labels),
            jnp.asarray(label_lens),
            reduction="none",
        )
    )
    ref = torch_ctc(logits, logit_lens, labels, label_lens)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_gradient_matches_torch():
    rng = np.random.default_rng(4)
    b, t, v, s = 2, 15, 8, 4
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    logit_lens = np.array([15, 12], np.int32)
    labels = rng.integers(1, v, size=(b, s)).astype(np.int32)
    label_lens = np.array([4, 3], np.int32)

    g_ours = np.asarray(
        jax.grad(
            lambda lg: ctc_loss(
                lg,
                jnp.asarray(logit_lens),
                jnp.asarray(labels),
                jnp.asarray(label_lens),
                reduction="sum",
            )
        )(jnp.asarray(logits))
    )

    lt = torch.tensor(logits, requires_grad=True)
    lp = torch.log_softmax(lt, dim=-1).transpose(0, 1)
    loss = torch.nn.functional.ctc_loss(
        lp,
        torch.tensor(labels),
        torch.tensor(logit_lens),
        torch.tensor(label_lens),
        blank=0,
        reduction="sum",
        zero_infinity=False,
    )
    loss.backward()
    np.testing.assert_allclose(g_ours, lt.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_padding_invariance():
    """Loss must not depend on logits beyond logit_lengths or labels beyond
    label_lengths (static-shape bucketing correctness)."""
    rng = np.random.default_rng(5)
    b, t, v, s = 2, 20, 10, 6
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    labels = rng.integers(1, v, size=(b, s)).astype(np.int32)
    logit_lens = np.array([14, 11], np.int32)
    label_lens = np.array([4, 2], np.int32)

    base = np.asarray(
        ctc_loss(
            jnp.asarray(logits),
            jnp.asarray(logit_lens),
            jnp.asarray(labels),
            jnp.asarray(label_lens),
            reduction="none",
        )
    )
    logits2 = logits.copy()
    logits2[0, 14:] = 99.0
    logits2[1, 11:] = -99.0
    labels2 = labels.copy()
    labels2[0, 4:] = 9
    labels2[1, 2:] = 7
    perturbed = np.asarray(
        ctc_loss(
            jnp.asarray(logits2),
            jnp.asarray(logit_lens),
            jnp.asarray(labels2),
            jnp.asarray(label_lens),
            reduction="none",
        )
    )
    np.testing.assert_allclose(base, perturbed, rtol=1e-5, atol=1e-5)


def test_jit_and_vmap():
    rng = np.random.default_rng(6)
    f = jax.jit(lambda lg, ll, lb, bl: ctc_loss(lg, ll, lb, bl, reduction="mean"))
    logits = jnp.asarray(rng.standard_normal((4, 25, 9)).astype(np.float32))
    out = f(
        logits,
        jnp.asarray([25, 20, 25, 10]),
        jnp.asarray(rng.integers(1, 9, size=(4, 5)).astype(np.int32)),
        jnp.asarray([5, 4, 3, 2]),
    )
    assert np.isfinite(float(out))


def test_greedy_decode():
    # build logits that deterministically emit [2, 3, 3] via path 2,2,0,3,0,3
    t, v = 6, 5
    path = [2, 2, 0, 3, 0, 3]
    logits = np.full((1, t, v), -10.0, np.float32)
    for i, p in enumerate(path):
        logits[0, i, p] = 10.0
    out = np.asarray(
        ctc_greedy_decode(jnp.asarray(logits), jnp.asarray([t]))
    )[0]
    toks = [int(x) for x in out if x >= 0]
    assert toks == [2, 3, 3]
