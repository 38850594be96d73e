"""CTC loss as pure JAX: log-space forward algorithm under ``lax.scan``.

Replaces the reference's external warp-ctc / torch CTCLoss native dependency
(SURVEY.md section 2b): on TPU there is no custom CUDA kernel to bind — the
forward-backward recursion compiles under XLA, and the backward pass comes
for free from autodiff through the scan (which XLA turns into an efficient
reverse scan; no hand-written gradient needed).

Shapes are fully static; variable input/label lengths are handled by masking,
so one compilation serves a whole length bucket. Verified against
torch.nn.CTCLoss as an oracle in tests/test_ctc.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _interleave_blanks(labels: jnp.ndarray, blank_id: int) -> jnp.ndarray:
    """(B, S) labels -> (B, 2S+1) blank-interleaved extended sequence."""
    b, s = labels.shape
    ext = jnp.full((b, 2 * s + 1), blank_id, dtype=labels.dtype)
    return ext.at[:, 1::2].set(labels)


def ctc_loss(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
    log_input: bool = False,
    reduction: str = "mean",
    impl: str = "scan",
) -> jnp.ndarray:
    """Negative log-likelihood of the CTC alignment marginal.

    Args:
      logits: (B, T, V) unnormalized scores (or log-probs if log_input).
      logit_lengths: (B,) valid time steps per sequence.
      labels: (B, S) target ids, padding arbitrary beyond label_lengths.
      label_lengths: (B,) valid label counts; entries must satisfy S_b <= S
        and S_b <= T_b (standard CTC feasibility).
      blank_id: index of the CTC blank.
      reduction: "mean" (per-label-token, torch 'mean' semantics), "sum",
        or "none" -> (B,).
      impl: alpha-recursion implementation — "scan" (XLA lax.scan, the
        oracle), "fused" (ops/ctc_pallas.py custom-VJP Mosaic kernels;
        falls back to scan when the shapes exceed the VMEM plan), "auto"
        (fused on TPU).

    Returns the reduced loss. Fully differentiable w.r.t. logits.
    """
    b, t, v = logits.shape
    s = labels.shape[1]
    u = 2 * s + 1

    lp = logits if log_input else jax.nn.log_softmax(logits, axis=-1)
    lp = lp.astype(jnp.float32)

    ext = _interleave_blanks(labels.astype(jnp.int32), blank_id)  # (B, U)

    # Transition mask: from s-2 allowed iff ext[s] != blank and
    # ext[s] != ext[s-2] (the standard CTC skip rule).
    ext_shift2 = jnp.concatenate(
        [jnp.full((b, 2), -1, dtype=ext.dtype), ext[:, :-2]], axis=1
    )
    allow_skip = (ext != blank_id) & (ext != ext_shift2)  # (B, U)
    skip_add = jnp.where(allow_skip, 0.0, _NEG_INF)

    # Per-step label emission scores: gather lp[:, t, ext] for all t at once.
    # (B, T, U) gather — one take_along_axis outside the scan keeps the scan
    # body to pure elementwise ops (VPU) with no per-step gathers.
    ext_bt = jnp.broadcast_to(ext[:, None, :], (b, t, u))
    emit = jnp.take_along_axis(lp, ext_bt, axis=-1)  # (B, T, U)

    # Positions beyond the true extended length are invalid.
    pos = jnp.arange(u, dtype=jnp.int32)[None, :]
    valid_pos = pos < (2 * label_lengths[:, None] + 1)
    pos_add = jnp.where(valid_pos, 0.0, _NEG_INF)

    alpha0 = jnp.full((b, u), _NEG_INF, dtype=jnp.float32)
    alpha0 = alpha0.at[:, 0].set(emit[:, 0, 0])
    has_label = (label_lengths > 0) & (s > 0)
    first_label = jnp.where(has_label, emit[:, 0, 1], _NEG_INF)
    alpha0 = alpha0.at[:, 1].set(jnp.where(has_label, first_label, _NEG_INF))
    alpha0 = jnp.maximum(alpha0 + pos_add, _NEG_INF)

    def step(alpha, inputs):
        emit_t, t_idx = inputs
        a_prev = alpha
        a_shift1 = jnp.concatenate(
            [jnp.full((b, 1), _NEG_INF), alpha[:, :-1]], axis=1
        )
        a_shift2 = (
            jnp.concatenate([jnp.full((b, 2), _NEG_INF), alpha[:, :-2]], axis=1)
            + skip_add
        )
        stacked = jnp.stack([a_prev, a_shift1, a_shift2], axis=0)
        m = jnp.max(stacked, axis=0)
        safe_m = jnp.where(m <= _NEG_INF, 0.0, m)
        # clamp keeps log finite (and its gradient NaN-free through the
        # untaken where-branch) when all three paths are impossible.
        summed = jnp.maximum(jnp.sum(jnp.exp(stacked - safe_m), axis=0), 1e-37)
        new_alpha = jnp.where(
            m <= _NEG_INF, _NEG_INF, safe_m + jnp.log(summed)
        ) + emit_t + pos_add
        new_alpha = jnp.maximum(new_alpha, _NEG_INF)  # bound drift
        # Freeze alpha past each sequence's input length.
        active = (t_idx < logit_lengths)[:, None]
        new_alpha = jnp.where(active, new_alpha, alpha)
        return new_alpha, None

    from robust_e2e_gan_tpu.utils.impl import fused_enabled

    use_fused = False
    if fused_enabled(impl):
        from robust_e2e_gan_tpu.ops.ctc_pallas import (
            ctc_alpha_final, ctc_alpha_fits,
        )
        from robust_e2e_gan_tpu.parallel.sharding import (
            local_kernel_batch,
        )

        use_fused = ctc_alpha_fits(t, local_kernel_batch(b), s)
    if use_fused:
        from robust_e2e_gan_tpu.parallel.sharding import (
            sharded_kernel_call,
        )

        # under a data mesh the kernel runs per-shard (shard_map); XLA
        # cannot partition a pallas_call and would all-gather
        alpha = sharded_kernel_call(
            ctc_alpha_final, b, (True,) * 5
        )(emit, alpha0, skip_add, pos_add, logit_lengths)
    else:
        ts = jnp.arange(1, t, dtype=jnp.int32)
        alpha, _ = jax.lax.scan(
            step, alpha0, (jnp.moveaxis(emit[:, 1:], 1, 0), ts)
        )

    # Final: logsumexp of positions 2*S_b and 2*S_b - 1.
    last = 2 * label_lengths.astype(jnp.int32)
    a_last = jnp.take_along_axis(alpha, last[:, None], axis=1)[:, 0]
    idx2 = jnp.maximum(last - 1, 0)
    a_prev_pos = jnp.take_along_axis(alpha, idx2[:, None], axis=1)[:, 0]
    a_prev_pos = jnp.where(label_lengths > 0, a_prev_pos, _NEG_INF)
    m = jnp.maximum(a_last, a_prev_pos)
    safe_m = jnp.where(m <= _NEG_INF, 0.0, m)
    ll = safe_m + jnp.log(
        jnp.maximum(
            jnp.exp(a_last - safe_m) + jnp.exp(a_prev_pos - safe_m), 1e-37
        )
    )
    nll = -jnp.where(m <= _NEG_INF, _NEG_INF, ll)

    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        denom = jnp.maximum(label_lengths.astype(jnp.float32), 1.0)
        return jnp.mean(nll / denom)
    raise ValueError(f"unknown reduction {reduction!r}")


def ctc_greedy_decode(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """Greedy (best-path) CTC decode, fully on device.

    Returns (B, T) int32 where repeated tokens and blanks are replaced by
    -1 at non-emitting positions; host code compacts to strings. The
    collapse (drop repeats, then blanks) is done with vectorized compares —
    no host loop (contrast SURVEY.md call stack 3.2's host-side decode).
    """
    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, T)
    t = ids.shape[1]
    prev = jnp.concatenate([jnp.full_like(ids[:, :1], -1), ids[:, :-1]], axis=1)
    in_range = jnp.arange(t, dtype=jnp.int32)[None, :] < logit_lengths[:, None]
    emit = (ids != prev) & (ids != blank_id) & in_range
    return jnp.where(emit, ids, -1)
