"""Batched joint CTC/attention beam search, fully on device.

Reference parity: SURVEY.md call stack 3.2 — the reference decodes with a
host-side, batch=1 Python loop (`Decoder.recognize_beam`) calling per-
hypothesis attention/LSTM steps and a numpy CTCPrefixScore. That host loop is
the reference's key performance gap; BASELINE.json config 3 requires batched
CTC-prefix beam search fully on device.

TPU-first design:
  * Hypotheses are dense (batch B, beam K) tensors; the decode loop is a
    single ``lax.scan`` over a static number of steps — one XLA program, no
    host round-trips.
  * Each step runs the shared DecoderStep (same params as training, via
    ``Decoder.step``) on all B*K hypotheses at once: the per-beam attention +
    LSTM work becomes a handful of large MXU matmuls instead of the
    reference's tiny per-hypothesis kernels.
  * CTC prefix scores for ALL V candidate extensions of ALL B*K hypotheses
    are computed together by one inner ``lax.scan`` over encoder frames
    (the Watanabe prefix recursion, vectorized to (B, K, V) lanes; see
    decode/ctc_prefix.py for the scalar formulation and oracle).
  * Frames past each utterance's length are padded so blank has log-prob 0
    and labels -inf: padding frames emit blank with probability 1, leaving
    prefix scores untouched, so one static T serves the whole batch.
  * Pruning is ``lax.top_k`` over the flattened (K*V) candidate scores;
    finished hypotheses stay in the beam with frozen scores (their only
    finite candidate is eos with delta 0). The final step forces eos so
    every surviving hypothesis is scored with its full-sequence CTC term.

Equivalence with the host reference implementation (decode/host_reference.py)
is asserted in tests/test_beam.py.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from robust_e2e_gan_tpu.config import BeamSearchConfig, E2EConfig

LOG_ZERO = -1e10


class BeamResult(NamedTuple):
    tokens: jnp.ndarray  # (B, L) best hypothesis, -1 padded
    lengths: jnp.ndarray  # (B,)
    scores: jnp.ndarray  # (B,)
    beam_tokens: jnp.ndarray  # (B, K, L)
    beam_lengths: jnp.ndarray  # (B, K)
    beam_scores: jnp.ndarray  # (B, K)


def _gather_beam(x: jnp.ndarray, k_idx: jnp.ndarray) -> jnp.ndarray:
    """Gather beam rows: x (B, K, ...) indexed by k_idx (B, K)."""
    idx = k_idx.reshape(k_idx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx.astype(jnp.int32), axis=1)


def batched_prefix_scores(
    lpz: jnp.ndarray,
    last_tok: jnp.ndarray,
    lengths: jnp.ndarray,
    r_n: jnp.ndarray,
    r_b: jnp.ndarray,
    blank: int,
    eos: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """CTC prefix scores for every vocab extension of every (batch, beam) hyp.

    The Watanabe prefix recursion of decode/ctc_prefix.py vectorized to
    (B, K, V) lanes under one ``lax.scan`` over frames; equivalence with the
    scalar numpy oracle is asserted in tests/test_beam.py.

    Args:
      lpz: (B, T, V) masked CTC log-probs (blank=0 past each length).
      last_tok / lengths: (B, K) last emitted token and emitted count.
      r_n / r_b: (B, K, T) forward variables of each current prefix.
    Returns:
      psi (B, K, V) prefix scores; rn_all/rb_all (T, B, K, V) forward
      variables of each extended prefix (gather the chosen token's slice as
      the next step's r_n/r_b).
    """
    b, t, v = lpz.shape
    k = last_tok.shape[1]
    vocab_ids = jnp.arange(v, dtype=jnp.int32)

    r_sum = jnp.logaddexp(r_n, r_b)  # (B, K, T)
    is_last = (
        vocab_ids[None, None, None, :] == last_tok[:, :, None, None]
    ) & (lengths[:, :, None, None] > 0)
    log_phi = jnp.where(is_last, r_b[..., None], r_sum[..., None])
    phi0 = jnp.where(lengths[:, :, None] == 0, 0.0, LOG_ZERO).astype(
        jnp.float32
    )
    phi_prev = jnp.concatenate(
        [jnp.broadcast_to(phi0[..., None], (b, k, 1, v)),
         log_phi[:, :, :-1, :]],
        axis=2,
    )

    def ctc_step(c, inp):
        rn_p, rb_p, psi = c
        x_t, phi_t = inp  # (B, V), (B, K, V)
        xl = x_t[:, None, :]
        rn = xl + jnp.logaddexp(rn_p, phi_t)
        rb = x_t[:, None, blank, None] + jnp.logaddexp(rn_p, rb_p)
        psi = jnp.logaddexp(psi, phi_t + xl)
        return (rn, rb, psi), (rn, rb)

    z = jnp.full((b, k, v), LOG_ZERO, jnp.float32)
    (_, _, psi), (rn_all, rb_all) = jax.lax.scan(
        ctc_step,
        (z, z, z),
        (jnp.moveaxis(lpz, 1, 0), jnp.moveaxis(phi_prev, 2, 0)),
    )
    # eos candidate = full-sequence CTC score of the prefix itself.
    psi = psi.at[..., eos].set(r_sum[:, :, -1])
    psi = psi.at[..., blank].set(LOG_ZERO)
    return psi, rn_all, rb_all


def batched_prefix_psi(
    lpz: jnp.ndarray,
    last_tok: jnp.ndarray,
    lengths: jnp.ndarray,
    r_n: jnp.ndarray,
    r_b: jnp.ndarray,
    blank: int,
    eos: int,
) -> jnp.ndarray:
    """psi only — the (B, K, V) prefix scores, no (T, B, K, V) outputs.

    Same recursion as ``batched_prefix_scores`` but the forward variables of
    the V candidate extensions stay in the scan carry and are discarded: the
    pruning step only consumes psi, and the selected extension's state is
    recomputed V x cheaper by ``prefix_state_for_token``. This removes the
    two (T, B, K, V) stacked outputs (the dominant HBM traffic of the
    round-1 decode step; PARITY.md "CTC prefix recursion").
    """
    b, t, v = lpz.shape
    k = last_tok.shape[1]
    vocab_ids = jnp.arange(v, dtype=jnp.int32)

    r_sum = jnp.logaddexp(r_n, r_b)  # (B, K, T)
    is_last = (
        vocab_ids[None, None, None, :] == last_tok[:, :, None, None]
    ) & (lengths[:, :, None, None] > 0)
    log_phi = jnp.where(is_last, r_b[..., None], r_sum[..., None])
    phi0 = jnp.where(lengths[:, :, None] == 0, 0.0, LOG_ZERO).astype(
        jnp.float32
    )
    phi_prev = jnp.concatenate(
        [jnp.broadcast_to(phi0[..., None], (b, k, 1, v)),
         log_phi[:, :, :-1, :]],
        axis=2,
    )

    def ctc_step(c, inp):
        rn_p, rb_p, psi = c
        x_t, phi_t = inp
        xl = x_t[:, None, :]
        rn = xl + jnp.logaddexp(rn_p, phi_t)
        rb = x_t[:, None, blank, None] + jnp.logaddexp(rn_p, rb_p)
        psi = jnp.logaddexp(psi, phi_t + xl)
        return (rn, rb, psi), None

    z = jnp.full((b, k, v), LOG_ZERO, jnp.float32)
    (_, _, psi), _ = jax.lax.scan(
        ctc_step,
        (z, z, z),
        (jnp.moveaxis(lpz, 1, 0), jnp.moveaxis(phi_prev, 2, 0)),
    )
    psi = psi.at[..., eos].set(r_sum[:, :, -1])
    psi = psi.at[..., blank].set(LOG_ZERO)
    return psi


def prefix_state_for_token(
    lpz: jnp.ndarray,
    tok: jnp.ndarray,
    last_tok: jnp.ndarray,
    lengths: jnp.ndarray,
    r_n: jnp.ndarray,
    r_b: jnp.ndarray,
    blank: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward variables (B, K, T) of the parent prefixes extended by tok.

    Runs the same 2-state recursion as ``batched_prefix_scores`` but only
    along the single chosen token lane per hypothesis — the cheap second
    pass of the psi-only formulation. ``last_tok``/``lengths``/``r_n``/
    ``r_b`` describe the PARENT prefixes (already gathered by beam index).
    """
    r_sum = jnp.logaddexp(r_n, r_b)  # (B, K, T)
    is_last = (tok == last_tok) & (lengths > 0)  # (B, K)
    log_phi = jnp.where(is_last[..., None], r_b, r_sum)  # (B, K, T)
    phi0 = jnp.where(lengths == 0, 0.0, LOG_ZERO).astype(jnp.float32)
    phi_prev = jnp.concatenate(
        [phi0[..., None], log_phi[..., :-1]], axis=-1
    )  # (B, K, T)
    # lpz gathered at the chosen token: (B, K, T)
    x_tok = jnp.moveaxis(
        jnp.take_along_axis(lpz, tok[:, None, :], axis=2), 1, 2
    )
    x_blank = lpz[:, :, blank]  # (B, T)

    def step(c, inp):
        rn_p, rb_p = c  # (B, K)
        x_t, xb_t, phi_t = inp  # (B, K), (B,), (B, K)
        rn = x_t + jnp.logaddexp(rn_p, phi_t)
        rb = xb_t[:, None] + jnp.logaddexp(rn_p, rb_p)
        return (rn, rb), (rn, rb)

    z = jnp.full(tok.shape, LOG_ZERO, jnp.float32)
    _, (rn_all, rb_all) = jax.lax.scan(
        step,
        (z, z),
        (jnp.moveaxis(x_tok, 2, 0), jnp.moveaxis(x_blank, 1, 0),
         jnp.moveaxis(phi_prev, 2, 0)),
    )
    return jnp.moveaxis(rn_all, 0, 2), jnp.moveaxis(rb_all, 0, 2)


def batched_prefix_scores_parallel(
    lpz: jnp.ndarray,
    last_tok: jnp.ndarray,
    lengths: jnp.ndarray,
    r_n: jnp.ndarray,
    r_b: jnp.ndarray,
    blank: int,
    eos: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scan-free CTC prefix scores (same contract as batched_prefix_scores).

    The Watanabe recursions are first-order linear in the log semiring, so
    they unroll into prefix sums: with X_t = cumsum_t log p(c'), and phi the
    (input) transition scores,

      r^n_t = X_t + logcumsumexp_t (phi_{t-1} - X_{t-1})
      r^b_t = Bk_t + logcumsumexp_t (r^n_{t-1} - Bk_{t-1}),  Bk = cumsum blank
      psi   = logsumexp_t (phi_{t-1} + x_t)

    This replaces the frame-sequential lax.scan (the decode loop's longest
    serial chain: T frames x L decode steps dependent iterations) with
    cumsum/cumlogsumexp, which XLA lowers to log-depth parallel scans on the
    VPU. Intermediate magnitudes are ~|X_T| (thousands of nats) — fine in
    f32, and cumlogsumexp is internally max-shifted. Equivalence with the
    sequential version is asserted in tests/test_beam.py.
    """
    b, t, v = lpz.shape
    k = last_tok.shape[1]
    vocab_ids = jnp.arange(v, dtype=jnp.int32)

    r_sum = jnp.logaddexp(r_n, r_b)  # (B, K, T)
    is_last = (
        vocab_ids[None, None, None, :] == last_tok[:, :, None, None]
    ) & (lengths[:, :, None, None] > 0)
    log_phi = jnp.where(is_last, r_b[..., None], r_sum[..., None])
    phi0 = jnp.where(lengths[:, :, None] == 0, 0.0, LOG_ZERO).astype(
        jnp.float32
    )
    phi_prev = jnp.concatenate(
        [jnp.broadcast_to(phi0[..., None], (b, k, 1, v)),
         log_phi[:, :, :-1, :]],
        axis=2,
    )  # (B, K, T, V)

    x = lpz[:, None]  # (B, 1, T, V) broadcast over beams
    X = jnp.cumsum(lpz, axis=1)  # (B, T, V)
    X_prev = jnp.concatenate(
        [jnp.zeros((b, 1, v), jnp.float32), X[:, :-1]], axis=1
    )
    rn_all = X[:, None] + jax.lax.cumlogsumexp(
        phi_prev - X_prev[:, None], axis=2
    )  # (B, K, T, V)

    bl = lpz[:, :, blank]  # (B, T)
    Bk = jnp.cumsum(bl, axis=1)
    Bk_prev = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.float32), Bk[:, :-1]], axis=1
    )
    rn_prev = jnp.concatenate(
        [jnp.full((b, k, 1, v), LOG_ZERO, jnp.float32),
         rn_all[:, :, :-1]],
        axis=2,
    )
    rb_all = Bk[:, None, :, None] + jax.lax.cumlogsumexp(
        rn_prev - Bk_prev[:, None, :, None], axis=2
    )

    psi = jax.scipy.special.logsumexp(phi_prev + x, axis=2)  # (B, K, V)
    psi = jnp.maximum(psi, LOG_ZERO)
    psi = psi.at[..., eos].set(r_sum[:, :, -1])
    psi = psi.at[..., blank].set(LOG_ZERO)
    # keep values bounded like the sequential version
    rn_all = jnp.maximum(rn_all, LOG_ZERO)
    rb_all = jnp.maximum(rb_all, LOG_ZERO)
    return psi, jnp.moveaxis(rn_all, 2, 0), jnp.moveaxis(rb_all, 2, 0)


def beam_search_from_encoder(
    step_fn: Callable,
    init_carry_fn: Callable,
    enc: jnp.ndarray,
    enc_mask: jnp.ndarray,
    hlens: jnp.ndarray,
    enc_proj: jnp.ndarray,
    ctc_logits: jnp.ndarray,
    ecfg: E2EConfig,
    bcfg: BeamSearchConfig,
    lm_step_fn: Callable = None,
    lm_init_fn: Callable = None,
    aux=None,
) -> BeamResult:
    """Core search given encoder outputs.

    Args:
      step_fn: (dec_carry, tokens (N,), enc (N,T,E), enc_proj (N,T,A),
                enc_mask (N,T)) -> (new_carry, (logits (N,V), att (N,T))) —
        the bound decoder step (training parameters).
      init_carry_fn: (n: int, enc_mask (N,T)) -> initial decoder carry.
      enc/enc_mask/hlens/enc_proj/ctc_logits: encoder-side tensors.
      lm_step_fn/lm_init_fn: optional bound RNNLM step for shallow fusion
        (score += bcfg.lm_weight * log p_LM); same carry discipline as the
        decoder step.
      aux: optional (aux_step_fn, aux_carry0) piggyback work — each beam
        step i additionally runs aux_carry = aux_step_fn(aux_carry, i),
        a data-INDEPENDENT chain the TPU scheduler overlaps with the
        latency-bound decode step inside the same scan iteration (the
        chunked-encode serving pipeline, decode/chunked_encode.py).
        When given, returns (BeamResult, final_aux_carry) and requires
        early_exit=False (the scan must run all max_steps so the aux
        schedule completes deterministically).
    """
    b, t, _ = enc.shape
    v = ctc_logits.shape[-1]
    k = bcfg.beam_size
    l = bcfg.max_steps
    blank, eos = ecfg.blank_id, ecfg.eos_id
    cw = bcfg.ctc_weight
    if bcfg.prefix_impl == "auto":
        # tiled Pallas kernels on real TPU; XLA twopass elsewhere (the
        # kernels run there too, but interpreted — correct, not fast)
        impl = "tiled" if jax.default_backend() == "tpu" else "twopass"
        import dataclasses

        bcfg = dataclasses.replace(bcfg, prefix_impl=impl)

    # --- masked CTC log-probs with the blank-padding trick.
    lpz = jax.nn.log_softmax(ctc_logits.astype(jnp.float32), axis=-1)
    frame_valid = (
        jnp.arange(t, dtype=jnp.int32)[None, :] < hlens[:, None]
    )  # (B, T)
    pad_row = jnp.full((v,), LOG_ZERO, jnp.float32).at[blank].set(0.0)
    lpz = jnp.where(frame_valid[..., None], lpz, pad_row[None, None, :])

    # --- hypothesis lanes n = b * K + k share the B encoder rows; the
    # decoder step broadcasts enc/enc_proj over the beam axis (no K-fold
    # repeat — that repeat was the decode chain's dominant HBM traffic,
    # round-2 VERDICT missing #6). Only the initial-alignment carry needs
    # the per-lane mask.
    emask_k = jnp.repeat(enc_mask, k, axis=0)
    dec_carry = init_carry_fn(b * k, emask_k)
    use_lm = lm_step_fn is not None and bcfg.lm_weight != 0.0
    lm_carry = lm_init_fn(b * k) if use_lm else None

    # --- CTC prefix state of the empty prefix: all-blank paths.
    rb0 = jnp.cumsum(lpz[:, :, blank], axis=1)  # (B, T)
    r_b = jnp.broadcast_to(rb0[:, None, :], (b, k, t))
    r_n = jnp.full((b, k, t), LOG_ZERO, jnp.float32)

    scores = jnp.full((b, k), LOG_ZERO, jnp.float32).at[:, 0].set(0.0)
    tokens = jnp.full((b, k, l), -1, jnp.int32)
    lengths = jnp.zeros((b, k), jnp.int32)
    finished = jnp.zeros((b, k), bool)
    last_tok = jnp.full((b, k), ecfg.sos_id, jnp.int32)
    psi_g = jnp.zeros((b, k), jnp.float32)

    # Per-utterance length bounds (reference maxlenratio/minlenratio over
    # the encoded length); static max_steps remains the hard ceiling.
    min_len_b = jnp.full((b, 1), bcfg.min_len, jnp.int32)
    if bcfg.minlen_ratio > 0.0:
        min_len_b = jnp.maximum(
            min_len_b,
            jnp.ceil(bcfg.minlen_ratio * hlens.astype(jnp.float32))
            .astype(jnp.int32)[:, None],
        )
    if bcfg.maxlen_ratio > 0.0:
        max_len_b = jnp.maximum(
            jnp.floor(bcfg.maxlen_ratio * hlens.astype(jnp.float32))
            .astype(jnp.int32),
            1,
        )[:, None]
        max_len_b = jnp.minimum(max_len_b, l - 1)
    else:
        max_len_b = jnp.full((b, 1), l - 1, jnp.int32)

    vocab_ids = jnp.arange(v, dtype=jnp.int32)
    # streaming end-detect state: best ended score so far + consecutive
    # non-improving-step counter, per utterance
    ended_best = jnp.full((b,), LOG_ZERO, jnp.float32)
    stall = jnp.zeros((b,), jnp.int32)

    if aux is not None and bcfg.early_exit:
        raise ValueError(
            "aux piggyback work requires early_exit=False (the scan "
            "must run all max_steps)"
        )

    def decode_step(carry, i):
        if aux is not None:
            carry, aux_carry = carry
        (scores, tokens, lengths, finished, last_tok, psi_g, r_n, r_b,
         ended_best, stall, dec_carry, lm_carry) = carry

        # --- attention decoder step on all B*K hypotheses at once.
        new_dec_carry, (logits, _) = step_fn(
            dec_carry, last_tok.reshape(b * k), enc, enc_proj, enc_mask
        )
        att_lp = jax.nn.log_softmax(
            logits.astype(jnp.float32), axis=-1
        ).reshape(b, k, v)
        if use_lm:  # RNNLM shallow fusion on the same B*K lanes
            new_lm_carry, lm_logits = lm_step_fn(
                lm_carry, last_tok.reshape(b * k)
            )
            lm_lp = jax.nn.log_softmax(
                lm_logits.astype(jnp.float32), axis=-1
            ).reshape(b, k, v)
        else:
            new_lm_carry = lm_carry

        # --- batched CTC prefix recursion over frames.
        if bcfg.prefix_impl in ("twopass", "pallas", "tiled"):
            # psi-only pass; the chosen extension's forward state is
            # recomputed after pruning (V x less memory traffic)
            if bcfg.prefix_impl == "pallas":
                from robust_e2e_gan_tpu.ops.ctc_prefix_pallas import (
                    prefix_scores_psi_pallas,
                )

                psi = prefix_scores_psi_pallas(
                    lpz, last_tok, lengths, r_n, r_b, blank, eos
                )
            elif bcfg.prefix_impl == "tiled":
                from robust_e2e_gan_tpu.ops.ctc_prefix_tiled import (
                    prefix_psi_tiled,
                )
                from robust_e2e_gan_tpu.parallel.sharding import (
                    sharded_kernel_call,
                )

                psi = sharded_kernel_call(
                    lambda z, lt, ln, rn, rb: prefix_psi_tiled(
                        z, lt, ln, rn, rb, blank, eos
                    ),
                    lpz.shape[0], (True,) * 5,
                )(lpz, last_tok, lengths, r_n, r_b)
            else:
                psi = batched_prefix_psi(
                    lpz, last_tok, lengths, r_n, r_b, blank, eos
                )
            rn_all = rb_all = None
        else:
            prefix_fn = (
                batched_prefix_scores_parallel
                if bcfg.prefix_impl == "parallel" else batched_prefix_scores
            )
            psi, rn_all, rb_all = prefix_fn(
                lpz, last_tok, lengths, r_n, r_b, blank, eos
            )

        # --- joint candidate scores.
        cand = (
            scores[..., None]
            + (1.0 - cw) * att_lp
            + cw * (psi - psi_g[..., None])
            + bcfg.penalty
        )
        if use_lm:
            cand = cand + bcfg.lm_weight * lm_lp
        # blank is never a label candidate; eos masked below min length.
        cand = cand.at[..., blank].set(2.0 * LOG_ZERO)
        cand = cand.at[..., eos].set(
            jnp.where(lengths < min_len_b, 2.0 * LOG_ZERO, cand[..., eos])
        )
        # finished hypotheses: frozen, eos-only continuation.
        cand_fin = jnp.full((b, k, v), 2.0 * LOG_ZERO).at[..., eos].set(scores)
        cand = jnp.where(finished[..., None], cand_fin, cand)
        # force eos at each utterance's max length (and at the last step)
        # so every hypothesis is fully scored.
        at_limit = (i == l - 1) | (lengths >= max_len_b)  # (B, K)
        if bcfg.end_detect:
            # end-detect fired -> wind the whole utterance down via eos
            at_limit = at_limit | (stall >= bcfg.end_detect_window)[:, None]
        force_eos = at_limit[..., None] & (vocab_ids[None, None, :] != eos)
        cand = jnp.where(force_eos & ~finished[..., None], 2.0 * LOG_ZERO, cand)

        # --- prune to K over all K*V candidates.
        top_scores, top_idx = jax.lax.top_k(cand.reshape(b, k * v), k)
        k_idx = (top_idx // v).astype(jnp.int32)
        tok = (top_idx % v).astype(jnp.int32)

        tokens = _gather_beam(tokens, k_idx)
        lengths = _gather_beam(lengths, k_idx)
        fin_old = _gather_beam(finished, k_idx)
        psi_old = _gather_beam(psi_g, k_idx)
        psi_sel = jnp.take_along_axis(
            _gather_beam(psi, k_idx), tok[..., None], axis=-1
        )[..., 0]

        append = (~fin_old) & (tok != eos)
        tokens = tokens.at[:, :, i].set(jnp.where(append, tok, -1))
        lengths = lengths + append.astype(jnp.int32)
        finished = fin_old | (tok == eos)
        psi_g = jnp.where(append, psi_sel, psi_old)

        if bcfg.end_detect:
            # Streaming ESPnet end_detect (reference call stack 3.2): a step
            # whose newly-ended hypotheses all score > margin below the best
            # ended score is "non-improving"; end_detect_window consecutive
            # such steps end the utterance. Steps ending nothing reset the
            # counter (a length with no ended hyps never counts in ESPnet).
            just_ended = finished & ~fin_old
            ended_now = jnp.max(
                jnp.where(just_ended, top_scores, 2.0 * LOG_ZERO), axis=1
            )  # (B,)
            any_ended = jnp.any(just_ended, axis=1)
            below = ended_now < ended_best - bcfg.end_detect_margin
            stall = jnp.where(any_ended & below, stall + 1, 0)
            ended_best = jnp.maximum(ended_best, ended_now)

        # CTC forward state of the selected extensions.
        if bcfg.prefix_impl in ("twopass", "pallas", "tiled"):
            last_par = _gather_beam(last_tok, k_idx)
            len_par = lengths - append.astype(jnp.int32)
            rn_par = _gather_beam(r_n, k_idx)
            rb_par = _gather_beam(r_b, k_idx)
            if bcfg.prefix_impl == "tiled":
                from robust_e2e_gan_tpu.ops.ctc_prefix_tiled import (
                    prefix_state_tiled,
                )
                from robust_e2e_gan_tpu.parallel.sharding import (
                    sharded_kernel_call,
                )

                rn_sel, rb_sel = sharded_kernel_call(
                    lambda z, tk, lt, ln, rn, rb: prefix_state_tiled(
                        z, tk, lt, ln, rn, rb, blank
                    ),
                    lpz.shape[0], (True,) * 6, out_batched=(True, True),
                )(lpz, tok, last_par, len_par, rn_par, rb_par)
            else:
                rn_sel, rb_sel = prefix_state_for_token(
                    lpz, tok, last_par, len_par, rn_par, rb_par, blank
                )
            r_n = jnp.where(append[..., None], rn_sel, rn_par)
            r_b = jnp.where(append[..., None], rb_sel, rb_par)
        else:
            rn_bk = jnp.moveaxis(rn_all, 0, 2)  # (B, K, T, V)
            rb_bk = jnp.moveaxis(rb_all, 0, 2)
            rn_sel = jnp.take_along_axis(
                _gather_beam(rn_bk, k_idx), tok[:, :, None, None], axis=-1
            )[..., 0]
            rb_sel = jnp.take_along_axis(
                _gather_beam(rb_bk, k_idx), tok[:, :, None, None], axis=-1
            )[..., 0]
            r_n = jnp.where(
                append[..., None], rn_sel, _gather_beam(r_n, k_idx)
            )
            r_b = jnp.where(
                append[..., None], rb_sel, _gather_beam(r_b, k_idx)
            )

        # Decoder carry: permute the (B*K)-flattened hidden state by k_idx.
        def permute(x):
            if x.shape[0] == b * k:  # (B*K, ...) e.g. attention weights
                xs = x.reshape((b, k) + x.shape[1:])
                idx = k_idx.reshape((b, k) + (1,) * (xs.ndim - 2))
                xs = jnp.take_along_axis(xs, idx, axis=1)
                return xs.reshape(x.shape)
            # (layers, B*K, D) stacked LSTM state
            assert x.ndim == 3 and x.shape[1] == b * k, x.shape
            xs = x.reshape((x.shape[0], b, k, x.shape[-1]))
            xs = jnp.take_along_axis(xs, k_idx[None, :, :, None], axis=2)
            return xs.reshape(x.shape)

        dec_carry = jax.tree_util.tree_map(permute, new_dec_carry)
        lm_carry = jax.tree_util.tree_map(permute, new_lm_carry)
        last_tok = tok

        new_carry = (top_scores, tokens, lengths, finished, last_tok, psi_g,
                     r_n, r_b, ended_best, stall, dec_carry, lm_carry)
        if aux is not None:
            # independent chain: XLA schedules it alongside the decode
            # step's latency-bound ops within this iteration
            return (new_carry, aux[0](aux_carry, i)), None
        return new_carry, None

    carry0 = (scores, tokens, lengths, finished, last_tok, psi_g, r_n, r_b,
              ended_best, stall, dec_carry, lm_carry)
    if aux is not None:
        carry0 = (carry0, aux[1])
    if bcfg.early_exit:
        # while_loop with an all-finished predicate: post-finish scan steps
        # are provably no-ops (frozen eos self-loops re-select the same
        # descending-sorted beams), so stopping early is token-exact while
        # cutting latency on short utterances (round-1 VERDICT weak #4).
        def loop_cond(state):
            i, c = state
            return (i < l) & ~jnp.all(c[3])

        def loop_body(state):
            i, c = state
            c, _ = decode_step(c, i)
            return i + 1, c

        _, carry = jax.lax.while_loop(
            loop_cond, loop_body, (jnp.int32(0), carry0)
        )
    else:
        carry, _ = jax.lax.scan(
            decode_step, carry0, jnp.arange(l, dtype=jnp.int32),
            unroll=max(bcfg.scan_unroll, 1),
        )
    aux_final = None
    if aux is not None:
        carry, aux_final = carry
    scores, tokens, lengths = carry[0], carry[1], carry[2]

    rank = scores
    if bcfg.length_normalize:
        rank = scores / jnp.maximum(lengths.astype(jnp.float32), 1.0)
    best = jnp.argmax(rank, axis=1)
    best_tokens = jnp.take_along_axis(
        tokens, best[:, None, None], axis=1
    )[:, 0]
    best_lengths = jnp.take_along_axis(lengths, best[:, None], axis=1)[:, 0]
    best_scores = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    result = BeamResult(
        best_tokens, best_lengths, best_scores, tokens, lengths, scores
    )
    if aux is not None:
        return result, aux_final
    return result


def _padded_batch(b: int) -> int:
    """Measured-good decode batch tile (round-5 bisect, results/
    batch_bisect.json + batch_sweep.json): B=112 degrades 1.9x (the
    fused attention kernel's lane packing wants B % 32 == 0; att=xla
    removes that cliff) and B=144 degrades 2.5x in EVERY impl variant
    (XLA-level, survives lstm=scan/att=xla/prefix=twopass) — both are
    the non-multiples of 32 in the sweep, while 64/96/128/160/192/256
    are all cliff-free. Padding up to the next multiple of 32 is
    therefore the guard; below 32 there is no measured cliff and
    padding waste dominates."""
    if b > 32 and b % 32:
        return b + 32 - b % 32
    return b


def make_beam_searcher(
    model,
    ecfg: E2EConfig,
    bcfg: BeamSearchConfig,
    use_enhancer: bool = True,
    lm=None,
    lm_params=None,
    input_kind: str = "wav",
    log_domain: bool = False,
    pad_batch="auto",
) -> Callable:
    """Bind a RobustE2E model into a jitted wav -> BeamResult function.

    Replaces the reference's recognize() entry point (SURVEY.md L3): one
    compiled program runs enhancer -> fbank -> encoder -> batched joint
    CTC/attention beam search for a whole batch of utterances. Pass an
    ``RNNLM`` module + params (models/lm.py) with ``bcfg.lm_weight > 0`` for
    shallow fusion.

    ``pad_batch``: "auto" pads odd batch sizes up to the measured-good
    tile ladder on TPU (see _padded_batch — protects library callers
    from the B=112/144 cliffs, not just the CLI batcher), an int pads to
    at least that size, None/False disables. Pad rows repeat the last
    utterance and are sliced off the result; per-utterance independence
    of the search makes this exact for the real rows
    (tests/test_beam.py::test_pad_batch_guard_exact).
    """
    encode_fn, decode_fn = _bind_search_parts(
        model, ecfg, bcfg, use_enhancer, lm, lm_params, input_kind,
        log_domain,
    )

    def search(params, wav, wav_lengths, cmvn_batch=None):
        b = wav.shape[0]
        if pad_batch == "auto":
            target = (
                _padded_batch(b)
                if jax.default_backend() == "tpu" else b
            )
        elif not pad_batch:
            target = b
        else:
            target = max(int(pad_batch), b)
        if target != b:
            reps = target - b

            def pad_rows(x):
                return jnp.concatenate(
                    [x, jnp.repeat(x[-1:], reps, axis=0)], axis=0
                )

            wav = pad_rows(wav)
            wav_lengths = pad_rows(wav_lengths)
            if cmvn_batch is not None:
                cmvn_batch = tuple(pad_rows(c) for c in cmvn_batch)
        res = decode_fn(params, encode_fn(params, wav, wav_lengths,
                                          cmvn_batch))
        if target != b:
            res = BeamResult(*(x[:b] for x in res))
        return res

    return jax.jit(search)


def _bind_search_parts(model, ecfg, bcfg, use_enhancer, lm, lm_params,
                       input_kind, log_domain):
    """(encode_fn, decode_fn) halves of the serving program.

    encode_fn: params, wav, lens[, cmvn] -> enc tuple (hs, hmask, hlens,
    ctc_logits, enc_proj). decode_fn: params, enc tuple -> BeamResult.
    make_beam_searcher composes them into one program;
    make_pipelined_beam_searcher staggers them across consecutive batches.
    """
    from robust_e2e_gan_tpu.pipeline import RobustE2E

    lm_step_fn = lm_init_fn = None
    if lm is not None and bcfg.lm_weight != 0.0:
        lm_vars = {"params": lm_params}

        def lm_step_fn(carry, toks):
            return lm.apply(lm_vars, carry, toks, method=lm.step)

        def lm_init_fn(n):
            return lm.apply(lm_vars, n, method=lm.initial_carry)

    def encode_fn(params, wav, wav_lengths, cmvn_batch=None):
        variables = {"params": params}
        if input_kind == "feats":  # precomputed-features (feats.scp) source
            return model.apply(
                variables, wav, wav_lengths, cmvn_batch=cmvn_batch,
                method=RobustE2E.encode_for_decode_feats,
            )
        if input_kind == "spec":  # precomputed spectrogram feats
            return model.apply(
                variables, wav, wav_lengths, use_enhancer,
                cmvn_batch=cmvn_batch, log_domain=log_domain,
                method=RobustE2E.encode_for_decode_spec,
            )
        return model.apply(
            variables, wav, wav_lengths, use_enhancer,
            cmvn_batch=cmvn_batch,
            method=RobustE2E.encode_for_decode,
        )

    def decode_fn(params, enc, aux=None):
        hs, hmask, hlens, ctc_logits, enc_proj = enc
        variables = {"params": params}

        def step_fn(carry, toks, enc_, enc_proj_, emask):
            return model.apply(
                variables, carry, toks, enc_, enc_proj_, emask,
                method=RobustE2E.decoder_step,
            )

        def init_fn(n, emask):
            return model.apply(
                variables, n, emask,
                method=RobustE2E.decoder_initial_carry,
            )

        return beam_search_from_encoder(
            step_fn, init_fn, hs, hmask, hlens, enc_proj, ctc_logits,
            ecfg, bcfg, lm_step_fn=lm_step_fn, lm_init_fn=lm_init_fn,
            aux=aux,
        )

    return encode_fn, decode_fn


def pipelined_default() -> bool:
    """Measurement-driven default for the cross-batch staged schedule.

    True iff the on-chip A/B (scripts/bench_pipeline.py ->
    results/pipeline_ab.json) recorded a >5% win on the TPU backend and
    we are running on TPU now. Same idiom as bench.py's swept-batch
    default: measured-on-hardware decisions, not guesses. Any missing or
    malformed record means False (sequential).
    """
    import json
    import os

    try:
        if jax.default_backend() != "tpu":
            return False
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            "results", "pipeline_ab.json",
        )
        with open(path) as f:
            data = json.load(f)
        return data.get("backend") == "tpu" and data.get("speedup", 0) > 1.05
    except Exception:
        return False


def serving_schedule_default() -> str:
    """Measurement-driven serving schedule: "sequential" | "pipelined" |
    "chunked", whichever the on-chip A/B (scripts/bench_pipeline.py ->
    results/pipeline_ab.json) recorded fastest by >5% on TPU. Same
    idiom as pipelined_default(); any missing/malformed record means
    "sequential"."""
    import json
    import os

    try:
        if jax.default_backend() != "tpu":
            return "sequential"
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            "results", "pipeline_ab.json",
        )
        with open(path) as f:
            data = json.load(f)
        if data.get("backend") != "tpu":
            return "sequential"
        best, best_s = "sequential", 1.05
        for name, key in (("pipelined", "speedup"),
                          ("chunked", "chunked_speedup")):
            s = data.get(key) or 0
            if s > best_s:
                best, best_s = name, s
        return best
    except Exception:
        return "sequential"


def make_pipelined_beam_searcher(
    model,
    ecfg: E2EConfig,
    bcfg: BeamSearchConfig,
    use_enhancer: bool = True,
    lm=None,
    lm_params=None,
    input_kind: str = "wav",
    log_domain: bool = False,
) -> Callable:
    """Cross-batch staged serving: batch i's beam loop and batch i+1's
    enhancer+encoder fused into ONE jitted program.

    The three pipeline stages (enhancer ~16 ms, encoder ~16 ms, beam loop
    ~31 ms at bench shapes, results/beam_parts.json) run strictly serially
    per batch in make_beam_searcher, yet the beam loop is latency-bound
    (decode MFU 15.4%, results/mfu.json): its serial scan leaves the MXU
    mostly idle exactly when the next batch's encoder — pure matmul
    throughput — could use it. The staged program hands XLA the two
    data-independent chains together, the same property that already
    yields the measured 20.9 ms in-search overlap.

    Returns ``run(params, batches)``: ``batches`` iterates (wav, lens[,
    cmvn]) tuples of IDENTICAL static shapes; yields one BeamResult per
    batch, in order. Identical results to the unpipelined searcher —
    only the schedule differs.
    """
    encode_fn, decode_fn = _bind_search_parts(
        model, ecfg, bcfg, use_enhancer, lm, lm_params, input_kind,
        log_domain,
    )

    prime = jax.jit(encode_fn)

    @jax.jit
    def staged(params, enc, wav, wav_lengths, cmvn_batch=None):
        # decode batch i + encode batch i+1: no data dependence between
        # the two outputs, XLA schedules the chains concurrently
        return (decode_fn(params, enc),
                encode_fn(params, wav, wav_lengths, cmvn_batch))

    flush = jax.jit(decode_fn)

    def run(params, batches):
        # Length-bucketed corpora change batch shapes at bucket
        # boundaries; a staged program spanning two shapes would compile
        # once per (bucket_i, bucket_j) PAIR observed. Flush + re-prime
        # at each shape change instead, so only same-shape staged
        # programs (plus one prime/flush per bucket) ever compile.
        enc = None
        cur_shape = None
        for b in batches:
            shape = tuple(
                x.shape for x in jax.tree_util.tree_leaves(b)
            )
            if enc is not None and shape != cur_shape:
                yield flush(params, enc)
                enc = None
            if enc is None:
                enc = prime(params, *b)
                cur_shape = shape
            else:
                res, enc = staged(params, enc, *b)
                yield res
        if enc is not None:
            yield flush(params, enc)

    return run


def make_chunked_pipelined_beam_searcher(
    model,
    ecfg: E2EConfig,
    bcfg: BeamSearchConfig,
    use_enhancer: bool = True,
    lm=None,
    lm_params=None,
) -> Callable:
    """Chunked-encode pipelined serving: batch i+1's encode runs INSIDE
    batch i's beam scan, one chunk per decode step.

    The schedule-level staging of make_pipelined_beam_searcher measured
    0.9995x (results/pipeline_ab.json) because the beam loop is one XLA
    while op, placed atomically — nothing outside it overlaps it. This
    variant moves the encode chain into the loop body itself
    (decode/chunked_encode.py): each scan iteration runs one decode step
    of batch i plus one chunk of batch i+1's STFT/enhancer/VGG/BLSTM
    pipeline, two independent chains XLA schedules together (the same
    within-iteration overlap already measured at 20.9 ms in
    results/beam_parts.json). Ceiling if the overlap is perfect: hide
    the whole ~33 ms encode behind the ~30 ms beam loop, ~1.8x.

    Same contract as make_pipelined_beam_searcher: ``run(params,
    batches)`` over (wav, lens) tuples, one BeamResult per batch in
    order, flush/re-prime at shape changes. Requires early_exit=False,
    input_kind="wav", and utterance/none CMVN; the chunked BLSTMs use
    the scan math (the fused Pallas kernels loop full T internally), a
    measured ~5.6% cost (results/kernel_ab.json) that the overlap must
    beat for this schedule to win.
    """
    from robust_e2e_gan_tpu.decode.chunked_encode import (
        build_chunked_encode,
        make_chunk_plan,
    )

    if bcfg.early_exit:
        raise ValueError(
            "chunked pipelined serving requires early_exit=False"
        )
    encode_fn, decode_fn = _bind_search_parts(
        model, ecfg, bcfg, use_enhancer, lm, lm_params, "wav", False
    )
    jcfg = model.cfg
    prime = jax.jit(encode_fn)
    flush = jax.jit(decode_fn)
    staged_cache = {}

    def staged_for(n_samples: int):
        if n_samples not in staged_cache:
            plan = make_chunk_plan(
                jcfg, n_samples, bcfg.max_steps, use_enhancer
            )
            init_fn, step_fn, finalize_fn = build_chunked_encode(
                model, jcfg, plan, use_enhancer
            )

            @jax.jit
            def staged(params, enc, wav, wav_lengths):
                aux0 = init_fn(params, wav, wav_lengths)
                res, aux_t = decode_fn(
                    params, enc,
                    aux=(lambda c, i: step_fn(params, c, i), aux0),
                )
                enc_next = finalize_fn(params, aux_t, bcfg.max_steps)
                return res, enc_next

            staged_cache[n_samples] = staged
        return staged_cache[n_samples]

    def run(params, batches):
        enc = None
        cur_shape = None
        for b in batches:
            wav, lens = b[0], b[1]
            if len(b) > 2 and b[2] is not None:
                raise ValueError(
                    "chunked pipelined serving does not take per-batch "
                    "CMVN stats — use the sequential searcher"
                )
            shape = (wav.shape, lens.shape)
            if enc is not None and shape != cur_shape:
                yield flush(params, enc)
                enc = None
            if enc is None:
                enc = prime(params, wav, lens)
                cur_shape = shape
            else:
                res, enc = staged_for(wav.shape[1])(
                    params, enc, wav, lens
                )
                yield res
        if enc is not None:
            yield flush(params, enc)

    return run
