"""Host-side per-utterance beam search — the slow oracle.

This mirrors the reference's `Decoder.recognize_beam` control flow (SURVEY.md
call stack 3.2): a Python loop over output steps, per-hypothesis decoder
steps, numpy CTCPrefixScore joint rescoring. It exists ONLY as the
equivalence oracle for the batched on-device search (SURVEY.md section 7
step 5); production decoding uses decode/beam.py.

Semantics are kept IDENTICAL to the device search so the equivalence test is
exact: a fixed-size beam of K hypotheses where ended hypotheses stay in the
beam with frozen scores (their only candidate is an eos self-loop with delta
0), global top-K pruning over all K*V candidates, and forced eos on the last
step. The CTC prefix scoring is the scalar numpy recursion from
decode/ctc_prefix.py, which tests separately against the batched scan.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List

import numpy as np
import jax
import jax.numpy as jnp

from robust_e2e_gan_tpu.config import BeamSearchConfig, E2EConfig
from robust_e2e_gan_tpu.decode.ctc_prefix import CTCPrefixScore, LOG_ZERO


@dataclass
class Hypothesis:
    tokens: List[int]  # emitted tokens (no sos/eos)
    last: int  # last fed token (sos at start)
    score: float
    psi: float  # CTC prefix score of the emitted tokens
    r: np.ndarray  # (T, 2) CTC forward state
    carry: object  # decoder carry to feed the NEXT step
    ended: bool = False
    ended_at: int = -1  # step index at which eos was taken
    lm_carry: object = None  # RNNLM state for shallow fusion


def recognize_beam_host(
    step_fn: Callable,
    init_carry_fn: Callable,
    enc: np.ndarray,
    enc_mask: np.ndarray,
    hlen: int,
    enc_proj: np.ndarray,
    log_probs_ctc: np.ndarray,
    ecfg: E2EConfig,
    bcfg: BeamSearchConfig,
    lm_step_fn: Callable = None,
    lm_init_fn: Callable = None,
):
    """Decode ONE utterance; returns (tokens, score) of the best hypothesis.

    step_fn/init_carry_fn take batch-1 tensors (the same bound decoder step
    as the device search, so only the search logic differs).
    """
    v = log_probs_ctc.shape[-1]
    blank, eos, sos = ecfg.blank_id, ecfg.eos_id, ecfg.sos_id
    k = bcfg.beam_size
    cw = bcfg.ctc_weight

    # Same blank-padding trick as the device path so T stays static.
    lpz = np.array(log_probs_ctc, dtype=np.float64)
    pad = np.full((v,), LOG_ZERO)
    pad[blank] = 0.0
    lpz[hlen:] = pad

    scorer = CTCPrefixScore(lpz, blank=blank, eos=eos)
    enc_b = jnp.asarray(enc[None])
    mask_b = jnp.asarray(enc_mask[None])
    proj_b = jnp.asarray(enc_proj[None])

    min_len = bcfg.min_len
    if bcfg.minlen_ratio > 0.0:
        min_len = max(min_len, int(np.ceil(bcfg.minlen_ratio * hlen)))
    max_len = bcfg.max_steps - 1
    if bcfg.maxlen_ratio > 0.0:
        max_len = min(max_len, max(int(bcfg.maxlen_ratio * hlen), 1))

    init = Hypothesis(
        tokens=[], last=sos, score=0.0, psi=0.0,
        r=scorer.initial_state(), carry=init_carry_fn(1, mask_b),
        lm_carry=lm_init_fn(1) if lm_init_fn is not None else None,
    )
    # Device search starts with K identical beams, score -inf except beam 0;
    # one live hypothesis at step 0 is the equivalent host state.
    hyps = [init]
    ended_best = LOG_ZERO  # streaming end-detect state (device-identical)
    stall = 0

    for i in range(bcfg.max_steps):
        end_trig = bcfg.end_detect and stall >= bcfg.end_detect_window
        # candidate = (score, tokens, last, psi, r, carry, ended)
        cands: List[Hypothesis] = []
        for hyp in hyps:
            if hyp.ended:  # frozen: eos self-loop, unchanged score
                cands.append(hyp)
                continue
            new_carry, (logits, _) = step_fn(
                hyp.carry, jnp.asarray([hyp.last], dtype=jnp.int32),
                enc_b, proj_b, mask_b,
            )
            att_lp = np.asarray(
                jax.nn.log_softmax(logits[0].astype(jnp.float32))
            ).astype(np.float64)
            psi, r = scorer([sos] + hyp.tokens, hyp.r)

            joint = hyp.score + (1.0 - cw) * att_lp \
                + cw * (psi - hyp.psi) + bcfg.penalty
            new_lm_carry = hyp.lm_carry
            if lm_step_fn is not None and bcfg.lm_weight != 0.0:
                new_lm_carry, lm_logits = lm_step_fn(
                    hyp.lm_carry, jnp.asarray([hyp.last], dtype=jnp.int32)
                )
                lm_lp = np.asarray(
                    jax.nn.log_softmax(lm_logits[0].astype(jnp.float32))
                ).astype(np.float64)
                joint = joint + bcfg.lm_weight * lm_lp
            joint[blank] = 2.0 * LOG_ZERO
            if len(hyp.tokens) < min_len:
                joint[eos] = 2.0 * LOG_ZERO
            at_limit = (i == bcfg.max_steps - 1
                        or len(hyp.tokens) >= max_len or end_trig)
            allowed = [eos] if at_limit else range(v)
            for c in allowed:
                c = int(c)
                cands.append(Hypothesis(
                    tokens=hyp.tokens if c == eos else hyp.tokens + [c],
                    last=c,
                    score=float(joint[c]),
                    psi=float(psi[c]) if c != eos else hyp.psi,
                    r=r[:, :, c].copy() if c != eos else hyp.r,
                    carry=new_carry,
                    ended=(c == eos),
                    ended_at=i if c == eos else -1,
                    lm_carry=new_lm_carry,
                ))
        cands.sort(key=lambda h: h.score, reverse=True)
        hyps = cands[:k]
        if bcfg.end_detect:
            just = [h.score for h in hyps if h.ended_at == i]
            if just:
                now = max(just)
                stall = (stall + 1
                         if now < ended_best - bcfg.end_detect_margin else 0)
                ended_best = max(ended_best, now)
            else:
                stall = 0
        if all(h.ended for h in hyps):
            break

    rank = (
        (lambda h: h.score / max(len(h.tokens), 1))
        if bcfg.length_normalize else (lambda h: h.score)
    )
    best = max(hyps, key=rank)
    return best.tokens, best.score
