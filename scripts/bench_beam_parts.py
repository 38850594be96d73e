"""Micro-bench the beam-loop components at bench.py shapes (B=128, K=8).

The round-3 MFU stage breakdown (results/mfu.json) puts the beam loop at
~40 ms of the 73 ms decode — ~0.83 ms per decode step. This script times
each component as its own 48-iteration jitted scan so the per-step cost
decomposes: the attention-decoder chain, the CTC-prefix psi pass, the
selected-token state recompute, the top-k + gathers. Each scan threads a
carry through the component so XLA cannot elide iterations.

  PYTHONPATH=/root/repo python scripts/bench_beam_parts.py
"""

from __future__ import annotations

import json
import time

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from robust_e2e_gan_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import dataclasses

from __graft_entry__ import _flagship_config
from robust_e2e_gan_tpu.config import BeamSearchConfig
from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, make_batch
from robust_e2e_gan_tpu.decode import beam as beam_lib
from robust_e2e_gan_tpu.pipeline import RobustE2E, build_model

STEPS = 48


def _timed(fn, min_seconds=3.0, chunk=8):
    np.asarray(jax.tree_util.tree_leaves(fn())[0])
    n, t0 = 0, time.perf_counter()
    while True:
        out = None
        for _ in range(chunk):
            out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        n += chunk
        dt = time.perf_counter() - t0
        if dt >= min_seconds:
            return dt / n * 1e3  # ms per call


def main():
    vocab = 52
    jcfg = dataclasses.replace(_flagship_config(vocab),
                               compute_dtype="bfloat16")
    model = build_model(jcfg)
    rng = np.random.default_rng(0)
    scfg = SyntheticConfig(vocab_size=vocab, min_tokens=48, max_tokens=58)
    B, K = 128, 8
    batch = make_batch(B, scfg, rng, ignore_id=-1)
    wav = jnp.asarray(batch["noisy_wav"])
    lens = jnp.asarray(batch["wav_lengths"])
    params = model.init(
        jax.random.PRNGKey(0), wav[:2], lens[:2],
        jnp.asarray(batch["labels"][:2]),
        use_enhancer=True, method=RobustE2E.asr_forward,
    )["params"]
    variables = {"params": params}

    hs, hmask, hlens, ctc_logits, enc_proj = jax.jit(
        lambda p, w, l: model.apply(
            {"params": p}, w, l, True, method=RobustE2E.encode_for_decode
        )
    )(params, wav, lens)
    t = hs.shape[1]
    v = ctc_logits.shape[-1]
    print(f"enc T={t} V={v}", flush=True)

    lpz = jax.nn.log_softmax(ctc_logits.astype(jnp.float32), -1)
    blank, eos = jcfg.e2e.blank_id, jcfg.e2e.eos_id
    last_tok = jnp.full((B, K), jcfg.e2e.sos_id, jnp.int32)
    lengths = jnp.zeros((B, K), jnp.int32)
    rb0 = jnp.cumsum(lpz[:, :, blank], axis=1)
    r_b = jnp.broadcast_to(rb0[:, None, :], (B, K, t))
    r_n = jnp.full((B, K, t), beam_lib.LOG_ZERO, jnp.float32)

    # ---- full search (reference point)
    bcfg = BeamSearchConfig(beam_size=K, ctc_weight=0.3, max_steps=STEPS,
                            early_exit=False)
    searcher = beam_lib.make_beam_searcher(model, jcfg.e2e, bcfg,
                                           use_enhancer=True)
    full_ms = _timed(lambda: searcher(params, wav, lens).lengths)

    # ---- encode stage alone (enhancer + frontend + encoder + CTC head) —
    # the full search includes it; without this row ~18 ms of the search
    # showed up as "unaccounted" (round-4 first cut of this breakdown).
    # (reduce to a scalar on device: fetching the full (B,T,E) hs would add
    # ~45 MB of tunnel transfer per timing iteration and dominate the row)
    encode = jax.jit(
        lambda p, w, l: model.apply(
            {"params": p}, w, l, True, method=RobustE2E.encode_for_decode
        )[0].sum()
    )
    enc_ms = _timed(lambda: encode(params, wav, lens))

    # ---- decoder-step-only scan (attention + LSTM + logits, no CTC)
    @jax.jit
    def dec_only(params, hs, enc_proj, hmask):
        carry0 = model.apply(variables, B * K, jnp.repeat(hmask, K, axis=0),
                             method=RobustE2E.decoder_initial_carry)
        toks = jnp.zeros((B * K,), jnp.int32)

        def body(c, _):
            dec_carry, tk = c
            new_carry, (logits, _) = model.apply(
                variables, dec_carry, tk, hs, enc_proj, hmask,
                method=RobustE2E.decoder_step,
            )
            return (new_carry, jnp.argmax(logits, -1).astype(jnp.int32)), None

        (c, tk), _ = jax.lax.scan(body, (carry0, toks), None, length=STEPS)
        return tk

    dec_ms = _timed(lambda: dec_only(params, hs, enc_proj, hmask))

    # ---- psi-only pass, 48 dependent iterations
    @jax.jit
    def psi_only(lpz, last_tok, lengths, r_n, r_b):
        def body(c, _):
            lt, ln = c
            psi = beam_lib.batched_prefix_psi(
                lpz, lt, ln, r_n, r_b, blank, eos
            )
            nxt = jnp.argmax(psi, -1).astype(jnp.int32)[:, :K]
            return (nxt, ln), None

        c, _ = jax.lax.scan(body, (last_tok, lengths), None, length=STEPS)
        return c[0]

    psi_ms = _timed(lambda: psi_only(lpz, last_tok, lengths, r_n, r_b))

    # ---- selected-token state recompute, 48 dependent iterations
    @jax.jit
    def state_only(lpz, last_tok, lengths, r_n, r_b):
        def body(c, _):
            rn, rb = c
            tok = jnp.full((B, K), 3, jnp.int32)
            rn2, rb2 = beam_lib.prefix_state_for_token(
                lpz, tok, last_tok, lengths, rn, rb, blank
            )
            return (rn2, rb2), None

        c, _ = jax.lax.scan(body, (r_n, r_b), None, length=STEPS)
        return c[0].sum()  # scalar fetch (full (B,K,T) is ~700 KB/iter)

    state_ms = _timed(lambda: state_only(lpz, last_tok, lengths, r_n, r_b))

    # ---- prune + reorder, 48 dependent iterations: combine joint scores,
    # flattened (K*V) top-k, then every gather the real loop performs on
    # selection — token buffer, CTC forward variables, and the decoder
    # carry (attention weights (BK, T) + two LSTM states (BK, H)).
    H = jcfg.e2e.decoder.hidden_dim
    tok_buf = jnp.full((B, K, STEPS), -1, jnp.int32)
    att_w = jnp.zeros((B * K, t), jnp.float32)
    lstm_c = jnp.zeros((B * K, H), jnp.float32)
    lstm_h = jnp.zeros((B * K, H), jnp.float32)
    att_scores = jnp.zeros((B, K, v), jnp.float32)

    @jax.jit
    def prune_only(psi, att_scores, scores0, tok_buf, r_n, r_b,
                   att_w, lstm_c, lstm_h):
        def body(c, _):
            scores, tokb, rn, rb, aw, lc, lh = c
            total = (scores[..., None] + att_scores
                     + 0.3 * psi)  # (B, K, V)
            flat = total.reshape(B, K * v)
            top_s, top_i = jax.lax.top_k(flat, K)
            k_idx = (top_i // v).astype(jnp.int32)
            tok = (top_i % v).astype(jnp.int32)
            tokb = beam_lib._gather_beam(tokb, k_idx)
            rn2 = beam_lib._gather_beam(rn, k_idx)
            rb2 = beam_lib._gather_beam(rb, k_idx)
            flat_idx = (
                jnp.arange(B, dtype=jnp.int32)[:, None] * K + k_idx
            ).reshape(-1)
            aw = jnp.take(aw, flat_idx, axis=0)
            lc = jnp.take(lc, flat_idx, axis=0)
            lh = jnp.take(lh, flat_idx, axis=0)
            # write the selected tokens into the buffer (as the real loop
            # does), which also keeps tok live in the dependence chain
            tokb = tokb.at[:, :, 0].set(tok)
            return (top_s, tokb, rn2, rb2, aw, lc, lh), None

        c, _ = jax.lax.scan(
            body, (scores0, tok_buf, r_n, r_b, att_w, lstm_c, lstm_h),
            None, length=STEPS,
        )
        return c[0]

    scores0 = jnp.zeros((B, K), jnp.float32)
    psi0 = jnp.zeros((B, K, v), jnp.float32)
    prune_ms = _timed(lambda: prune_only(
        psi0, att_scores, scores0, tok_buf, r_n, r_b,
        att_w, lstm_c, lstm_h))

    parts = enc_ms + dec_ms + psi_ms + state_ms + prune_ms
    out = {
        "shapes": {"B": B, "K": K, "T": int(t), "V": int(v),
                   "steps": STEPS},
        "full_search_ms": round(full_ms, 2),
        "encode_stage_ms": round(enc_ms, 2),
        "decoder_chain_ms": round(dec_ms, 2),
        "psi_pass_ms": round(psi_ms, 2),
        "state_recompute_ms": round(state_ms, 2),
        "prune_reorder_ms": round(prune_ms, 2),
        "components_sum_ms": round(parts, 2),
        # positive = the single search program runs the independent serial
        # chains (decoder matmuls on MXU, psi frame-scan on VPU, gathers)
        # concurrently — measured overlap, not measurement error. A
        # negative value would mean cost the rows above do not explain.
        "overlap_ms": round(parts - full_ms, 2),
    }
    print(json.dumps(out, indent=2))
    import os

    os.makedirs("results", exist_ok=True)
    with open("results/beam_parts.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
