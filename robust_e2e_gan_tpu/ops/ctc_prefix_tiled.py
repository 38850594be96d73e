"""Batch-tiled Pallas TPU kernels for the CTC-prefix beam-search recursions.

Round-2 shipped ``ops/ctc_prefix_pallas.py`` with grid=(B,): one program per
utterance, which serializes the frame loop B times (556 ms vs the XLA
twopass's 79 ms — BASELINE.md). The round-3 MFU breakdown (results/mfu.json)
shows the beam loop at ~40 ms of the 73 ms decode, dominated by the TWO
sequential T-frame ``lax.scan``s inside every decode step (psi pass +
selected-token state recompute): each XLA scan iteration round-trips its
(B, K, V) carries through HBM (~3 MB/frame), ~0.5 GB of carry traffic per
decode step.

These kernels run the SAME recursions with every (batch, beam) lane in ONE
program — the fix sketched in ctc_prefix_pallas.py:35-42:

  * layout: V on SUBLANES (pad 8), B*K on LANES — carries r^n/r^b/psi are
    (Vp, B*K) f32 VMEM residents (~230 KB each), zero HBM traffic per frame;
  * lpz frames stream from HBM with double-buffered async DMA ((Vp, B)
    slices, ~30 KB) and are lane-tiled K-fold in VMEM;
  * the per-beam parent state (r^b, r^b+r^n at t-1) and the blank log-prob
    are (Tp, B*K) row tables — frame t reads ONE dynamically-indexed
    sublane row (dynamic sublane indexing is supported; dynamic LANE
    indexing is not, which is what forced the round-2 kernel's one-hot
    matvec gymnastics);
  * eos/blank candidate columns are patched OUTSIDE in XLA (cheap (B,K,V)
    ``.at`` sets, identical to the twopass path).

Equivalence with ``decode/beam.py::batched_prefix_psi`` /
``prefix_state_for_token`` (and transitively the numpy oracle) is asserted
in tests/test_beam.py. Runs interpreted off-TPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_ZERO = -1e10


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# --------------------------------------------------------------------------
# psi pass: prefix scores for every vocab extension of every (B, K) lane
# --------------------------------------------------------------------------


def _psi_kernel(t: int, k: int, b: int, vp: int):
    bk = b * k

    def kernel(lpz_hbm, rbp_ref, rsp_ref, xb_ref, islast_ref, phi0_ref,
               out_ref, buf, sem):
        def fetch(tt, slot):
            return pltpu.make_async_copy(
                lpz_hbm.at[tt], buf.at[slot], sem.at[slot]
            )

        fetch(0, 0).start()

        def tile_k(x):  # (Vp, B) -> (Vp, B*K) lane tiling
            return jnp.concatenate([x] * k, axis=1)

        is_last = islast_ref[...] > 0.5
        phi0 = phi0_ref[...]

        def row(ref, idx):
            # 1-D load from a (1, Tp, BK) table -> (1, BK): the 1-D value
            # carries a sublane-replicated layout, so broadcasting against
            # the (Vp, BK) carries is a no-op relayout (a direct (1, BK)
            # 2-D slice is NOT — Mosaic rejects replicating its concrete
            # sublane offset; same trick as ctc_prefix_pallas.py)
            return ref[0, idx, :][None, :]

        def body(tt, carry):
            rn, rb, psi = carry  # (Vp, BK) VMEM-resident
            slot = jax.lax.rem(tt, 2)
            fetch(tt, slot).wait()

            @pl.when(tt + 1 < t)
            def _():
                fetch(tt + 1, 1 - slot).start()

            x_t = tile_k(buf[slot])  # (Vp, BK)
            xb_t = row(xb_ref, tt)  # (1, BK), broadcasts over sublanes
            tm1 = jnp.maximum(tt - 1, 0)
            # += 0*phi0 pins the broadcast rows to a CONCRETE sublane
            # layout: the select against phi0 below would otherwise ask
            # Mosaic to relayout phi0 into a replicated layout, which it
            # rejects for non-singleton sublanes
            zero = phi0 * 0.0
            rb_tm1 = row(rbp_ref, tm1) + zero
            rs_tm1 = row(rsp_ref, tm1) + zero
            phi = jnp.where(is_last, rb_tm1, rs_tm1)
            phi = jnp.where(tt == 0, phi0, phi)
            rn_new = x_t + jnp.logaddexp(rn, phi)
            rb_new = xb_t + jnp.logaddexp(rn, rb)
            psi_new = jnp.logaddexp(psi, phi + x_t)
            return rn_new, rb_new, psi_new

        # concrete-layout init: a splat jnp.full would give the loop carry
        # a sublane-REPLICATED layout, and Mosaic unifies the fori carry
        # toward it — then rejects relayouting the body's concrete output
        # back to replicated ("Invalid relayout ... {0,0} -> {*,0}")
        z = phi0_ref[...] * 0.0 + LOG_ZERO
        _, _, psi = jax.lax.fori_loop(0, t, body, (z, z, z))
        out_ref[...] = psi

    return kernel


def prefix_psi_tiled(
    lpz: jnp.ndarray,
    last_tok: jnp.ndarray,
    lengths: jnp.ndarray,
    r_n: jnp.ndarray,
    r_b: jnp.ndarray,
    blank: int,
    eos: int,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """psi (B, K, V) — same contract as beam.batched_prefix_psi."""
    b, t, v = lpz.shape
    k = last_tok.shape[1]
    vp = _round_up(v, 8)
    tp = _round_up(t, 8)
    # lanes pad to the 128 tile so the per-frame DMA slice is aligned
    # (small-batch serving, e.g. the bench's batch=1 baseline)
    bp = _round_up(b, 128)
    bk = bp * k

    # (T, Vp, Bp): frame-major so one frame is one contiguous DMA slice
    lpz_t = jnp.pad(
        jnp.transpose(lpz, (1, 2, 0)),
        ((0, 0), (0, vp - v), (0, bp - b)),
        constant_values=LOG_ZERO,
    )
    # parent-state row tables (Tp, K*Bp); lane ordered kk * Bp + bb to
    # match the (Vp, K*Bp) layout produced by tile_k's K-fold lane
    # concatenation of (Vp, Bp) frames
    def rows_kb(x_bkt, pad_fill=0.0):
        r = jnp.pad(jnp.transpose(x_bkt, (2, 1, 0)),
                    ((0, tp - t), (0, 0), (0, bp - b)),
                    constant_values=pad_fill)
        return r.reshape(tp, bk)

    # tables carry a leading singleton so the kernel can do 1-D row loads
    # (see _psi_kernel.row)
    rbp = rows_kb(r_b)[None]
    rsp = rows_kb(jnp.logaddexp(r_n, r_b))[None]
    xb = rows_kb(  # blank lpz rows, tiled K-fold on lanes
        jnp.broadcast_to(lpz[:, None, :, blank], (b, k, t))
    )[None]

    vocab_ids = jnp.arange(vp, dtype=jnp.int32)
    # (Vp, K*Bp) masks, lane = kk * Bp + bb
    is_last = jnp.pad(
        (
            (vocab_ids[:, None, None] == last_tok.T[None, :, :])
            & (lengths.T[None, :, :] > 0)
        ).astype(jnp.float32),
        ((0, 0), (0, 0), (0, bp - b)),
    ).reshape(vp, bk)
    phi0 = jnp.where(
        lengths.T[None, :, :] == 0, 0.0, LOG_ZERO
    ).astype(jnp.float32)
    phi0 = jnp.pad(
        jnp.broadcast_to(phi0, (vp, k, b)), ((0, 0), (0, 0), (0, bp - b)),
        constant_values=LOG_ZERO,
    ).reshape(vp, bk)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    psi = pl.pallas_call(
        _psi_kernel(t, k, bp, vp),
        out_shape=jax.ShapeDtypeStruct((vp, bk), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # lpz_t streams via DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, vp, bp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * t * vp * bk,
            bytes_accessed=4 * (t * vp * bp + 3 * tp * bk + 3 * vp * bk),
            transcendentals=3 * t * vp * bk,
        ),
    )(lpz_t, rbp, rsp, xb, is_last, phi0)

    # (Vp, K*B) -> (B, K, V), then the eos/blank candidate patches (same
    # as the twopass path)
    psi = jnp.transpose(psi.reshape(vp, k, bp), (2, 1, 0))[:b, :, :v]
    r_sum = jnp.logaddexp(r_n, r_b)
    psi = psi.at[..., eos].set(r_sum[:, :, -1])
    psi = psi.at[..., blank].set(LOG_ZERO)
    return psi


# --------------------------------------------------------------------------
# selected-token state recompute: forward variables of the chosen extension
# --------------------------------------------------------------------------


def _state_kernel(t: int):
    def kernel(x_ref, xb_ref, phi_ref, rn_out, rb_out):
        def body(tt, carry):
            rn, rb = carry  # (1, BK)
            x_t = x_ref[pl.ds(tt, 1), :]
            xb_t = xb_ref[pl.ds(tt, 1), :]
            phi_t = phi_ref[pl.ds(tt, 1), :]
            rn_new = x_t + jnp.logaddexp(rn, phi_t)
            rb_new = xb_t + jnp.logaddexp(rn, rb)
            rn_out[pl.ds(tt, 1), :] = rn_new
            rb_out[pl.ds(tt, 1), :] = rb_new
            return rn_new, rb_new

        bk = x_ref.shape[1]
        z = jnp.full((1, bk), LOG_ZERO, jnp.float32)
        jax.lax.fori_loop(0, t, body, (z, z))

    return kernel


def prefix_state_tiled(
    lpz: jnp.ndarray,
    tok: jnp.ndarray,
    last_tok: jnp.ndarray,
    lengths: jnp.ndarray,
    r_n: jnp.ndarray,
    r_b: jnp.ndarray,
    blank: int,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(r_n, r_b) (B, K, T) of the parents extended by ``tok`` — same
    contract as beam.prefix_state_for_token, with the T-frame recursion in
    one VMEM-resident kernel instead of an XLA scan."""
    b, t, v = lpz.shape
    k = tok.shape[1]
    bk = b * k
    tp = _round_up(t, 8)

    # per-lane inputs, rows = frames (XLA prepares them exactly like the
    # scan path: gathers + elementwise, all cheap)
    r_sum = jnp.logaddexp(r_n, r_b)
    is_last = (tok == last_tok) & (lengths > 0)
    log_phi = jnp.where(is_last[..., None], r_b, r_sum)  # (B, K, T)
    phi0 = jnp.where(lengths == 0, 0.0, LOG_ZERO).astype(jnp.float32)
    phi_prev = jnp.concatenate([phi0[..., None], log_phi[..., :-1]], axis=-1)
    x_tok = jnp.moveaxis(
        jnp.take_along_axis(lpz, tok[:, None, :], axis=2), 1, 2
    )  # (B, K, T)
    x_blank = jnp.broadcast_to(lpz[:, None, :, blank], (b, k, t))

    def rows_bk(x_bkt):  # (B, K, T) -> (Tp, B*K), lane = bb * K + kk
        r = jnp.moveaxis(x_bkt, 2, 0).reshape(t, bk)
        return jnp.pad(r, ((0, tp - t), (0, 0)))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    rn_rows, rb_rows = pl.pallas_call(
        _state_kernel(t),
        out_shape=(
            jax.ShapeDtypeStruct((tp, bk), jnp.float32),
            jax.ShapeDtypeStruct((tp, bk), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * t * bk,
            bytes_accessed=4 * 5 * tp * bk,
            transcendentals=2 * t * bk,
        ),
    )(rows_bk(x_tok), rows_bk(x_blank), rows_bk(phi_prev))

    def unrows(r):  # (Tp, B*K) -> (B, K, T)
        return jnp.moveaxis(r[:t].reshape(t, b, k), 0, 2)

    return unrows(rn_rows), unrows(rb_rows)
