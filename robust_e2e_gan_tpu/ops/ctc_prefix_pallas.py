"""Pallas TPU kernel: batched CTC prefix scores (the beam-search hot loop).

Round-1 profiling (PARITY.md "CTC prefix recursion") found the sequential
frame scan of ``decode/beam.py::batched_prefix_scores`` to be the decode
latency floor: per frame, XLA round-trips three (B, K, V) carries through
HBM and stacks two (T, B, K, V) outputs — of which the search later keeps
only the selected token's (B, K, T) slice, wasting V x the bandwidth.

This kernel computes ONLY psi, the (B, K, V) prefix scores (the quantity the
pruning step actually consumes), with the whole T-loop resident in VMEM:

  * grid = (B,): one program per utterance; the (K, V) lanes of one
    utterance are exactly VPU tiles (K pads to 8 sublanes, V to 128 lanes).
  * the log-semiring 2-state recursion (Watanabe CTCPrefixScore; see
    decode/ctc_prefix.py for the scalar oracle) runs as a fori_loop over
    frames with (K, V) carries r^n/r^b/psi held on-chip — zero HBM traffic
    per frame beyond the streamed lpz rows.
  * per-beam parent state (r^b/r^n at frame t-1) and the blank log-prob are
    packed as (3K, T) ROWS and selected per frame by a one-hot matvec on
    the MXU — Mosaic has no clean dynamic LANE indexing or small
    transposes, and a (3K, T_pad128) @ (T_pad128, 1) product is the
    hardware-native way to read a column into sublanes.
  * the per-beam selection masks (is-last-token, empty-prefix phi0) are
    precomputed on the host as (B, Kp, Vp) arrays — cheap XLA elementwise
    work — because Mosaic rejects the SMEM-scalar compare loop that would
    build them in-kernel.
  * the forward state of the SELECTED extension is not produced here; the
    search recomputes it for the chosen token only (V x cheaper) with
    ``decode/beam.py::prefix_state_for_token``.

Equivalence with the XLA scan (and transitively the numpy oracle) is
asserted in tests/test_beam.py; on the real v5e chip the kernel's psi is
bit-exact vs the scan. Runs interpreted off-TPU for tests.

Measured v5e status (scripts/bench_prefix.py, B=128 beam 8): the winning
formulation is the XLA "twopass" (79 ms/batch vs 146 ms for the round-1
scan — the shipped default); THIS kernel lands at 556 ms because its
grid=(B,) serializes the frame loop per utterance (serial chain B x T
instead of T). A faster variant needs batch tiling with HBM-streamed lpz
rows (double-buffered DMA) so several utterances share one frame loop —
kept as future work since the prefix recursion no longer dominates the
decode step after the twopass restructure.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_ZERO = -1e10


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(t: int, t_pad: int, blank: int, eos: int, kp: int, vp: int):
    def kernel(lpz_ref, st_ref, is_ref, phi0_ref, out_ref):
        is_last = is_ref[0] > 0.5  # (Kp, Vp) host-precomputed mask
        phi0 = phi0_ref[0]  # (Kp, Vp)

        st = st_ref[0]  # (3Kp, T_pad): rows = [r^b | r^n | blank lpz]
        t_iota = jax.lax.broadcasted_iota(jnp.int32, (t_pad, 1), 0)
        ones_v = jnp.ones((1, vp), jnp.float32)

        def col_at(idx):
            # exact column select: one-hot matvec (HIGHEST precision — the
            # default MXU path rounds operands through bf16), then lane
            # replication via a second matmul ((Kp,1)->(Kp,Vp) elementwise
            # broadcast is an invalid Mosaic relayout)
            onehot = (t_iota == idx).astype(jnp.float32)
            col = jnp.dot(st, onehot, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            return jnp.dot(col, ones_v, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

        def body(tt, carry):
            rn, rb, psi = carry  # (Kp, Vp) each, VMEM-resident
            x_t = lpz_ref[0, tt, :][None, :]  # (1, Vp)
            sel_p = col_at(jnp.maximum(tt - 1, 0))  # parent state at t-1
            rb_tm1 = sel_p[0:kp]  # (Kp, 1)
            rn_tm1 = sel_p[kp : 2 * kp]
            rs_tm1 = jnp.logaddexp(rn_tm1, rb_tm1)
            xb = col_at(tt)[2 * kp : 3 * kp]  # blank lpz at t, per beam row
            phi = jnp.where(is_last, rb_tm1, rs_tm1)
            phi = jnp.where(tt == 0, phi0, phi)
            rn_new = x_t + jnp.logaddexp(rn, phi)
            rb_new = xb + jnp.logaddexp(rn, rb)
            psi_new = jnp.logaddexp(psi, phi + x_t)
            return rn_new, rb_new, psi_new

        z = jnp.full((kp, vp), LOG_ZERO, jnp.float32)
        _, _, psi = jax.lax.fori_loop(0, t, body, (z, z, z))
        # eos candidate = full-sequence CTC score of the prefix itself
        # (column writes as iota masks: scatter does not lower on TPU)
        sel_l = col_at(t - 1)
        r_last = jnp.logaddexp(sel_l[0:kp], sel_l[kp : 2 * kp])  # (Kp, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (kp, vp), 1)
        psi = jnp.where(col == eos, r_last, psi)
        psi = jnp.where(col == blank, LOG_ZERO, psi)
        out_ref[0] = psi

    return kernel


def prefix_scores_psi_pallas(
    lpz: jnp.ndarray,
    last_tok: jnp.ndarray,
    lengths: jnp.ndarray,
    r_n: jnp.ndarray,
    r_b: jnp.ndarray,
    blank: int,
    eos: int,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """CTC prefix scores psi (B, K, V) for every vocab extension.

    Same contract as the psi return of ``batched_prefix_scores``
    (decode/beam.py): lpz (B, T, V) masked CTC log-probs, last_tok/lengths
    (B, K), r_n/r_b (B, K, T) parent forward variables.
    """
    b, t, v = lpz.shape
    k = last_tok.shape[1]
    kp, vp = _round_up(k, 8), _round_up(v, 128)
    t_pad = _round_up(t, 128)

    lpz_p = jnp.pad(lpz, ((0, 0), (0, 0), (0, vp - v)),
                    constant_values=LOG_ZERO)
    # packed per-beam rows: [r^b (Kp) | r^n (Kp) | blank lpz (Kp copies)]
    def rows(x, fill):
        x = jnp.pad(x, ((0, 0), (0, kp - k), (0, 0)), constant_values=fill)
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t)))

    # (b, k, t): rows() pads the beam axis to kp, so st stays exactly
    # (B, 3Kp, T_pad) and matches the BlockSpec for every beam size
    blank_rows = jnp.broadcast_to(
        lpz[:, None, :, blank], (b, k, t)
    )
    st = jnp.concatenate(
        [rows(r_b, 0.0), rows(r_n, LOG_ZERO), rows(blank_rows, 0.0)], axis=1
    )  # (B, 3Kp, T_pad)
    vocab_ids = jnp.arange(vp, dtype=jnp.int32)
    is_last = (
        (vocab_ids[None, None, :] == last_tok[:, :, None])
        & (lengths[:, :, None] > 0)
    ).astype(jnp.float32)
    is_last = jnp.pad(is_last, ((0, 0), (0, kp - k), (0, 0)))
    phi0 = jnp.where(
        lengths[:, :, None] == 0, 0.0, LOG_ZERO
    ).astype(jnp.float32)
    phi0 = jnp.broadcast_to(phi0, (b, k, vp))
    phi0 = jnp.pad(phi0, ((0, 0), (0, kp - k), (0, 0)),
                   constant_values=LOG_ZERO)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid_spec = pl.GridSpec(
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, vp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * kp, t_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp, vp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp, vp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kp, vp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    psi = pl.pallas_call(
        _kernel(t, t_pad, blank, eos, kp, vp),
        out_shape=jax.ShapeDtypeStruct((b, kp, vp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * t * kp * vp + 6 * b * t * kp * t_pad,
            bytes_accessed=4 * b * t * vp + 4 * b * 3 * kp * t_pad
            + 4 * b * kp * vp,
            transcendentals=3 * b * t * kp * vp,  # logaddexp = exp+log1p
        ),
    )(lpz_p, st, is_last, phi0)
    return psi[:, :k, :v]
