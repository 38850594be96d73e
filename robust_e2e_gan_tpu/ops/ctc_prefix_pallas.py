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
  * the forward state of the SELECTED extension is not produced here; the
    search recomputes it for the chosen token only (V x cheaper) with
    ``decode/beam.py::prefix_state_for_token``.

Equivalence with the XLA scan (and transitively the numpy oracle) is
asserted in tests/test_beam.py. Runs interpreted off-TPU for tests.
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


def _kernel(t: int, blank: int, eos: int, kp: int, vp: int):
    def kernel(lpz_ref, rn_ref, rb_ref, last_ref, len_ref, out_ref):
        last = last_ref[0]  # (Kp,)
        lens = len_ref[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (kp, vp), 1)
        is_last = (col == last[:, None]) & (lens[:, None] > 0)
        phi0 = jnp.where(
            lens[:, None] == 0, 0.0, LOG_ZERO
        ).astype(jnp.float32)  # (Kp, 1) -> broadcasts over V

        def body(tt, carry):
            rn, rb, psi = carry  # (Kp, Vp) each, VMEM-resident
            x_t = lpz_ref[0, tt, :]  # (Vp,)
            tm1 = jnp.maximum(tt - 1, 0)
            rb_tm1 = rb_ref[0, tm1, :]  # (Kp,) parent r^b at frame t-1
            rs_tm1 = jnp.logaddexp(rn_ref[0, tm1, :], rb_tm1)
            phi = jnp.where(is_last, rb_tm1[:, None], rs_tm1[:, None])
            phi = jnp.where(tt == 0, phi0, phi)
            rn_new = x_t[None, :] + jnp.logaddexp(rn, phi)
            rb_new = x_t[blank] + jnp.logaddexp(rn, rb)
            psi_new = jnp.logaddexp(psi, phi + x_t[None, :])
            return rn_new, rb_new, psi_new

        z = jnp.full((kp, vp), LOG_ZERO, jnp.float32)
        _, _, psi = jax.lax.fori_loop(0, t, body, (z, z, z))
        # eos candidate = full-sequence CTC score of the prefix itself
        r_last = jnp.logaddexp(rn_ref[0, t - 1, :], rb_ref[0, t - 1, :])
        psi = psi.at[:, eos].set(r_last)
        psi = psi.at[:, blank].set(LOG_ZERO)
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

    lpz_p = jnp.pad(lpz, ((0, 0), (0, 0), (0, vp - v)),
                    constant_values=LOG_ZERO)
    # (B, T, Kp) frame-major parent state (kernel reads one frame per step)
    def to_tk(x, fill):
        x = jnp.moveaxis(x, 1, 2)  # (B, T, K)
        return jnp.pad(x, ((0, 0), (0, 0), (0, kp - k)),
                       constant_values=fill)

    rn_tk = to_tk(r_n, LOG_ZERO)
    rb_tk = to_tk(r_b, 0.0)  # pad beams look like the empty prefix
    last_p = jnp.pad(last_tok.astype(jnp.int32), ((0, 0), (0, kp - k)))
    len_p = jnp.pad(lengths.astype(jnp.int32), ((0, 0), (0, kp - k)))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid_spec = pl.GridSpec(
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, vp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, kp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, kp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kp, vp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    psi = pl.pallas_call(
        _kernel(t, blank, eos, kp, vp),
        out_shape=jax.ShapeDtypeStruct((b, kp, vp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * t * kp * vp,
            bytes_accessed=4 * b * t * (vp + 2 * kp) + 4 * b * kp * vp,
            transcendentals=3 * b * t * kp * vp,  # logaddexp = exp+log1p
        ),
    )(lpz_p, rn_tk, rb_tk, last_p, len_p)
    return psi[:, :k, :v]
