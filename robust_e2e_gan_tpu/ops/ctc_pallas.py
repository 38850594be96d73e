"""Fused Pallas CTC loss: the alpha recursion + its adjoint as two Mosaic
programs.

Why: ops/ctc.py runs the log-space forward algorithm as a ``lax.scan`` —
T sequential steps of tiny (B, U) VPU ops, each paying scan-iteration
overhead, with autodiff saving per-step residuals through HBM for the
reverse scan. At train shapes the whole state history fits comfortably in
VMEM, so this module runs the entire recursion in ONE kernel (and the
entire hand-derived adjoint in a second), with the state shifts expressed
as one-hot shift-matrix MATMULS (Mosaic has no lane shift; a 0/1 matrix
copies values exactly for finite f32) and the emission scores resident.

This is the reference's warp-ctc role (SURVEY.md section 2b: "warp-ctc ->
pure JAX") implemented the TPU-native way: a fused kernel where CUDA had
one, with the XLA scan retained as the oracle and large-shape fallback.

Numerics: identical formulas to ops/ctc.py (same _NEG_INF encoding,
clamps, freeze-past-length semantics). Every in-kernel dot is pinned to
HIGHEST precision so the 0/1 shift matrices copy f32 values EXACTLY —
at default MXU precision the inputs are rounded to bf16 first, which
round-3/4 on-chip runs measured as up to 8e-4 absolute gradient error vs
the scan path (results/r4_hw/verify_fused2.log); these (Up, Up) dots are
negligible next to the kernel's transcendentals, so exactness is free.
Sentinel comparisons still use a -5e29 threshold as defensive margin.
Equivalence vs the scan path is tested to 1e-5 and the gradient to 1e-5
(tests/test_ctc_pallas.py, plus the torch oracle through the public
ctc_loss API), and on chip by scripts/verify_fused.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from robust_e2e_gan_tpu.ops.blstm_pallas import _lane_tile, _round_up

_NEG_INF = -1e30
_NEG_THRESH = -5e29  # sentinel compare threshold (shift matmuls round)
_VMEM_LIMIT = 100 * 1024 * 1024
_BUDGET = 56 * 1024 * 1024


def _shift_consts(up):
    """Build (S1, S2, neg1, neg2) shift matrices / -inf fills in-kernel."""
    row = jax.lax.broadcasted_iota(jnp.int32, (up, up), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (up, up), 1)
    s1 = (row == col - 1).astype(jnp.float32)
    s2 = (row == col - 2).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, up), 1)
    neg1 = jnp.where(lane < 1, _NEG_INF, 0.0)
    neg2 = jnp.where(lane < 2, _NEG_INF, 0.0)
    return s1, s2, neg1, neg2


def _fwd_kernel(t1: int, b: int, up: int):
    """Forward with the full alpha trajectory out (for the backward)."""

    def kernel(emit_ref, a0_ref, skip_ref, pos_ref, len_ref,
               hist_ref, afin_ref, s1_scr, s2_scr):
        # emit_ref: (T1, B, Up) f32 — emission scores for steps 1..T-1
        # a0_ref/skip_ref/pos_ref: (B, Up) f32; len_ref: (B, Up) f32
        # hist_ref: (T1+1, B, Up) f32 — alpha trajectory (row 0 = alpha0)
        # afin_ref: (B, Up) f32 — final (frozen) alpha
        s1, s2, neg1, neg2 = _shift_consts(up)
        s1_scr[...] = s1
        s2_scr[...] = s2
        hist_ref[0] = a0_ref[...]

        def body(i, alpha):
            t_idx = (i + 1).astype(jnp.float32)
            sh1 = jax.lax.dot(
                alpha, s1_scr[...], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST
            ) + neg1
            sh2 = jax.lax.dot(
                alpha, s2_scr[...], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST
            ) + neg2 + skip_ref[...]
            m = jnp.maximum(jnp.maximum(alpha, sh1), sh2)
            safe_m = jnp.where(m <= _NEG_THRESH, 0.0, m)
            summed = jnp.maximum(
                jnp.exp(alpha - safe_m) + jnp.exp(sh1 - safe_m)
                + jnp.exp(sh2 - safe_m),
                1e-37,
            )
            na = jnp.where(
                m <= _NEG_THRESH, _NEG_INF, safe_m + jnp.log(summed)
            ) + emit_ref[i] + pos_ref[...]
            na = jnp.maximum(na, _NEG_INF)
            active = jnp.where(t_idx < len_ref[...], 1.0, 0.0)
            new_alpha = active * na + (1.0 - active) * alpha
            hist_ref[pl.ds(i + 1, 1)] = new_alpha[None]
            return new_alpha

        afin_ref[...] = jax.lax.fori_loop(0, t1, body, a0_ref[...])

    return kernel


def _fwd_only_kernel(t1: int, b: int, up: int):
    """Forward without the trajectory output (no-grad/eval calls)."""

    def kernel(emit_ref, a0_ref, skip_ref, pos_ref, len_ref,
               afin_ref, s1_scr, s2_scr):
        s1, s2, neg1, neg2 = _shift_consts(up)
        s1_scr[...] = s1
        s2_scr[...] = s2

        def body(i, alpha):
            t_idx = (i + 1).astype(jnp.float32)
            sh1 = jax.lax.dot(
                alpha, s1_scr[...], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST
            ) + neg1
            sh2 = jax.lax.dot(
                alpha, s2_scr[...], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST
            ) + neg2 + skip_ref[...]
            m = jnp.maximum(jnp.maximum(alpha, sh1), sh2)
            safe_m = jnp.where(m <= _NEG_THRESH, 0.0, m)
            summed = jnp.maximum(
                jnp.exp(alpha - safe_m) + jnp.exp(sh1 - safe_m)
                + jnp.exp(sh2 - safe_m),
                1e-37,
            )
            na = jnp.where(
                m <= _NEG_THRESH, _NEG_INF, safe_m + jnp.log(summed)
            ) + emit_ref[i] + pos_ref[...]
            na = jnp.maximum(na, _NEG_INF)
            active = jnp.where(t_idx < len_ref[...], 1.0, 0.0)
            return active * na + (1.0 - active) * alpha

        afin_ref[...] = jax.lax.fori_loop(0, t1, body, a0_ref[...])

    return kernel


def _bwd_kernel(t1: int, b: int, up: int):
    def kernel(emit_ref, skip_ref, pos_ref, len_ref, hist_ref, dfin_ref,
               demit_ref, da0_ref, s1_scr, s2_scr, s1t_scr, s2t_scr):
        # adjoint of the forward recursion, descending t; hist_ref holds
        # the full alpha trajectory (row i = alpha after step i)
        s1, s2, neg1, neg2 = _shift_consts(up)
        s1_scr[...] = s1
        s2_scr[...] = s2
        # transposed shifts for the adjoint scatter (shift the other way)
        row = jax.lax.broadcasted_iota(jnp.int32, (up, up), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (up, up), 1)
        s1t_scr[...] = (row == col + 1).astype(jnp.float32)
        s2t_scr[...] = (row == col + 2).astype(jnp.float32)

        def body(k, da):
            i = t1 - 1 - k  # forward step index (emit row)
            t_idx = (i + 1).astype(jnp.float32)
            a_prev = hist_ref[i]
            a_new = hist_ref[i + 1]
            active = jnp.where(t_idx < len_ref[...], 1.0, 0.0)
            da_na = da * active
            da_pass = da * (1.0 - active)
            # recompute the LSE pre-activation; where the step clamped to
            # _NEG_INF the derivative is zero
            pre = a_new - emit_ref[i] - pos_ref[...]
            finite = jnp.where(a_new > _NEG_THRESH, 1.0, 0.0) * active
            demit_ref[pl.ds(i, 1)] = (da_na * finite)[None]
            dpre = da_na * finite
            # path weights w_i = exp(x_i - pre) (zero where impossible)
            sh1 = jax.lax.dot(
                a_prev, s1_scr[...], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST
            ) + neg1
            sh2 = jax.lax.dot(
                a_prev, s2_scr[...], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST
            ) + neg2 + skip_ref[...]
            safe_pre = jnp.where(pre <= _NEG_THRESH, 0.0, pre)
            w0 = jnp.exp(jnp.maximum(a_prev - safe_pre, _NEG_INF))
            w1 = jnp.exp(jnp.maximum(sh1 - safe_pre, _NEG_INF))
            w2 = jnp.exp(jnp.maximum(sh2 - safe_pre, _NEG_INF))
            g1 = jax.lax.dot(
                w1 * dpre, s1t_scr[...],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            g2 = jax.lax.dot(
                w2 * dpre, s2t_scr[...],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return w0 * dpre + g1 + g2 + da_pass

        da0_ref[...] = jax.lax.fori_loop(0, t1, body, dfin_ref[...])

    return kernel


def ctc_alpha_fits(t: int, b: int, s: int) -> bool:
    """Do these shapes fit the fully-VMEM-resident kernels?"""
    up = _round_up(2 * s + 1, 128)
    bp = _round_up(b, 8)
    t1 = max(t - 1, 1)
    hist = (t1 + 1) * bp * up * 4
    emit = t1 * bp * up * 4
    consts = 4 * up * up * 4 + 6 * bp * up * 4
    return 2 * emit + 2 * hist + consts <= _BUDGET


@functools.lru_cache(maxsize=None)
def _make_alpha_fn(t1, bp, up, interpret):
    def fwd_call(emit1, a0, skip, pos, lens, with_hist):
        # with_hist=False: forward-only (no-grad) calls skip the
        # trajectory output entirely (the hist write is dead there)
        out_shape = [jax.ShapeDtypeStruct((bp, up), jnp.float32)]
        if with_hist:
            out_shape.insert(
                0, jax.ShapeDtypeStruct((t1 + 1, bp, up), jnp.float32)
            )
        res = pl.pallas_call(
            _fwd_kernel(t1, bp, up) if with_hist
            else _fwd_only_kernel(t1, bp, up),
            out_shape=tuple(out_shape),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=tuple(
                pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shape
            ),
            scratch_shapes=[
                pltpu.VMEM((up, up), jnp.float32),
                pltpu.VMEM((up, up), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * t1 * bp * up * up,
                bytes_accessed=4 * t1 * bp * up * 2,
                transcendentals=4 * t1 * bp * up,
            ),
        )(emit1, a0, skip, pos, lens)
        return res if with_hist else (None, res[0])

    def bwd_call(emit1, skip, pos, lens, hist, dfin):
        return pl.pallas_call(
            _bwd_kernel(t1, bp, up),
            out_shape=(
                jax.ShapeDtypeStruct((t1, bp, up), jnp.float32),
                jax.ShapeDtypeStruct((bp, up), jnp.float32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((up, up), jnp.float32),
                pltpu.VMEM((up, up), jnp.float32),
                pltpu.VMEM((up, up), jnp.float32),
                pltpu.VMEM((up, up), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * 4 * t1 * bp * up * up,
                bytes_accessed=4 * t1 * bp * up * 3,
                transcendentals=5 * t1 * bp * up,
            ),
        )(emit1, skip, pos, lens, hist, dfin)

    def fwd(emit1, a0, skip, pos, lens):
        hist, afin = fwd_call(emit1, a0, skip, pos, lens, True)
        return afin, (emit1, skip, pos, lens, hist)

    def bwd(res, dfin):
        emit1, skip, pos, lens, hist = res
        demit, da0 = bwd_call(emit1, skip, pos, lens, hist, dfin)
        # skip/pos/lens are label-derived constants: zero cotangents
        return (demit, da0, jnp.zeros_like(skip), jnp.zeros_like(pos),
                jnp.zeros_like(lens))

    @jax.custom_vjp
    def fn(emit1, a0, skip, pos, lens):
        # primal (no-grad) path: hist-free forward
        return fwd_call(emit1, a0, skip, pos, lens, False)[1]

    fn.defvjp(fwd, bwd)
    return fn


def ctc_alpha_final(
    emit: jnp.ndarray,
    alpha0: jnp.ndarray,
    skip_add: jnp.ndarray,
    pos_add: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused replacement for ops/ctc.py's alpha scan.

    emit: (B, T, U) emission scores (ops/ctc.py layout); alpha0 (B, U);
    skip_add/pos_add (B, U); logit_lengths (B,). Returns the final frozen
    alpha (B, U), differentiable w.r.t. emit and alpha0.
    """
    b, t, u = emit.shape
    t1 = max(t - 1, 1)
    up = _round_up(u, 128)
    bp = _round_up(b, 8)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    pad_bu = ((0, bp - b), (0, up - u))
    emit1 = jnp.moveaxis(emit[:, 1:], 1, 0) if t > 1 else jnp.full(
        (1, b, u), _NEG_INF, jnp.float32
    )
    emit1 = jnp.pad(
        emit1.astype(jnp.float32),
        ((0, 0), (0, bp - b), (0, up - u)),
        constant_values=_NEG_INF,
    )
    a0 = jnp.pad(alpha0.astype(jnp.float32), pad_bu,
                 constant_values=_NEG_INF)
    skip = jnp.pad(skip_add.astype(jnp.float32), pad_bu,
                   constant_values=_NEG_INF)
    pos = jnp.pad(pos_add.astype(jnp.float32), pad_bu,
                  constant_values=_NEG_INF)
    lens = _lane_tile(
        jnp.pad(
            jnp.broadcast_to(
                logit_lengths.astype(jnp.float32)[:, None], (b, 128)
            ),
            ((0, bp - b), (0, 0)),
        ),
        up,
    )
    fn = _make_alpha_fn(t1, bp, up, bool(interpret))
    afin = fn(emit1, a0, skip, pos, lens)
    return afin[:b, :u]
