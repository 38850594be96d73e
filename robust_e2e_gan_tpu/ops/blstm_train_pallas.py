"""Differentiable fused Pallas BLSTM: forward + custom-VJP backward.

Why: the train step is BANDWIDTH-bound (results/mfu.json: 55% HBM util at
10.3% MFU), and its dominant HBM residual is the scan BLSTM's machinery —
the hoisted (T, 2, B, 4H) f32 gate projections written then re-read by the
backward pass, plus per-frame h/c carry round-trips in both passes. This
module replaces that with two Mosaic programs per layer:

FORWARD (same recursion as ops/blstm_pallas.py variant "fused": W_x/W_h and
the h/c carries VMEM-resident, raw input frames streamed in double-buffered
chunks, all chunk input projections batched into one MXU matmul off the
serial path) — but it additionally streams out the residuals the backward
needs, and nothing else:

  * y  = h_out * mask   (compute dtype — the layer output anyway)
  * c  = c_out * mask   (f32 — the cell-state trajectory)

That is 6H bytes/frame of residual (bf16 compute) against the scan path's
~24H (16H f32 gates + 8H carry saves): the backward's working set shrinks
~4x and the gate tensor never exists.

Storing only the MASKED streams suffices because every mask in this
codebase is an interval (length) mask: in stream order the valid frames of
either direction are preceded only by frames whose carry is the zero
initial state (fwd: valid [0, len); bwd on the flipped sequence: valid
[T-len, T) with zero-carry pads in front). Hence for every valid frame t,
the true incoming carries equal the stored masked row t-1 (zero for t=0 via
a leading zero row), and for invalid frames the recomputed gates are never
used (their dgates are masked to zero). Arbitrary non-interval masks must
use the scan path.

BACKWARD walks the chunks in descending time with the SAME streaming
structure. Per chunk, gate pre-activations are recomputed as batched MXU
matmuls from the x and h streams — recompute is the right trade on this
roofline: FLOPs sit at 10% utilization while HBM sits at 55%. The serial
chain is one NT matmul per frame (dgates @ W_h^T) plus VPU adjoint gate
math — symmetric with the forward's h @ W_h. Weight/bias gradients
accumulate in VMEM-resident output refs (dW_x via a TN matmul per chunk,
contracting the frame-row axis); dx streams out chunk-wise.

Gate recompute is bit-consistent with the forward in both compute dtypes:
the stored y rows are exactly ``h_f32.astype(cdtype)`` — the same rounding
the forward's own h @ W_h operand went through — and the f32 add order
((x W_x + bias) + h W_h) is preserved.

Reference parity: SURVEY.md section 2b "cuDNN LSTM via PyTorch" — this is
the TPU-native analogue of cuDNN's fused LSTM *training* kernels
(cudnnRNNBackwardData/Weights), built the Mosaic way.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from robust_e2e_gan_tpu.ops.blstm_pallas import (
    _VMEM_LIMIT,
    _intervals,
    _lane_tile,
    _pad_gate_axis,
    _round_up,
)

# The backward program holds W_x, W_h, the f32 dW accumulators, and four
# stream buffers at once; selection must leave Mosaic scratch headroom.
_TRAIN_VMEM_BUDGET = 80 * 1024 * 1024


def _sigmoid(x):
    return jax.nn.sigmoid(x)


# --------------------------------------------------------------------------
# forward kernel: inference recursion + residual streams out
# --------------------------------------------------------------------------


def _fwd_kernel(tp: int, f: int, b: int, dp: int, hp: int, cdtype):
    n_chunks = tp // f

    def kernel(xs_hbm, wx_ref, wh_ref, bias_ref, s_ref, e_ref,
               y_hbm, c_hbm,
               h_scr, c_scr, xbuf, gxbuf, ybuf, cbuf, zbuf, zcbuf,
               xsem, ysem, csem, zsem):
        # xs_hbm: (2, Tp, B, Dp) cdtype — per-direction stream-order frames
        # y_hbm: (2, Tp+1, B, Hp) cdtype — row 0 zeros, row t+1 = h_out*m
        # c_hbm: (2, Tp+1, B, Hp) f32 — row 0 zeros, row t+1 = c_out*m

        def fetch(z, c, slot):
            return pltpu.make_async_copy(
                xs_hbm.at[z, pl.ds(c * f, f)], xbuf.at[slot, z],
                xsem.at[slot, z],
            )

        def put_y(z, c, slot):
            return pltpu.make_async_copy(
                ybuf.at[slot, z], y_hbm.at[z, pl.ds(1 + c * f, f)],
                ysem.at[slot, z],
            )

        def put_c(z, c, slot):
            return pltpu.make_async_copy(
                cbuf.at[slot, z], c_hbm.at[z, pl.ds(1 + c * f, f)],
                csem.at[slot, z],
            )

        h_scr[...] = jnp.zeros((2, b, hp), jnp.float32)
        c_scr[...] = jnp.zeros((2, b, hp), jnp.float32)
        zbuf[...] = jnp.zeros((1, b, hp), cdtype)
        zcbuf[...] = jnp.zeros((1, b, hp), jnp.float32)
        # leading zero rows (the t=0 carries the backward will read)
        for z in (0, 1):
            fetch(z, 0, 0).start()
            pltpu.make_async_copy(
                zbuf, y_hbm.at[z, pl.ds(0, 1)], zsem.at[0, z]
            ).start()
            pltpu.make_async_copy(
                zcbuf, c_hbm.at[z, pl.ds(0, 1)], zsem.at[1, z]
            ).start()
        for z in (0, 1):
            pltpu.make_async_copy(
                zbuf, y_hbm.at[z, pl.ds(0, 1)], zsem.at[0, z]
            ).wait()
            pltpu.make_async_copy(
                zcbuf, c_hbm.at[z, pl.ds(0, 1)], zsem.at[1, z]
            ).wait()

        def body(c, carry):
            slot = jax.lax.rem(c, 2)
            for z in (0, 1):
                fetch(z, c, slot).wait()

            @pl.when(c + 1 < n_chunks)
            def _():
                for z in (0, 1):
                    fetch(z, c + 1, 1 - slot).start()

            @pl.when(c >= 2)
            def _():
                for z in (0, 1):
                    put_y(z, c - 2, slot).wait()
                    put_c(z, c - 2, slot).wait()

            # all F input projections per direction in one MXU matmul
            for z in (0, 1):
                gxbuf[z] = (
                    jnp.dot(
                        xbuf[slot, z].reshape(f * b, dp), wx_ref[z],
                        preferred_element_type=jnp.float32,
                    )
                    + bias_ref[z, 0, :]
                ).reshape(f, b, 4 * hp)

            for fi in range(f):  # static unroll
                tf = (c * f + fi).astype(jnp.float32)
                for z in (0, 1):
                    h_prev = h_scr[z]
                    c_prev = c_scr[z]
                    gh = jnp.dot(
                        h_prev.astype(cdtype), wh_ref[z],
                        preferred_element_type=jnp.float32,
                    )
                    gates = gxbuf[z, fi] + gh
                    gi = gates[:, 0 * hp:1 * hp]
                    gf = gates[:, 1 * hp:2 * hp]
                    gg = gates[:, 2 * hp:3 * hp]
                    go = gates[:, 3 * hp:4 * hp]
                    c_new = (_sigmoid(gf) * c_prev
                             + _sigmoid(gi) * jnp.tanh(gg))
                    h_new = _sigmoid(go) * jnp.tanh(c_new)
                    m = _lane_tile(
                        jnp.where(
                            (tf >= s_ref[z]) & (tf < e_ref[z]), 1.0, 0.0
                        ),
                        hp,
                    )
                    c_out = m * c_new + (1.0 - m) * c_prev
                    h_out = m * h_new + (1.0 - m) * h_prev
                    h_scr[z] = h_out
                    c_scr[z] = c_out
                    ybuf[slot, z, fi] = (h_out * m).astype(cdtype)
                    cbuf[slot, z, fi] = c_out * m

            for z in (0, 1):
                put_y(z, c, slot).start()
                put_c(z, c, slot).start()
            return carry

        jax.lax.fori_loop(0, n_chunks, body, 0)
        for back in (2, 1):
            c = n_chunks - back  # static
            if c >= 0:
                for z in (0, 1):
                    put_y(z, c, c % 2).wait()
                    put_c(z, c, c % 2).wait()

    return kernel


# --------------------------------------------------------------------------
# backward kernel: descending chunks, batched gate recompute
# --------------------------------------------------------------------------


def _bwd_kernel(tp: int, f: int, b: int, dp: int, hp: int, cdtype):
    n_chunks = tp // f
    nt = (((1,), (1,)), ((), ()))  # A (M,K) x B (N,K) -> (M,N)
    tn = (((0,), (0,)), ((), ()))  # A (K,M) x B (K,N) -> (M,N)

    def kernel(xs_hbm, y_hbm, c_hbm, dy_hbm, wx_ref, wh_ref, bias_ref,
               s_ref, e_ref,
               dx_hbm, dwx_ref, dwh_ref, dbias_ref,
               dh_scr, dc_scr, xbuf, ybuf, cbuf, dybuf, gbuf, dgbuf, dxbuf,
               xsem, ysem, csem, dysem, dxsem):
        # streams (stream order): xs (2,Tp,B,Dp) cdtype; y (2,Tp+1,B,Hp)
        # cdtype; c (2,Tp+1,B,Hp) f32; dy (2,Tp,B,Hp) cdtype
        # outputs: dx (2,Tp,B,Dp) f32 stream; dwx (2,Dp,4Hp) f32;
        # dwh (2,Hp,4Hp) f32; dbias (2,B,4Hp) f32 (host reduces rows)

        def fetch_x(z, c, slot):
            return pltpu.make_async_copy(
                xs_hbm.at[z, pl.ds(c * f, f)], xbuf.at[slot, z],
                xsem.at[slot, z],
            )

        def fetch_y(z, c, slot):
            # rows [c*f, c*f+f) of y_ext = h_prev of frames c*f .. c*f+f-1
            return pltpu.make_async_copy(
                y_hbm.at[z, pl.ds(c * f, f)], ybuf.at[slot, z],
                ysem.at[slot, z],
            )

        def fetch_c(z, c, slot):
            # rows [c*f, c*f+f+1): c_prev rows 0..f-1, c_new rows 1..f
            return pltpu.make_async_copy(
                c_hbm.at[z, pl.ds(c * f, f + 1)], cbuf.at[slot, z],
                csem.at[slot, z],
            )

        def fetch_dy(z, c, slot):
            return pltpu.make_async_copy(
                dy_hbm.at[z, pl.ds(c * f, f)], dybuf.at[slot, z],
                dysem.at[slot, z],
            )

        def put_dx(z, c, slot):
            return pltpu.make_async_copy(
                dxbuf.at[slot, z], dx_hbm.at[z, pl.ds(c * f, f)],
                dxsem.at[slot, z],
            )

        dh_scr[...] = jnp.zeros((2, b, hp), jnp.float32)
        dc_scr[...] = jnp.zeros((2, b, hp), jnp.float32)
        dwx_ref[...] = jnp.zeros((2, dp, 4 * hp), jnp.float32)
        dwh_ref[...] = jnp.zeros((2, hp, 4 * hp), jnp.float32)
        dbias_ref[...] = jnp.zeros((2, b, 4 * hp), jnp.float32)

        c0 = n_chunks - 1
        for z in (0, 1):
            fetch_x(z, c0, 0).start()
            fetch_y(z, c0, 0).start()
            fetch_c(z, c0, 0).start()
            fetch_dy(z, c0, 0).start()

        def body(k, carry):
            c = n_chunks - 1 - k
            slot = jax.lax.rem(k, 2)
            for z in (0, 1):
                fetch_x(z, c, slot).wait()
                fetch_y(z, c, slot).wait()
                fetch_c(z, c, slot).wait()
                fetch_dy(z, c, slot).wait()

            @pl.when(k + 1 < n_chunks)
            def _():
                for z in (0, 1):
                    fetch_x(z, c - 1, 1 - slot).start()
                    fetch_y(z, c - 1, 1 - slot).start()
                    fetch_c(z, c - 1, 1 - slot).start()
                    fetch_dy(z, c - 1, 1 - slot).start()

            @pl.when(k >= 2)
            def _():
                for z in (0, 1):
                    put_dx(z, c + 2, slot).wait()

            # batched recompute of the chunk's gate pre-activations:
            # (x W_x + bias) + h_prev W_h — the forward's f32 add order
            for z in (0, 1):
                gbuf[z] = (
                    (
                        jnp.dot(
                            xbuf[slot, z].reshape(f * b, dp), wx_ref[z],
                            preferred_element_type=jnp.float32,
                        )
                        + bias_ref[z, 0, :]
                    )
                    + jnp.dot(
                        ybuf[slot, z].reshape(f * b, hp), wh_ref[z],
                        preferred_element_type=jnp.float32,
                    )
                ).reshape(f, b, 4 * hp)

            for fi in range(f - 1, -1, -1):  # descending, static unroll
                tf = (c * f + fi).astype(jnp.float32)
                for z in (0, 1):
                    gates = gbuf[z, fi]
                    gi = _sigmoid(gates[:, 0 * hp:1 * hp])
                    gf = _sigmoid(gates[:, 1 * hp:2 * hp])
                    gg = jnp.tanh(gates[:, 2 * hp:3 * hp])
                    go = _sigmoid(gates[:, 3 * hp:4 * hp])
                    c_prev = cbuf[slot, z, fi]
                    tanh_c = jnp.tanh(cbuf[slot, z, fi + 1])
                    m = _lane_tile(
                        jnp.where(
                            (tf >= s_ref[z]) & (tf < e_ref[z]), 1.0, 0.0
                        ),
                        hp,
                    )
                    dh_out = (dybuf[slot, z, fi].astype(jnp.float32) * m
                              + dh_scr[z])
                    dc_out = dc_scr[z]
                    dh_new = m * dh_out
                    dc_new = (m * dc_out
                              + dh_new * go * (1.0 - tanh_c * tanh_c))
                    di = dc_new * gg * (gi * (1.0 - gi))
                    df = dc_new * c_prev * (gf * (1.0 - gf))
                    dg = dc_new * gi * (1.0 - gg * gg)
                    do = dh_new * tanh_c * (go * (1.0 - go))
                    dgates = jnp.concatenate([di, df, dg, do], axis=-1)
                    dgbuf[z, fi] = dgates
                    dbias_ref[z] += dgates
                    rec = jax.lax.dot_general(
                        dgates.astype(cdtype), wh_ref[z], nt,
                        preferred_element_type=jnp.float32,
                    )
                    dh_scr[z] = (1.0 - m) * dh_out + rec
                    dc_scr[z] = (1.0 - m) * dc_out + gf * dc_new

            # chunk-batched weight-gradient accumulation + dx stream
            for z in (0, 1):
                dg2 = dgbuf[z].reshape(f * b, 4 * hp).astype(cdtype)
                dxbuf[slot, z] = jax.lax.dot_general(
                    dg2, wx_ref[z], nt, preferred_element_type=jnp.float32
                ).reshape(f, b, dp)
                dwx_ref[z] += jax.lax.dot_general(
                    xbuf[slot, z].reshape(f * b, dp), dg2, tn,
                    preferred_element_type=jnp.float32,
                )
                dwh_ref[z] += jax.lax.dot_general(
                    ybuf[slot, z].reshape(f * b, hp), dg2, tn,
                    preferred_element_type=jnp.float32,
                )
                put_dx(z, c, slot).start()
            return carry

        jax.lax.fori_loop(0, n_chunks, body, 0)
        for back in (2, 1):
            k = n_chunks - back  # static
            if k >= 0:
                for z in (0, 1):
                    put_dx(z, n_chunks - 1 - k, k % 2).wait()

    return kernel


# --------------------------------------------------------------------------
# chunk selection / budget predicate
# --------------------------------------------------------------------------


def _pick_chunk(
    b: int, d: int, h: int, itemsize: int
) -> Optional[Tuple[int, int, int, int]]:
    """Return (chunk, bp, dp, hp) fitting the train VMEM budget, or None.

    The binding constraint is the BACKWARD program's working set (weights +
    f32 dW accumulators + four input streams); the forward's is strictly
    smaller, so one predicate sizes both.
    """
    bp = _round_up(b, 8)
    dp = _round_up(d, 128)
    hp = _round_up(h, 128)
    wx_b = 2 * dp * 4 * hp * itemsize
    wh_b = 2 * hp * 4 * hp * itemsize
    dwx_b = 2 * dp * 4 * hp * 4
    dwh_b = 2 * hp * 4 * hp * 4
    dbias_b = 2 * bp * 4 * hp * 4
    states = 4 * (2 * bp * hp * 4)  # h/c fwd + dh/dc bwd (only 2 live)
    fixed = wx_b + wh_b + dwx_b + dwh_b + dbias_b + states \
        + 2 * (2 * bp * 128 * 4)
    for f in (4, 2, 8, 1):
        xbuf = 2 * 2 * f * bp * dp * itemsize
        ybuf = 2 * 2 * f * bp * hp * itemsize
        cbuf = 2 * 2 * (f + 1) * bp * hp * 4
        dybuf = 2 * 2 * f * bp * hp * itemsize
        gbuf = 2 * f * bp * 4 * hp * 4
        dgbuf = 2 * f * bp * 4 * hp * 4
        dxbuf = 2 * 2 * f * bp * dp * 4
        if (fixed + xbuf + ybuf + cbuf + dybuf + gbuf + dgbuf + dxbuf
                <= _TRAIN_VMEM_BUDGET):
            return f, bp, dp, hp
    return None


def fused_train_fits(b: int, t: int, d: int, h: int, itemsize: int = 2
                     ) -> bool:
    """Public predicate: can (B, T, D) x H train in the fused kernels?"""
    del t  # time never limits VMEM (streamed)
    return _pick_chunk(b, d, h, itemsize) is not None


def gx_train_fits(b: int, h: int, itemsize: int = 2) -> bool:
    """Can hidden dim H train in the gate-stream (gx) kernels?

    The gx variant fits ANY input dim (W_x lives outside), but W_h, its
    f32 dW_h accumulator and the double-buffered gate/state streams are
    still VMEM-resident; this budgets the gx BACKWARD program's working
    set (shapes mirror bwd_call's scratch_shapes in _make_gx_fn).
    Callers fall back to the XLA scan when this is False.
    """
    bp = _round_up(b, 8)
    hp = _round_up(h, 128)
    f = _GX_CHUNK
    wh_b = 2 * hp * 4 * hp * itemsize
    dwh_b = 2 * hp * 4 * hp * 4
    states = 2 * (2 * bp * hp * 4)          # h/c (or dh/dc) carries
    ivals = 2 * (2 * bp * min(hp, 128) * 4)  # s/e interval tables
    bufs = (
        2 * 2 * f * bp * 4 * hp * 4          # gate stream in
        + 2 * 2 * f * bp * hp * itemsize     # h stream
        + 2 * 2 * (f + 1) * bp * hp * 4      # c stream
        + 2 * 2 * f * bp * hp * itemsize     # dy stream
        + 2 * f * bp * 4 * hp * 4            # gh recompute buffer
        + 2 * 2 * f * bp * 4 * hp * 4        # d(gates) out
    )
    return wh_b + dwh_b + states + ivals + bufs <= _TRAIN_VMEM_BUDGET


# --------------------------------------------------------------------------
# custom-VJP entry
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_train_fn(t, f, b, bp, d, dp, h, hp, cdtype_str, xdtype_str,
                   interpret):
    """Build the custom-VJP function for one static configuration.

    All static metadata lives in this closure so the VJP residuals are a
    pure array pytree (dtype objects are not valid pytree leaves)."""
    cdtype = jnp.dtype(cdtype_str)
    xdtype = jnp.dtype(xdtype_str)
    tp = _round_up(t, f)

    def _prep(x, lengths, wx, wh, bias):
        xs = jnp.stack([x, jnp.flip(x, axis=1)]).astype(cdtype)
        xs = jnp.transpose(xs, (0, 2, 1, 3))  # (2, T, B, D)
        xs = jnp.pad(
            xs, ((0, 0), (0, tp - t), (0, bp - b), (0, dp - d))
        )
        wxp = _pad_gate_axis(
            jnp.pad(wx, ((0, 0), (0, dp - d), (0, 0))), h, hp
        )
        whp = _pad_gate_axis(
            jnp.pad(wh, ((0, 0), (0, hp - h), (0, 0))), h, hp
        )
        biasp = _pad_gate_axis(bias.astype(jnp.float32), h, hp)[:, None, :]
        s, e = _intervals(lengths, t, bp, hp)
        return xs, wxp, whp, biasp, s, e

    def fwd(x, lengths, wx, wh, bias):
        xs, wxp, whp, biasp, s, e = _prep(x, lengths, wx, wh, bias)
        y_ext, c_ext = _fwd_call(xs, wxp, whp, biasp, s, e)
        fwd_y = y_ext[0, 1:t + 1, :b, :h]
        bwd_y = jnp.flip(y_ext[1, 1:t + 1, :b, :h], axis=0)
        y = jnp.transpose(
            jnp.concatenate([fwd_y, bwd_y], axis=-1), (1, 0, 2)
        )
        return y, (xs, y_ext, c_ext, wxp, whp, biasp, s, e)

    def _fwd_call(xs, wxp, whp, biasp, s, e):
        return pl.pallas_call(
        _fwd_kernel(tp, f, bp, dp, hp, cdtype),
        out_shape=(
            jax.ShapeDtypeStruct((2, tp + 1, bp, hp), cdtype),
            jax.ShapeDtypeStruct((2, tp + 1, bp, hp), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xs streams
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bp, hp), jnp.float32),  # h
            pltpu.VMEM((2, bp, hp), jnp.float32),  # c
            pltpu.VMEM((2, 2, f, bp, dp), cdtype),  # x double buf
            pltpu.VMEM((2, f, bp, 4 * hp), jnp.float32),  # gx
            pltpu.VMEM((2, 2, f, bp, hp), cdtype),  # y out buf
            pltpu.VMEM((2, 2, f, bp, hp), jnp.float32),  # c out buf
            pltpu.VMEM((1, bp, hp), cdtype),  # zero row (y)
            pltpu.VMEM((1, bp, hp), jnp.float32),  # zero row (c)
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * tp * bp * (dp + hp) * 4 * hp,
            bytes_accessed=jnp.dtype(cdtype).itemsize
            * (tp * 2 * bp * (dp + hp)) + 4 * tp * 2 * bp * hp,
            transcendentals=5 * 2 * tp * bp * hp,
        ),
    )(xs, wxp, whp, biasp, s, e)

    def bwd(res, dy):
        xs, y_ext, c_ext, wxp, whp, biasp, s, e = res

        # (B, T, 2H) cotangent -> per-direction stream-order padded
        dy = dy.astype(cdtype)
        dyf = dy[..., :h]
        dyb = jnp.flip(dy[..., h:], axis=1)
        dys = jnp.transpose(jnp.stack([dyf, dyb]), (0, 2, 1, 3))
        dys = jnp.pad(
            dys, ((0, 0), (0, tp - t), (0, bp - b), (0, hp - h))
        )

        dx_s, dwx, dwh, dbias = _bwd_call(
            xs, y_ext, c_ext, dys, wxp, whp, biasp, s, e
        )
        dx = dx_s[0, :t, :b, :d] + jnp.flip(dx_s[1, :t, :b, :d], axis=0)
        dx = jnp.transpose(dx, (1, 0, 2)).astype(xdtype)

        def unpad_gates(g, rows):
            g = g.reshape(2, g.shape[1], 4, hp)[..., :h].reshape(
                2, g.shape[1], 4 * h
            )
            return g[:, :rows]

        dwx = unpad_gates(dwx, d).astype(cdtype)
        dwh = unpad_gates(dwh, h).astype(cdtype)
        dbias = jnp.sum(dbias, axis=1).reshape(2, 4, hp)[..., :h].reshape(
            2, 4 * h
        )
        # lengths is integer-valued: its tangent space is float0
        dlen = np.zeros((b,), dtype=jax.dtypes.float0)
        return dx, dlen, dwx, dwh, dbias

    def _bwd_call(xs, y_ext, c_ext, dys, wxp, whp, biasp, s, e):
        return pl.pallas_call(
        _bwd_kernel(tp, f, bp, dp, hp, cdtype),
        out_shape=(
            jax.ShapeDtypeStruct((2, tp, bp, dp), jnp.float32),
            jax.ShapeDtypeStruct((2, dp, 4 * hp), jnp.float32),
            jax.ShapeDtypeStruct((2, hp, 4 * hp), jnp.float32),
            jax.ShapeDtypeStruct((2, bp, 4 * hp), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xs
            pl.BlockSpec(memory_space=pl.ANY),  # y_ext
            pl.BlockSpec(memory_space=pl.ANY),  # c_ext
            pl.BlockSpec(memory_space=pl.ANY),  # dy
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),  # dx streams
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bp, hp), jnp.float32),  # dh
            pltpu.VMEM((2, bp, hp), jnp.float32),  # dc
            pltpu.VMEM((2, 2, f, bp, dp), cdtype),  # x
            pltpu.VMEM((2, 2, f, bp, hp), cdtype),  # y (h_prev rows)
            pltpu.VMEM((2, 2, f + 1, bp, hp), jnp.float32),  # c
            pltpu.VMEM((2, 2, f, bp, hp), cdtype),  # dy
            pltpu.VMEM((2, f, bp, 4 * hp), jnp.float32),  # gates
            pltpu.VMEM((2, f, bp, 4 * hp), jnp.float32),  # dgates
            pltpu.VMEM((2, 2, f, bp, dp), jnp.float32),  # dx
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 2 * tp * bp * (dp + hp) * 4 * hp,
            bytes_accessed=jnp.dtype(cdtype).itemsize
            * (tp * 2 * bp * (dp + 3 * hp)) + 4 * tp * 2 * bp * (hp + dp),
            transcendentals=5 * 2 * tp * bp * hp,
        ),
    )(xs, y_ext, c_ext, dys, wxp, whp, biasp, s, e)

    @jax.custom_vjp
    def fn(x, lengths, wx, wh, bias):
        return fwd(x, lengths, wx, wh, bias)[0]

    fn.defvjp(fwd, bwd)
    return fn


def blstm_train(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    wx: jnp.ndarray,
    wh: jnp.ndarray,
    bias: jnp.ndarray,
    chunk: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Differentiable fused bidirectional masked LSTM.

    Same contract as ops.blstm_pallas.blstm_infer — x (B, T, D),
    lengths (B,) interval-mask frame counts, wx (2, D, 4H), wh (2, H, 4H),
    bias (2, 4H) f32 — but with a fused Pallas backward (custom VJP), so it
    is usable inside jitted train steps. Returns (B, T, 2H) in wx.dtype,
    pad frames zero.
    """
    b, t, d = x.shape
    h = wh.shape[-1] // 4
    cdtype = jnp.dtype(wx.dtype)
    picked = _pick_chunk(b, d, h, cdtype.itemsize)
    if picked is None:
        raise ValueError(
            f"blstm_train: shapes B={b} D={d} H={h} exceed the VMEM "
            "budget; use the scan path (fused_train_fits gates this)"
        )
    f0, bp, dp, hp = picked
    f = chunk or f0
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fn = _make_train_fn(
        t, f, b, bp, d, dp, h, hp, str(cdtype), str(jnp.dtype(x.dtype)),
        bool(interpret),
    )
    return fn(x, lengths, wx, wh, bias)


# --------------------------------------------------------------------------
# gate-stream ("gx") training variant: arbitrary input dims
# --------------------------------------------------------------------------
#
# When W_x exceeds the VMEM budget (the encoder's VGG-output layer,
# D = 2560 at reference scale), the input projection stays OUTSIDE the
# kernel as one big differentiable XLA einsum — autodiff covers dW_x, dx
# and dbias through it — and the kernels handle only the serial recursion:
# the forward streams pre-projected gate chunks in and the masked h/c
# residual streams out; the backward re-reads the gate stream, recomputes
# gh from the h stream as batched matmuls, runs the serial adjoint, and
# streams d(gates) back out as the einsum's cotangent. W_h and its f32
# gradient accumulator are the only VMEM-resident weights, so this variant
# fits ANY input dim. Same interval-mask residual argument as the fused
# variant above.


def _fwd_gx_kernel(tp: int, f: int, b: int, hp: int, cdtype):
    n_chunks = tp // f

    def kernel(gx_hbm, wh_ref, s_ref, e_ref, y_hbm, c_hbm,
               h_scr, c_scr, gbuf, ybuf, cbuf, zbuf, zcbuf,
               gsem, ysem, csem, zsem):
        # gx_hbm: (2, Tp, B, 4Hp) f32 — pre-projected gates (incl. bias)

        def fetch(z, c, slot):
            return pltpu.make_async_copy(
                gx_hbm.at[z, pl.ds(c * f, f)], gbuf.at[slot, z],
                gsem.at[slot, z],
            )

        def put_y(z, c, slot):
            return pltpu.make_async_copy(
                ybuf.at[slot, z], y_hbm.at[z, pl.ds(1 + c * f, f)],
                ysem.at[slot, z],
            )

        def put_c(z, c, slot):
            return pltpu.make_async_copy(
                cbuf.at[slot, z], c_hbm.at[z, pl.ds(1 + c * f, f)],
                csem.at[slot, z],
            )

        h_scr[...] = jnp.zeros((2, b, hp), jnp.float32)
        c_scr[...] = jnp.zeros((2, b, hp), jnp.float32)
        zbuf[...] = jnp.zeros((1, b, hp), cdtype)
        zcbuf[...] = jnp.zeros((1, b, hp), jnp.float32)
        for z in (0, 1):
            fetch(z, 0, 0).start()
            pltpu.make_async_copy(
                zbuf, y_hbm.at[z, pl.ds(0, 1)], zsem.at[0, z]
            ).start()
            pltpu.make_async_copy(
                zcbuf, c_hbm.at[z, pl.ds(0, 1)], zsem.at[1, z]
            ).start()
        for z in (0, 1):
            pltpu.make_async_copy(
                zbuf, y_hbm.at[z, pl.ds(0, 1)], zsem.at[0, z]
            ).wait()
            pltpu.make_async_copy(
                zcbuf, c_hbm.at[z, pl.ds(0, 1)], zsem.at[1, z]
            ).wait()

        def body(c, carry):
            slot = jax.lax.rem(c, 2)
            for z in (0, 1):
                fetch(z, c, slot).wait()

            @pl.when(c + 1 < n_chunks)
            def _():
                for z in (0, 1):
                    fetch(z, c + 1, 1 - slot).start()

            @pl.when(c >= 2)
            def _():
                for z in (0, 1):
                    put_y(z, c - 2, slot).wait()
                    put_c(z, c - 2, slot).wait()

            for fi in range(f):
                tf = (c * f + fi).astype(jnp.float32)
                for z in (0, 1):
                    h_prev = h_scr[z]
                    c_prev = c_scr[z]
                    gh = jnp.dot(
                        h_prev.astype(cdtype), wh_ref[z],
                        preferred_element_type=jnp.float32,
                    )
                    gates = gbuf[slot, z, fi] + gh
                    gi = gates[:, 0 * hp:1 * hp]
                    gf = gates[:, 1 * hp:2 * hp]
                    gg = gates[:, 2 * hp:3 * hp]
                    go = gates[:, 3 * hp:4 * hp]
                    c_new = (_sigmoid(gf) * c_prev
                             + _sigmoid(gi) * jnp.tanh(gg))
                    h_new = _sigmoid(go) * jnp.tanh(c_new)
                    m = _lane_tile(
                        jnp.where(
                            (tf >= s_ref[z]) & (tf < e_ref[z]), 1.0, 0.0
                        ),
                        hp,
                    )
                    c_out = m * c_new + (1.0 - m) * c_prev
                    h_out = m * h_new + (1.0 - m) * h_prev
                    h_scr[z] = h_out
                    c_scr[z] = c_out
                    ybuf[slot, z, fi] = (h_out * m).astype(cdtype)
                    cbuf[slot, z, fi] = c_out * m

            for z in (0, 1):
                put_y(z, c, slot).start()
                put_c(z, c, slot).start()
            return carry

        jax.lax.fori_loop(0, n_chunks, body, 0)
        for back in (2, 1):
            c = n_chunks - back  # static
            if c >= 0:
                for z in (0, 1):
                    put_y(z, c, c % 2).wait()
                    put_c(z, c, c % 2).wait()

    return kernel


def _bwd_gx_kernel(tp: int, f: int, b: int, hp: int, cdtype):
    n_chunks = tp // f
    nt = (((1,), (1,)), ((), ()))
    tn = (((0,), (0,)), ((), ()))

    def kernel(gx_hbm, y_hbm, c_hbm, dy_hbm, wh_ref, s_ref, e_ref,
               dgx_hbm, dwh_ref,
               dh_scr, dc_scr, gbuf, ybuf, cbuf, dybuf, prebuf, dgbuf,
               gsem, ysem, csem, dysem, dgsem):
        # outputs: dgx (2, Tp, B, 4Hp) f32 stream; dwh (2, Hp, 4Hp) f32

        def fetch_g(z, c, slot):
            return pltpu.make_async_copy(
                gx_hbm.at[z, pl.ds(c * f, f)], gbuf.at[slot, z],
                gsem.at[slot, z],
            )

        def fetch_y(z, c, slot):
            return pltpu.make_async_copy(
                y_hbm.at[z, pl.ds(c * f, f)], ybuf.at[slot, z],
                ysem.at[slot, z],
            )

        def fetch_c(z, c, slot):
            return pltpu.make_async_copy(
                c_hbm.at[z, pl.ds(c * f, f + 1)], cbuf.at[slot, z],
                csem.at[slot, z],
            )

        def fetch_dy(z, c, slot):
            return pltpu.make_async_copy(
                dy_hbm.at[z, pl.ds(c * f, f)], dybuf.at[slot, z],
                dysem.at[slot, z],
            )

        def put_dg(z, c, slot):
            return pltpu.make_async_copy(
                dgbuf.at[slot, z], dgx_hbm.at[z, pl.ds(c * f, f)],
                dgsem.at[slot, z],
            )

        dh_scr[...] = jnp.zeros((2, b, hp), jnp.float32)
        dc_scr[...] = jnp.zeros((2, b, hp), jnp.float32)
        dwh_ref[...] = jnp.zeros((2, hp, 4 * hp), jnp.float32)

        c0 = n_chunks - 1
        for z in (0, 1):
            fetch_g(z, c0, 0).start()
            fetch_y(z, c0, 0).start()
            fetch_c(z, c0, 0).start()
            fetch_dy(z, c0, 0).start()

        def body(k, carry):
            c = n_chunks - 1 - k
            slot = jax.lax.rem(k, 2)
            for z in (0, 1):
                fetch_g(z, c, slot).wait()
                fetch_y(z, c, slot).wait()
                fetch_c(z, c, slot).wait()
                fetch_dy(z, c, slot).wait()

            @pl.when(k + 1 < n_chunks)
            def _():
                for z in (0, 1):
                    fetch_g(z, c - 1, 1 - slot).start()
                    fetch_y(z, c - 1, 1 - slot).start()
                    fetch_c(z, c - 1, 1 - slot).start()
                    fetch_dy(z, c - 1, 1 - slot).start()

            @pl.when(k >= 2)
            def _():
                for z in (0, 1):
                    put_dg(z, c + 2, slot).wait()

            # batched gh recompute for the chunk: gates = gx + h_prev@Wh
            for z in (0, 1):
                prebuf[z] = gbuf[slot, z] + jnp.dot(
                    ybuf[slot, z].reshape(f * b, hp), wh_ref[z],
                    preferred_element_type=jnp.float32,
                ).reshape(f, b, 4 * hp)

            for fi in range(f - 1, -1, -1):
                tf = (c * f + fi).astype(jnp.float32)
                for z in (0, 1):
                    gates = prebuf[z, fi]
                    gi = _sigmoid(gates[:, 0 * hp:1 * hp])
                    gf = _sigmoid(gates[:, 1 * hp:2 * hp])
                    gg = jnp.tanh(gates[:, 2 * hp:3 * hp])
                    go = _sigmoid(gates[:, 3 * hp:4 * hp])
                    c_prev = cbuf[slot, z, fi]
                    tanh_c = jnp.tanh(cbuf[slot, z, fi + 1])
                    m = _lane_tile(
                        jnp.where(
                            (tf >= s_ref[z]) & (tf < e_ref[z]), 1.0, 0.0
                        ),
                        hp,
                    )
                    dh_out = (dybuf[slot, z, fi].astype(jnp.float32) * m
                              + dh_scr[z])
                    dc_out = dc_scr[z]
                    dh_new = m * dh_out
                    dc_new = (m * dc_out
                              + dh_new * go * (1.0 - tanh_c * tanh_c))
                    di = dc_new * gg * (gi * (1.0 - gi))
                    df = dc_new * c_prev * (gf * (1.0 - gf))
                    dg = dc_new * gi * (1.0 - gg * gg)
                    do = dh_new * tanh_c * (go * (1.0 - go))
                    dgates = jnp.concatenate([di, df, dg, do], axis=-1)
                    dgbuf[slot, z, fi] = dgates
                    rec = jax.lax.dot_general(
                        dgates.astype(cdtype), wh_ref[z], nt,
                        preferred_element_type=jnp.float32,
                    )
                    dh_scr[z] = (1.0 - m) * dh_out + rec
                    dc_scr[z] = (1.0 - m) * dc_out + gf * dc_new

            for z in (0, 1):
                dwh_ref[z] += jax.lax.dot_general(
                    ybuf[slot, z].reshape(f * b, hp),
                    dgbuf[slot, z].reshape(f * b, 4 * hp).astype(cdtype),
                    tn, preferred_element_type=jnp.float32,
                )
                put_dg(z, c, slot).start()
            return carry

        jax.lax.fori_loop(0, n_chunks, body, 0)
        for back in (2, 1):
            k = n_chunks - back  # static
            if k >= 0:
                for z in (0, 1):
                    put_dg(z, n_chunks - 1 - k, k % 2).wait()

    return kernel


_GX_CHUNK = 2  # serial h-chain dominates; small chunks keep DMA off it


@functools.lru_cache(maxsize=None)
def _make_gx_fn(t, f, b, bp, h, hp, cdtype_str, interpret):
    cdtype = jnp.dtype(cdtype_str)
    tp = _round_up(t, f)

    def fwd_call(gxp, whp, s, e):
        return pl.pallas_call(
            _fwd_gx_kernel(tp, f, bp, hp, cdtype),
            out_shape=(
                jax.ShapeDtypeStruct((2, tp + 1, bp, hp), cdtype),
                jax.ShapeDtypeStruct((2, tp + 1, bp, hp), jnp.float32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, bp, hp), jnp.float32),
                pltpu.VMEM((2, bp, hp), jnp.float32),
                pltpu.VMEM((2, 2, f, bp, 4 * hp), jnp.float32),
                pltpu.VMEM((2, 2, f, bp, hp), cdtype),
                pltpu.VMEM((2, 2, f, bp, hp), jnp.float32),
                pltpu.VMEM((1, bp, hp), cdtype),
                pltpu.VMEM((1, bp, hp), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * tp * bp * hp * 4 * hp,
                bytes_accessed=4 * tp * 2 * bp * 4 * hp
                + 6 * tp * 2 * bp * hp,
                transcendentals=5 * 2 * tp * bp * hp,
            ),
        )(gxp, whp, s, e)

    def bwd_call(gxp, y_ext, c_ext, dys, whp, s, e):
        return pl.pallas_call(
            _bwd_gx_kernel(tp, f, bp, hp, cdtype),
            out_shape=(
                jax.ShapeDtypeStruct((2, tp, bp, 4 * hp), jnp.float32),
                jax.ShapeDtypeStruct((2, hp, 4 * hp), jnp.float32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, bp, hp), jnp.float32),
                pltpu.VMEM((2, bp, hp), jnp.float32),
                pltpu.VMEM((2, 2, f, bp, 4 * hp), jnp.float32),
                pltpu.VMEM((2, 2, f, bp, hp), cdtype),
                pltpu.VMEM((2, 2, f + 1, bp, hp), jnp.float32),
                pltpu.VMEM((2, 2, f, bp, hp), cdtype),
                pltpu.VMEM((2, f, bp, 4 * hp), jnp.float32),
                pltpu.VMEM((2, 2, f, bp, 4 * hp), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * 2 * tp * bp * hp * 4 * hp,
                bytes_accessed=2 * 4 * tp * 2 * bp * 4 * hp
                + 6 * tp * 2 * bp * hp,
                transcendentals=5 * 2 * tp * bp * hp,
            ),
        )(gxp, y_ext, c_ext, dys, whp, s, e)

    def fwd(gxp, whp, s, e):
        y_ext, c_ext = fwd_call(gxp, whp, s, e)
        fwd_y = y_ext[0, 1:t + 1, :b, :h]
        bwd_y = jnp.flip(y_ext[1, 1:t + 1, :b, :h], axis=0)
        y = jnp.transpose(
            jnp.concatenate([fwd_y, bwd_y], axis=-1), (1, 0, 2)
        )
        return y, (gxp, y_ext, c_ext, whp, s, e)

    def bwd(res, dy):
        gxp, y_ext, c_ext, whp, s, e = res
        dy = dy.astype(cdtype)
        dyf = dy[..., :h]
        dyb = jnp.flip(dy[..., h:], axis=1)
        dys = jnp.transpose(jnp.stack([dyf, dyb]), (0, 2, 1, 3))
        dys = jnp.pad(
            dys, ((0, 0), (0, tp - t), (0, bp - b), (0, hp - h))
        )
        dgx, dwh = bwd_call(gxp, y_ext, c_ext, dys, whp, s, e)
        # pad rows/lanes of the accumulator are exactly zero (h/y pad
        # lanes stay zero in the forward), so it IS the padded adjoint
        return (dgx, dwh.astype(whp.dtype), jnp.zeros_like(s),
                jnp.zeros_like(e))

    @jax.custom_vjp
    def fn(gxp, whp, s, e):
        return fwd(gxp, whp, s, e)[0]

    fn.defvjp(fwd, bwd)
    return fn


def blstm_train_gx(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    wx: jnp.ndarray,
    wh: jnp.ndarray,
    bias: jnp.ndarray,
    chunk: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Gate-stream fused training BLSTM (fits ANY input dim).

    Same contract as blstm_train; the input projection runs outside as a
    differentiable einsum (dW_x/dx/dbias via autodiff), the kernels own
    only the serial recursion.
    """
    b, t, d = x.shape
    h = wh.shape[-1] // 4
    cdtype = jnp.dtype(wx.dtype)
    f = chunk or _GX_CHUNK
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bp = _round_up(b, 8)
    hp = _round_up(h, 128)
    tp = _round_up(t, f)

    xs = jnp.stack([x, jnp.flip(x, axis=1)]).astype(cdtype)  # (2, B, T, D)
    # one big MXU matmul outside the kernel — exactly the scan path's
    # hoisted projection, so dW_x/dx/dbias come from XLA autodiff
    gx = (
        jnp.einsum(
            "zbtd,zdg->ztbg", xs, wx,
            preferred_element_type=jnp.float32,
        )
        + bias.astype(jnp.float32)[:, None, None, :]
    )  # (2, T, B, 4H) f32
    gxp = _pad_gate_axis(gx, h, hp)
    gxp = jnp.pad(gxp, ((0, 0), (0, tp - t), (0, bp - b), (0, 0)))
    whp = _pad_gate_axis(jnp.pad(wh, ((0, 0), (0, hp - h), (0, 0))), h, hp)
    s, e = _intervals(lengths, t, bp, hp)
    fn = _make_gx_fn(t, f, b, bp, h, hp, str(cdtype), bool(interpret))
    return fn(gxp, whp, s, e)
