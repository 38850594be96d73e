"""Fused Pallas TPU kernels for BLSTM *inference* over a padded batch.

Why: the XLA ``lax.scan`` BLSTM (models/rnn.py) materializes the hoisted
(T, 2, B, 4H) f32 gate projections through HBM (~1.5 GB at enhancer shapes)
and round-trips its (2, B, H) h/c carries every frame, plus per-iteration
loop overhead — the round-3 MFU report (results/mfu.json) shows the decode
program latency-bound with the enhancer (2 BLSTM layers at full frame rate,
~690 frames) and encoder BLSTMP chains as two of its three top sinks.

The main kernel here (variant "fused") walks the whole frame loop in ONE
Mosaic program and keeps BOTH weight matrices on-chip:

  * ``W_x`` (2, D, 4H), ``W_h`` (2, H, 4H) and the h/c states are
    VMEM-resident for the entire sequence — the only HBM traffic is the
    raw input frames in (streamed in F-frame chunks of (F, 2, B, D) with
    double-buffered async DMA; ~64 KB/frame at enhancer shapes vs the
    2 MB/frame a pre-projected gate stream would cost) and the hidden
    states out (F-frame chunks, compute dtype);
  * gate math per frame: two MXU dots (x_t @ W_x, h @ W_h) + f32 bias —
    the same operands and f32 accumulation the scan path's einsums use;
  * the backward direction processes the time-flipped sequence and its
    output chunks are written time-REVERSED (row Tp-1-t), so the result
    needs no ``jnp.flip``;
  * pad-frame masking is computed in-kernel from per-direction
    ``[start, end)`` frame intervals (fwd: [0, len), bwd on the flipped
    sequence: [T-len, T)) — valid because every mask in this codebase is
    a length mask; arbitrary non-interval masks must use the scan path;
  * both directions advance in the same frame step (one serial chain).

When the weights don't fit (the encoder's first layer consumes the
flattened VGG output, D = 2560), a fallback variant streams pre-projected
gate frames instead (the projection happens outside as one big MXU matmul,
exactly like the scan path) — same recursion, fatter stream.

v5e-measured (scripts/bench_blstm.py, results/blstm_kernel.json, bf16,
B=128): enhancer layer (T=690, D=257, H=512) scan 10.7 -> tiled 6.2 ms
(1.73x); encoder layers 1.05-1.16x. The remaining floor is the serial
per-frame h @ W_h chain itself (~690 dependent (128,512)x(512,2048) MXU
dots) — chunk-size sweeps confirm DMA and x-projection are already off
the critical path. End-to-end batched beam decode: 1935 -> 2027 utt/s.

FORWARD ONLY: differentiating through ``pallas_call`` without a custom VJP
raises, which is the intended guard — training keeps the scan path (which
XLA differentiates), decode/serving opt in via ``lstm_impl`` config.

Reference parity: SURVEY.md section 2b "cuDNN LSTM via PyTorch" — this is
the TPU-native analogue of cuDNN's fused LSTM inference kernels.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM working-set budget for kernel-variant selection (bytes), and the
# matching Mosaic scoped-vmem limit we request (v5e has 128 MB VMEM/core;
# the compiler's DEFAULT scoped limit is 16 MB, so pallas_call must raise
# it explicitly via CompilerParams.vmem_limit_bytes). The budget leaves
# headroom below the limit for Mosaic's own scratch.
_VMEM_BUDGET = 64 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lane_tile(x: jnp.ndarray, hp: int) -> jnp.ndarray:
    """(B, L) -> (B, Hp) by lane-block concatenation (L divides Hp).

    Mosaic cannot broadcast a 1-lane vector across lanes in-kernel, and
    full (B, Hp) tables waste VMEM — tables are stored at L = min(Hp, 128)
    lanes and tiled where used.
    """
    l = x.shape[-1]
    if l == hp:
        return x
    return jnp.concatenate([x] * (hp // l), axis=-1)


# --------------------------------------------------------------------------
# variant "fused": W_x resident, raw input frames streamed
# --------------------------------------------------------------------------


def _fused_kernel(tp: int, f: int, b: int, dp: int, hp: int, cdtype, odtype):
    """Kernel factory. Static: Tp padded frames, F frames/chunk, B rows,
    Dp/Hp padded input/hidden dims."""
    n_chunks = tp // f

    def kernel(xs_hbm, wx_ref, wh_ref, bias_ref, s_ref, e_ref, out_hbm,
               h_scr, c_scr, xbuf, gxbuf, obuf, xsem, osem):
        # xs_hbm: (2, Tp, B, Dp) cdtype HBM — per-direction frame streams
        # wx_ref: (2, Dp, 4Hp) cdtype; wh_ref: (2, Hp, 4Hp) cdtype VMEM
        # bias_ref: (2, 1, 4Hp) f32 (1-D row loads -> sublane broadcast)
        # s_ref/e_ref: (2, B, L) f32 — valid-frame intervals, lane-tiled
        # out_hbm: (Tp, 2, B, Hp) odtype — direction 1 written reversed
        # scratch: h/c (2, B, Hp) f32; xbuf (2, 2, F, B, Dp);
        #          gxbuf (2, F, B, 4Hp) f32; obuf (2, 2, F, B, Hp)

        def fetch(z, c, slot):
            return pltpu.make_async_copy(
                xs_hbm.at[z, pl.ds(c * f, f)], xbuf.at[slot, z],
                xsem.at[slot, z],
            )

        def put(z, c, slot):
            # bwd chunks land at descending rows; in-chunk order is
            # written reversed below, so each chunk is one contiguous copy
            row0 = c * f if z == 0 else tp - (c + 1) * f
            return pltpu.make_async_copy(
                obuf.at[slot, z],
                out_hbm.at[pl.ds(row0, f), z],
                osem.at[slot, z],
            )

        h_scr[...] = jnp.zeros((2, b, hp), jnp.float32)
        c_scr[...] = jnp.zeros((2, b, hp), jnp.float32)
        for z in (0, 1):
            fetch(z, 0, 0).start()

        def body(c, carry):
            slot = jax.lax.rem(c, 2)
            for z in (0, 1):
                fetch(z, c, slot).wait()

            @pl.when(c + 1 < n_chunks)
            def _():
                for z in (0, 1):
                    fetch(z, c + 1, 1 - slot).start()

            # obuf slot reuse: the copies issued 2 chunks ago must have
            # drained before overwriting
            @pl.when(c >= 2)
            def _():
                for z in (0, 1):
                    put(z, c - 2, slot).wait()

            # ---- all F input projections as ONE MXU matmul per direction:
            # x-frames are independent, so this lifts them OFF the serial
            # h-chain (the per-frame critical path is just h-dot + gates)
            for z in (0, 1):
                gxbuf[z] = (
                    jnp.dot(
                        xbuf[slot, z].reshape(f * b, dp), wx_ref[z],
                        preferred_element_type=jnp.float32,
                    )
                    + bias_ref[z, 0, :]
                ).reshape(f, b, 4 * hp)

            for fi in range(f):  # static unroll inside the chunk
                tf = (c * f + fi).astype(jnp.float32)
                for z in (0, 1):
                    h_prev = h_scr[z]
                    c_prev = c_scr[z]
                    gh = jnp.dot(
                        h_prev.astype(cdtype), wh_ref[z],
                        preferred_element_type=jnp.float32,
                    )
                    # (gx + bias) + gh matches the scan path's gx_t + gh
                    # f32 add order bit for bit
                    gates = gxbuf[z, fi] + gh
                    gi = gates[:, 0 * hp:1 * hp]
                    gf = gates[:, 1 * hp:2 * hp]
                    gg = gates[:, 2 * hp:3 * hp]
                    go = gates[:, 3 * hp:4 * hp]
                    c_new = (jax.nn.sigmoid(gf) * c_prev
                             + jax.nn.sigmoid(gi) * jnp.tanh(gg))
                    h_new = jax.nn.sigmoid(go) * jnp.tanh(c_new)
                    m = _lane_tile(
                        jnp.where(
                            (tf >= s_ref[z]) & (tf < e_ref[z]), 1.0, 0.0
                        ),
                        hp,
                    )  # (B, Hp)
                    c_out = m * c_new + (1.0 - m) * c_prev
                    h_out = m * h_new + (1.0 - m) * h_prev
                    h_scr[z] = h_out
                    c_scr[z] = c_out
                    # fwd in order; bwd reversed within the chunk so the
                    # descending chunk write lands time-ordered
                    row = fi if z == 0 else f - 1 - fi
                    obuf[slot, z, row] = (h_out * m).astype(odtype)

            for z in (0, 1):
                put(z, c, slot).start()
            return carry

        jax.lax.fori_loop(0, n_chunks, body, 0)

        # drain the last (up to) two in-flight output chunks
        for back in (2, 1):
            c = n_chunks - back  # static
            if c >= 0:
                for z in (0, 1):
                    put(z, c, c % 2).wait()

    return kernel


# --------------------------------------------------------------------------
# variant "gx": pre-projected gate frames streamed (large-D fallback)
# --------------------------------------------------------------------------


def _gx_kernel(t: int, b: int, hp: int, cdtype):
    def kernel(gx_hbm, wh_ref, s_ref, e_ref, out_hbm, h_scr, c_scr,
               gbuf, obuf, gsem, osem):
        # gx_hbm: (T, 2, B, 4Hp) f32 HBM (per-gate padded layout)
        # out_hbm: (T, 2, B, Hp) f32 — direction 1 written time-reversed

        def fetch(tt, slot):
            return pltpu.make_async_copy(
                gx_hbm.at[tt], gbuf.at[slot], gsem.at[slot]
            )

        def put(z, tt, slot):
            row = tt if z == 0 else t - 1 - tt
            return pltpu.make_async_copy(
                obuf.at[slot, z],
                out_hbm.at[pl.ds(row, 1), z],
                osem.at[slot, z],
            )

        h_scr[...] = jnp.zeros((2, b, hp), jnp.float32)
        c_scr[...] = jnp.zeros((2, b, hp), jnp.float32)
        fetch(0, 0).start()

        def body(tt, carry):
            slot = jax.lax.rem(tt, 2)
            fetch(tt, slot).wait()

            @pl.when(tt + 1 < t)
            def _():
                fetch(tt + 1, 1 - slot).start()

            tf = tt.astype(jnp.float32)
            for z in (0, 1):
                h_prev = h_scr[z]
                c_prev = c_scr[z]
                gh = jnp.dot(
                    h_prev.astype(cdtype), wh_ref[z],
                    preferred_element_type=jnp.float32,
                )
                gates = gbuf[slot, z] + gh  # (B, 4Hp) f32
                gi = gates[:, 0 * hp:1 * hp]
                gf = gates[:, 1 * hp:2 * hp]
                gg = gates[:, 2 * hp:3 * hp]
                go = gates[:, 3 * hp:4 * hp]
                c_new = (jax.nn.sigmoid(gf) * c_prev
                         + jax.nn.sigmoid(gi) * jnp.tanh(gg))
                h_new = jax.nn.sigmoid(go) * jnp.tanh(c_new)
                m = _lane_tile(
                    jnp.where((tf >= s_ref[z]) & (tf < e_ref[z]), 1.0, 0.0),
                    hp,
                )
                c_out = m * c_new + (1.0 - m) * c_prev
                h_out = m * h_new + (1.0 - m) * h_prev
                h_scr[z] = h_out
                c_scr[z] = c_out

                @pl.when(tt >= 2)
                def _():
                    put(z, tt - 2, slot).wait()

                obuf[slot, z, 0] = h_out * m
                put(z, tt, slot).start()
            return carry

        jax.lax.fori_loop(0, t, body, 0)
        for back in (2, 1):
            tt = t - back  # static
            if tt >= 0:
                for z in (0, 1):
                    put(z, tt, tt % 2).wait()

    return kernel


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------


def _pad_gate_axis(x: jnp.ndarray, h: int, hp: int) -> jnp.ndarray:
    """Pad the trailing 4H axis to per-gate Hp blocks (no-op if Hp == H)."""
    if hp == h:
        return x
    shp = x.shape[:-1]
    x = x.reshape(*shp, 4, h)
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, hp - h)])
    return x.reshape(*shp, 4 * hp)


def _intervals(lengths: jnp.ndarray, t: int, bp: int, hp: int):
    """Per-direction valid-frame [start, end) tables, (2, Bp, L) f32."""
    b = lengths.shape[0]
    lens = jnp.pad(lengths.astype(jnp.float32), (0, bp - b))
    tcf = jnp.float32(t)
    # fwd valid frames [0, len); bwd (flipped sequence) [T-len, T)
    s = jnp.stack([jnp.zeros_like(lens), tcf - lens])  # (2, Bp)
    e = jnp.stack([lens, jnp.broadcast_to(tcf, lens.shape)])
    l = min(hp, 128)
    return (
        jnp.broadcast_to(s[..., None], (2, bp, l)),
        jnp.broadcast_to(e[..., None], (2, bp, l)),
    )


def infer_fits(b: int, h: int, itemsize: int = 2) -> bool:
    """Can hidden dim H run in the serving kernels at all?

    The gate-stream fallback inside blstm_infer handles any INPUT dim,
    but W_h and the h/c carries stay VMEM-resident in both variants;
    beyond this H the caller should keep the XLA scan (budget mirrors
    the gx fallback's scratch_shapes below).
    """
    bp = _round_up(b, 8)
    hp = _round_up(h, 128)
    wh_b = 2 * hp * 4 * hp * itemsize
    states = 2 * (2 * bp * hp * 4)          # h + c carries, f32
    gh = 2 * 2 * bp * 4 * hp * 4            # gate recompute buffer
    stage = 2 * 2 * 1 * bp * hp * 4         # output staging
    ivals = 2 * (2 * bp * min(hp, 128) * 4)  # s/e interval tables
    return wh_b + states + gh + stage + ivals <= _VMEM_BUDGET


def blstm_infer(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    wx: jnp.ndarray,
    wh: jnp.ndarray,
    bias: jnp.ndarray,
    interpret: Optional[bool] = None,
    chunk: Optional[int] = None,
) -> jnp.ndarray:
    """Bidirectional masked-LSTM forward in one fused kernel.

    Args:
      x: (B, T, D) input sequence (any float dtype; cast to ``wx.dtype``).
      lengths: (B,) int32 valid-frame counts — the mask is the interval
        mask of these lengths (fwd [0, len); bwd on the flipped padded
        sequence [T-len, T)).
      wx: (2, D, 4H) input weights in the module's compute dtype.
      wh: (2, H, 4H) recurrent weights, same dtype.
      bias: (2, 4H) f32 gate bias.

    Returns:
      (B, T, 2H) hidden states in the compute dtype (fwd ++ bwd), pad
      frames zero, backward direction already un-flipped.
    """
    b, t, d = x.shape
    four_h = wh.shape[-1]
    h = four_h // 4
    hp = _round_up(h, 128)
    bp = _round_up(b, 8)
    cdtype = wx.dtype

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    whp = _pad_gate_axis(jnp.pad(wh, ((0, 0), (0, hp - h), (0, 0))), h, hp)
    biasp = _pad_gate_axis(bias.astype(jnp.float32), h, hp)[:, None, :]
    itemsize = jnp.dtype(cdtype).itemsize

    # ---- variant selection by VMEM working set ----
    dp = _round_up(d, 128)
    wx_bytes = 2 * dp * 4 * hp * itemsize
    wh_bytes = 2 * hp * 4 * hp * itemsize
    state_bytes = 2 * (2 * bp * hp * 4)  # h + c, f32
    fixed = wx_bytes + wh_bytes + state_bytes + 2 * (2 * bp * 128 * 4)
    if chunk is None:
        # v5e-swept preference (scripts/bench_blstm.py): 2-frame chunks
        # edge out 1/4/8 at enhancer and encoder shapes — the serial
        # h-dot chain dominates, so chunking only needs to keep the input
        # DMA + x-projection off the critical path, which f=2 already does
        # with the smallest obuf-drain stalls.
        for f in (2, 4, 8, 1):
            xbuf = 2 * 2 * f * bp * dp * itemsize
            gxbuf = 2 * f * bp * 4 * hp * 4
            obuf = 2 * 2 * f * bp * hp * itemsize
            if fixed + xbuf + gxbuf + obuf <= _VMEM_BUDGET:
                chunk = f
                break

    if chunk is not None:
        tp = _round_up(t, chunk)
        # per-direction frame-major streams; dummy tail frames are masked
        # off by e <= T
        xs = jnp.stack([x, jnp.flip(x, axis=1)]).astype(cdtype)  # (2,B,T,D)
        xs = jnp.transpose(xs, (0, 2, 1, 3))  # (2, T, B, D)
        xs = jnp.pad(
            xs, ((0, 0), (0, tp - t), (0, bp - b), (0, dp - d))
        )
        wxp = _pad_gate_axis(
            jnp.pad(wx, ((0, 0), (0, dp - d), (0, 0))), h, hp
        )
        s, e = _intervals(lengths, t, bp, hp)
        out = pl.pallas_call(
            _fused_kernel(tp, chunk, bp, dp, hp, cdtype, cdtype),
            out_shape=jax.ShapeDtypeStruct((tp, 2, bp, hp), cdtype),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # xs streams via DMA
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, bp, hp), jnp.float32),  # h
                pltpu.VMEM((2, bp, hp), jnp.float32),  # c
                pltpu.VMEM((2, 2, chunk, bp, dp), cdtype),  # x double buf
                pltpu.VMEM((2, chunk, bp, 4 * hp), jnp.float32),  # gx
                pltpu.VMEM((2, 2, chunk, bp, hp), cdtype),  # out double buf
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * tp * bp * (dp + hp) * 4 * hp,
                bytes_accessed=itemsize
                * (tp * 2 * bp * dp + tp * 2 * bp * hp),
                transcendentals=5 * 2 * tp * bp * hp,
            ),
        )(xs, wxp, whp, biasp, s, e)
        # bwd real frames sit at rows [Tp-T, Tp) (dummy tail wrote the
        # leading rows, all zeros by masking)
        y = jnp.concatenate(
            [out[:t, 0, :b, :h], out[tp - t:, 1, :b, :h]], axis=-1
        )
        return jnp.transpose(y, (1, 0, 2))

    # ---- fallback: stream pre-projected gates (large D, e.g. VGG out) ----
    xs = jnp.stack([x, jnp.flip(x, axis=1)])  # (2, B, T, D)
    gates_x = (
        jnp.einsum(
            "zbtd,zdg->tzbg", xs.astype(cdtype), wx,
            preferred_element_type=jnp.float32,
        )
        + bias.astype(jnp.float32)[None, :, None, :]
    )
    gx = _pad_gate_axis(gates_x, h, hp)
    if bp != b:
        gx = jnp.pad(gx, ((0, 0), (0, 0), (0, bp - b), (0, 0)))
    s, e = _intervals(lengths, t, bp, hp)
    out = pl.pallas_call(
        _gx_kernel(t, bp, hp, cdtype),
        out_shape=jax.ShapeDtypeStruct((t, 2, bp, hp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, bp, hp), jnp.float32),
            pltpu.VMEM((2, bp, hp), jnp.float32),
            pltpu.VMEM((2, 2, bp, 4 * hp), jnp.float32),
            pltpu.VMEM((2, 2, 1, bp, hp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * t * bp * hp * 4 * hp,
            bytes_accessed=4 * (t * 2 * bp * 4 * hp + t * 2 * bp * hp),
            transcendentals=5 * 2 * t * bp * hp,
        ),
    )(gx, whp, s, e)
    y = jnp.concatenate([out[:, 0, :b, :h], out[:, 1, :b, :h]], axis=-1)
    return jnp.transpose(y, (1, 0, 2)).astype(cdtype)
