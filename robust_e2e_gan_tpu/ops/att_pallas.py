"""Fused Pallas TPU kernel for the beam-mode location-attention step.

Why: the per-step score path of the batched beam search materializes the
location projection as a (B, K, T, A) tensor through HBM (~91 MB bf16 at
bench shapes) and then re-reads it fused with the enc_proj/dec broadcast
adds, tanh, g-reduction and softmax — measured ~0.42 ms of the ~0.51 ms
decoder chain per decode step (ablation: /tmp probe, recorded in
PARITY.md round-3 additions). This kernel keeps the whole step VMEM-
resident per utterance tile:

  * the location projection, the dec-state term and the tanh-score
    reduction never touch HBM — only the conv features (B, K, T, C),
    enc_proj, enc and the per-step dec projections stream in, and ctx/att
    stream out (~30 MB/step vs ~200 MB);
  * the C=10-channel projection pads its MXU contraction to 128 lanes
    (unavoidable; XLA pays the same tax) — the pad columns are used
    PRODUCTIVELY: per-beam dec columns ride in lanes C..C+K of the same
    matmul against constant 0/1 indicator rows, so the dec broadcast
    costs zero extra MXU passes;
  * the segmented (per-beam) softmax avoids lane<->sublane relayouts by
    computing segment sums with two tiny 0/1-matrix matmuls;
  * the context matmul (K, Tp) x (Tp, E) runs per utterance in f32 on
    rows assembled by aligned lane-slice copies.

Numerics: identical operand dtypes and f32 accumulation as the XLA path
(models/attention.py::AttLoc beam mode). The (ep + loc) + dec add order
becomes (loc + dec) + ep inside the fused matmul — a bf16-rounding-level
difference, covered by the equivalence tests' tolerance; exact-parity
paths (CPU host oracle, training) use the XLA implementation.

Reference parity: SURVEY.md section 2a "Attention" (ESPnet AttLoc) — this
is the serving fast path for exactly that computation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_MIN = -1e9
# VMEM ceiling for the per-grid-step working set; above this the caller
# must use the XLA path (wrapper returns None).
_VMEM_BUDGET = 64 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(bb: int, k: int, tp: int, cp: int, a: int, e: int, sharpening: float,
            cdtype):
    ktp = k * tp

    def kernel(feat_ref, ept_ref, enc_ref, dect_ref, wloct_ref, g_ref,
               tval_ref, ctx_ref, att_ref, lhs, rhs, work, att2d, st_f, s_f):
        # feat_ref: (BB, CP, K*Tp) cdtype — conv features, channel-major
        # ept_ref:  (BB, A, Tp) cdtype — enc_proj transposed
        # enc_ref:  (BB, Tp, E) cdtype
        # dect_ref: (BB, A, K) cdtype — per-step dec projections, transposed
        # wloct_ref:(A, CP) cdtype; g_ref: (1, A) cdtype
        # tval_ref: (BB, 1, K*Tp) f32 — 1.0 on valid frame lanes
        # ctx_ref:  (BB, K, E) f32; att_ref: (BB, K, Tp) f32
        # scratch: lhs (A, 128) cdtype; rhs (128, K*Tp) cdtype;
        #          work (A, K*Tp) cdtype; att2d (K, Tp) f32;
        #          st_f (K*Tp, K) f32; s_f (K, K*Tp) f32

        # ---- constants shared by every utterance and every grid step
        # (scratch persists across the sequential TPU grid: build once)
        @pl.when(pl.program_id(0) == 0)
        def _():
            sub_i = jax.lax.broadcasted_iota(jnp.int32, (k, ktp), 0)
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (k, ktp), 1)
            seg = (lane_i // tp == sub_i)
            s_f[...] = seg.astype(jnp.float32)
            sub_t = jax.lax.broadcasted_iota(jnp.int32, (ktp, k), 0)
            lane_t = jax.lax.broadcasted_iota(jnp.int32, (ktp, k), 1)
            st_f[...] = (sub_t // tp == lane_t).astype(jnp.float32)
            rhs[...] = jnp.zeros((128, ktp), cdtype)
            rhs[cp:cp + k, :] = seg.astype(cdtype)
            lhs[...] = jnp.zeros((a, 128), cdtype)
            lhs[:, 0:cp] = wloct_ref[...]

        for bi in range(bb):
            ctx = _att_one(
                bi, k, tp, cp, sharpening, cdtype, feat_ref, ept_ref,
                enc_ref, dect_ref, g_ref, tval_ref, lhs, rhs, work, att2d,
                st_f, s_f,
            )
            att_ref[bi] = att2d[...]
            ctx_ref[bi] = ctx

    return kernel


def _att_one(bi, k, tp, cp, sharpening, cdtype, feat_ref, ept_ref, enc_ref,
             dect_ref, g_ref, tval_ref, lhs, rhs, work, att2d, st_f, s_f):
    """Attention for utterance ``bi`` of the tile: leaves the per-beam
    alignment in the att2d scratch and returns the (K, E) f32 context."""
    rhs[0:cp, :] = feat_ref[bi]
    lhs[:, cp:cp + k] = dect_ref[bi]
    # loc projection + dec broadcast in ONE padded matmul
    ld = jax.lax.dot(
        lhs[...], rhs[...], preferred_element_type=jnp.float32
    ).astype(cdtype)  # (A, K*Tp)
    ep = ept_ref[bi]  # (A, Tp)
    for ki in range(k):
        work[:, ki * tp:(ki + 1) * tp] = (
            ld[:, ki * tp:(ki + 1) * tp] + ep
        )
    th = jnp.tanh(work[...])
    e_row = jax.lax.dot(
        g_ref[...], th, preferred_element_type=jnp.float32
    )  # (1, K*Tp) f32
    tv = tval_ref[bi]  # (1, K*Tp) f32
    e_row = jnp.where(
        tv > 0.0, jnp.float32(sharpening) * e_row, _MASK_MIN
    )
    m_glob = jnp.max(e_row)
    ex = jnp.exp(e_row - m_glob) * tv  # exact zeros on pad lanes
    ssum = jax.lax.dot(
        ex, st_f[...], preferred_element_type=jnp.float32
    )  # (1, K)
    den = jax.lax.dot(
        ssum, s_f[...], preferred_element_type=jnp.float32
    )  # (1, K*Tp)
    att_row = ex / jnp.maximum(den, 1e-8)
    for ki in range(k):
        att2d[ki:ki + 1, :] = att_row[:, ki * tp:(ki + 1) * tp]
    return jax.lax.dot(
        att2d[...], enc_ref[bi].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )  # (K, E) f32


def pad_gate_rows(w, rows, rowsp, h, hp):
    """Pad (rows, 4h) LSTM weights to (rowsp, 4hp) in per-gate blocks
    (shared by the decoder-step and LM-step kernels)."""
    w = w.reshape(rows, 4, h)
    w = jnp.pad(w, ((0, rowsp - rows), (0, 0), (0, hp - h)))
    return w.reshape(rowsp, 4 * hp)


def att_loc_plan(b, k, t, c, a, e, cdtype, block_b=None):
    """Pick the utterance tile (block_b) for these shapes, or None when
    they exceed this kernel's working-set budget (caller uses XLA)."""
    tp = _round_up(max(t, 128), 128)
    ap = _round_up(a, 128)
    ep_ = _round_up(e, 128)
    cp = _round_up(c, 8)
    ktp = k * tp
    if cp + k > 128:
        return None
    itemsize = jnp.dtype(cdtype).itemsize
    if block_b is not None:
        bb = block_b
    else:
        # v5e-swept utterance tile (scripts/bench_att.py): 8 beats 4/16 at
        # bench shapes; shrink only to divide small batches
        bb = 8 if b % 8 == 0 else (4 if b % 4 == 0 else (2 if b % 2 == 0 else 1))
    # working set: blocks + scratch
    vmem = (
        bb * (cp * ktp + ap * tp + tp * ep_ + ap * k) * itemsize  # inputs
        + bb * 1 * ktp * 4  # tval
        + bb * (k * ep_ + k * tp) * 4  # outputs
        + (ap * 128 + 128 * ktp + ap * ktp) * itemsize  # lhs/rhs/work
        + (k * tp + ktp * k + k * ktp) * 4  # att2d/st/s
    )
    if vmem > _VMEM_BUDGET:
        return None
    return bb


def att_loc_fused(
    feat: jnp.ndarray,
    enc_proj: jnp.ndarray,
    enc: jnp.ndarray,
    dec: jnp.ndarray,
    wloc: jnp.ndarray,
    g: jnp.ndarray,
    mask: jnp.ndarray,
    sharpening: float,
    interpret: Optional[bool] = None,
    block_b: Optional[int] = None,
) -> Optional[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Fused beam-mode attention step.

    Args:
      feat: (B, K, T, C) location-conv features (compute dtype).
      enc_proj: (B, T, A) precomputed encoder projection.
      enc: (B, T, E) encoder outputs.
      dec: (B, K, A) per-step decoder-state projections.
      wloc: (C, A) location-projection kernel.
      g: (A,) score vector (compute dtype).
      mask: (B, T) frame-validity mask (interval/length mask).
      sharpening: static pre-softmax scale.

    Returns:
      (ctx (B, K, E) f32, att (B, K, T) f32), or None if the shapes don't
      fit this kernel's working-set budget (caller falls back to XLA).
    """
    b, k, t, c = feat.shape
    a = enc_proj.shape[-1]
    e = enc.shape[-1]
    cdtype = enc.dtype

    bb = att_loc_plan(b, k, t, c, a, e, cdtype, block_b)
    if bb is None:
        return None
    itemsize = jnp.dtype(cdtype).itemsize
    tp = _round_up(max(t, 128), 128)
    ap = _round_up(a, 128)
    ep_ = _round_up(e, 128)
    cp = _round_up(c, 8)
    ktp = k * tp

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    bp = _round_up(b, bb)
    # channel-major conv features: (B, K, T, C) -> (B, CP, K*Tp)
    featp = jnp.pad(
        feat.astype(cdtype),
        ((0, bp - b), (0, 0), (0, tp - t), (0, cp - c)),
    )
    featp = jnp.transpose(featp, (0, 3, 1, 2)).reshape(bp, cp, ktp)
    ept = jnp.pad(
        jnp.transpose(enc_proj.astype(cdtype), (0, 2, 1)),
        ((0, bp - b), (0, ap - a), (0, tp - t)),
    )
    encp = jnp.pad(
        enc.astype(cdtype), ((0, bp - b), (0, tp - t), (0, ep_ - e))
    )
    dect = jnp.pad(
        jnp.transpose(dec.astype(cdtype), (0, 2, 1)),
        ((0, bp - b), (0, ap - a), (0, 0)),
    )
    wloct = jnp.pad(wloc.T.astype(cdtype), ((0, ap - a), (0, cp - c)))
    g2 = jnp.pad(g.astype(cdtype)[None, :], ((0, 0), (0, ap - a)))
    # per-lane frame validity, tiled per beam block: (B, 1, K*Tp)
    mp = jnp.pad(
        (mask > 0).astype(jnp.float32), ((0, bp - b), (0, tp - t))
    )
    tval = jnp.tile(mp, (1, k))[:, None, :]

    grid = (bp // bb,)
    ctx, att = pl.pallas_call(
        _kernel(bb, k, tp, cp, ap, ep_, sharpening, cdtype),
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((bp, k, ep_), jnp.float32),
            jax.ShapeDtypeStruct((bp, k, tp), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((bb, cp, ktp), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, ap, tp), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, tp, ep_), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, ap, k), lambda i: (i, 0, 0)),
            pl.BlockSpec((ap, cp), lambda i: (0, 0)),
            pl.BlockSpec((1, ap), lambda i: (0, 0)),
            pl.BlockSpec((bb, 1, ktp), lambda i: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((bb, k, ep_), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, k, tp), lambda i: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((ap, 128), cdtype),  # lhs
            pltpu.VMEM((128, ktp), cdtype),  # rhs
            pltpu.VMEM((ap, ktp), cdtype),  # work
            pltpu.VMEM((k, tp), jnp.float32),  # att2d
            pltpu.VMEM((ktp, k), jnp.float32),  # st
            pltpu.VMEM((k, ktp), jnp.float32),  # s
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * k * tp * 128 * ap + 2 * bp * k * tp * ap,
            bytes_accessed=itemsize * bp * (cp * ktp + ap * tp + tp * ep_)
            + 4 * bp * k * (tp + ep_),
            transcendentals=2 * bp * ap * ktp,
        ),
    )(featp, ept, encp, dect, wloct, g2, tval)
    return ctx[:b, :, :e], att[:b, :, :t]


# --------------------------------------------------------------------------
# full decoder step: attention + embedding + LSTM cell + readout, one kernel
# --------------------------------------------------------------------------


def _kernel_step(bb: int, k: int, tp: int, cp: int, a: int, e: int,
                 vp: int, embp: int, hp: int, sharpening: float, cdtype):
    ktp = k * tp
    n = bb * k

    def kernel(feat_ref, ept_ref, enc_ref, dect_ref, wloct_ref, g_ref,
               tval_ref, tokr_ref, embt_ref, wxe_ref, wxc_ref, whc_ref,
               bcell_ref, wz_ref, wc_ref, bout_ref, zin_ref, cin_ref,
               logits_ref, att_ref, zn_ref, cn_ref,
               lhs, rhs, work, att2d, st_f, s_f, ctxbuf):
        # extra inputs vs _kernel:
        #   tokr_ref: (BB, K, Vp) f32 — token ids lane-replicated
        #   embt_ref: (Vp, EMBp) cdtype — embedding table
        #   wxe/wxc:  (EMBp, 4Hp) / (E, 4Hp) cdtype — cell input weights,
        #             split at the [emb | ctx] concat boundary
        #   whc_ref:  (Hp, 4Hp) cdtype; bcell_ref: (1, 4Hp) f32
        #   wz/wc:    (Hp, Vp) / (E, Vp) cdtype — readout split [z | ctx]
        #   bout_ref: (1, Vp) f32
        #   zin/cin:  (BB, K, Hp) f32 — decoder LSTM state
        # extra outputs: logits (BB, K, Vp) f32; zn/cn (BB, K, Hp) f32

        @pl.when(pl.program_id(0) == 0)
        def _():
            sub_i = jax.lax.broadcasted_iota(jnp.int32, (k, ktp), 0)
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (k, ktp), 1)
            seg = (lane_i // tp == sub_i)
            s_f[...] = seg.astype(jnp.float32)
            sub_t = jax.lax.broadcasted_iota(jnp.int32, (ktp, k), 0)
            lane_t = jax.lax.broadcasted_iota(jnp.int32, (ktp, k), 1)
            st_f[...] = (sub_t // tp == lane_t).astype(jnp.float32)
            rhs[...] = jnp.zeros((128, ktp), cdtype)
            rhs[cp:cp + k, :] = seg.astype(cdtype)
            lhs[...] = jnp.zeros((a, 128), cdtype)
            lhs[:, 0:cp] = wloct_ref[...]

        for bi in range(bb):
            ctx = _att_one(
                bi, k, tp, cp, sharpening, cdtype, feat_ref, ept_ref,
                enc_ref, dect_ref, g_ref, tval_ref, lhs, rhs, work, att2d,
                st_f, s_f,
            )
            att_ref[bi] = att2d[...]
            ctxbuf[bi * k:(bi + 1) * k, :] = ctx

        # ---- batched post-attention stage over all N = BB*K lanes ----
        ctxc = ctxbuf[...].astype(cdtype)  # (N, E)
        # embedding as a one-hot matmul (Mosaic has no gather); token ids
        # arrive lane-replicated so no lane broadcast is needed
        tokrep = tokr_ref[...].reshape(n, vp)
        # tpu.iota only produces integers (Mosaic rejects a float iota);
        # generate int32 and convert for the f32 token-id compare
        lane = jax.lax.broadcasted_iota(jnp.int32, (n, vp), 1).astype(
            jnp.float32
        )
        onehot = (lane == tokrep).astype(cdtype)
        embrow = jnp.dot(
            onehot, embt_ref[...], preferred_element_type=jnp.float32
        ).astype(cdtype)  # (N, EMBp) — exact table rows
        zrow = zin_ref[...].reshape(n, hp)
        gx = (
            jnp.dot(embrow, wxe_ref[...],
                    preferred_element_type=jnp.float32)
            + jnp.dot(ctxc, wxc_ref[...],
                      preferred_element_type=jnp.float32)
        )
        # NOTE bf16 serving: the f32 LSTM state rounds to the compute
        # dtype for this MXU dot, while the XLA cell promotes wh to f32
        # instead — a bf16-rounding-level gate difference (same convention
        # as the BLSTM kernels; f32 serving is bit-consistent, and the
        # bf16 WER-parity gate lives in scripts/verify_drive.py)
        gh = jnp.dot(
            zrow.astype(cdtype), whc_ref[...],
            preferred_element_type=jnp.float32,
        )
        gates = (gx + gh) + bcell_ref[0, :]
        gi = gates[:, 0 * hp:1 * hp]
        gf = gates[:, 1 * hp:2 * hp]
        gg = gates[:, 2 * hp:3 * hp]
        go = gates[:, 3 * hp:4 * hp]
        c_prev = cin_ref[...].reshape(n, hp)
        c_new = (jax.nn.sigmoid(gf) * c_prev
                 + jax.nn.sigmoid(gi) * jnp.tanh(gg))
        z_new = jax.nn.sigmoid(go) * jnp.tanh(c_new)
        logits = (
            jnp.dot(z_new.astype(cdtype), wz_ref[...],
                    preferred_element_type=jnp.float32)
            + jnp.dot(ctxc, wc_ref[...],
                      preferred_element_type=jnp.float32)
            + bout_ref[0, :]
        )
        logits_ref[...] = logits.reshape(bb, k, vp)
        zn_ref[...] = z_new.reshape(bb, k, hp)
        cn_ref[...] = c_new.reshape(bb, k, hp)

    return kernel


def att_dec_plan(b, k, t, c, a, e, v, embd, h, cdtype, block_b=None):
    """block_b for the full decoder-step kernel, or None -> XLA path."""
    bb = att_loc_plan(b, k, t, c, a, e, cdtype, block_b)
    if bb is None:
        return None
    itemsize = jnp.dtype(cdtype).itemsize
    ep_ = _round_up(e, 128)
    vp = _round_up(v, 128)
    embp = _round_up(embd, 128)
    hp = _round_up(h, 128)
    n = bb * k
    extra = (
        itemsize * (vp * embp + embp * 4 * hp + ep_ * 4 * hp
                    + hp * 4 * hp + hp * vp + ep_ * vp)  # weights
        + 4 * n * ep_  # ctxbuf
        + 4 * n * (4 * hp * 3 + vp * 3 + 2 * hp)  # stage intermediates
        + 4 * bb * k * (vp + 2 * hp + vp)  # tok/z/c/logit blocks
    )
    if extra > 16 * 1024 * 1024:
        return None
    return bb


def att_dec_step_fused(
    feat: jnp.ndarray,
    enc_proj: jnp.ndarray,
    enc: jnp.ndarray,
    dec: jnp.ndarray,
    wloc: jnp.ndarray,
    g: jnp.ndarray,
    mask: jnp.ndarray,
    sharpening: float,
    tok: jnp.ndarray,
    emb_table: jnp.ndarray,
    cell_wx: jnp.ndarray,
    cell_wh: jnp.ndarray,
    cell_bias: jnp.ndarray,
    out_w: jnp.ndarray,
    out_b: jnp.ndarray,
    z_prev: jnp.ndarray,
    c_prev: jnp.ndarray,
    interpret: Optional[bool] = None,
    block_b: Optional[int] = None,
) -> Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """FULL fused beam decoder step: attention (as att_loc_fused) plus
    embedding lookup, single-layer LSTM cell and vocabulary readout in the
    SAME Mosaic program — the context, gate and tanh intermediates never
    touch HBM, and the ~8 small per-step XLA ops collapse into one launch.

    Extra args vs att_loc_fused:
      tok: (B, K) int32 token ids fed this step (already >= 0).
      emb_table: (V, EMB) embedding table (compute dtype).
      cell_wx: (EMB+E, 4H) cell input weights ([emb | ctx] rows).
      cell_wh: (H, 4H); cell_bias: (4H,) f32.
      out_w: (H+E, V) readout ([z | ctx] rows); out_b: (V,) f32.
      z_prev/c_prev: (B, K, H) f32 decoder LSTM state.

    Returns (logits (B, K, V) f32, att (B, K, T) f32, z_new (B, K, H) f32,
    c_new (B, K, H) f32), or None when the shapes don't fit (caller uses
    the XLA path). Requires a single decoder LSTM layer; the one-hot
    embedding handles any vocab (multi-lane-block when V > 128).
    """
    b, kk, t, c = feat.shape
    a = enc_proj.shape[-1]
    e = enc.shape[-1]
    v, embd = emb_table.shape
    h = cell_wh.shape[0]
    cdtype = enc.dtype

    bb = att_dec_plan(b, kk, t, c, a, e, v, embd, h, cdtype, block_b)
    if bb is None:
        return None
    itemsize = jnp.dtype(cdtype).itemsize
    tp = _round_up(max(t, 128), 128)
    ap = _round_up(a, 128)
    ep_ = _round_up(e, 128)
    cp = _round_up(c, 8)
    vp = _round_up(v, 128)
    embp = _round_up(embd, 128)
    hp = _round_up(h, 128)
    ktp = kk * tp

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    bp = _round_up(b, bb)
    featp = jnp.pad(
        feat.astype(cdtype),
        ((0, bp - b), (0, 0), (0, tp - t), (0, cp - c)),
    )
    featp = jnp.transpose(featp, (0, 3, 1, 2)).reshape(bp, cp, ktp)
    ept = jnp.pad(
        jnp.transpose(enc_proj.astype(cdtype), (0, 2, 1)),
        ((0, bp - b), (0, ap - a), (0, tp - t)),
    )
    encp = jnp.pad(
        enc.astype(cdtype), ((0, bp - b), (0, tp - t), (0, ep_ - e))
    )
    dect = jnp.pad(
        jnp.transpose(dec.astype(cdtype), (0, 2, 1)),
        ((0, bp - b), (0, ap - a), (0, 0)),
    )
    wloct = jnp.pad(wloc.T.astype(cdtype), ((0, ap - a), (0, cp - c)))
    g2 = jnp.pad(g.astype(cdtype)[None, :], ((0, 0), (0, ap - a)))
    mp = jnp.pad(
        (mask > 0).astype(jnp.float32), ((0, bp - b), (0, tp - t))
    )
    tval = jnp.tile(mp, (1, kk))[:, None, :]

    tokr = jnp.broadcast_to(
        tok.astype(jnp.float32)[..., None], (b, kk, vp)
    )
    tokr = jnp.pad(tokr, ((0, bp - b), (0, 0), (0, 0)),
                   constant_values=-1.0)  # pad rows match no vocab lane
    embt = jnp.pad(
        emb_table.astype(cdtype), ((0, vp - v), (0, embp - embd))
    )

    wxe = pad_gate_rows(cell_wx[:embd].astype(cdtype), embd, embp, h, hp)
    wxc = pad_gate_rows(cell_wx[embd:].astype(cdtype), e, ep_, h, hp)
    whc = pad_gate_rows(cell_wh.astype(cdtype), h, hp, h, hp)
    bcell = jnp.pad(
        cell_bias.astype(jnp.float32).reshape(4, h), ((0, 0), (0, hp - h))
    ).reshape(1, 4 * hp)
    wz = jnp.pad(out_w[:h].astype(cdtype), ((0, hp - h), (0, vp - v)))
    wc = jnp.pad(out_w[h:].astype(cdtype), ((0, ep_ - e), (0, vp - v)))
    bout = jnp.pad(out_b.astype(jnp.float32), (0, vp - v))[None, :]
    zin = jnp.pad(
        z_prev.astype(jnp.float32),
        ((0, bp - b), (0, 0), (0, hp - h)),
    )
    cin = jnp.pad(
        c_prev.astype(jnp.float32),
        ((0, bp - b), (0, 0), (0, hp - h)),
    )

    grid = (bp // bb,)
    logits, att, zn, cn = pl.pallas_call(
        _kernel_step(bb, kk, tp, cp, ap, ep_, vp, embp, hp, sharpening,
                     cdtype),
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((bp, kk, vp), jnp.float32),
            jax.ShapeDtypeStruct((bp, kk, tp), jnp.float32),
            jax.ShapeDtypeStruct((bp, kk, hp), jnp.float32),
            jax.ShapeDtypeStruct((bp, kk, hp), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((bb, cp, ktp), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, ap, tp), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, tp, ep_), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, ap, kk), lambda i: (i, 0, 0)),
            pl.BlockSpec((ap, cp), lambda i: (0, 0)),
            pl.BlockSpec((1, ap), lambda i: (0, 0)),
            pl.BlockSpec((bb, 1, ktp), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, kk, vp), lambda i: (i, 0, 0)),
            pl.BlockSpec((vp, embp), lambda i: (0, 0)),
            pl.BlockSpec((embp, 4 * hp), lambda i: (0, 0)),
            pl.BlockSpec((ep_, 4 * hp), lambda i: (0, 0)),
            pl.BlockSpec((hp, 4 * hp), lambda i: (0, 0)),
            pl.BlockSpec((1, 4 * hp), lambda i: (0, 0)),
            pl.BlockSpec((hp, vp), lambda i: (0, 0)),
            pl.BlockSpec((ep_, vp), lambda i: (0, 0)),
            pl.BlockSpec((1, vp), lambda i: (0, 0)),
            pl.BlockSpec((bb, kk, hp), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, kk, hp), lambda i: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((bb, kk, vp), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, kk, tp), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, kk, hp), lambda i: (i, 0, 0)),
            pl.BlockSpec((bb, kk, hp), lambda i: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((ap, 128), cdtype),  # lhs
            pltpu.VMEM((128, ktp), cdtype),  # rhs
            pltpu.VMEM((ap, ktp), cdtype),  # work
            pltpu.VMEM((kk, tp), jnp.float32),  # att2d
            pltpu.VMEM((ktp, kk), jnp.float32),  # st
            pltpu.VMEM((kk, ktp), jnp.float32),  # s
            pltpu.VMEM((bb * kk, ep_), jnp.float32),  # ctxbuf
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * kk * tp * 128 * ap
            + 2 * bp * kk * (embp + ep_ + hp) * 4 * hp,
            bytes_accessed=itemsize * bp * (cp * ktp + ap * tp + tp * ep_)
            + 4 * bp * kk * (tp + vp + 4 * hp),
            transcendentals=2 * bp * ap * ktp + 7 * bp * kk * hp,
        ),
    )(featp, ept, encp, dect, wloct, g2, tval, tokr, embt, wxe, wxc, whc,
      bcell, wz, wc, bout, zin, cin)
    return (
        logits[:b, :, :v], att[:b, :, :t], zn[:b, :, :h], cn[:b, :, :h]
    )
