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
            att_ref[bi] = att2d[...]
            ctx_ref[bi] = jax.lax.dot(
                att2d[...], enc_ref[bi].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )  # (K, E) f32

    return kernel


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
