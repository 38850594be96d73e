"""Fused Pallas kernel for the beam-search RNNLM step (shallow fusion).

Why: with ``--lm-dir`` active, every beam decode step runs the LM chain —
embedding gather, L stacked LSTM cells, vocabulary readout — as ~6 small
XLA ops over the (B*K, ·) lanes, each with launch overhead and HBM
round-trips of the gate/hidden intermediates (the same cost shape the
fully-fused decoder step removed from the attention side,
ops/att_pallas.py::att_dec_step_fused). This kernel runs the whole LM step
in ONE Mosaic program: the embedding is a one-hot matmul against the
VMEM-resident table (exact table rows, Mosaic has no gather), the per-layer
cell weights stay in VMEM, and only the token ids, the (L, N, H) state and
the (N, V) logits touch HBM.

Numerics follow the kernel convention of this codebase (same as the
BLSTM/decoder-step kernels): the f32 carries round to the compute dtype
for the recurrent MXU dots, f32 accumulation everywhere; f32 serving is
tolerance-level identical to the XLA path (tests/test_lm_pallas.py).

Reference parity: SURVEY.md section 2a "CTC prefix scorer" row / call
stack 3.2 — the ESPnet-lineage ``recognize_beam`` fuses an optional RNNLM
term; this is its serving fast path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from robust_e2e_gan_tpu.ops.att_pallas import _round_up, _VMEM_LIMIT

_BUDGET = 48 * 1024 * 1024


def _kernel(n: int, vp: int, embp: int, hp: int, layers: int, cdtype):
    def kernel(tokr_ref, embt_ref, wx0_ref, wxs_ref, whs_ref, bias_ref,
               wout_ref, bout_ref, hin_ref, cin_ref,
               logits_ref, hout_ref, cout_ref):
        # tokr_ref: (N, Vp) f32 — token ids lane-replicated
        # embt_ref: (Vp, EMBp) cdtype
        # wx0_ref:  (EMBp, 4Hp) cdtype — layer-0 input weights
        # wxs_ref:  (max(L-1,1), Hp, 4Hp) cdtype — deeper-layer inputs
        # whs_ref:  (L, Hp, 4Hp) cdtype; bias_ref: (L, 1, 4Hp) f32
        # wout_ref: (Hp, Vp) cdtype; bout_ref: (1, Vp) f32
        # hin/cin:  (L, N, Hp) f32; outputs mirror
        tokrep = tokr_ref[...]
        # tpu.iota only produces integers (Mosaic rejects a float iota);
        # generate int32 and convert for the f32 token-id compare
        lane = jax.lax.broadcasted_iota(jnp.int32, (n, vp), 1).astype(
            jnp.float32
        )
        onehot = (lane == tokrep).astype(cdtype)
        inp = jnp.dot(
            onehot, embt_ref[...], preferred_element_type=jnp.float32
        ).astype(cdtype)  # (N, EMBp) — exact table rows
        for li in range(layers):
            wx = wx0_ref[...] if li == 0 else wxs_ref[li - 1]
            gates = (
                jnp.dot(inp, wx, preferred_element_type=jnp.float32)
                + jnp.dot(
                    hin_ref[li].astype(cdtype), whs_ref[li],
                    preferred_element_type=jnp.float32,
                )
                + bias_ref[li, 0, :]
            )
            gi = gates[:, 0 * hp:1 * hp]
            gf = gates[:, 1 * hp:2 * hp]
            gg = gates[:, 2 * hp:3 * hp]
            go = gates[:, 3 * hp:4 * hp]
            c_new = (jax.nn.sigmoid(gf) * cin_ref[li]
                     + jax.nn.sigmoid(gi) * jnp.tanh(gg))
            h_new = jax.nn.sigmoid(go) * jnp.tanh(c_new)
            hout_ref[li] = h_new
            cout_ref[li] = c_new
            inp = h_new.astype(cdtype)
        logits_ref[...] = (
            jnp.dot(inp, wout_ref[...], preferred_element_type=jnp.float32)
            + bout_ref[0, :]
        )

    return kernel


def lm_step_plan(n, v, embd, h, layers, cdtype) -> bool:
    """Do these LM shapes fit the fused step kernel?"""
    it = jnp.dtype(cdtype).itemsize
    vp = _round_up(v, 128)
    embp = _round_up(embd, 128)
    hp = _round_up(h, 128)
    np_ = _round_up(n, 8)
    vmem = (
        it * (vp * embp + embp * 4 * hp
              + (max(layers - 1, 1)) * hp * 4 * hp
              + layers * hp * 4 * hp + hp * vp)
        + 4 * layers * (2 * np_ * hp * 2 + np_ * 4 * hp)
        + 4 * np_ * (vp * 2 + embp)
    )
    return vmem <= _BUDGET


def lm_step_fused(
    tok: jnp.ndarray,
    emb_table: jnp.ndarray,
    cell_wxs: Tuple[jnp.ndarray, ...],
    cell_whs: Tuple[jnp.ndarray, ...],
    cell_biases: Tuple[jnp.ndarray, ...],
    out_w: jnp.ndarray,
    out_b: jnp.ndarray,
    h_prev: jnp.ndarray,
    c_prev: jnp.ndarray,
    dtype=jnp.float32,
    interpret: Optional[bool] = None,
) -> Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """One fused LM step.

    Args:
      tok: (N,) int32 token ids (already >= 0).
      emb_table: (V, EMB) f32 master table.
      cell_wxs/cell_whs/cell_biases: per-layer LSTM weights — wxs[0] is
        (EMB, 4H), deeper layers (H, 4H); whs (H, 4H); biases (4H,) f32.
      out_w: (H, V); out_b: (V,).
      h_prev/c_prev: (L, N, H) f32.

    Returns (h_new (L, N, H) f32, c_new, logits (N, V) f32) or None when
    the shapes don't fit (caller uses the XLA path).
    """
    n = tok.shape[0]
    v, embd = emb_table.shape
    layers, _, h = h_prev.shape
    cdtype = jnp.dtype(dtype)
    if not lm_step_plan(n, v, embd, h, layers, cdtype):
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    vp = _round_up(v, 128)
    embp = _round_up(embd, 128)
    hp = _round_up(h, 128)
    np_ = _round_up(n, 8)

    from robust_e2e_gan_tpu.ops.att_pallas import pad_gate_rows

    def pad_gates(w, rows, rowsp):
        return pad_gate_rows(w, rows, rowsp, h, hp)

    tokr = jnp.pad(
        jnp.broadcast_to(tok.astype(jnp.float32)[:, None], (n, vp)),
        ((0, np_ - n), (0, 0)), constant_values=-1.0,
    )
    embt = jnp.pad(
        emb_table.astype(cdtype), ((0, vp - v), (0, embp - embd))
    )
    wx0 = pad_gates(cell_wxs[0].astype(cdtype), embd, embp)
    if layers > 1:
        wxs = jnp.stack(
            [pad_gates(w.astype(cdtype), h, hp) for w in cell_wxs[1:]]
        )
    else:
        wxs = jnp.zeros((1, hp, 4 * hp), cdtype)
    whs = jnp.stack(
        [pad_gates(w.astype(cdtype), h, hp) for w in cell_whs]
    )
    biases = jnp.stack([
        jnp.pad(b.astype(jnp.float32).reshape(4, h),
                ((0, 0), (0, hp - h))).reshape(1, 4 * hp)
        for b in cell_biases
    ])
    wout = jnp.pad(out_w.astype(cdtype), ((0, hp - h), (0, vp - v)))
    bout = jnp.pad(out_b.astype(jnp.float32), (0, vp - v))[None, :]
    hin = jnp.pad(
        h_prev.astype(jnp.float32), ((0, 0), (0, np_ - n), (0, hp - h))
    )
    cin = jnp.pad(
        c_prev.astype(jnp.float32), ((0, 0), (0, np_ - n), (0, hp - h))
    )

    logits, hout, cout = pl.pallas_call(
        _kernel(np_, vp, embp, hp, layers, cdtype),
        out_shape=(
            jax.ShapeDtypeStruct((np_, vp), jnp.float32),
            jax.ShapeDtypeStruct((layers, np_, hp), jnp.float32),
            jax.ShapeDtypeStruct((layers, np_, hp), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * (vp * embp + layers * (embp + hp) * 4 * hp
                             + hp * vp),
            bytes_accessed=4 * np_ * (128 + vp + layers * 4 * hp),
            transcendentals=5 * layers * np_ * hp,
        ),
    )(tokr, embt, wx0, wxs, whs, biases, wout, bout, hin, cin)
    return hout[:, :n, :h], cout[:, :n, :h], logits[:n, :v]
