"""Location-aware attention (Chorowski-style).

Reference parity: SURVEY.md section 2a "Attention" — ESPnet AttLoc: a 1-D
conv over the previous alignment plus additive (tanh) scoring, with a
sharpening scale on the pre-softmax logits. The encoder-side projection is
computed once per utterance *outside* the decode loop (one big MXU matmul)
and passed in; the per-step work is one conv over (B, T) alignments, two
small matmuls and a masked softmax — all batch-parallel, no host control
flow, so the same module drives teacher forcing, batched beam search and
streaming decode.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from robust_e2e_gan_tpu.config import AttentionConfig

_MASK_MIN = -1e9


def _gvec_score(mod: nn.Module, pre: jnp.ndarray) -> jnp.ndarray:
    """g . tanh(pre) as an elementwise multiply + lane reduction.

    Expressing the final projection as a Dense MATMUL forces XLA to
    materialize tanh(pre) — a (B[, K], T, A) tensor written and re-read
    through HBM every decode step (measured ~0.2 ms/step of the beam
    loop's decoder chain, results/beam_parts.json). As an elementwise
    mul + reduce it fuses with the add/tanh into one pass over the
    location projection. The Dense submodule is still instantiated (on an
    identity matrix, which returns exactly its kernel) so the parameter
    tree stays byte-compatible with checkpoints: att/gvec/kernel.
    """
    a = pre.shape[-1]
    g = nn.Dense(1, use_bias=False, dtype=mod.dtype, name="gvec")(
        jnp.eye(a, dtype=mod.dtype)
    )[:, 0]
    return jnp.sum(
        jnp.tanh(pre).astype(jnp.float32) * g.astype(jnp.float32), axis=-1
    )


class AttLoc(nn.Module):
    """One attention step.

    Inputs:
      enc:      (B, T, E) encoder outputs.
      enc_proj: (B, T, A) precomputed encoder projection (see
                ``encoder_projection``).
      mask:     (B, T) validity mask.
      dec_z:    (B, D) current decoder state — or (B, K, D) in BEAM mode.
      att_prev: (B, T) previous alignment (masked-uniform at step 0) — or
                (B, K, T) in beam mode.

    Returns (context (B, E), att (B, T)) — or ((B, K, E), (B, K, T)).

    Beam mode (dec_z.ndim == 3) is the decode hot path: K beams per
    utterance score against ONE copy of enc/enc_proj, broadcast on the
    beam axis, instead of the K-fold ``jnp.repeat`` the round-2 search
    used — that repeat made the per-step HBM reads of the two (·, T, A/E)
    tensors K x larger, the measured decoder-chain latency floor
    (PARITY.md micro-profile; round-2 VERDICT missing #6).
    """

    cfg: AttentionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        enc: jnp.ndarray,
        enc_proj: jnp.ndarray,
        mask: jnp.ndarray,
        dec_z: jnp.ndarray,
        att_prev: jnp.ndarray,
        step_pack=None,
    ) -> Tuple[jnp.ndarray, ...]:
        """step_pack (beam mode only): dict of decoder-step tensors
        (tok, emb_table, cell_wx, cell_wh, cell_bias, out_w, out_b,
        z_prev, c_prev) — when given and the fused FULL-step kernel fits,
        returns (logits, att, z_new, c_new) instead of (ctx, att), with
        the whole embed+attention+cell+readout step in one Mosaic program
        (ops/att_pallas.py::att_dec_step_fused)."""
        a = self.cfg.dim
        beam = dec_z.ndim == 3
        # conv over previous alignment: (N, T, 1) -> (N, T, C); beam lanes
        # flatten into the conv batch (parameters are shape-independent)
        ap = att_prev.reshape((-1,) + att_prev.shape[-1:]) if beam else att_prev
        loc = nn.Conv(
            self.cfg.conv_channels,
            (self.cfg.conv_kernel,),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            name="loc_conv",
        )(ap[..., None])
        mlp_loc = nn.Dense(a, use_bias=False, dtype=self.dtype, name="mlp_loc")
        dec = nn.Dense(a, use_bias=False, dtype=self.dtype, name="mlp_dec")(dec_z)
        if beam and self._fused_score():
            # serving fast path: the whole score+softmax+context step in
            # one Pallas program (ops/att_pallas.py) — the (B, K, T, A)
            # location projection never touches HBM. The kernels are read
            # through the same submodules (identity-matrix applies return
            # them), so the parameter tree matches the XLA path exactly.
            from robust_e2e_gan_tpu.ops.att_pallas import (
                att_loc_fused, att_loc_plan,
            )
            from robust_e2e_gan_tpu.parallel.sharding import (
                local_kernel_batch, sharded_kernel_call,
            )

            b, k, t = att_prev.shape
            c = self.cfg.conv_channels
            wloc = mlp_loc(jnp.eye(c, dtype=self.dtype))
            g = nn.Dense(1, use_bias=False, dtype=self.dtype, name="gvec")(
                jnp.eye(a, dtype=self.dtype)
            )[:, 0]
            # budget-plan on the PER-SHARD batch when a data mesh is
            # registered (the kernel then runs inside shard_map — XLA
            # cannot partition a pallas_call and would all-gather)
            local_b = local_kernel_batch(b)
            e_dim = enc.shape[-1]
            if step_pack is not None:
                from robust_e2e_gan_tpu.ops.att_pallas import (
                    att_dec_plan, att_dec_step_fused,
                )

                sp = step_pack
                v, embd = sp["emb_table"].shape
                h = sp["cell_wh"].shape[0]
                if att_dec_plan(
                    local_b, k, t, c, a, e_dim, v, embd, h, enc.dtype
                ) is not None:
                    sharp = self.cfg.sharpening

                    def _full(feat, ep, en, de, wl, gv, mk, tk, et, cwx,
                              cwh, cb, ow, ob, zp, cp_):
                        r = att_dec_step_fused(
                            feat, ep, en, de, wl, gv, mk, sharp, tk, et,
                            cwx, cwh, cb, ow, ob, zp, cp_,
                        )
                        assert r is not None  # per-shard plan checked
                        return r

                    call = sharded_kernel_call(
                        _full, b,
                        (True, True, True, True, False, False, True,
                         True, False, False, False, False, False, False,
                         True, True),
                        out_batched=(True, True, True, True),
                    )
                    return call(
                        loc.reshape(b, k, t, c), enc_proj, enc, dec,
                        wloc, g, mask, sp["tok"], sp["emb_table"],
                        sp["cell_wx"], sp["cell_wh"], sp["cell_bias"],
                        sp["out_w"], sp["out_b"], sp["z_prev"],
                        sp["c_prev"],
                    )
                # full-step kernel doesn't fit: fall through to the
                # attention-only fused path (caller runs the XLA cell)
            if att_loc_plan(local_b, k, t, c, a, e_dim, enc.dtype) is not None:
                sharp = self.cfg.sharpening

                def _fused(feat, ep, en, de, wl, gv, mk):
                    out = att_loc_fused(feat, ep, en, de, wl, gv, mk, sharp)
                    assert out is not None  # per-shard plan checked above
                    return out

                call = sharded_kernel_call(
                    _fused, b,
                    (True, True, True, True, False, False, True),
                    out_batched=(True, True),
                )
                ctx_f, att_f = call(
                    loc.reshape(b, k, t, c), enc_proj, enc, dec, wloc, g,
                    mask,
                )
                return ctx_f.astype(enc.dtype), att_f.astype(att_prev.dtype)
            # shapes outside the kernel's budget: fall through to XLA,
            # scoring through the already-declared gvec submodule
            loc = mlp_loc(loc)
            loc = loc.reshape(att_prev.shape + (a,))  # (B, K, T, A)
            pre = enc_proj[:, None] + loc + dec[:, :, None, :]
            e = jnp.sum(
                jnp.tanh(pre).astype(jnp.float32)
                * g.astype(jnp.float32), axis=-1
            )
            return self._finish(e, mask, enc, att_prev, beam)
        loc = mlp_loc(loc)
        if beam:
            loc = loc.reshape(att_prev.shape + (a,))  # (B, K, T, A)
            pre = enc_proj[:, None] + loc + dec[:, :, None, :]
        else:
            pre = enc_proj + loc + dec[:, None, :]
        e = _gvec_score(self, pre)
        return self._finish(e, mask, enc, att_prev, beam)

    def _fused_score(self) -> bool:
        from robust_e2e_gan_tpu.utils.impl import fused_enabled

        return fused_enabled(getattr(self.cfg, "score_impl", "auto"))

    def _finish(self, e, mask, enc, att_prev, beam):
        """Masked softmax + context shared by the XLA score paths."""
        e = self.cfg.sharpening * e
        m = mask[:, None, :] if beam else mask
        e = jnp.where(m > 0, e, _MASK_MIN)
        att = nn.softmax(e, axis=-1)
        att = att * m  # exact zeros on padding
        att = att / jnp.maximum(jnp.sum(att, axis=-1, keepdims=True), 1e-8)
        ctx = jnp.einsum(
            "bkt,bte->bke" if beam else "bt,bte->be",
            att, enc, preferred_element_type=jnp.float32,
        ).astype(enc.dtype)
        # context uses the f32 alignment; the returned alignment matches the
        # carry dtype (scan carries must be dtype-stable across steps)
        return ctx, att.astype(att_prev.dtype)


class AttAdd(nn.Module):
    """Additive (Bahdanau) attention — the reference's AttAdd variant
    (SURVEY.md section 2a "Attention": "plus possibly AttDot/AttAdd
    variants"). Same as AttLoc without the location conv; att_prev is
    accepted and ignored so all variants share one step signature."""

    cfg: AttentionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc, enc_proj, mask, dec_z, att_prev,
                 step_pack=None):
        del step_pack  # full-step fusion is location-variant-only
        a = self.cfg.dim
        beam = dec_z.ndim == 3
        dec = nn.Dense(a, use_bias=False, dtype=self.dtype, name="mlp_dec")(dec_z)
        pre = (
            enc_proj[:, None] + dec[:, :, None, :]
            if beam else enc_proj + dec[:, None, :]
        )
        e = _gvec_score(self, pre)
        e = self.cfg.sharpening * e
        m = mask[:, None, :] if beam else mask
        e = jnp.where(m > 0, e, _MASK_MIN)
        att = nn.softmax(e, axis=-1)
        att = att * m
        att = att / jnp.maximum(jnp.sum(att, axis=-1, keepdims=True), 1e-8)
        ctx = jnp.einsum(
            "bkt,bte->bke" if beam else "bt,bte->be",
            att, enc, preferred_element_type=jnp.float32,
        ).astype(enc.dtype)
        # context uses the f32 alignment; the returned alignment matches the
        # carry dtype (scan carries must be dtype-stable across steps)
        return ctx, att.astype(att_prev.dtype)


class AttDot(nn.Module):
    """Dot-product attention — the reference's AttDot variant: scores are
    tanh(enc_proj) . tanh(W dec_z); att_prev accepted and ignored."""

    cfg: AttentionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc, enc_proj, mask, dec_z, att_prev,
                 step_pack=None):
        del step_pack  # full-step fusion is location-variant-only
        a = self.cfg.dim
        beam = dec_z.ndim == 3
        dec = nn.Dense(a, use_bias=False, dtype=self.dtype, name="mlp_dec")(dec_z)
        e = jnp.einsum(
            "bta,bka->bkt" if beam else "bta,ba->bt",
            jnp.tanh(enc_proj), jnp.tanh(dec),
            preferred_element_type=jnp.float32,
        )
        e = self.cfg.sharpening * e
        m = mask[:, None, :] if beam else mask
        e = jnp.where(m > 0, e, _MASK_MIN)
        att = nn.softmax(e, axis=-1)
        att = att * m
        att = att / jnp.maximum(jnp.sum(att, axis=-1, keepdims=True), 1e-8)
        ctx = jnp.einsum(
            "bkt,bte->bke" if beam else "bt,bte->be",
            att, enc, preferred_element_type=jnp.float32,
        ).astype(enc.dtype)
        # context uses the f32 alignment; the returned alignment matches the
        # carry dtype (scan carries must be dtype-stable across steps)
        return ctx, att.astype(att_prev.dtype)


ATTENTION_VARIANTS = {"location": AttLoc, "add": AttAdd, "dot": AttDot}


def make_attention(cfg: AttentionConfig, dtype=jnp.float32, name="att"):
    """Factory over the reference's attention variants (atype option)."""
    try:
        cls = ATTENTION_VARIANTS[cfg.variant]
    except KeyError:
        raise ValueError(
            f"unknown attention variant {cfg.variant!r}; "
            f"options: {sorted(ATTENTION_VARIANTS)}"
        )
    return cls(cfg, dtype=dtype, name=name)


def initial_alignment(mask: jnp.ndarray) -> jnp.ndarray:
    """Masked-uniform alignment over valid frames (ESPnet step-0 convention)."""
    denom = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1.0)
    return mask / denom


class EncoderProjection(nn.Module):
    """Per-utterance encoder-side attention projection, hoisted out of the
    decode loop."""

    cfg: AttentionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc: jnp.ndarray) -> jnp.ndarray:
        # enc_proj_bias=True restores the reference-era mlp_enc bias for
        # imported checkpoints (SURVEY.md 2a "Attention"; the bias sits
        # inside the tanh so it cannot be folded away). The fused serving
        # kernels consume the projected tensor, so they are unaffected.
        return nn.Dense(
            self.cfg.dim, use_bias=getattr(self.cfg, "enc_proj_bias", False),
            dtype=self.dtype, name="mlp_enc",
        )(enc)
