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

import jax.numpy as jnp
from flax import linen as nn

from robust_e2e_gan_tpu.config import AttentionConfig

_MASK_MIN = -1e9


class AttLoc(nn.Module):
    """One attention step.

    Inputs:
      enc:      (B, T, E) encoder outputs.
      enc_proj: (B, T, A) precomputed encoder projection (see
                ``encoder_projection``).
      mask:     (B, T) validity mask.
      dec_z:    (B, D) current decoder state.
      att_prev: (B, T) previous alignment (masked-uniform at step 0).

    Returns (context (B, E), att (B, T)).
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
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        a = self.cfg.dim
        # conv over previous alignment: (B, T, 1) -> (B, T, C)
        loc = nn.Conv(
            self.cfg.conv_channels,
            (self.cfg.conv_kernel,),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            name="loc_conv",
        )(att_prev[..., None])
        loc = nn.Dense(a, use_bias=False, dtype=self.dtype, name="mlp_loc")(loc)
        dec = nn.Dense(a, use_bias=False, dtype=self.dtype, name="mlp_dec")(dec_z)
        e = nn.Dense(1, use_bias=False, dtype=self.dtype, name="gvec")(
            jnp.tanh(enc_proj + loc + dec[:, None, :])
        )[..., 0]
        e = self.cfg.sharpening * e
        e = jnp.where(mask > 0, e, _MASK_MIN)
        att = nn.softmax(e, axis=-1)
        att = att * mask  # exact zeros on padding
        att = att / jnp.maximum(jnp.sum(att, axis=-1, keepdims=True), 1e-8)
        ctx = jnp.einsum(
            "bt,bte->be", att, enc, preferred_element_type=jnp.float32
        ).astype(enc.dtype)
        return ctx, att


class AttAdd(nn.Module):
    """Additive (Bahdanau) attention — the reference's AttAdd variant
    (SURVEY.md section 2a "Attention": "plus possibly AttDot/AttAdd
    variants"). Same as AttLoc without the location conv; att_prev is
    accepted and ignored so all variants share one step signature."""

    cfg: AttentionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc, enc_proj, mask, dec_z, att_prev):
        a = self.cfg.dim
        dec = nn.Dense(a, use_bias=False, dtype=self.dtype, name="mlp_dec")(dec_z)
        e = nn.Dense(1, use_bias=False, dtype=self.dtype, name="gvec")(
            jnp.tanh(enc_proj + dec[:, None, :])
        )[..., 0]
        e = self.cfg.sharpening * e
        e = jnp.where(mask > 0, e, _MASK_MIN)
        att = nn.softmax(e, axis=-1)
        att = att * mask
        att = att / jnp.maximum(jnp.sum(att, axis=-1, keepdims=True), 1e-8)
        ctx = jnp.einsum(
            "bt,bte->be", att, enc, preferred_element_type=jnp.float32
        ).astype(enc.dtype)
        return ctx, att


class AttDot(nn.Module):
    """Dot-product attention — the reference's AttDot variant: scores are
    tanh(enc_proj) . tanh(W dec_z); att_prev accepted and ignored."""

    cfg: AttentionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc, enc_proj, mask, dec_z, att_prev):
        a = self.cfg.dim
        dec = nn.Dense(a, use_bias=False, dtype=self.dtype, name="mlp_dec")(dec_z)
        e = jnp.einsum(
            "bta,ba->bt", jnp.tanh(enc_proj), jnp.tanh(dec),
            preferred_element_type=jnp.float32,
        )
        e = self.cfg.sharpening * e
        e = jnp.where(mask > 0, e, _MASK_MIN)
        att = nn.softmax(e, axis=-1)
        att = att * mask
        att = att / jnp.maximum(jnp.sum(att, axis=-1, keepdims=True), 1e-8)
        ctx = jnp.einsum(
            "bt,bte->be", att, enc, preferred_element_type=jnp.float32
        ).astype(enc.dtype)
        return ctx, att


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
        return nn.Dense(
            self.cfg.dim, use_bias=False, dtype=self.dtype, name="mlp_enc"
        )(enc)
