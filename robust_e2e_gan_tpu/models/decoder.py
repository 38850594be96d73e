"""Attention decoder: embedding + LSTM + location-aware attention + CE loss.

Reference parity: SURVEY.md section 2a "ASR Decoder" — ESPnet-style LSTM
decoder with teacher forcing, scheduled sampling, label smoothing, and a
``recognize_beam`` path (ours is the batched on-device search in
decode/beam.py). TPU-first: the teacher-forced loop is an ``nn.scan`` over a
single DecoderStep module — one compiled graph per length bucket, with the
encoder-side attention projection hoisted out of the loop. The same
DecoderStep (same parameters) is exposed through ``Decoder.step`` for the
on-device beam search, so training and decode paths cannot drift apart.

Scheduled sampling: with probability ``sampling_probability`` each step
feeds back the model's own previous argmax prediction instead of the gold
token (carried through the scan as ``prev_pred``; never triggers at step 0,
where prev_pred is the -1 sentinel). The per-step Bernoulli draws come from
the 'sampling' rng collection, split per scan step.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from robust_e2e_gan_tpu.config import AttentionConfig, DecoderConfig
from robust_e2e_gan_tpu.models.attention import (
    EncoderProjection,
    initial_alignment,
    make_attention,
)
from robust_e2e_gan_tpu.models.rnn import LSTMCell


class DecoderStep(nn.Module):
    """One decode step on raw token ids: scheduled-sampling token choice,
    embedding, attention with s_{t-1}, LSTM update, output logits."""

    dcfg: DecoderConfig
    acfg: AttentionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, carry, tok_t, enc, enc_proj, enc_mask,
        sampling_prob: float = 0.0,
    ):
        h_prev, c_prev, att_prev, prev_pred = carry
        if sampling_prob > 0.0:
            sample = jax.random.bernoulli(
                self.make_rng("sampling"), sampling_prob, tok_t.shape
            )
            tok_t = jnp.where(sample & (prev_pred >= 0), prev_pred, tok_t)
        emb_t = nn.Embed(
            self.dcfg.vocab_size, self.dcfg.embed_dim, dtype=self.dtype,
            name="embed",
        )(jnp.maximum(tok_t, 0))

        n, b = tok_t.shape[0], enc.shape[0]
        att_mod = make_attention(self.acfg, dtype=self.dtype, name="att")
        if n != b:
            # beam search: N = B*K hypothesis lanes share B encoder rows —
            # attention broadcasts over the beam axis instead of reading a
            # K-fold repeated enc/enc_proj from HBM each step
            k = n // b
            ctx, att = att_mod(
                enc, enc_proj, enc_mask,
                h_prev[-1].reshape(b, k, -1), att_prev.reshape(b, k, -1),
            )
            ctx = ctx.reshape(n, -1)
            att = att.reshape(n, -1)
        else:
            ctx, att = att_mod(enc, enc_proj, enc_mask, h_prev[-1], att_prev)
        x = jnp.concatenate([emb_t, ctx], axis=-1)
        hs, cs = [], []
        inp = x
        for li in range(self.dcfg.num_layers):
            (h_new, c_new), inp = LSTMCell(
                self.dcfg.hidden_dim, dtype=self.dtype, name=f"lstm{li}"
            )((h_prev[li], c_prev[li]), inp)
            hs.append(h_new)
            cs.append(c_new)
        z = inp
        logits = nn.Dense(
            self.dcfg.vocab_size, dtype=self.dtype, name="output"
        )(jnp.concatenate([z, ctx], axis=-1))
        new_pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        new_carry = (jnp.stack(hs), jnp.stack(cs), att, new_pred)
        return new_carry, (logits, att)


class Decoder(nn.Module):
    """Teacher-forced decoder over (B, S) target prefixes."""

    dcfg: DecoderConfig
    acfg: AttentionConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.enc_projection = EncoderProjection(self.acfg, dtype=self.dtype)
        self.step_mod = DecoderStep(self.dcfg, self.acfg, dtype=self.dtype)

    def initial_carry(self, batch: int, enc_mask: jnp.ndarray):
        h0 = jnp.zeros(
            (self.dcfg.num_layers, batch, self.dcfg.hidden_dim), jnp.float32
        )
        prev_pred = jnp.full((batch,), -1, jnp.int32)  # sentinel: no pred yet
        return (h0, h0, initial_alignment(enc_mask), prev_pred)

    def __call__(
        self,
        enc: jnp.ndarray,
        enc_mask: jnp.ndarray,
        ys_in: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (logits (B, S, V), attentions (B, S, T))."""
        b, s = ys_in.shape
        enc_proj = self.enc_projection(enc)
        carry0 = self.initial_carry(b, enc_mask)
        p = 0.0 if deterministic else self.dcfg.sampling_probability

        scan = nn.scan(
            lambda mod, carry, tok_t: mod(
                carry, tok_t, enc, enc_proj, enc_mask, sampling_prob=p
            ),
            variable_broadcast="params",
            split_rngs={"params": False, "sampling": True},
            in_axes=1,
            out_axes=1,
        )
        _, (logits, atts) = scan(self.step_mod, carry0, ys_in)
        return logits, atts

    def project_encoder(self, enc: jnp.ndarray) -> jnp.ndarray:
        """Expose the hoisted encoder projection for decode-time use."""
        return self.enc_projection(enc)

    def step(self, carry, tokens, enc, enc_proj, enc_mask):
        """Single decode step on raw token ids (beam-search entry point)."""
        return self.step_mod(carry, tokens, enc, enc_proj, enc_mask)


def decoder_cross_entropy(
    logits: jnp.ndarray,
    ys_out: jnp.ndarray,
    ignore_id: int = -1,
    label_smoothing: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked CE with label smoothing; returns (loss, accuracy).

    Matches the reference objective (SURVEY.md section 2a "ASR Decoder": CE
    with label smoothing option; attention accuracy as the training signal).
    Normalization is per valid token.
    """
    v = logits.shape[-1]
    valid = (ys_out != ignore_id).astype(jnp.float32)
    targets = jnp.maximum(ys_out, 0)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(lp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    loss = jnp.sum(nll * valid) / denom
    pred = jnp.argmax(logits, axis=-1)
    acc = jnp.sum((pred == targets).astype(jnp.float32) * valid) / denom
    return loss, acc
