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


class DenseIO(nn.Module):
    """nn.Dense-equivalent with params declared in setup from a static
    ``in_features`` — so fused serving kernels can read ``.kernel``/
    ``.bias`` directly. Parameter tree (kernel/bias, f32 masters, lecun
    init) is byte-compatible with nn.Dense checkpoints."""

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            jnp.float32,
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return (
            jnp.matmul(x.astype(self.dtype), self.kernel.astype(self.dtype))
            + self.bias.astype(self.dtype)
        )


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
        embed_mod = nn.Embed(
            self.dcfg.vocab_size, self.dcfg.embed_dim, dtype=self.dtype,
            name="embed",
        )
        tok_pos = jnp.maximum(tok_t, 0)
        emb_t = embed_mod(tok_pos)

        n, b = tok_t.shape[0], enc.shape[0]
        e_dim = enc.shape[-1]
        hdim = self.dcfg.hidden_dim
        cell0 = LSTMCell(
            hdim, in_features=self.dcfg.embed_dim + e_dim,
            dtype=self.dtype, name="lstm0",
        )
        outd = DenseIO(
            self.dcfg.vocab_size, in_features=hdim + e_dim,
            dtype=self.dtype, name="output",
        )
        att_mod = make_attention(self.acfg, dtype=self.dtype, name="att")
        if n != b:
            # beam search: N = B*K hypothesis lanes share B encoder rows —
            # attention broadcasts over the beam axis instead of reading a
            # K-fold repeated enc/enc_proj from HBM each step
            k = n // b
            step_pack = None
            if self._fused_step():
                # full-step fusion: hand the attention module everything
                # the post-attention stage needs; it returns logits and
                # new LSTM state when the kernel fits these shapes
                step_pack = {
                    "tok": tok_pos.reshape(b, k),
                    "emb_table": embed_mod.embedding,
                    "cell_wx": cell0.wx,
                    "cell_wh": cell0.wh,
                    "cell_bias": cell0.bias,
                    "out_w": outd.kernel,
                    "out_b": outd.bias,
                    "z_prev": h_prev[-1].reshape(b, k, -1),
                    "c_prev": c_prev[-1].reshape(b, k, -1),
                }
            res = att_mod(
                enc, enc_proj, enc_mask,
                h_prev[-1].reshape(b, k, -1), att_prev.reshape(b, k, -1),
                step_pack=step_pack,
            )
            if len(res) == 4:
                logits, att, z_new, c_new = res
                # dtype parity with the XLA readout (bf16 rounding point)
                logits = logits.reshape(n, -1).astype(self.dtype)
                att = att.reshape(n, -1).astype(att_prev.dtype)
                new_pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                new_carry = (
                    z_new.reshape(1, n, -1), c_new.reshape(1, n, -1),
                    att, new_pred,
                )
                return new_carry, (logits, att)
            ctx, att = res
            ctx = ctx.reshape(n, -1)
            att = att.reshape(n, -1)
        else:
            ctx, att = att_mod(enc, enc_proj, enc_mask, h_prev[-1], att_prev)
        x = jnp.concatenate([emb_t, ctx], axis=-1)
        hs, cs = [], []
        inp = x
        for li in range(self.dcfg.num_layers):
            cell = cell0 if li == 0 else LSTMCell(
                hdim, in_features=inp.shape[-1],
                dtype=self.dtype, name=f"lstm{li}",
            )
            (h_new, c_new), inp = cell((h_prev[li], c_prev[li]), inp)
            hs.append(h_new)
            cs.append(c_new)
        z = inp
        logits = outd(jnp.concatenate([z, ctx], axis=-1))
        new_pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        new_carry = (jnp.stack(hs), jnp.stack(cs), att, new_pred)
        return new_carry, (logits, att)

    def _fused_step(self) -> bool:
        """Full-step fusion gate: config + structural requirements (one
        LSTM layer, location attention; vocab bound checked by the
        kernel plan).

        "auto" resolves to the XLA step (fused attention kernel + XLA
        cell/readout): the round-4 on-chip A/B measured the fully-fused
        step ~3% SLOWER than that combination at bench shapes (2120.2 vs
        2184.6 utt/s, 3 reps each — results/kernel_ab.json), the serial
        one-hot embedding matmul inside the kernel costing more than the
        HBM round-trips it saves. "fused" still forces the kernel."""
        if self.dcfg.num_layers != 1 or self.acfg.variant != "location":
            return False
        from robust_e2e_gan_tpu.utils.impl import fused_enabled

        impl = getattr(self.dcfg, "step_impl", "auto")
        if impl == "auto":
            return False
        return fused_enabled(impl)


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
            unroll=max(self.dcfg.scan_unroll, 1),
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
