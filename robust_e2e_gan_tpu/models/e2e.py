"""Hybrid CTC/attention E2E ASR model.

Reference parity: SURVEY.md section 2a "E2E wrapper + loss" — composes the
encoder, the CTC branch (linear projection encoder->vocab + CTC loss) and
the attention decoder; total loss = mtlalpha * L_ctc + (1 - mtlalpha) *
L_att (Kim et al. hybrid CTC/attention). Target sequences follow the ESPnet
converter convention: label padding is ignore_id (-1), <sos>/<eos> share one
id. All target prep is vectorized (no host loops) so the whole forward jits.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from robust_e2e_gan_tpu.config import E2EConfig
from robust_e2e_gan_tpu.models.decoder import Decoder, decoder_cross_entropy
from robust_e2e_gan_tpu.models.encoder import Encoder
from robust_e2e_gan_tpu.ops.ctc import ctc_loss


def add_sos_eos(
    ys_pad: jnp.ndarray, sos: int, eos: int, ignore_id: int = -1
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(B, S) padded labels -> (ys_in (B, S+1), ys_out (B, S+1), lengths).

    ys_in  = [sos, y1..yS, pad...]      (teacher-forcing inputs)
    ys_out = [y1..yS, eos, ignore...]   (CE targets)
    """
    b, s = ys_pad.shape
    lengths = jnp.sum((ys_pad != ignore_id).astype(jnp.int32), axis=1)
    ys_in = jnp.concatenate(
        [jnp.full((b, 1), sos, dtype=ys_pad.dtype), jnp.where(ys_pad == ignore_id, 0, ys_pad)],
        axis=1,
    )
    # ys_out: shift labels left is not needed; append eos at position len.
    pos = jnp.arange(s + 1, dtype=jnp.int32)[None, :]
    padded = jnp.concatenate(
        [ys_pad, jnp.full((b, 1), ignore_id, dtype=ys_pad.dtype)], axis=1
    )
    ys_out = jnp.where(pos == lengths[:, None], eos, padded)
    ys_out = jnp.where(pos > lengths[:, None], ignore_id, ys_out)
    return ys_in, ys_out, lengths


class CTCHead(nn.Module):
    """Linear projection encoder -> vocab (SURVEY.md section 2a "CTC branch")."""

    vocab_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hs: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.vocab_size, dtype=self.dtype, name="ctc_lo")(hs)


class E2E(nn.Module):
    """forward() -> loss dict; also exposes the pieces used by decode paths."""

    cfg: E2EConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg.encoder, dtype=self.dtype)
        self.ctc = CTCHead(self.cfg.decoder.vocab_size, dtype=self.dtype)
        self.decoder = Decoder(
            self.cfg.decoder, self.cfg.attention, dtype=self.dtype
        )

    def __call__(
        self,
        feats: jnp.ndarray,
        feat_lengths: jnp.ndarray,
        ys_pad: jnp.ndarray,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        hs, hmask, hlens = self.encoder(
            feats, feat_lengths, deterministic=deterministic
        )

        # CTC branch
        ctc_logits = self.ctc(hs)
        label_lengths = jnp.sum(
            (ys_pad != self.cfg.ignore_id).astype(jnp.int32), axis=1
        )
        loss_ctc = ctc_loss(
            ctc_logits,
            hlens,
            jnp.where(ys_pad == self.cfg.ignore_id, 0, ys_pad),
            label_lengths,
            blank_id=self.cfg.blank_id,
            reduction="mean",
            impl=getattr(self.cfg, "ctc_impl", "auto"),
        )

        # Attention branch
        ys_in, ys_out, _ = add_sos_eos(
            ys_pad, self.cfg.sos_id, self.cfg.eos_id, self.cfg.ignore_id
        )
        logits, _ = self.decoder(hs, hmask, ys_in, deterministic=deterministic)
        loss_att, acc = decoder_cross_entropy(
            logits,
            ys_out,
            ignore_id=self.cfg.ignore_id,
            label_smoothing=self.cfg.decoder.label_smoothing,
        )

        alpha = self.cfg.mtlalpha
        loss = alpha * loss_ctc + (1.0 - alpha) * loss_att
        return {
            "loss": loss,
            "loss_ctc": loss_ctc,
            "loss_att": loss_att,
            "acc": acc,
        }

    # ---- decode-time entry points (used via apply(..., method=...)) ----

    def encode(
        self, feats: jnp.ndarray, feat_lengths: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        return self.encoder(feats, feat_lengths, deterministic=True)

    def ctc_logits(self, hs: jnp.ndarray) -> jnp.ndarray:
        return self.ctc(hs)

    def decoder_project_encoder(self, hs: jnp.ndarray) -> jnp.ndarray:
        return self.decoder.project_encoder(hs)

    def decoder_step(self, carry, tokens, enc, enc_proj, enc_mask):
        return self.decoder.step(carry, tokens, enc, enc_proj, enc_mask)

    def decoder_initial_carry(self, batch: int, enc_mask: jnp.ndarray):
        return self.decoder.initial_carry(batch, enc_mask)
