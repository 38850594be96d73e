"""Speech-enhancement GAN: mask-estimating generator + conv discriminator.

Reference parity: SURVEY.md section 2a — "Enhancement generator (G)": stacked
BLSTM over noisy spectral features -> sigmoid T-F mask -> mask * noisy =
enhanced; "Discriminator (D)": conv net classifying enhanced vs clean feature
maps with an LS-GAN/BCE objective. The generator masks the *linear
magnitude/power spectrum* so the differentiable log-mel stage (ops/fbank.py)
carries ASR gradients back into G — the joint-training requirement of
SURVEY.md L2 and call stack 3.1.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from robust_e2e_gan_tpu.config import DiscriminatorConfig, EnhancerConfig
from robust_e2e_gan_tpu.models.rnn import BLSTM


class EnhanceNet(nn.Module):
    """Mask-estimating BLSTM generator over (B, T, F) power spectra.

    Returns (enhanced_power, mask). The network sees a log-compressed input
    (BLSTMs train poorly on raw power dynamics) but the mask multiplies the
    linear-domain spectrum, keeping the chain exactly invertible at mask=1.
    """

    cfg: EnhancerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, noisy_power: jnp.ndarray, frame_mask: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.cfg.compression == "log1p":
            x = jnp.log1p(noisy_power)
        elif self.cfg.compression == "log":
            x = jnp.log(jnp.maximum(noisy_power, 1e-7))
        else:
            x = noisy_power
        from flax import linen as _nn

        blstm_cls = _nn.remat(BLSTM) if self.cfg.remat else BLSTM
        h = x
        for i in range(self.cfg.num_layers):
            h = blstm_cls(
                self.cfg.hidden_dim, dtype=self.dtype,
                unroll=self.cfg.scan_unroll or None,
                impl=self.cfg.lstm_impl,
                gate_storage=self.cfg.gate_storage, name=f"blstm{i}"
            )(h, frame_mask)
        m = nn.Dense(self.cfg.input_dim, dtype=self.dtype, name="mask_out")(h)
        tf_mask = jax.nn.sigmoid(m)
        if self.cfg.mask_floor > 0.0:
            tf_mask = self.cfg.mask_floor + (1.0 - self.cfg.mask_floor) * tf_mask
        enhanced = tf_mask * noisy_power
        if frame_mask is not None:
            fm = frame_mask[..., None].astype(enhanced.dtype)
            enhanced = enhanced * fm
            tf_mask = tf_mask * fm
        return enhanced, tf_mask


class Discriminator(nn.Module):
    """Conv discriminator over (B, T, D) feature maps -> per-utterance score.

    Valid-frame mean pooling (not max) keeps the score independent of pad
    length, so one compilation serves every bucket without leaking padding
    information to the adversary.
    """

    cfg: DiscriminatorConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, feats: jnp.ndarray, frame_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        b, t, d = feats.shape
        if frame_mask is not None:
            # zero pad frames up front so conv halos can never read them
            feats = feats * frame_mask[..., None].astype(feats.dtype)
        h = feats[..., None].astype(self.dtype)  # (B, T, D, 1)
        for i, ch in enumerate(self.cfg.channels):
            h = nn.Conv(
                ch, self.cfg.kernel, strides=(2, 2), padding="SAME",
                dtype=self.dtype, name=f"conv{i}",
            )(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
        bt, tt, dd, cc = h.shape
        h = h.reshape(bt, tt, dd * cc)
        if frame_mask is not None:
            stride = 2 ** len(self.cfg.channels)
            sub_len = frame_mask.sum(axis=1).astype(jnp.int32)
            for _ in range(len(self.cfg.channels)):
                sub_len = (sub_len + 1) // 2
            m = (
                jnp.arange(tt, dtype=jnp.int32)[None, :] < sub_len[:, None]
            ).astype(h.dtype)
            h = h * m[..., None]
            pooled = h.sum(axis=1) / jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
        else:
            pooled = h.mean(axis=1)
        score = nn.Dense(1, dtype=self.dtype, name="out")(pooled)
        return score[..., 0]


def adversarial_losses(
    d_real: jnp.ndarray,
    d_fake: jnp.ndarray,
    loss_type: str = "lsgan",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(loss_D, loss_G_adv) for real/fake discriminator scores.

    lsgan: least-squares GAN (D: (D(x)-1)^2 + D(G)^2, G: (D(G)-1)^2).
    bce:   original sigmoid cross-entropy GAN.
    The reference used BCE or LS-GAN (SURVEY.md section 2a, K-med); both are
    provided and selected by DiscriminatorConfig.loss_type.
    """
    if loss_type == "lsgan":
        loss_d = 0.5 * (
            jnp.mean((d_real - 1.0) ** 2) + jnp.mean(d_fake**2)
        )
        loss_g = 0.5 * jnp.mean((d_fake - 1.0) ** 2)
    elif loss_type == "bce":
        loss_d = jnp.mean(
            jax.nn.softplus(-d_real)
        ) + jnp.mean(jax.nn.softplus(d_fake))
        loss_g = jnp.mean(jax.nn.softplus(-d_fake))
    else:
        raise ValueError(f"unknown gan loss {loss_type!r}")
    return loss_d, loss_g


def enhancement_loss(
    enhanced: jnp.ndarray,
    clean: jnp.ndarray,
    frame_mask: Optional[jnp.ndarray] = None,
    kind: str = "l2",
    compress: bool = True,
) -> jnp.ndarray:
    """Reconstruction term mu * L_enh(enhanced, clean) of the joint loss
    (SURVEY.md call stack 3.1). Computed on log1p-compressed spectra by
    default so it is scale-stable across utterance loudness."""
    if compress:
        enhanced = jnp.log1p(jnp.maximum(enhanced, 0.0))
        clean = jnp.log1p(jnp.maximum(clean, 0.0))
    diff = enhanced - clean
    if kind == "l1":
        per = jnp.abs(diff)
    else:
        per = jnp.square(diff)
    if frame_mask is None:
        return jnp.mean(per)
    m = frame_mask[..., None].astype(per.dtype)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m) * per.shape[-1], 1.0)
