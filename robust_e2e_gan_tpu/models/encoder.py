"""ASR encoder: VGG conv frontend + projected BLSTM stack.

Reference parity: SURVEY.md section 2a "ASR Encoder" — ESPnet-style VGG2L
(two conv blocks, 64 -> 128 channels, each followed by a 2x2 maxpool, giving
4x time and frequency subsampling) feeding a BLSTMP stack. Re-designed for
TPU: convs run as NHWC ``lax.conv_general_dilated`` (XLA tiles them onto the
MXU), pooling uses SAME/ceil semantics so subsampled lengths are
``ceil(ceil(T/2)/2)``, and all sequence masking threads through so one
compilation serves a whole length bucket.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from robust_e2e_gan_tpu.config import EncoderConfig
from robust_e2e_gan_tpu.models.rnn import BLSTMP


def subsampled_lengths(lengths: jnp.ndarray) -> jnp.ndarray:
    """Length transform of the two ceil-mode 2x2 maxpools."""
    l1 = (lengths + 1) // 2
    return (l1 + 1) // 2


def subsampled_frames(t: int) -> int:
    return ((t + 1) // 2 + 1) // 2


class VGG2L(nn.Module):
    """Two VGG conv blocks over (B, T, D) features treated as a 1-channel
    image; output (B, T//4, D//4 * channels[-1])."""

    channels: Tuple[int, int] = (64, 128)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, d = x.shape
        h = x[..., None].astype(self.dtype)  # NHWC: (B, T, D, 1)
        for i, ch in enumerate(self.channels):
            h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv{i}_1")(h)
            h = nn.relu(h)
            h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv{i}_2")(h)
            h = nn.relu(h)
            h = nn.max_pool(h, (2, 2), strides=(2, 2), padding="SAME")
        bt, tt, dd, cc = h.shape
        return h.reshape(bt, tt, dd * cc)


class Encoder(nn.Module):
    """VGG2L -> BLSTMP. Returns (hs, hmask): (B, T', proj_dim), (B, T')."""

    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,
        feat_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        b, t, d = feats.shape
        h = VGG2L(self.cfg.vgg_channels, dtype=self.dtype, name="vgg")(feats)
        tt = h.shape[1]
        if feat_lengths is None:
            hlens = jnp.full((b,), tt, dtype=jnp.int32)
        else:
            hlens = subsampled_lengths(feat_lengths.astype(jnp.int32))
        hmask = (
            jnp.arange(tt, dtype=jnp.int32)[None, :] < hlens[:, None]
        ).astype(h.dtype)
        h = h * hmask[..., None]
        hs = BLSTMP(
            num_layers=self.cfg.num_layers,
            hidden_dim=self.cfg.hidden_dim,
            proj_dim=self.cfg.proj_dim,
            dropout_rate=self.cfg.dropout_rate,
            dtype=self.dtype,
            unroll=self.cfg.scan_unroll or None,
            remat=self.cfg.remat,
            impl=self.cfg.lstm_impl,
            gate_storage=self.cfg.gate_storage,
            name="blstmp",
        )(h, hmask, deterministic=deterministic)
        return hs, hmask, hlens
