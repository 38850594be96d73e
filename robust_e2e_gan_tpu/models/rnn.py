"""Recurrent cores: LSTM / BLSTM as XLA-friendly ``lax.scan``.

Replaces the reference's cuDNN LSTM dependency (SURVEY.md section 2b: "cuDNN
LSTM via PyTorch" -> "XLA-compiled jax.lax.scan LSTM"). TPU-first structure:

- The input projection ``x @ W_x`` for all four gates is hoisted out of the
  scan and computed for the whole (B, T) sequence as one large matmul that
  tiles onto the MXU; the scan body only does the (B, H) x (H, 4H) recurrent
  matmul plus VPU elementwise gate math.
- Variable length is handled by a per-step mask gate: h/c are updated only
  where mask=1 and carried otherwise. This makes the *same* scan correct for
  the backward direction of a BLSTM over a fully flipped padded sequence
  (pad frames, wherever they sit, never perturb the state), so no
  gather-based sequence reversal is needed.
- All shapes static; one compilation per length bucket.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# Global scan-unroll default for LSTMScan (overridable per module instance
# or via EncoderConfig/EnhancerConfig.scan_unroll). Parameters are
# unroll-independent, so this can be tuned without re-init.
# v5e-measured (scripts/bench_train.py + bench.py): unroll 4 speeds the
# joint TRAIN step 43.0 -> 38.2 ms (f32) / 36.2 -> 33.8 ms (bf16) at B=32,
# but SLOWS the batched beam decode 1710 -> 1560 utt/s, so the global
# default stays 1 and training runs opt in per-config.
DEFAULT_UNROLL = 1


class LSTMScan(nn.Module):
    """Unidirectional LSTM over (B, T, D) -> (B, T, H), masked, via scan."""

    hidden_dim: int
    reverse: bool = False
    dtype: jnp.dtype = jnp.float32
    unroll: Optional[int] = None  # scan unroll factor; None -> DEFAULT_UNROLL
    # (the recurrent matmul is tiny and latency-bound; unrolling lets XLA
    # software-pipeline several steps per loop iteration, at the price of a
    # larger loop body to compile)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        b, t, d = x.shape
        h = self.hidden_dim
        # Params are stored float32 (mixed-precision convention: master
        # weights in f32, compute in self.dtype, accumulate f32 via
        # preferred_element_type).
        wx = self.param(
            "wx", nn.initializers.xavier_uniform(), (d, 4 * h), jnp.float32
        ).astype(self.dtype)
        wh = self.param(
            "wh", nn.initializers.orthogonal(), (h, 4 * h), jnp.float32
        ).astype(self.dtype)
        bias = self.param("bias", _lstm_bias_init, (4 * h,), jnp.float32)

        if mask is None:
            mask = jnp.ones((b, t), dtype=x.dtype)

        if self.reverse:
            x = jnp.flip(x, axis=1)
            mask = jnp.flip(mask, axis=1)

        # One big MXU matmul for all timesteps' input projections.
        gates_x = (
            jnp.einsum(
                "btd,dh->bth", x.astype(self.dtype), wx,
                preferred_element_type=jnp.float32,
            )
            + bias
        )

        def step(carry, inputs):
            h_prev, c_prev = carry
            gx_t, m_t = inputs  # (B, 4H), (B,)
            gh = jnp.matmul(
                h_prev, wh, preferred_element_type=jnp.float32
            )
            i, f, g, o = jnp.split(gx_t + gh, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            m = m_t[:, None]
            c_out = m * c_new + (1.0 - m) * c_prev
            h_out = m * h_new + (1.0 - m) * h_prev
            return (h_out, c_out), h_out * m  # zero outputs at pad frames

        init = (
            jnp.zeros((b, h), dtype=jnp.float32),
            jnp.zeros((b, h), dtype=jnp.float32),
        )
        (_, _), ys = jax.lax.scan(
            step,
            init,
            (jnp.moveaxis(gates_x, 1, 0), jnp.moveaxis(mask, 1, 0)),
            unroll=self.unroll if self.unroll is not None else DEFAULT_UNROLL,
        )
        ys = jnp.moveaxis(ys, 0, 1)  # (B, T, H)
        if self.reverse:
            ys = jnp.flip(ys, axis=1)
        return ys.astype(self.dtype)


def _lstm_bias_init(key, shape, dtype):
    """Zero bias with forget gate at 1.0 (standard trainability trick)."""
    b = jnp.zeros(shape, dtype)
    h = shape[0] // 4
    return b.at[h : 2 * h].set(1.0)


def _stacked_orthogonal(key, shape, dtype):
    """Per-direction orthogonal init for (2, H, 4H) recurrent weights."""
    k0, k1 = jax.random.split(key)
    init = nn.initializers.orthogonal()
    return jnp.stack([init(k0, shape[1:], dtype), init(k1, shape[1:], dtype)])


def _stacked_xavier(key, shape, dtype):
    k0, k1 = jax.random.split(key)
    init = nn.initializers.xavier_uniform()
    return jnp.stack([init(k0, shape[1:], dtype), init(k1, shape[1:], dtype)])


def _stacked_lstm_bias(key, shape, dtype):
    return jnp.stack([_lstm_bias_init(key, shape[1:], dtype)] * 2)


class BLSTM(nn.Module):
    """Bidirectional LSTM as a SINGLE scan batched over the direction axis.

    The forward and backward passes are independent recurrences of identical
    shape, so they run as one ``lax.scan`` over (2, B, ...) — the time-axis
    serial chain is walked once, not twice, halving the latency-bound
    sequential step count (the recurrent matmuls are tiny; wall time is
    per-step latency x steps). The backward direction processes the
    mask-flipped sequence; the mask gate makes pad frames state-transparent,
    so flipping the padded sequence is exact (same argument as LSTMScan).
    """

    hidden_dim: int
    dtype: jnp.dtype = jnp.float32
    unroll: Optional[int] = None
    # Frame-loop implementation: "scan" (XLA lax.scan, differentiable,
    # the default), "tiled" (fused Pallas inference kernel,
    # ops/blstm_pallas.py — weights/carries VMEM-resident, forward-only),
    # "fused" (differentiable fused Pallas forward + custom-VJP backward,
    # ops/blstm_train_pallas.py — usable inside train steps; falls back
    # to scan when the layer exceeds the kernel VMEM budget), or "auto"
    # ("tiled" on TPU, "scan" elsewhere). Parameters are impl-independent.
    # The Pallas paths require the mask to be a length (interval) mask,
    # which every caller in this codebase constructs.
    impl: Optional[str] = None
    # Storage dtype of the hoisted (T, 2, B, 4H) gate projections the
    # backward pass re-reads: "f32" (exact) or "compute" (store in
    # self.dtype — halves the train step's dominant HBM residual when
    # computing in bf16; the gate math itself stays f32 either way).
    gate_storage: str = "f32"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        b, t, d = x.shape
        h = self.hidden_dim
        wx = self.param(
            "wx", _stacked_xavier, (2, d, 4 * h), jnp.float32
        ).astype(self.dtype)
        wh = self.param(
            "wh", _stacked_orthogonal, (2, h, 4 * h), jnp.float32
        ).astype(self.dtype)
        bias = self.param("bias", _stacked_lstm_bias, (2, 4 * h), jnp.float32)

        if mask is None:
            mask = jnp.ones((b, t), dtype=x.dtype)

        impl = self.impl or "scan"
        if impl == "auto":
            impl = "tiled" if jax.default_backend() == "tpu" else "scan"
        if impl == "tiled":
            from robust_e2e_gan_tpu.ops.blstm_pallas import (
                blstm_infer, infer_fits,
            )
            from robust_e2e_gan_tpu.parallel.sharding import (
                local_kernel_batch, sharded_kernel_call,
            )

            if infer_fits(local_kernel_batch(b), h,
                          jnp.dtype(self.dtype).itemsize):
                lengths = jnp.sum(mask > 0, axis=1).astype(jnp.int32)
                # under a data mesh, run the kernel per-shard (shard_map);
                # XLA cannot partition a pallas_call and would all-gather
                call = sharded_kernel_call(
                    blstm_infer, b, (True, True, False, False, False)
                )
                ys = call(x, lengths, wx, wh, bias)  # (B, T, 2H)
                return ys.astype(self.dtype)
            # even W_h + carries exceed the VMEM budget: XLA scan below
        if impl == "fused":
            from robust_e2e_gan_tpu.ops.blstm_train_pallas import (
                blstm_train, blstm_train_gx, fused_train_fits,
                gx_train_fits,
            )
            from robust_e2e_gan_tpu.parallel.sharding import (
                local_kernel_batch, sharded_kernel_call,
            )

            # W_x-resident kernel when it fits; otherwise the gate-stream
            # variant (input projection outside, fits any input dim) —
            # e.g. the encoder's VGG-output layer; if even W_h + its dW_h
            # accumulator exceed the VMEM budget, fall through to scan
            lb = local_kernel_batch(b)
            isz = jnp.dtype(self.dtype).itemsize
            if fused_train_fits(lb, t, d, h, isz):
                fn = blstm_train
            elif gx_train_fits(lb, h, isz):
                fn = blstm_train_gx
            else:
                fn = None
            if fn is not None:
                lengths = jnp.sum(mask > 0, axis=1).astype(jnp.int32)
                call = sharded_kernel_call(
                    fn, b, (True, True, False, False, False)
                )
                ys = call(x, lengths, wx, wh, bias)
                return ys.astype(self.dtype)

        xs = jnp.stack([x, jnp.flip(x, axis=1)])  # (2, B, T, D)
        ms = jnp.stack([mask, jnp.flip(mask, axis=1)])  # (2, B, T)

        gates_x = (
            jnp.einsum(
                "zbtd,zdg->zbtg", xs.astype(self.dtype), wx,
                preferred_element_type=jnp.float32,
            )
            + bias[:, None, None, :]
        )
        if self.gate_storage == "compute" and self.dtype != jnp.float32:
            # round the hoisted projections to the compute dtype: the
            # (T, 2, B, 4H) tensor the backward re-reads is the train
            # step's dominant HBM residual; the recurrent math below
            # still runs f32
            gates_x = gates_x.astype(self.dtype)

        def step(carry, inputs):
            h_prev, c_prev = carry  # (2, B, H)
            gx_t, m_t = inputs  # (2, B, 4H), (2, B)
            gh = jnp.einsum(
                "zbh,zhg->zbg", h_prev, wh,
                preferred_element_type=jnp.float32,
            )
            i, f, g, o = jnp.split(gx_t.astype(jnp.float32) + gh, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            m = m_t[..., None]
            c_out = m * c_new + (1.0 - m) * c_prev
            h_out = m * h_new + (1.0 - m) * h_prev
            return (h_out, c_out), h_out * m

        init = (
            jnp.zeros((2, b, h), jnp.float32),
            jnp.zeros((2, b, h), jnp.float32),
        )
        _, ys = jax.lax.scan(
            step,
            init,
            (jnp.moveaxis(gates_x, 2, 0), jnp.moveaxis(ms, 2, 0)),
            unroll=self.unroll if self.unroll is not None else DEFAULT_UNROLL,
        )
        ys = jnp.moveaxis(ys, 0, 2)  # (2, B, T, H)
        fwd = ys[0]
        bwd = jnp.flip(ys[1], axis=1)
        return jnp.concatenate([fwd, bwd], axis=-1).astype(self.dtype)


class BLSTMP(nn.Module):
    """Stack of BLSTM layers with per-layer linear projection + tanh
    (reference: ESPnet BLSTMP, SURVEY.md section 2a "ASR Encoder")."""

    num_layers: int
    hidden_dim: int
    proj_dim: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    unroll: Optional[int] = None  # scan unroll for each BLSTM layer
    remat: bool = False  # rematerialize each BLSTM layer in the backward
    # pass (jax.checkpoint): trades recompute for activation HBM on long
    # utterances. v5e-measured (scripts/bench_train_scale.py,
    # results/train_scale.json): does NOT pay at reference scale — the
    # recompute adds serial latency (47.7 -> 48.5 ms at B=32); the lever
    # that works for the bandwidth-bound step is batch size (B=64: +15%
    # utt/s). Kept for genuinely memory-limited configs.
    impl: Optional[str] = None  # per-layer BLSTM frame-loop impl (see BLSTM)
    gate_storage: str = "f32"  # see BLSTM.gate_storage

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        blstm_cls = nn.remat(BLSTM) if self.remat else BLSTM
        h = x
        for i in range(self.num_layers):
            h = blstm_cls(
                self.hidden_dim, dtype=self.dtype, unroll=self.unroll,
                impl=self.impl, gate_storage=self.gate_storage,
                name=f"blstm{i}"
            )(h, mask)
            h = nn.Dense(
                self.proj_dim, dtype=self.dtype, name=f"proj{i}"
            )(h)
            h = jnp.tanh(h)
            if self.dropout_rate > 0.0 and not deterministic:
                h = nn.Dropout(self.dropout_rate, deterministic=False)(h)
            if mask is not None:
                h = h * mask[..., None].astype(h.dtype)
        return h


class LSTMCell(nn.Module):
    """Single-step LSTM cell for the attention decoder's per-token loop.

    Setup-style (params declared from ``in_features``) so fused serving
    kernels can read ``.wx``/``.wh``/``.bias`` directly without invoking
    the cell; the parameter tree is identical to the original compact
    form (names wx/wh/bias, f32 master weights)."""

    hidden_dim: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d, h = self.in_features, self.hidden_dim
        self.wx = self.param(
            "wx", nn.initializers.xavier_uniform(), (d, 4 * h), jnp.float32
        )
        self.wh = self.param(
            "wh", nn.initializers.orthogonal(), (h, 4 * h), jnp.float32
        )
        self.bias = self.param("bias", _lstm_bias_init, (4 * h,), jnp.float32)

    def __call__(
        self, carry: Tuple[jnp.ndarray, jnp.ndarray], x: jnp.ndarray
    ) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
        h_prev, c_prev = carry
        if x.shape[-1] != self.in_features:
            raise ValueError(
                f"LSTMCell in_features={self.in_features}, got {x.shape}"
            )
        gates = (
            jnp.matmul(
                x.astype(self.dtype), self.wx.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            + jnp.matmul(
                h_prev, self.wh.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            + self.bias
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new), h_new
