"""Character RNNLM for shallow fusion in beam search.

Reference parity: the reference's ESPnet lineage decodes with an optional
RNNLM fused into ``recognize_beam`` (SURVEY.md section 2a "CTC prefix
scorer" row / call stack 3.2 — the joint one-pass rescoring supports an
LM term ``score += lm_weight * log p_LM``). The reference repo itself keeps
the LM optional; here it is a first-class module trained by
``train/cli.py --mode lm`` and fused on device in decode/beam.py.

TPU-first structure mirrors models/decoder.py: the teacher-forced training
pass is an ``nn.scan`` over a single LMStep module, and the SAME LMStep
(same parameters) is exposed through ``RNNLM.step`` for the batched beam
search, so training and decode paths cannot drift apart.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from robust_e2e_gan_tpu.models.decoder import DenseIO
from robust_e2e_gan_tpu.models.rnn import LSTMCell


@dataclass(frozen=True)
class LMConfig:
    """LSTM language model over the ASR token vocabulary."""

    vocab_size: int = 52
    embed_dim: int = 128
    hidden_dim: int = 256
    num_layers: int = 1
    sos_id: int = 1  # shared <sos>/<eos>, same convention as E2EConfig
    eos_id: int = 1
    ignore_id: int = -1
    # Beam-step implementation: "xla", "fused" (ops/lm_step_pallas.py —
    # the whole embed + cells + readout step in one Mosaic program),
    # "auto" (fused on TPU). Training always uses XLA.
    step_impl: str = "auto"


class LMStep(nn.Module):
    """One LM step on raw token ids: embed, stacked LSTM cells, logits."""

    cfg: LMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, tok_t, fused_ok: bool = False):
        h_prev, c_prev = carry
        tok_pos = jnp.maximum(tok_t, 0)
        embed_mod = nn.Embed(
            self.cfg.vocab_size, self.cfg.embed_dim, dtype=self.dtype,
            name="embed",
        )
        cells = [
            LSTMCell(
                self.cfg.hidden_dim,
                in_features=(self.cfg.embed_dim if li == 0
                             else self.cfg.hidden_dim),
                dtype=self.dtype, name=f"lstm{li}",
            )
            for li in range(self.cfg.num_layers)
        ]
        outd = DenseIO(
            self.cfg.vocab_size, in_features=self.cfg.hidden_dim,
            dtype=self.dtype, name="output",
        )

        if fused_ok and self._fused_step():
            from robust_e2e_gan_tpu.ops.lm_step_pallas import (
                lm_step_fused, lm_step_plan,
            )
            from robust_e2e_gan_tpu.parallel.sharding import (
                local_kernel_batch, sharded_kernel_call,
            )

            n = tok_t.shape[0]
            if lm_step_plan(
                local_kernel_batch(n), self.cfg.vocab_size,
                self.cfg.embed_dim, self.cfg.hidden_dim,
                self.cfg.num_layers, self.dtype,
            ):
                wxs = tuple(c.wx for c in cells)
                whs = tuple(c.wh for c in cells)
                bs = tuple(c.bias for c in cells)

                # state is (L, N, H): shard_map specs shard dim 0, so
                # the wrapped fn sees it batch-major and swaps inside
                def _f(tk, et, ws_x, ws_h, ws_b, ok, ob, hs_, cs_):
                    r = lm_step_fused(
                        tk, et, ws_x, ws_h, ws_b, ok, ob,
                        jnp.swapaxes(hs_, 0, 1), jnp.swapaxes(cs_, 0, 1),
                        dtype=self.dtype,
                    )
                    assert r is not None  # per-shard plan checked above
                    h2, c2, lg = r
                    return (jnp.swapaxes(h2, 0, 1),
                            jnp.swapaxes(c2, 0, 1), lg)

                call = sharded_kernel_call(
                    _f, n,
                    (True, False, False, False, False, False, False,
                     True, True),
                    out_batched=(True, True, True),
                )
                h_new, c_new, logits = call(
                    tok_pos, embed_mod.embedding, wxs, whs, bs,
                    outd.kernel, outd.bias,
                    jnp.swapaxes(h_prev, 0, 1),
                    jnp.swapaxes(c_prev, 0, 1),
                )
                return (
                    (jnp.swapaxes(h_new, 0, 1), jnp.swapaxes(c_new, 0, 1)),
                    logits.astype(self.dtype),
                )
            # shapes outside the kernel plan: fall through to XLA

        emb = embed_mod(tok_pos)
        inp = emb
        hs, cs = [], []
        for li in range(self.cfg.num_layers):
            (h_new, c_new), inp = cells[li]((h_prev[li], c_prev[li]), inp)
            hs.append(h_new)
            cs.append(c_new)
        logits = outd(inp)
        return (jnp.stack(hs), jnp.stack(cs)), logits

    def _fused_step(self) -> bool:
        from robust_e2e_gan_tpu.utils.impl import fused_enabled

        return fused_enabled(getattr(self.cfg, "step_impl", "auto"))


class RNNLM(nn.Module):
    """Next-token LSTM LM; scan for training, per-step API for decoding."""

    cfg: LMConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.step_mod = LMStep(self.cfg, dtype=self.dtype)

    def initial_carry(self, batch: int):
        h0 = jnp.zeros(
            (self.cfg.num_layers, batch, self.cfg.hidden_dim), jnp.float32
        )
        return (h0, h0)

    def __call__(self, ys_in: jnp.ndarray) -> jnp.ndarray:
        """Teacher-forced pass over (B, S) token ids -> (B, S, V) logits."""
        b, _ = ys_in.shape
        scan = nn.scan(
            lambda mod, carry, tok_t: mod(carry, tok_t),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        _, logits = scan(self.step_mod, self.initial_carry(b), ys_in)
        return logits

    def step(self, carry, tokens):
        """Single LM step on raw token ids (beam-search entry point);
        eligible for the fused Pallas step (training scan is not)."""
        return self.step_mod(carry, tokens, fused_ok=True)


def lm_loss(
    logits: jnp.ndarray, ys_out: jnp.ndarray, ignore_id: int = -1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked next-token NLL; returns (loss/token, perplexity)."""
    valid = (ys_out != ignore_id).astype(jnp.float32)
    targets = jnp.maximum(ys_out, 0)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    loss = jnp.sum(nll * valid) / denom
    return loss, jnp.exp(loss)
