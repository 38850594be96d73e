"""Equivalence tests for the fused Pallas RNNLM step (shallow fusion).

The fused step (ops/lm_step_pallas.py) must match the XLA LMStep on
identical parameters — single and stacked layers, unaligned batch, bf16 —
and the full beam search with LM fusion must produce identical hypotheses
with either impl. Interpret mode on the CPU mesh.

Reference parity: SURVEY.md call stack 3.2 — recognize_beam's optional
RNNLM term; the XLA step is the semantics oracle.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_e2e_gan_tpu.models.lm import LMConfig, RNNLM


def _run_step(cfg, dtype, n, seed=0):
    rng = np.random.default_rng(seed)
    lm = RNNLM(cfg, dtype=dtype)
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(n,)), jnp.int32)
    params = lm.init(jax.random.PRNGKey(0), tok[None, :8].repeat(1, 0))
    h0 = jnp.asarray(
        rng.standard_normal((cfg.num_layers, n, cfg.hidden_dim))
        .astype(np.float32)
    ) * 0.3
    c0 = jnp.asarray(
        rng.standard_normal((cfg.num_layers, n, cfg.hidden_dim))
        .astype(np.float32)
    ) * 0.3
    (h, c), logits = lm.apply(params, (h0, c0), tok, method=RNNLM.step)
    return h, c, logits


@pytest.mark.parametrize(
    "layers,n,hid,emb",
    [
        (1, 12, 24, 16),  # unaligned everything
        (2, 9, 128, 128),  # stacked layers, odd batch
    ],
)
def test_lm_fused_step_matches_xla(layers, n, hid, emb):
    cfg_x = LMConfig(vocab_size=12, embed_dim=emb, hidden_dim=hid,
                     num_layers=layers, step_impl="xla")
    cfg_f = dataclasses.replace(cfg_x, step_impl="fused")
    hx, cx, lx = _run_step(cfg_x, jnp.float32, n)
    hf, cf, lf = _run_step(cfg_f, jnp.float32, n)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lf),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hx), np.asarray(hf),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cx), np.asarray(cf),
                               rtol=0, atol=1e-6)


def test_lm_fused_step_bf16_close():
    cfg_x = LMConfig(vocab_size=12, embed_dim=16, hidden_dim=32,
                     step_impl="xla")
    cfg_f = dataclasses.replace(cfg_x, step_impl="fused")
    hx, cx, lx = _run_step(cfg_x, jnp.bfloat16, 8)
    hf, cf, lf = _run_step(cfg_f, jnp.bfloat16, 8)
    scale = np.abs(np.asarray(lx, np.float32)).max() + 1e-6
    assert (np.abs(np.asarray(lx, np.float32)
                   - np.asarray(lf, np.float32)).max() / scale) < 3e-2


def test_lm_large_vocab_runs_fused():
    """vocab > 128 (multi-lane-block one-hot): fused still matches XLA."""
    cfg_f = LMConfig(vocab_size=200, embed_dim=16, hidden_dim=24,
                     step_impl="fused")
    cfg_x = dataclasses.replace(cfg_f, step_impl="xla")
    hx, cx, lx = _run_step(cfg_x, jnp.float32, 6)
    hf, cf, lf = _run_step(cfg_f, jnp.float32, 6)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lf),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hx), np.asarray(hf),
                               rtol=0, atol=1e-6)


def test_lm_oversize_budget_falls_back(monkeypatch):
    """Shapes beyond the VMEM plan RUN the XLA path (exact equality).

    step_impl='fused' with a vocab the kernel plan rejects must produce
    the XLA step's result without ever invoking the kernel — the fused
    entry is stubbed out to prove the fallback is taken, not just that
    the plan predicate says no."""
    from robust_e2e_gan_tpu.ops import lm_step_pallas

    assert not lm_step_pallas.lm_step_plan(4, 100_000, 16, 16,
                                           1, jnp.float32)

    def _boom(*a, **kw):  # noqa: ANN001
        raise AssertionError("fused kernel invoked for oversize shapes")

    monkeypatch.setattr(lm_step_pallas, "lm_step_fused", _boom)
    cfg_f = LMConfig(vocab_size=100_000, embed_dim=16, hidden_dim=16,
                     step_impl="fused")
    cfg_x = dataclasses.replace(cfg_f, step_impl="xla")
    hx, cx, lx = _run_step(cfg_x, jnp.float32, 4)
    hf, cf, lf = _run_step(cfg_f, jnp.float32, 4)
    np.testing.assert_array_equal(np.asarray(lx), np.asarray(lf))
    np.testing.assert_array_equal(np.asarray(hx), np.asarray(hf))
    np.testing.assert_array_equal(np.asarray(cx), np.asarray(cf))


def test_beam_lm_fusion_impls_same_result():
    """Full beam search with RNNLM shallow fusion: fused LM step == XLA
    LM step, token-exact at f32."""
    from robust_e2e_gan_tpu.config import BeamSearchConfig
    from robust_e2e_gan_tpu.data.synthetic import (
        SyntheticConfig, make_batch,
    )
    from robust_e2e_gan_tpu.decode.beam import make_beam_searcher
    from robust_e2e_gan_tpu.pipeline import RobustE2E
    from tests.test_beam import JCFG, VOCAB

    scfg = SyntheticConfig(vocab_size=VOCAB, min_tokens=2, max_tokens=4)
    rng = np.random.default_rng(23)
    batch = make_batch(3, scfg, rng, ignore_id=-1)
    wav = jnp.asarray(batch["noisy_wav"])
    lens = jnp.asarray(batch["wav_lengths"])
    model = RobustE2E(JCFG)
    params = model.init(
        jax.random.PRNGKey(7), wav, lens, jnp.asarray(batch["labels"]),
        use_enhancer=True, method=RobustE2E.asr_forward,
    )["params"]

    res = {}
    for impl in ("xla", "fused"):
        lm_cfg = LMConfig(vocab_size=VOCAB, embed_dim=16, hidden_dim=24,
                          step_impl=impl)
        lm = RNNLM(lm_cfg)
        lm_params = lm.init(
            jax.random.PRNGKey(3), jnp.zeros((2, 4), jnp.int32)
        )["params"]
        bcfg = BeamSearchConfig(beam_size=4, ctc_weight=0.3, max_steps=8,
                                lm_weight=0.4)
        searcher = make_beam_searcher(
            model, JCFG.e2e, bcfg, use_enhancer=True,
            lm=lm, lm_params=lm_params,
        )
        res[impl] = searcher(params, wav, lens)
    np.testing.assert_array_equal(
        np.asarray(res["xla"].tokens), np.asarray(res["fused"].tokens)
    )
