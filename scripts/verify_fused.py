"""On-chip parity drive for the fused Pallas serving/training kernels.

Compiled-mode (not interpret) checks on the attached TPU:
  1. full beam search, fused impls (auto on TPU: fused attention step,
     fully-fused decoder step, tiled BLSTM, tiled CTC prefix) vs the
     all-XLA impls — same WER on a trained model, near-identical tokens;
  2. fused-train BLSTM (ops/blstm_train_pallas.py) gradients vs the scan
     path at f32 — the on-chip complement of the interpret-mode suite
     (tests/test_blstm_train_pallas.py), catching Mosaic lowering issues
     interpret mode cannot.

Usage: PYTHONPATH=/root/repo python -u scripts/verify_fused.py [train_steps]
Prints FUSED VERIFY PASS on success. Budget ~2-4 min warm cache.
"""

from __future__ import annotations

import dataclasses
import sys

import numpy as np
import jax
import jax.numpy as jnp

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from robust_e2e_gan_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from robust_e2e_gan_tpu.config import BeamSearchConfig
from robust_e2e_gan_tpu.data.synthetic import labels_to_list, make_batch
from robust_e2e_gan_tpu.decode.beam import make_beam_searcher
from robust_e2e_gan_tpu.models.enhancement import Discriminator
from robust_e2e_gan_tpu.models.rnn import BLSTM
from robust_e2e_gan_tpu.ops.editdistance import wer_details
from robust_e2e_gan_tpu.pipeline import RobustE2E
from robust_e2e_gan_tpu.train.steps import (
    init_train_state, make_joint_train_step,
)
from scripts.verify_drive import JCFG, SCFG, TCFG, VOCAB


def impls(jcfg, which):
    """Force every kernel-impl knob to `which` ('xla-ish scan' or auto)."""
    if which == "xla":
        att = dataclasses.replace(jcfg.e2e.attention, score_impl="xla")
        dec = dataclasses.replace(jcfg.e2e.decoder, step_impl="xla")
        enc = dataclasses.replace(jcfg.e2e.encoder, lstm_impl="scan")
        enh = dataclasses.replace(jcfg.enhancer, lstm_impl="scan")
        bcfg_impl = "twopass"
    else:
        att = dataclasses.replace(jcfg.e2e.attention, score_impl="fused")
        dec = dataclasses.replace(jcfg.e2e.decoder, step_impl="fused")
        enc = dataclasses.replace(jcfg.e2e.encoder, lstm_impl="tiled")
        enh = dataclasses.replace(jcfg.enhancer, lstm_impl="tiled")
        bcfg_impl = "tiled"
    return dataclasses.replace(
        jcfg,
        e2e=dataclasses.replace(jcfg.e2e, attention=att, decoder=dec,
                                encoder=enc),
        enhancer=enh,
    ), bcfg_impl


def main(steps=300):
    print("backend:", jax.default_backend(), jax.devices())

    # ---- 2. fused-train BLSTM grads vs scan, compiled on chip ----
    b, t, d, h = 8, 24, 16, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    lens = jnp.asarray(rng.integers(1, t + 1, size=b).astype(np.int32))
    mask = (jnp.arange(t)[None, :] < lens[:, None]).astype(jnp.float32)
    r = jnp.asarray(rng.standard_normal((b, t, 2 * h)).astype(np.float32))
    m_scan = BLSTM(h, impl="scan")
    m_fused = BLSTM(h, impl="fused")
    params = m_scan.init(jax.random.PRNGKey(0), x, mask)

    def loss(m):
        def f(p, xx):
            return jnp.sum(m.apply(p, xx, mask).astype(jnp.float32) * r)
        return jax.jit(jax.grad(f, argnums=(0, 1)))

    def max_norm_diff(g0, g1):
        worst = 0.0
        for a, bb_ in zip(jax.tree_util.tree_leaves(g0),
                          jax.tree_util.tree_leaves(g1)):
            scale = np.abs(np.asarray(a)).max() + 1e-6
            d = np.abs(np.asarray(bb_) - np.asarray(a)).max() / scale
            worst = max(worst, float(d))
        return worst

    # CORRECTNESS GATE: every dot pinned to HIGHEST precision (multi-pass
    # f32 emulation on the MXU) — both the scan path and the Pallas
    # kernels inherit the context default. With MXU rounding removed, any
    # remaining mismatch is a real kernel-gradient bug, so the gate is
    # tight (5e-5, the pre-round-3 value).
    with jax.default_matmul_precision("highest"):
        g0h = loss(m_scan)(params, x)
        g1h = loss(m_fused)(params, x)
    d_highest = max_norm_diff(g0h, g1h)
    print(f"fused-train BLSTM grad diff, HIGHEST precision: {d_highest:.3e} "
          "of max|grad| (gate 5e-5)")
    assert d_highest <= 5e-5, (
        "mismatch under highest precision — a kernel-gradient bug, not "
        f"MXU noise: {d_highest:.3e}"
    )

    # MXU-NOISE MEASUREMENT at default precision: single-pass-bf16 MXU
    # mode, where the fused backward RECOMPUTES gate pre-activations while
    # scan-autodiff reads stored ones — different decompositions of the
    # same math under bf16 rounding. The highest-precision gate above
    # proves any diff here is rounding, not math; measured 2.7e-4 and
    # 5.9e-4 of max|grad| on v5e across round-3/4 runs (it fluctuates with
    # data), so this is a sanity ceiling, not the correctness gate.
    g0 = loss(m_scan)(params, x)
    g1 = loss(m_fused)(params, x)
    d_default = max_norm_diff(g0, g1)
    print(f"fused-train BLSTM grad diff, default precision: {d_default:.3e} "
          "of max|grad| (MXU-noise measurement; ceiling 2e-3)")
    assert d_default <= 2e-3, d_default
    print("fused-train BLSTM grads == scan on chip "
          f"(HIGHEST {d_highest:.1e} <= 5e-5 proves the math; default-"
          f"precision diff {d_default:.1e} is MXU rounding by elimination)")

    # ---- 2b. fused CTC loss grads vs scan, compiled on chip ----
    from robust_e2e_gan_tpu.ops.ctc import ctc_loss

    rng = np.random.default_rng(2)
    bb_, tt_, vv_, ss_ = 8, 40, 12, 10
    logits = jnp.asarray(
        rng.standard_normal((bb_, tt_, vv_)).astype(np.float32)
    )
    llen = jnp.asarray(rng.integers(ss_ + 2, tt_ + 1, size=bb_), jnp.int32)
    slen = jnp.asarray(rng.integers(1, ss_ + 1, size=bb_), jnp.int32)
    labels = jnp.asarray(rng.integers(1, vv_, size=(bb_, ss_)), jnp.int32)
    gs = jax.jit(jax.grad(
        lambda x: ctc_loss(x, llen, labels, slen, impl="scan")))(logits)
    gf = jax.jit(jax.grad(
        lambda x: ctc_loss(x, llen, labels, slen, impl="fused")))(logits)
    np.testing.assert_allclose(
        np.asarray(gf), np.asarray(gs), rtol=0, atol=1e-5
    )
    print("fused CTC grads == scan on chip")

    # ---- 2c. fused LM step vs XLA, compiled on chip ----
    from robust_e2e_gan_tpu.models.lm import LMConfig, RNNLM

    lmc_x = LMConfig(vocab_size=VOCAB, embed_dim=32, hidden_dim=64,
                     step_impl="xla")
    lmc_f = dataclasses.replace(lmc_x, step_impl="fused")
    tokn = jnp.asarray(rng.integers(0, VOCAB, size=(32,)), jnp.int32)
    lm_x = RNNLM(lmc_x)
    lm_params = lm_x.init(jax.random.PRNGKey(0),
                          jnp.zeros((2, 4), jnp.int32))
    h0 = jnp.asarray(rng.standard_normal((1, 32, 64)), jnp.float32) * 0.3
    c0 = jnp.asarray(rng.standard_normal((1, 32, 64)), jnp.float32) * 0.3
    (hx, cx), lx = lm_x.apply(lm_params, (h0, c0), tokn, method=RNNLM.step)
    lm_f = RNNLM(lmc_f)
    (hf, cf), lf = lm_f.apply(lm_params, (h0, c0), tokn, method=RNNLM.step)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lf),
                               rtol=0, atol=1e-4)
    print("fused LM step == XLA on chip")

    # ---- 1. train briefly, then fused vs XLA search on chip ----
    rng = np.random.default_rng(1)
    seg = int(SCFG.tone_ms * SCFG.sample_rate / 1000.0)
    pad_to = SCFG.max_tokens * seg
    model = RobustE2E(JCFG)
    disc = Discriminator(JCFG.discriminator)
    batch0 = {k: jnp.asarray(v) for k, v in
              make_batch(16, SCFG, rng, pad_to_samples=pad_to,
                         ignore_id=-1).items()}
    state, opt_g, opt_d = init_train_state(model, disc, TCFG, batch0, seed=0)
    step = make_joint_train_step(model, disc, JCFG, opt_g, opt_d,
                                 with_asr=True)
    for i in range(steps):
        bt = make_batch(16, SCFG, rng, pad_to_samples=pad_to, ignore_id=-1)
        state, metrics = step(
            state, {k: jnp.asarray(v) for k, v in bt.items()}
        )
    print("trained, acc:", float(metrics["acc"]))

    eval_b = make_batch(16, SCFG, rng, pad_to_samples=pad_to, ignore_id=-1)
    wav = jnp.asarray(eval_b["noisy_wav"])
    lens = jnp.asarray(eval_b["wav_lengths"])
    refs = labels_to_list(eval_b["labels"])
    res = {}
    for which in ("xla", "fused"):
        jcfg, prefix_impl = impls(JCFG, which)
        m = RobustE2E(jcfg)
        bcfg = BeamSearchConfig(beam_size=4, ctc_weight=0.3, max_steps=10,
                                prefix_impl=prefix_impl)
        searcher = make_beam_searcher(m, jcfg.e2e, bcfg, use_enhancer=True)
        out = searcher(state.params_g, wav, lens)
        hyps = [[int(x) for x in row if x != -1]
                for row in np.asarray(out.tokens)]
        res[which] = (wer_details(refs, hyps), np.asarray(out.tokens))
        print(f"{which}: WER {res[which][0]}")
    wer_x, tok_x = res["xla"]
    wer_f, tok_f = res["fused"]
    assert abs(wer_x["error_rate"] - wer_f["error_rate"]) <= 0.01, (
        wer_x, wer_f,
    )
    same = float(np.mean(np.all(tok_x == tok_f, axis=1)))
    print(f"identical hypothesis rows: {same:.2%}")
    assert same >= 0.9, same  # f32: only genuine near-ties may flip
    print("FUSED VERIFY PASS")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
