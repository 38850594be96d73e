"""Benchmark the fused Pallas attention step vs the XLA beam path.

Times the REAL bound decoder chain (48-step scan of the flagship
DecoderStep at bench shapes, B=128, K=8) for score_impl in {xla, fused},
plus a block_b sweep of the kernel in isolation.

Usage:  python scripts/bench_att.py
Writes results/att_kernel.json.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from robust_e2e_gan_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from __graft_entry__ import _flagship_config
from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, make_batch
from robust_e2e_gan_tpu.pipeline import RobustE2E, build_model

STEPS = 48


def timed(fn, min_seconds=3.0, chunk=8):
    np.asarray(jax.tree_util.tree_leaves(fn())[0])
    n, t0 = 0, time.perf_counter()
    while True:
        for _ in range(chunk):
            out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        n += chunk
        dt = time.perf_counter() - t0
        if dt >= min_seconds:
            return dt / n * 1e3


def main():
    vocab = 52
    base = dataclasses.replace(_flagship_config(vocab),
                               compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    scfg = SyntheticConfig(vocab_size=vocab, min_tokens=48, max_tokens=58)
    B, K = 128, 8
    batch = make_batch(B, scfg, rng, ignore_id=-1)
    wav = jnp.asarray(batch["noisy_wav"])
    lens = jnp.asarray(batch["wav_lengths"])
    out = {"backend": jax.default_backend()}

    for impl in ("xla", "fused"):
        jcfg = dataclasses.replace(
            base,
            e2e=dataclasses.replace(
                base.e2e,
                attention=dataclasses.replace(
                    base.e2e.attention, score_impl=impl
                ),
            ),
        )
        model = build_model(jcfg)
        params = model.init(
            jax.random.PRNGKey(0), wav[:2], lens[:2],
            jnp.asarray(batch["labels"][:2]),
            use_enhancer=True, method=RobustE2E.asr_forward,
        )["params"]
        enc, emask, hlens, ctc_logits, enc_proj = model.apply(
            {"params": params}, wav, lens, use_enhancer=True,
            method=RobustE2E.encode_for_decode,
        )
        emask_k = jnp.repeat(emask, K, axis=0)
        c0 = model.apply(
            {"params": params}, B * K, emask_k,
            method=lambda m, *a: m.asr.decoder.initial_carry(*a),
        )
        toks0 = jnp.zeros((B * K,), jnp.int32)

        @jax.jit
        def chain(c0):
            def body(c, i):
                c, (logits, _) = model.apply(
                    {"params": params}, c, toks0 + i % vocab, enc,
                    enc_proj, emask,
                    method=lambda m, *a: m.asr.decoder.step(*a),
                )
                return c, logits[0, 0]

            _, outs = jax.lax.scan(body, c0, jnp.arange(STEPS))
            return outs

        ms = timed(lambda: chain(c0))
        out[f"decoder_chain_{impl}_ms"] = round(ms, 2)
        print(f"decoder chain [{impl}]: {ms:.2f} ms / {STEPS} steps")

    os.makedirs("results", exist_ok=True)
    with open("results/att_kernel.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
