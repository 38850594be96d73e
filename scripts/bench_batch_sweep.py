"""Decode batch-size sweep for the headline benchmark configuration.

The flagship beam decode is latency-bound (results/mfu.json: 13.4% MFU,
26% HBM BW at B=128) — the serial LSTM/attention chains cost nearly the
same wall time regardless of how many utterances ride them, so throughput
should scale with batch until a roof (VMEM tiling, HBM, or MXU) bites.
This sweeps B over the bench.py program (same shapes, same impl ladder)
and reports utt/s per batch size, so bench.py's default B tracks the
post-kernel-fusion optimum instead of the round-2 measurement.

Usage: python scripts/bench_batch_sweep.py [B ...]   (default sweep below)
Writes results/batch_sweep.json.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from robust_e2e_gan_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from __graft_entry__ import _flagship_config
from robust_e2e_gan_tpu.config import BeamSearchConfig
from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, make_batch
from robust_e2e_gan_tpu.decode.beam import make_beam_searcher
from robust_e2e_gan_tpu.pipeline import RobustE2E, build_model


def _timed(fn, min_seconds=5.0, max_iters=200, chunk=4):
    np.asarray(fn())  # warm
    n, t0 = 0, time.perf_counter()
    while True:
        out = None
        for _ in range(chunk):
            out = fn()
        np.asarray(out)
        n += chunk
        dt = time.perf_counter() - t0
        if dt >= min_seconds or n >= max_iters:
            return n, dt


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [64, 128, 192, 256, 384, 512]
    vocab = 52
    jcfg = dataclasses.replace(
        _flagship_config(vocab), compute_dtype="bfloat16"
    )
    jcfg = dataclasses.replace(
        jcfg,
        e2e=dataclasses.replace(
            jcfg.e2e,
            encoder=dataclasses.replace(jcfg.e2e.encoder, lstm_impl="auto"),
        ),
        enhancer=dataclasses.replace(jcfg.enhancer, lstm_impl="auto"),
    )
    model = build_model(jcfg)
    bcfg = BeamSearchConfig(beam_size=8, ctc_weight=0.3, max_steps=48,
                            early_exit=False)

    rng = np.random.default_rng(0)
    scfg = SyntheticConfig(vocab_size=vocab, min_tokens=48, max_tokens=58)
    b_max = max(sizes)
    batch = make_batch(b_max, scfg, rng, ignore_id=-1)
    wav_all = jnp.asarray(batch["noisy_wav"])
    lens_all = jnp.asarray(batch["wav_lengths"])

    params = model.init(
        jax.random.PRNGKey(0), wav_all[:2], lens_all[:2],
        jnp.asarray(batch["labels"][:2]),
        use_enhancer=True, method=RobustE2E.asr_forward,
    )["params"]
    searcher = make_beam_searcher(model, jcfg.e2e, bcfg, use_enhancer=True)

    rows = []
    for b in sizes:
        wav, lens = wav_all[:b], lens_all[:b]
        try:
            iters, dt = _timed(lambda: searcher(params, wav, lens).lengths)
        except Exception as e:  # OOM / tiling failure at this B: record it
            rows.append({"batch": b, "error": str(e)[:200]})
            print(f"B={b}: FAILED {str(e)[:120]}", flush=True)
            continue
        utt_s = b * iters / dt
        ms = 1000.0 * dt / iters
        rows.append({"batch": b, "utt_per_s": round(utt_s, 1),
                     "ms_per_batch": round(ms, 2)})
        print(f"B={b}: {utt_s:.1f} utt/s ({ms:.1f} ms/batch)", flush=True)

    out = {
        "program": "flagship batched beam decode (bench.py shapes/impls)",
        "backend": jax.default_backend(),
        "beam": 8,
        "max_steps": 48,
        "sweep": rows,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "batch_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
