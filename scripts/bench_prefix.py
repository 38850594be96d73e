"""Compare CTC-prefix implementations inside the full beam decode on TPU.

Round-1 profiling found the sequential prefix scan to be the decode latency
floor (PARITY.md); round 2 adds the two-pass formulation and the Pallas
kernel (ops/ctc_prefix_pallas.py). This benchmark times the WHOLE jitted
decode program (bench.py shapes: B=128, beam 8, ~7 s utterances, bf16
compute) under each ``BeamSearchConfig.prefix_impl`` and checks the decoded
tokens agree.

  PYTHONPATH=/root/repo python scripts/bench_prefix.py [impls...]
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from robust_e2e_gan_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from __graft_entry__ import _flagship_config
from robust_e2e_gan_tpu.config import BeamSearchConfig
from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, make_batch
from robust_e2e_gan_tpu.decode.beam import make_beam_searcher
from robust_e2e_gan_tpu.pipeline import RobustE2E, build_model


def timed(fn, min_seconds=4.0, chunk=4):
    np.asarray(fn())
    n, t0 = 0, time.perf_counter()
    while True:
        out = None
        for _ in range(chunk):
            out = fn()
        np.asarray(out)
        n += chunk
        dt = time.perf_counter() - t0
        if dt >= min_seconds:
            return dt / n


def main(impls):
    vocab = 52
    jcfg = dataclasses.replace(
        _flagship_config(vocab), compute_dtype="bfloat16"
    )
    model = build_model(jcfg)
    rng = np.random.default_rng(0)
    scfg = SyntheticConfig(vocab_size=vocab, min_tokens=48, max_tokens=58)
    B = 128
    batch = make_batch(B, scfg, rng, ignore_id=-1)
    wav = jnp.asarray(batch["noisy_wav"])
    lens = jnp.asarray(batch["wav_lengths"])
    params = model.init(
        jax.random.PRNGKey(0), wav[:2], lens[:2],
        jnp.asarray(batch["labels"][:2]),
        use_enhancer=True, method=RobustE2E.asr_forward,
    )["params"]

    results = {}
    tokens = {}
    for impl in impls:
        # early_exit=False so every impl runs the identical 48 scan steps
        # (pure per-step cost comparison); bench.py measures the shipped
        # config separately.
        bcfg = BeamSearchConfig(beam_size=8, ctc_weight=0.3, max_steps=48,
                                prefix_impl=impl, early_exit=False)
        searcher = make_beam_searcher(model, jcfg.e2e, bcfg,
                                      use_enhancer=True)
        res = searcher(params, wav, lens)
        tokens[impl] = np.asarray(res.tokens)
        sec = timed(lambda: searcher(params, wav, lens).lengths)
        results[impl] = {"ms_per_batch": round(1000 * sec, 2),
                         "utt_per_s": round(B / sec, 1)}
        print(impl, results[impl], flush=True)

    base = impls[0]
    for impl in impls[1:]:
        same = np.array_equal(tokens[base], tokens[impl])
        results[impl]["tokens_match_" + base] = bool(same)
    print(json.dumps(results))


if __name__ == "__main__":
    main(sys.argv[1:] or ["scan", "twopass", "pallas"])
