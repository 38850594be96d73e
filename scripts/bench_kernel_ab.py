"""On-chip A/B for every `auto`-defaulted serving kernel (round-3 VERDICT #2).

Round 3 shipped `step_impl="auto"` (the fully-fused decoder step) without an
on-chip A/B; the only run where the fused step demonstrably executed
measured SLOWER than the XLA-step fallback (2130.9 vs 2185.0 utt/s). This
script measures the full bench.py program (flagship bf16, B=128, beam 8,
48 steps) with each serving-kernel knob flipped one at a time, >=3
repetitions each, and writes results/kernel_ab.json with a winner per knob.
`auto` defaults must then follow the measurement (models/* resolve via
utils/impl.py; docs/KERNELS.md evidence column cites this file).

Usage: PYTHONPATH=/root/repo python -u scripts/bench_kernel_ab.py [reps]
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

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from robust_e2e_gan_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from __graft_entry__ import _flagship_config
from robust_e2e_gan_tpu.config import BeamSearchConfig
from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, make_batch
from robust_e2e_gan_tpu.decode.beam import make_beam_searcher
from robust_e2e_gan_tpu.pipeline import RobustE2E, build_model

B = 128
VOCAB = 52

# one knob flipped at a time around the all-fused point; step=xla rows keep
# score=fused so the step-vs-score effects separate cleanly
CONFIGS = {
    "all_fused":      dict(step="fused", score="fused", lstm="tiled",
                           prefix="tiled"),
    "step_xla":       dict(step="xla",   score="fused", lstm="tiled",
                           prefix="tiled"),
    "score_xla":      dict(step="xla",   score="xla",   lstm="tiled",
                           prefix="tiled"),
    "lstm_scan":      dict(step="fused", score="fused", lstm="scan",
                           prefix="tiled"),
    "prefix_twopass": dict(step="fused", score="fused", lstm="tiled",
                           prefix="twopass"),
}


def build_searcher(knobs):
    jcfg = dataclasses.replace(_flagship_config(VOCAB),
                               compute_dtype="bfloat16")
    jcfg = dataclasses.replace(
        jcfg,
        e2e=dataclasses.replace(
            jcfg.e2e,
            attention=dataclasses.replace(
                jcfg.e2e.attention, score_impl=knobs["score"]),
            decoder=dataclasses.replace(
                jcfg.e2e.decoder, step_impl=knobs["step"]),
            encoder=dataclasses.replace(
                jcfg.e2e.encoder, lstm_impl=knobs["lstm"]),
        ),
        enhancer=dataclasses.replace(jcfg.enhancer, lstm_impl=knobs["lstm"]),
    )
    model = build_model(jcfg)
    bcfg = BeamSearchConfig(beam_size=8, ctc_weight=0.3, max_steps=48,
                            early_exit=False, prefix_impl=knobs["prefix"])
    return model, make_beam_searcher(model, jcfg.e2e, bcfg,
                                     use_enhancer=True)


def timed_reps(fn, reps, min_seconds=3.0, chunk=8):
    """bench.py's amortized-sync timing, repeated `reps` times."""
    np.asarray(fn())  # warm
    out = []
    for _ in range(reps):
        n, t0 = 0, time.perf_counter()
        while True:
            o = None
            for _ in range(chunk):
                o = fn()
            np.asarray(o)
            n += chunk
            dt = time.perf_counter() - t0
            if dt >= min_seconds:
                break
        out.append(B * n / dt)
    return out


def main(reps=3):
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    scfg = SyntheticConfig(vocab_size=VOCAB, min_tokens=48, max_tokens=58)
    batch = make_batch(B, scfg, rng, ignore_id=-1)
    wav = jnp.asarray(batch["noisy_wav"])
    lens = jnp.asarray(batch["wav_lengths"])

    # one param tree shared by every variant (same architecture throughout)
    model0, _ = build_searcher(CONFIGS["all_fused"])
    params = model0.init(
        jax.random.PRNGKey(0), wav[:2], lens[:2],
        jnp.asarray(batch["labels"][:2]),
        use_enhancer=True, method=RobustE2E.asr_forward,
    )["params"]

    rows = {}
    for name, knobs in CONFIGS.items():
        t0 = time.perf_counter()
        try:
            _, searcher = build_searcher(knobs)
            vals = timed_reps(
                lambda: searcher(params, wav, lens).lengths, reps
            )
            rows[name] = {
                "knobs": knobs,
                "utt_per_s": [round(v, 1) for v in vals],
                "mean": round(float(np.mean(vals)), 1),
                "min": round(float(np.min(vals)), 1),
                "compile_plus_measure_s": round(time.perf_counter() - t0, 1),
            }
        except Exception as e:
            rows[name] = {"knobs": knobs, "error": str(e)[:200]}
        print(name, rows[name], flush=True)

    def mean(n):
        return rows.get(n, {}).get("mean", -1.0)

    winners = {
        "step_impl": "fused" if mean("all_fused") >= mean("step_xla")
        else "xla",
        "score_impl": "fused" if mean("step_xla") >= mean("score_xla")
        else "xla",
        "lstm_impl": "tiled" if mean("all_fused") >= mean("lstm_scan")
        else "scan",
        "prefix_impl": "tiled" if mean("all_fused") >= mean("prefix_twopass")
        else "twopass",
    }
    out = {
        "backend": jax.default_backend(),
        "shapes": {"batch": B, "beam": 8, "max_steps": 48, "vocab": VOCAB,
                   "utterance_s": "~7", "dtype": "bfloat16"},
        "reps": reps,
        "rows": rows,
        "winners": winners,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "kernel_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"winners": winners}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
