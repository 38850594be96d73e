"""Bisect the pathological decode batch tiles by impl knob (round-4
VERDICT weak #2 / next-round item 3).

The fine sweep measured a reproducible 2.8x cliff at B=112 and B=144
either side of the B=128 optimum (results/r4_hw/bench_batch_sweep_fine2
.log), worked around by pad_final in the CLIs — but nobody knows WHICH
kernel's grid degenerates. This reruns the sweep at the cliff shapes under
one impl knob at a time (everything else at the headline 'auto' ladder):

  base          auto everything (the headline program)
  lstm=scan     XLA scan BLSTMs instead of the fused Pallas frame loops
  att=xla       XLA attention step instead of the fused att kernel
  prefix=twopass XLA psi recursion instead of the batch-tiled Pallas kernel

If exactly one knob's 'xla' variant removes the cliff, that kernel's
tiling is the root cause. Writes results/batch_bisect.json.
Usage: PYTHONPATH=/root/repo python scripts/bench_batch_bisect.py [B ...]
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


def _timed(fn, min_seconds=4.0, max_iters=120, chunk=4):
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


def _jcfg(lstm="auto", att=None):
    jcfg = dataclasses.replace(_flagship_config(52),
                               compute_dtype="bfloat16")
    enc = dataclasses.replace(jcfg.e2e.encoder, lstm_impl=lstm)
    e2e = dataclasses.replace(jcfg.e2e, encoder=enc)
    if att is not None:
        e2e = dataclasses.replace(
            e2e, attention=dataclasses.replace(e2e.attention,
                                               score_impl=att))
    return dataclasses.replace(
        jcfg, e2e=e2e,
        enhancer=dataclasses.replace(jcfg.enhancer, lstm_impl=lstm),
    )


VARIANTS = {
    "base": dict(),
    "lstm=scan": dict(lstm="scan"),
    "att=xla": dict(att="xla"),
    "prefix=twopass": dict(prefix="twopass"),
}


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [96, 112, 128, 144, 160]
    rng = np.random.default_rng(0)
    scfg = SyntheticConfig(vocab_size=52, min_tokens=48, max_tokens=58)
    b_max = max(sizes)
    batch = make_batch(b_max, scfg, rng, ignore_id=-1)
    wav_all = jnp.asarray(batch["noisy_wav"])
    lens_all = jnp.asarray(batch["wav_lengths"])

    params = None
    results = {}
    for name, kv in VARIANTS.items():
        prefix = kv.pop("prefix", "auto")
        jcfg = _jcfg(**kv)
        model = build_model(jcfg)
        if params is None:
            params = model.init(
                jax.random.PRNGKey(0), wav_all[:2], lens_all[:2],
                jnp.asarray(batch["labels"][:2]),
                use_enhancer=True, method=RobustE2E.asr_forward,
            )["params"]
        bcfg = BeamSearchConfig(beam_size=8, ctc_weight=0.3, max_steps=48,
                                early_exit=False, prefix_impl=prefix)
        searcher = make_beam_searcher(model, jcfg.e2e, bcfg,
                                      use_enhancer=True)
        rows = []
        for b in sizes:
            wav, lens = wav_all[:b], lens_all[:b]
            try:
                iters, dt = _timed(
                    lambda: searcher(params, wav, lens).lengths)
            except Exception as e:
                rows.append({"batch": b, "error": str(e)[:200]})
                print(f"[{name}] B={b}: FAILED {str(e)[:120]}", flush=True)
                continue
            ms = 1000.0 * dt / iters
            rows.append({"batch": b, "ms_per_batch": round(ms, 2),
                         "utt_per_s": round(b * iters / dt, 1)})
            print(f"[{name}] B={b}: {ms:.1f} ms/batch", flush=True)
        # cliff metric: worst ms-per-utt in the sweep vs the B=128 row
        ok = [r for r in rows if "ms_per_batch" in r]
        per_utt = {r["batch"]: r["ms_per_batch"] / r["batch"] for r in ok}
        ref = per_utt.get(128) or min(per_utt.values())
        results[name] = {
            "rows": rows,
            "max_cliff_vs_b128": round(max(per_utt.values()) / ref, 3)
            if per_utt else None,
        }
        print(f"[{name}] cliff={results[name]['max_cliff_vs_b128']}x",
              flush=True)

    out = {
        "program": "flagship beam decode, one impl knob at a time",
        "backend": jax.default_backend(),
        "sizes": sizes,
        "variants": results,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "batch_bisect.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
