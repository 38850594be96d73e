"""A/B: cross-batch staged serving vs the sequential searcher (round-4
VERDICT weak #3 / next-round item 2).

Measures, at the exact bench.py shapes/impls (flagship bf16, B=128, beam 8,
48-step search, ~7 s utterances):
  (a) sequential: make_beam_searcher called per batch (the round-4 headline
      schedule — enhancer, encoder, beam strictly serial per batch);
  (b) pipelined: make_pipelined_beam_searcher — batch i's beam loop and
      batch i+1's enhancer+encoder in ONE jitted program, so XLA may
      co-schedule the latency-bound beam scan with the next batch's
      throughput-bound encode matmuls.

Also asserts token-exact equivalence of the two schedules on one stream.
Writes results/pipeline_ab.json. Usage:
  PYTHONPATH=/root/repo python scripts/bench_pipeline.py [n_batches]
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
from robust_e2e_gan_tpu.decode.beam import (
    make_beam_searcher, make_pipelined_beam_searcher,
)
from robust_e2e_gan_tpu.pipeline import RobustE2E, build_model


def main(n_batches: int = 12, reps: int = 3) -> None:
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
    B = 128
    # distinct data per stream position so equivalence is a real check
    batches = []
    for _ in range(n_batches):
        b = make_batch(B, scfg, rng, ignore_id=-1)
        batches.append((jnp.asarray(b["noisy_wav"]),
                        jnp.asarray(b["wav_lengths"])))

    params = model.init(
        jax.random.PRNGKey(0), batches[0][0][:2], batches[0][1][:2],
        jnp.asarray(make_batch(2, scfg, rng, ignore_id=-1)["labels"]),
        use_enhancer=True, method=RobustE2E.asr_forward,
    )["params"]

    seq = make_beam_searcher(model, jcfg.e2e, bcfg, use_enhancer=True)
    pipe = make_pipelined_beam_searcher(model, jcfg.e2e, bcfg,
                                        use_enhancer=True)

    # --- equivalence: same tokens under both schedules ---
    ref = [np.asarray(seq(params, w, l).tokens) for w, l in batches[:3]]
    got = [np.asarray(r.tokens) for r in pipe(params, batches[:3])]
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(a, b, err_msg=f"batch {i} diverged")
    print(f"equivalence OK over 3 batches (B={B})", flush=True)

    # --- timing: whole-stream wall clock, hard host sync at the end of
    # each rep (np.asarray fetch; block_until_ready returns early on this
    # platform). One warm rep each to absorb compiles.
    def time_seq():
        outs = [seq(params, w, l).lengths for w, l in batches]
        np.asarray(outs[-1])
        return outs

    def time_pipe():
        outs = [r.lengths for r in pipe(params, batches)]
        np.asarray(outs[-1])
        return outs

    time_seq()
    time_pipe()
    seq_t, pipe_t = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        time_seq()
        seq_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        time_pipe()
        pipe_t.append(time.perf_counter() - t0)
    n_utts = B * n_batches
    seq_best = min(seq_t)
    pipe_best = min(pipe_t)
    out = {
        "program": "flagship batched beam decode, bench.py shapes/impls",
        "backend": jax.default_backend(),
        "batch": B,
        "n_batches": n_batches,
        "reps": reps,
        "sequential": {
            "s_per_stream": [round(t, 4) for t in seq_t],
            "utt_per_s": round(n_utts / seq_best, 1),
        },
        "pipelined": {
            "s_per_stream": [round(t, 4) for t in pipe_t],
            "utt_per_s": round(n_utts / pipe_best, 1),
        },
        "speedup": round(seq_best / pipe_best, 4),
    }
    print(json.dumps(out, indent=2), flush=True)
    _os.makedirs("results", exist_ok=True)
    with open("results/pipeline_ab.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    main(n)
