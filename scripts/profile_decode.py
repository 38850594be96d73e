"""Profile the decode pipeline: per-stage timing + optional Perfetto trace.

SURVEY.md section 5 "Tracing/profiling" row: the reference had none; the
TPU-native plan is jax.profiler traces + per-step timing.

NOTE: on the remote-tunnel TPU platform every host-synced call pays a
~30 ms round-trip floor (measured: jnp.sum of a resident 17.8 MB array =
29.9 ms), so ABSOLUTE stage times are RTT-dominated; read the DELTAS
between stages, or use --trace and read the device timeline. Usage:

  PYTHONPATH=/root/repo python scripts/profile_decode.py [--trace DIR]
"""

from __future__ import annotations

import argparse
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
from robust_e2e_gan_tpu.utils.logging import profile_trace


def _timed(fn, seconds=3.0):
    np.asarray(jax.tree_util.tree_leaves(fn())[0])
    t0, n = time.perf_counter(), 0
    while time.perf_counter() - t0 < seconds:
        r = fn()
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        n += 1
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", help="write a Perfetto trace to this dir")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--beam", type=int, default=8)
    ap.add_argument("--steps", type=int, default=48)
    args = ap.parse_args()

    jcfg = _flagship_config(52)
    model = build_model(jcfg)
    rng = np.random.default_rng(0)
    scfg = SyntheticConfig(vocab_size=52, min_tokens=48, max_tokens=58)
    batch = make_batch(args.batch, scfg, rng, ignore_id=-1)
    wav = jnp.asarray(batch["noisy_wav"])
    lens = jnp.asarray(batch["wav_lengths"])
    params = model.init(
        jax.random.PRNGKey(0), wav[:2], lens[:2],
        jnp.asarray(batch["labels"][:2]),
        use_enhancer=True, method=RobustE2E.asr_forward,
    )["params"]

    # each stage returns a scalar so timing measures compute, not the
    # multi-MB device->host fetch of intermediate tensors over the tunnel
    stft = jax.jit(lambda p, w, l: jnp.sum(model.apply(
        {"params": p}, w, l, method=RobustE2E.noisy_power)[0]))
    enh = jax.jit(lambda p, w, l: jnp.sum(model.apply(
        {"params": p}, w, l, method=RobustE2E.enhance)[0]))
    enc = jax.jit(lambda p, w, l: jnp.sum(model.apply(
        {"params": p}, w, l, True, method=RobustE2E.encode_for_decode)[0]))
    searcher = make_beam_searcher(
        model, jcfg.e2e,
        BeamSearchConfig(beam_size=args.beam, max_steps=args.steps),
    )

    stages = [
        ("stft_power", lambda: stft(params, wav, lens)),
        ("stft+enhancer", lambda: enh(params, wav, lens)),
        ("full encode (enh+fbank+vgg+blstm)", lambda: enc(params, wav, lens)),
        (f"encode+beam{args.beam}x{args.steps}",
         lambda: searcher(params, wav, lens).lengths),
    ]
    prev = 0.0
    for name, fn in stages:
        ms = _timed(fn)
        print(f"{name:40s} {ms:8.1f} ms  (+{ms - prev:6.1f})")
        prev = ms

    if args.trace:
        with profile_trace(args.trace):
            for _ in range(3):
                np.asarray(searcher(params, wav, lens).lengths)
        print(f"trace written under {args.trace}/profile")


if __name__ == "__main__":
    main()
