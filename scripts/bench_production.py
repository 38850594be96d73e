"""Stage breakdown of the production-representative serving row.

The first trained-checkpoint bench rows (results/r5_hw/bench_d.log) read
71.6 utt/s at B=128 — ~32x below the flagship headline and identical
with and without the early-exit while loop — on 2.8 s utterances that
should decode FASTER than the 7 s bench shapes. This script pins where
the time goes: encode vs beam, train-side scan impls vs the serving
kernel ladder, and per-stage times, on the trained exp/ab_ref* ckpt.

Usage: PYTHONPATH=/root/repo python scripts/bench_production.py
Writes results/production_breakdown.json.
"""

from __future__ import annotations

import dataclasses
import glob
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

from flax import serialization

from robust_e2e_gan_tpu.config import BeamSearchConfig
from robust_e2e_gan_tpu.data.synthetic import make_batch
from robust_e2e_gan_tpu.decode.beam import _bind_search_parts
from robust_e2e_gan_tpu.utils.checkpoint import _read_meta
from scripts.adversarial_benefit import PAD_TO, SCFG, jcfg_for

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_params():
    candidates = [os.path.join(ROOT, "exp", "ab_ref_ckpt")] + sorted(
        glob.glob(os.path.join(ROOT, "exp", "ab_ref*")))
    for d in candidates:
        entry = _read_meta(d).get("latest")
        if not entry:
            continue
        p = os.path.join(d, entry["path"])
        if os.path.exists(p):
            with open(p, "rb") as f:
                tree = serialization.msgpack_restore(f.read())
            import jax as _jax
            params = _jax.device_put(tree["params_g"])
            _jax.block_until_ready(params)
            return params, d
    raise SystemExit("no trained exp/ab_ref* checkpoint found")


def _timed(fn, reps=12):
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


def main():
    params, ckpt_dir = _load_params()
    rng = np.random.default_rng(0)
    B = 128
    batch = make_batch(B, SCFG, rng, pad_to_samples=PAD_TO, ignore_id=-1)
    wav = jnp.asarray(batch["noisy_wav"])
    lens = jnp.asarray(batch["wav_lengths"])
    print(f"ckpt={ckpt_dir} wav={wav.shape} ({wav.shape[1]/16000:.1f}s)",
          flush=True)

    from robust_e2e_gan_tpu.pipeline import build_model

    out = {"batch": B, "wav_samples": int(wav.shape[1]),
           "backend": jax.default_backend(), "variants": {}}
    base = jcfg_for("reference")
    serving = dataclasses.replace(
        base,
        e2e=dataclasses.replace(
            base.e2e,
            encoder=dataclasses.replace(
                base.e2e.encoder, lstm_impl="auto", scan_unroll=0
            ),
        ),
        enhancer=dataclasses.replace(
            base.enhancer, lstm_impl="auto", scan_unroll=0
        ),
    )
    # third variant: full-XLA decode side — if the fused att/prefix
    # kernels hit degenerate grids at this task's SHORT encoded length
    # (T4 ~ 70 vs the 174 they were A/B'd at), both impl ladders above
    # would be slow in beam_ms and this one would not.
    xla_decode = dataclasses.replace(
        serving,
        e2e=dataclasses.replace(
            serving.e2e,
            attention=dataclasses.replace(
                serving.e2e.attention, score_impl="xla"
            ),
            decoder=dataclasses.replace(
                serving.e2e.decoder, step_impl="xla"
            ),
        ),
    )
    variants = (("train_impls_scan_unroll4", base, "auto"),
                ("serving_impls_auto", serving, "auto"),
                ("xla_decode_side", xla_decode, "twopass"))
    for name, jcfg, prefix in variants:
        model = build_model(jcfg)
        bcfg = BeamSearchConfig(beam_size=8, ctc_weight=0.3,
                                max_steps=48, early_exit=False,
                                prefix_impl=prefix)
        encode_fn, decode_fn = _bind_search_parts(
            model, jcfg.e2e, bcfg, True, None, None, "wav", False
        )
        enc_j = jax.jit(encode_fn)
        dec_j = jax.jit(decode_fn)

        try:
            t_enc = _timed(lambda: enc_j(params, wav, lens)[0])
            enc = jax.block_until_ready(enc_j(params, wav, lens))
            t_dec = _timed(lambda: dec_j(params, enc).lengths)

            def full():
                return dec_j(params, enc_j(params, wav, lens)).lengths

            t_full = _timed(full)
            row = {
                "encode_ms": round(1e3 * t_enc, 2),
                "beam_ms": round(1e3 * t_dec, 2),
                "full_ms": round(1e3 * t_full, 2),
                "utt_per_s": round(B / t_full, 1),
            }
        except Exception as e:
            row = {"error": str(e)[:300]}
        out["variants"][name] = row
        print(name, row, flush=True)

    with open(os.path.join(ROOT, "results",
                           "production_breakdown.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
