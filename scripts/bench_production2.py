"""Piecewise localization of the production encode pathology.

prod_breakdown measured encode at 1.4-2.2 s/batch at reference dims on
2.8 s utterances (flagship encodes 7 s batches in ~34 ms), identical
across impl ladders — so the sink is in the shared chain. Time each
stage separately: STFT power, + enhancer, + fbank/CMVN, full encode.

Usage: PYTHONPATH=/root/repo python scripts/bench_production2.py
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

from robust_e2e_gan_tpu.data.synthetic import make_batch
from robust_e2e_gan_tpu.pipeline import RobustE2E, build_model
from robust_e2e_gan_tpu.utils.checkpoint import _read_meta
from scripts.adversarial_benefit import PAD_TO, SCFG, jcfg_for

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _timed(fn, reps=8):
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    np.asarray(out)
    return 1e3 * (time.perf_counter() - t0) / reps


def main():
    params = None
    for d in [os.path.join(ROOT, "exp", "ab_ref_ckpt")] + sorted(
            glob.glob(os.path.join(ROOT, "exp", "ab_ref*"))):
        entry = _read_meta(d).get("latest")
        if entry and os.path.exists(os.path.join(d, entry["path"])):
            with open(os.path.join(d, entry["path"]), "rb") as f:
                params = jax.device_put(
                    serialization.msgpack_restore(f.read())["params_g"])
                jax.block_until_ready(params)
            break
    if params is None:
        raise SystemExit("no ckpt")

    jcfg = jcfg_for("reference")
    model = build_model(jcfg)
    rng = np.random.default_rng(0)
    B = 128
    batch = make_batch(B, SCFG, rng, pad_to_samples=PAD_TO, ignore_id=-1)
    wav = jnp.asarray(batch["noisy_wav"])
    lens = jnp.asarray(batch["wav_lengths"])

    v = {"params": params}
    f_power = jax.jit(lambda w, l: model.apply(
        v, w, l, method=RobustE2E.noisy_power)[0])
    f_enh = jax.jit(lambda w, l: model.apply(
        v, w, l, method=RobustE2E.enhance)[0])
    f_full = jax.jit(lambda w, l: model.apply(
        v, w, l, True, method=RobustE2E.encode_for_decode)[0])

    def f_feats_fn(w, l):
        power, fmask = model.apply(v, w, l, method=RobustE2E.noisy_power)
        enh = model.apply(v, power, fmask,
                          method=lambda m, p, fm: m.enhancer(p, fm))[0]
        return model.apply(v, enh, fmask,
                           method=RobustE2E.features_from_power)

    f_feats = jax.jit(f_feats_fn)

    out = {}
    out["stft_power_ms"] = round(_timed(lambda: f_power(wav, lens)), 2)
    out["plus_enhancer_ms"] = round(_timed(lambda: f_enh(wav, lens)), 2)
    out["plus_fbank_cmvn_ms"] = round(_timed(lambda: f_feats(wav, lens)), 2)
    out["full_encode_ms"] = round(_timed(lambda: f_full(wav, lens)), 2)
    print(json.dumps(out), flush=True)

    # also: same full encode at FLAGSHIP-length audio (7 s) to separate
    # "reference dims" from "this task's shapes"
    batch7 = make_batch(B, SCFG, rng, pad_to_samples=112000,
                        ignore_id=-1)
    w7 = jnp.asarray(batch7["noisy_wav"])
    l7 = jnp.asarray(batch7["wav_lengths"])
    out["full_encode_7s_ms"] = round(_timed(lambda: f_full(w7, l7)), 2)
    print(json.dumps(out), flush=True)
    with open(os.path.join(ROOT, "results",
                           "production_breakdown2.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
