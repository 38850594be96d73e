"""Headline benchmark: enhanced+decoded utterances/sec/chip.

Measures the full flagship inference pipeline — waveform -> mask-estimating
enhancer -> differentiable fbank -> VGG/BLSTM encoder -> batched joint
CTC/attention BEAM SEARCH — jitted as one XLA program on one chip, over
CHiME-4-shaped utterances (~7 s audio, beam 8). The baseline column is the
same compiled program run reference-style: batch=1, host-synced per
utterance (the reference's per-utterance decode loop, SURVEY.md call stack
3.2). ``vs_baseline`` = batched / batch-1 throughput, the BASELINE.json
north-star ratio (target >= 10x).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from robust_e2e_gan_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from __graft_entry__ import _flagship_config
from robust_e2e_gan_tpu.config import BeamSearchConfig
from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, make_batch
from robust_e2e_gan_tpu.decode.beam import make_beam_searcher
from robust_e2e_gan_tpu.pipeline import RobustE2E, build_model


def _timed(fn, min_seconds=5.0, max_iters=200, chunk=8):
    """Throughput timing with amortized hard host syncs.

    ``fn`` must return a device array. `block_until_ready` has been
    observed returning early on the remote-tunnel platform, so the sync is
    an np.asarray fetch — but each synced call pays the tunnel's ~30 ms
    round-trip floor, so ``chunk`` calls are dispatched per fetch: the
    single device executes the queue in order, making the final fetch a
    completion barrier for all of them.
    """
    np.asarray(fn())  # warm (already compiled)
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


def _swept_batch_default(fallback: int) -> int:
    """Batch size for the headline: the hardware sweep's optimum if recorded.

    results/batch_sweep.json is written by scripts/bench_batch_sweep.py
    (same program, same impl ladder). Only TPU-backend rows count — a CPU
    smoke run must not steer the chip benchmark — and any malformed file
    falls back silently.
    """
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "batch_sweep.json")
    try:
        with open(path) as f:
            data = json.load(f)
        if data.get("backend") == "cpu":
            return fallback
        rows = [r for r in data.get("sweep", [])
                if "utt_per_s" in r and "batch" in r]
        best = max(rows, key=lambda r: r["utt_per_s"])
        return int(best["batch"])
    except Exception:
        return fallback


def _production_row():
    """Production-representative serving row (round-4 VERDICT weak #5).

    The headline above deliberately benches UNTRAINED weights with
    early-exit disabled (full 48-step search, comparable across rounds).
    Production decodes a TRAINED model with the token-exact early exit +
    streaming end-detect enabled; when the reference-scale trained
    checkpoint from the paper-claim run (exp/ab_ref_ckpt, 36M params)
    exists, bench that too. Best-effort: absent checkpoint or a compile
    failure returns None and the headline stands alone.
    """
    import dataclasses
    import os

    import glob as _glob

    root = os.path.dirname(os.path.abspath(__file__))
    # prefer the canonical paper-claim dir; fall back to any reference-scale
    # seed-replication run (exp/ is untracked and a VM restart can wipe the
    # original — any ab_ref* checkpoint is the same 36M recipe)
    candidates = [os.path.join(root, "exp", "ab_ref_ckpt")] + sorted(
        _glob.glob(os.path.join(root, "exp", "ab_ref*")))
    try:
        from flax import serialization

        from robust_e2e_gan_tpu.utils.checkpoint import _read_meta
        from scripts.adversarial_benefit import PAD_TO, SCFG, jcfg_for

        entry, path, ckpt_dir = None, None, None
        for d in candidates:
            e = _read_meta(d).get("latest")
            if not e:
                continue
            p = os.path.join(d, e["path"])
            if os.path.exists(p) and (
                    entry is None or e["step"] > entry["step"]):
                entry, path, ckpt_dir = e, p, d
        if entry is None:
            return None
        # raw msgpack -> params_g subtree (no optimizer templates needed).
        # device_put ONCE: msgpack_restore yields numpy arrays, and a
        # numpy tree passed as a jit ARGUMENT re-uploads all 145 MB over
        # the tunnel on every call — that, not compute, was the first
        # production rows' 1.5 s/batch (results/r5_hw/prod_breakdown*).
        with open(path, "rb") as f:
            tree = serialization.msgpack_restore(f.read())
        params = jax.device_put(tree["params_g"])
        jax.block_until_ready(params)

        jcfg = jcfg_for("reference")
        # jcfg_for is the TRAIN-side config (differentiable scan BLSTMs,
        # unroll tuned for the train step). Serving uses the measured
        # A/B-winner ladder — parameters are impl-independent.
        jcfg = dataclasses.replace(
            jcfg,
            e2e=dataclasses.replace(
                jcfg.e2e,
                encoder=dataclasses.replace(
                    jcfg.e2e.encoder, lstm_impl="auto", scan_unroll=0
                ),
            ),
            enhancer=dataclasses.replace(
                jcfg.enhancer, lstm_impl="auto", scan_unroll=0
            ),
        )
        model = build_model(jcfg)
        rng = np.random.default_rng(0)
        B = 128
        batch = make_batch(B, SCFG, rng, pad_to_samples=PAD_TO,
                           ignore_id=-1)
        wav = jnp.asarray(batch["noisy_wav"])
        lens = jnp.asarray(batch["wav_lengths"])
        row = {
            "model": "reference-scale 36M, trained "
                     f"({os.path.relpath(ckpt_dir, root)})",
            "batch": B,
            "ckpt_step": int(entry["step"]),
        }
        # both loop forms: the early-exit while_loop SHOULD win on a
        # trained model (it stops at the true hypothesis lengths), but
        # its first on-chip row measured 3.7 s/batch — 60x the scan —
        # so time the fixed-48-step scan beside it to pin whether the
        # while lowering itself is pathological on this platform.
        for tag, ee in (("early_exit", True), ("fixed_48", False)):
            bcfg = BeamSearchConfig(
                beam_size=8, ctc_weight=0.3, max_steps=48,
                early_exit=ee, end_detect=ee,
            )
            searcher = make_beam_searcher(model, jcfg.e2e, bcfg,
                                          use_enhancer=True)
            iters, dt = _timed(
                lambda: searcher(params, wav, lens).lengths,
                min_seconds=3.0, chunk=4,
            )
            row[f"utt_per_s_{tag}"] = round(B * iters / dt, 2)
        return row
    except Exception as e:  # absent ckpt / compile failure: headline stands
        import sys

        print(f"production row skipped: {str(e)[:160]}", file=sys.stderr)
        return None


def main():
    import dataclasses

    vocab = 52
    # bf16 compute for serving (params stay f32): 606 vs 497 utt/s measured
    # at B=64; decode parity with f32 is gated in scripts/verify_drive.py.
    jcfg = dataclasses.replace(
        _flagship_config(vocab), compute_dtype="bfloat16"
    )
    # serving path: fused Pallas BLSTM frame loops (forward-only; the
    # train-side config keeps the differentiable scan)
    jcfg = dataclasses.replace(
        jcfg,
        e2e=dataclasses.replace(
            jcfg.e2e,
            encoder=dataclasses.replace(jcfg.e2e.encoder, lstm_impl="auto"),
        ),
        enhancer=dataclasses.replace(jcfg.enhancer, lstm_impl="auto"),
    )
    model = build_model(jcfg)
    # early_exit=False: with untrained weights hypotheses can emit eos
    # arbitrarily early, so the honest throughput number runs the full
    # 48-step search; production decode keeps the (token-exact) early exit.
    bcfg = BeamSearchConfig(beam_size=8, ctc_weight=0.3, max_steps=48,
                            early_exit=False)

    rng = np.random.default_rng(0)
    # ~7 s utterances (CHiME-4-era utterance scale): 58 tokens * 120 ms
    scfg = SyntheticConfig(vocab_size=vocab, min_tokens=48, max_tokens=58)
    # Batch amortizes the latency-bound sequential LSTM chains; with the
    # tunnel RTT also amortized (chunked sync below), B=128 measured best
    # pre-kernel-fusion (815 utt/s @B=64 vs 898 @B=128, bf16). When the
    # post-fusion sweep (scripts/bench_batch_sweep.py) has run on TPU,
    # adopt its measured optimum instead.
    B = _swept_batch_default(128)
    batch = make_batch(B, scfg, rng, ignore_id=-1)
    wav = jnp.asarray(batch["noisy_wav"])
    lens = jnp.asarray(batch["wav_lengths"])

    params = model.init(
        jax.random.PRNGKey(0), wav[:2], lens[:2],
        jnp.asarray(batch["labels"][:2]),
        use_enhancer=True, method=RobustE2E.asr_forward,
    )["params"]

    searcher = make_beam_searcher(model, jcfg.e2e, bcfg, use_enhancer=True)

    # --- batched (TPU-native) path ---
    # degradation ladder: if a fused serving kernel fails to compile on
    # this platform, fall back toward the pure-XLA program rather than
    # failing the headline benchmark (auto-selection is best-effort).
    try:
        iters, dt = _timed(lambda: searcher(params, wav, lens).lengths)
    except Exception as e:
        import sys

        print(f"fused-step path failed ({str(e)[:120]}); "
              "retrying with step_impl=xla", file=sys.stderr)
        jcfg = dataclasses.replace(
            jcfg,
            e2e=dataclasses.replace(
                jcfg.e2e,
                decoder=dataclasses.replace(
                    jcfg.e2e.decoder, step_impl="xla"
                ),
            ),
        )
        model = build_model(jcfg)
        searcher = make_beam_searcher(
            model, jcfg.e2e, bcfg, use_enhancer=True
        )
        try:
            iters, dt = _timed(lambda: searcher(params, wav, lens).lengths)
        except Exception as e2:
            print(f"fused attention path failed ({str(e2)[:120]}); "
                  "retrying all-XLA", file=sys.stderr)
            jcfg = dataclasses.replace(
                jcfg,
                e2e=dataclasses.replace(
                    jcfg.e2e,
                    attention=dataclasses.replace(
                        jcfg.e2e.attention, score_impl="xla"
                    ),
                    encoder=dataclasses.replace(
                        jcfg.e2e.encoder, lstm_impl="scan"
                    ),
                ),
                enhancer=dataclasses.replace(
                    jcfg.enhancer, lstm_impl="scan"
                ),
            )
            model = build_model(jcfg)
            searcher = make_beam_searcher(
                model, jcfg.e2e, bcfg, use_enhancer=True
            )
            iters, dt = _timed(lambda: searcher(params, wav, lens).lengths)
    utt_s = B * iters / dt
    seq_utt_s = utt_s

    # --- cross-batch staged schedule (round-5): batch i's beam loop and
    # batch i+1's enhancer+encoder in one program. Measured on the same
    # data; the faster schedule becomes the headline value, both reported.
    pipe_utt_s = None
    try:
        from robust_e2e_gan_tpu.decode.beam import (
            make_pipelined_beam_searcher,
        )

        pipe = make_pipelined_beam_searcher(model, jcfg.e2e, bcfg,
                                            use_enhancer=True)
        stream = [(wav, lens)] * 16

        def run_stream():
            out = None
            for r in pipe(params, stream):
                out = r.lengths
            return out

        np.asarray(run_stream())  # compile + warm
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run_stream())
            dt_p = time.perf_counter() - t0
            best = dt_p if best is None else min(best, dt_p)
        pipe_utt_s = B * len(stream) / best
        utt_s = max(utt_s, pipe_utt_s)
    except Exception as e:
        import sys

        print(f"pipelined schedule skipped ({str(e)[:120]})",
              file=sys.stderr)

    # --- chunked-encode schedule (round-5): batch i+1's encode cut into
    # per-decode-step chunks INSIDE batch i's beam scan
    # (decode/chunked_encode.py). The on-chip stream A/B measured it
    # 0.54x (results/pipeline_ab.json chunked_speedup) — skip re-timing
    # it here unless the record is absent or favorable, so the headline
    # bench doesn't spend minutes compiling a measured-rejected
    # schedule every run.
    chunked_utt_s = None
    try:
        import os as _os

        try:
            with open(_os.path.join(
                    _os.path.dirname(_os.path.abspath(__file__)),
                    "results", "pipeline_ab.json")) as f:
                _rec = json.load(f)
            _cs = _rec.get("chunked_speedup")
        except Exception:
            _cs = None
        if _cs is not None and _cs < 1.02:
            raise RuntimeError(
                f"measured-rejected (chunked_speedup={_cs})"
            )
        from robust_e2e_gan_tpu.decode.beam import (
            make_chunked_pipelined_beam_searcher,
        )

        chunked = make_chunked_pipelined_beam_searcher(
            model, jcfg.e2e, bcfg, use_enhancer=True
        )
        stream = [(wav, lens)] * 16

        def run_chunked():
            out = None
            for r in chunked(params, stream):
                out = r.lengths
            return out

        np.asarray(run_chunked())  # compile + warm
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run_chunked())
            dt_c = time.perf_counter() - t0
            best = dt_c if best is None else min(best, dt_c)
        chunked_utt_s = B * len(stream) / best
        utt_s = max(utt_s, chunked_utt_s)
    except Exception as e:
        import sys

        print(f"chunked schedule skipped ({str(e)[:120]})",
              file=sys.stderr)

    # --- reference-style batch=1 loop (host-driven per-utterance decode) ---
    # Round-4 VERDICT weak #1: 8 RTT-dominated iterations made vs_baseline
    # swing 45% run to run. Now: >=64 iterations, per-iteration wall times,
    # MEDIAN statistic (robust to tunnel stragglers), and the tunnel's
    # host-sync round-trip — which the reference's local-GPU loop would not
    # pay — measured separately and subtracted for the corrected ratio.
    np.asarray(searcher(params, wav[:1], lens[:1]).lengths)  # compile B=1
    tiny = jnp.zeros((1,), jnp.int32) + 1
    np.asarray(tiny)
    rtts = []
    for _ in range(30):
        t0 = time.perf_counter()
        np.asarray(tiny + 1)  # trivial dispatch+fetch == pure tunnel RTT
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    n1 = 64
    iter_t = []
    for i in range(n1):
        j = i % B
        t0 = time.perf_counter()
        np.asarray(searcher(params, wav[j : j + 1], lens[j : j + 1]).lengths)
        iter_t.append(time.perf_counter() - t0)
    med = float(np.median(iter_t))
    utt_s_base_raw = 1.0 / med
    utt_s_base = 1.0 / max(med - rtt, 1e-6)

    row = {
        "metric": "enhanced+decoded utterances/sec/chip",
        "value": round(utt_s, 2),
        "unit": "utt/s",
        # corrected ratio (tunnel RTT subtracted from the batch=1 loop):
        # the conservative, reproducible number — raw kept for comparison
        # with rounds 1-4.
        "vs_baseline": round(utt_s / utt_s_base, 2),
        "vs_baseline_raw": round(utt_s / utt_s_base_raw, 2),
        "batch1_median_ms": round(1e3 * med, 2),
        "tunnel_rtt_ms": round(1e3 * rtt, 2),
        "sequential_utt_s": round(seq_utt_s, 2),
    }
    if pipe_utt_s is not None:
        row["pipelined_utt_s"] = round(pipe_utt_s, 2)
    if chunked_utt_s is not None:
        row["chunked_utt_s"] = round(chunked_utt_s, 2)
    schedules = {"sequential": seq_utt_s}
    if pipe_utt_s is not None:
        schedules["pipelined"] = pipe_utt_s
    if chunked_utt_s is not None:
        schedules["chunked"] = chunked_utt_s
    row["schedule"] = max(schedules, key=schedules.get)
    prod = _production_row()
    if prod is not None:
        row["production"] = prod
    print(json.dumps(row))


if __name__ == "__main__":
    main()
