"""MFU / roofline accounting for the two hot programs (round-2 VERDICT #1).

Measures, on the real chip:
  (a) the reference-scale joint adversarial G+D train step (SURVEY.md call
      stack 3.1 shapes: 3x512 BLSTMP encoder, 512 att/decoder, 2x512
      enhancer), and
  (b) the flagship B=128 batched beam-decode step (bench.py shapes),

and reports achieved FLOP/s and MFU against the v5e peak, plus a stage
breakdown (enhancer / encoder / beam loop) timed as separate jitted
subprograms — the top time sinks the VERDICT asked to be named.

FLOP counts come from XLA's own ``compiled.cost_analysis()['flops']``
(the compiler's static count of the optimized HLO), cross-checked with a
hand count of the dominant matmuls (BLSTM input+recurrent projections,
attention, decoder LSTM). Peak numbers: TPU v5e = 197 TFLOP/s bf16
(394 int8), HBM BW 819 GB/s (public spec).

Writes results/mfu.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from robust_e2e_gan_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import dataclasses

from __graft_entry__ import _flagship_config
from robust_e2e_gan_tpu.config import (
    AttentionConfig, BeamSearchConfig, DecoderConfig, DiscriminatorConfig,
    E2EConfig, EncoderConfig, EnhancerConfig, FrontendConfig, JointConfig,
    TrainConfig,
)
from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, make_batch
from robust_e2e_gan_tpu.decode.beam import make_beam_searcher
from robust_e2e_gan_tpu.models.enhancement import Discriminator
from robust_e2e_gan_tpu.pipeline import RobustE2E, build_model
from robust_e2e_gan_tpu.train.steps import init_train_state, make_joint_train_step

V5E_PEAK_BF16 = 197e12  # FLOP/s per chip
V5E_PEAK_F32 = 49e12  # MXU f32 ~ peak/4
V5E_HBM_BW = 819e9  # bytes/s


def _sync(x):
    return np.asarray(x)


def _timed(fn, min_seconds=3.0, chunk=8):
    """bench.py's chunked-sync timing (amortizes the tunnel RTT)."""
    _sync(fn())
    n, t0 = 0, time.perf_counter()
    while True:
        out = None
        for _ in range(chunk):
            out = fn()
        _sync(out)
        n += chunk
        dt = time.perf_counter() - t0
        if dt >= min_seconds:
            return dt / n


def _cost(jitted, *args):
    """XLA's static FLOP / bytes estimate of the optimized program."""
    compiled = jitted.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return {
        "flops": float(ca.get("flops", float("nan"))),
        "bytes": float(ca.get("bytes accessed", float("nan"))),
    }


def _reference_scale_config(vocab: int = 52) -> JointConfig:
    return JointConfig(
        e2e=E2EConfig(
            frontend=FrontendConfig(n_mels=80),
            encoder=EncoderConfig(
                input_dim=80, num_layers=3, hidden_dim=512, proj_dim=512,
            ),
            attention=AttentionConfig(dim=512, conv_kernel=201),
            decoder=DecoderConfig(vocab_size=vocab, embed_dim=512,
                                  hidden_dim=512),
        ),
        enhancer=EnhancerConfig(input_dim=257, num_layers=2, hidden_dim=512),
        discriminator=DiscriminatorConfig(input_dim=80, channels=(32, 64, 128)),
        compute_dtype="bfloat16",
    )


def _lstm_flops(t, b, in_dim, hidden, bidirectional=True):
    """2*(in+h)*4h MACs per step per direction (hand count, matmuls only)."""
    per_step = 2.0 * (in_dim + hidden) * 4 * hidden * b
    return per_step * t * (2 if bidirectional else 1)


def train_step_report(lstm_impl: str = "scan", ctc_impl: str = "auto"):
    """``lstm_impl='fused'`` routes every BLSTM through the custom-VJP
    Pallas train kernels (ops/blstm_train_pallas.py) and ``ctc_impl``
    selects the fused CTC loss — the round-3 kernels built against the
    measured 55%-HBM-bound scan step."""
    vocab = 52
    jcfg = dataclasses.replace(
        _reference_scale_config(vocab),
        e2e=dataclasses.replace(
            _reference_scale_config(vocab).e2e,
            encoder=dataclasses.replace(
                _reference_scale_config(vocab).e2e.encoder, scan_unroll=4,
                lstm_impl=lstm_impl,
            ),
            ctc_impl=ctc_impl,
        ),
    )
    jcfg = dataclasses.replace(
        jcfg, enhancer=dataclasses.replace(jcfg.enhancer,
                                           lstm_impl=lstm_impl),
    )
    model = build_model(jcfg)
    disc = Discriminator(jcfg.discriminator)
    tcfg = TrainConfig(optimizer="adadelta", batch_size=32)

    rng = np.random.default_rng(0)
    scfg = SyntheticConfig(vocab_size=vocab, min_tokens=20, max_tokens=24)
    B = 32
    batch = {
        k: jnp.asarray(v)
        for k, v in make_batch(B, scfg, rng, ignore_id=-1).items()
    }
    state, opt_g, opt_d = init_train_state(model, disc, tcfg, batch, seed=0)
    step = make_joint_train_step(model, disc, jcfg, opt_g, opt_d,
                                 with_asr=True)

    cost = _cost(step, state, batch)
    # step donates state; re-init for timing
    state, _, _ = init_train_state(model, disc, tcfg, batch, seed=0)

    def run(state):
        while True:
            state, metrics = step(state, batch)
            yield metrics["loss_g"]

    gen = run(state)
    sec = _timed(lambda: next(gen))

    wav_len = int(batch["noisy_wav"].shape[1])
    n_frames = wav_len // 160
    t_enc = n_frames // 4
    s_lab = int(batch["labels"].shape[1])
    e = jcfg.e2e.encoder
    enh = jcfg.enhancer
    d = jcfg.e2e.decoder
    hand_fwd = (
        _lstm_flops(n_frames, B, enh.input_dim, enh.hidden_dim)
        + _lstm_flops(n_frames, B, 2 * enh.hidden_dim, enh.hidden_dim)
        + 2.0 * B * n_frames * 2 * enh.hidden_dim * enh.input_dim  # mask proj
        + _lstm_flops(t_enc, B, 128 * (e.input_dim // 4), e.hidden_dim)
        + (e.num_layers - 1)
        * _lstm_flops(t_enc, B, e.proj_dim, e.hidden_dim)
        + e.num_layers * 2.0 * B * t_enc * 2 * e.hidden_dim * e.proj_dim
        + 2.0 * B * s_lab * (d.embed_dim + 512) * 4 * d.hidden_dim  # dec LSTM
        + 2.0 * B * s_lab * t_enc * jcfg.e2e.attention.dim * 2  # att scores
    )
    hand = 3.0 * hand_fwd * 2  # fwd+bwd ~3x fwd; G step + D step ~2 programs

    return {
        "program": "joint adversarial G+D train step (reference scale)",
        "batch": B,
        "wall_ms": sec * 1e3,
        "xla_flops": cost["flops"],
        "xla_bytes": cost["bytes"],
        "hand_flops_approx": hand,
        "achieved_tflops": cost["flops"] / sec / 1e12,
        "mfu_vs_bf16_peak": cost["flops"] / sec / V5E_PEAK_BF16,
        "hbm_bw_util": cost["bytes"] / sec / V5E_HBM_BW,
        "train_utt_per_s": B / sec,
    }


def decode_report():
    vocab = 52
    jcfg = dataclasses.replace(
        _flagship_config(vocab), compute_dtype="bfloat16"
    )
    model = build_model(jcfg)
    bcfg = BeamSearchConfig(beam_size=8, ctc_weight=0.3, max_steps=48,
                            early_exit=False)
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

    searcher = make_beam_searcher(model, jcfg.e2e, bcfg, use_enhancer=True)
    cost = _cost(searcher, params, wav, lens)
    sec = _timed(lambda: searcher(params, wav, lens).lengths)

    # --- stage breakdown as separate jitted subprograms. Each returns a
    # scalar reduction: fetching the real stage output (up to ~92 MB) would
    # time the tunnel transfer, not the stage (the sum forces the full
    # stage compute and cannot be DCE'd).
    @jax.jit
    def enhance_only(params, wav, lens):
        return jnp.sum(model.apply({"params": params}, wav, lens,
                                   method=RobustE2E.enhance)[0])

    @jax.jit
    def encode_only(params, wav, lens):
        out = model.apply({"params": params}, wav, lens, True,
                          method=RobustE2E.encode_for_decode)
        return jnp.sum(out[0]) + jnp.sum(out[3])

    t_enh = _timed(lambda: enhance_only(params, wav, lens))
    t_enc = _timed(lambda: encode_only(params, wav, lens))
    stages = {
        "enhancer_ms": t_enh * 1e3,
        "enhancer+frontend+encoder_ms": t_enc * 1e3,
        "beam_loop_ms": (sec - t_enc) * 1e3,
        "total_ms": sec * 1e3,
    }

    # --- cross-batch staged program (round 5): beam(i) + encode(i+1) in
    # one program. cross_batch_overlap_ms = (sequential total) - (staged
    # steady-state) — how much of the next batch's encode XLA actually
    # hides inside the beam loop's bubbles.
    pipelined = None
    try:
        from robust_e2e_gan_tpu.decode.beam import (
            make_pipelined_beam_searcher,
        )

        pipe = make_pipelined_beam_searcher(model, jcfg.e2e, bcfg,
                                            use_enhancer=True)
        stream = [(wav, lens)] * 10

        def run_stream():
            out = None
            for r in pipe(params, stream):
                out = r.lengths
            return out

        t_stream = _timed(run_stream, min_seconds=3.0, chunk=1)
        staged_ms = t_stream * 1e3 / len(stream)  # steady-state per batch
        pipelined = {
            "staged_ms_per_batch": staged_ms,
            "cross_batch_overlap_ms": sec * 1e3 - staged_ms,
            "utt_per_s": B / (staged_ms / 1e3),
        }
    except Exception as e:
        pipelined = {"error": str(e)[:200]}

    return {
        "program": "flagship batched beam decode (bench.py shapes)",
        "batch": B,
        "beam": 8,
        "wall_ms": sec * 1e3,
        "xla_flops": cost["flops"],
        "xla_bytes": cost["bytes"],
        "achieved_tflops": cost["flops"] / sec / 1e12,
        "mfu_vs_bf16_peak": cost["flops"] / sec / V5E_PEAK_BF16,
        "hbm_bw_util": cost["bytes"] / sec / V5E_HBM_BW,
        "utt_per_s": B / sec,
        "stages": stages,
        "pipelined": pipelined,
    }


def main():
    out = {
        "peaks": {"bf16_flops": V5E_PEAK_BF16, "hbm_bytes_per_s": V5E_HBM_BW},
        "train": train_step_report(),
        "decode": decode_report(),
    }
    try:
        out["train_fused"] = train_step_report(lstm_impl="fused",
                                               ctc_impl="fused")
    except Exception as e:
        out["train_fused"] = {"error": str(e)[:200]}
    os.makedirs("results", exist_ok=True)
    with open("results/mfu.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
