"""Step-chunked encode: the full enhancer+fbank+encoder chain re-expressed
as ~48 sequential slices that run INSIDE the beam-search scan body.

Why: serving wall time is the serial sum enhancer (~16 ms) + encoder
(~16 ms) + 48-step beam loop (~31 ms at B=128 bench shapes,
results/beam_parts.json), and both schedule-level overlap ideas are
measured dead ends (results/wavefront.json, results/pipeline_ab.json):
the beam loop is ONE XLA while op, scheduled atomically, so nothing
outside it can overlap it. The only structure the TPU scheduler does
overlap is independent chains WITHIN one loop iteration (the measured
20.9 ms in-search overlap). This module exploits exactly that: batch
i+1's encode is cut into per-decode-step chunks, and each beam step of
batch i additionally advances batch i+1's encode by one chunk. The
latency-bound decode step (tiny matmuls, idle MXU) and the chunk's MXU
work (LSTM gate matmuls, VGG convs, DFT) then share one iteration.

Mechanics (SURVEY.md call stack 3.2 semantics preserved exactly):
  * A static ``ChunkPlan`` partitions the encode DAG into stages —
    STFT, per-layer bidirectional-LSTM sweeps (enhancer + encoder),
    the mask/fbank/CMVN step, VGG (time-chunked with halo), BLSTMP
    projections, and the CTC/attention heads — and allocates the beam
    loop's ``max_steps`` step budget across them proportionally to
    estimated wall cost.
  * The carry is a dict of preallocated HBM buffers with zero margins
    on both ends of the time axis, so every chunk read/write is a
    plain in-bounds ``dynamic_slice`` — ragged final chunks spill
    into the margin where masks are 0 and the LSTM mask gate makes
    frames state-transparent (same argument as models/rnn.py).
  * Both directions of each BLSTM sweep advance together as the
    (2, B, ...) lane layout of models/rnn.py::BLSTM — the backward
    lane reads/writes flipped coordinates, so chunk j of the sweep
    processes frames [jc, jc+c) of the forward sequence and the
    mirror-image window of the flipped one.
  * ``lax.switch`` on the (traced) step index selects the stage; each
    branch knows its chunk geometry statically.

Numerical equivalence with the monolithic ``lstm_impl="scan"`` encode
is exact by construction (identical op sequences on identical values;
asserted in tests/test_chunked_encode.py). The fused Pallas BLSTM
kernels loop the full T internally and cannot be chunked without new
kernel variants; the scan math costs ~5.6% end-to-end on chip
(results/kernel_ab.json lstm_scan row), far less than the serial
encode time this schedule can hide.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from robust_e2e_gan_tpu.config import JointConfig
from robust_e2e_gan_tpu.models.encoder import (
    VGG2L,
    subsampled_frames,
    subsampled_lengths,
)
from robust_e2e_gan_tpu.ops import fbank as fbank_ops

# Wall-cost model for the step-budget allocator (schedule shaping only —
# correctness never depends on these). LSTM sweeps are latency-bound
# (~constant per frame regardless of width); VGG is throughput-bound.
_LSTM_US_PER_FRAME = 11.0
_VGG_US_PER_FRAME = 10.0
_STFT_US_PER_FRAME = 0.5


@dataclasses.dataclass(frozen=True)
class Stage:
    kind: str  # stft | lstm | fbank | vgg | proj | heads | noop
    start: int  # first beam step owning this stage
    n_chunks: int
    chunk: int  # frames per chunk in the stage's own time domain
    layer: int = 0  # lstm/proj layer index within its group
    group: str = ""  # "enh" | "enc" for lstm/proj stages


@dataclasses.dataclass(frozen=True)
class ChunkPlan:
    stages: Tuple[Stage, ...]
    total_steps: int
    t: int  # frame count (logical)
    t4: int  # subsampled frame count
    m_t: int  # margin of T-domain buffers
    m_t4: int  # margin of T4-domain buffers
    n_wav_pad: int  # padded waveform length


def _vgg_layout(t4: int, c4: int) -> Tuple[bool, int, int]:
    """(has_head, n_regular_chunks, s4_tail) partition of the t4 output
    rows into head [0, c4) + regular [(j+1)c4, ...) + tail [s4_tail, t4).

    Edge rows 0..1 and t4-2..t4-1 can only be computed by slices with
    the exact monolithic boundary (head/tail); the tail must therefore
    keep >= 2 rows, and when t4 is too small for head + 2 tail rows the
    whole extent collapses into one exact tail slice.
    """
    if t4 <= c4 + 1:
        return False, 0, 0  # tail-only: exact geometry at both edges
    n_reg = max(0, (t4 - c4 - 2) // c4)
    return True, n_reg, (n_reg + 1) * c4


def make_chunk_plan(
    jcfg: JointConfig, num_samples: int, n_steps: int,
    use_enhancer: bool = True,
) -> ChunkPlan:
    """Static stage schedule for one batch shape.

    ``n_steps`` is the beam loop's step budget (BeamSearchConfig
    .max_steps); stages that don't fit run in the finalize loop after
    the beam scan (correct, just less overlapped).
    """
    fcfg = jcfg.e2e.frontend
    t = fbank_ops.num_frames(num_samples, fcfg)
    if t <= 0:
        raise ValueError(f"waveform too short for framing: {num_samples}")
    t4 = subsampled_frames(t)
    nl_enh = jcfg.enhancer.num_layers if use_enhancer else 0
    nl_enc = jcfg.e2e.encoder.num_layers

    # --- variable-size phases and their wall-cost weights.
    var = [("stft", t, _STFT_US_PER_FRAME * t)]
    for i in range(nl_enh):
        var.append((f"enh{i}", t, _LSTM_US_PER_FRAME * t))
    var.append(("vgg", t4, _VGG_US_PER_FRAME * t))
    for i in range(nl_enc):
        var.append((f"enc{i}", t4, _LSTM_US_PER_FRAME * t4))

    # fbank + vgg_head + vgg_tail + (nl_enc - 1) projections + heads
    n_fixed = 3 + nl_enc
    budget = max(n_steps - n_fixed, len(var))
    wsum = sum(w for _, _, w in var)
    counts = {}
    for name, frames, w in var:
        n = max(1, int(round(budget * w / wsum)))
        counts[name] = min(n, frames)
    # trim overshoot from the largest phases so the plan fits the budget
    while sum(counts.values()) > budget:
        big = max(counts, key=lambda k: counts[k])
        if counts[big] <= 1:
            break
        counts[big] -= 1

    # --- chunk geometry. VGG chunks are multiples of 4 input frames so
    # pool windows never straddle chunk boundaries (alignment to the
    # absolute frame grid is what makes chunked == monolithic).
    geom = {}
    for name, frames, _ in var:
        n = counts[name]
        if name == "vgg":
            c4 = max(-(-t4 // n), 2)  # output rows per chunk (>= 2: the
            # head stage must own BOTH left-edge rows, see _vgg_layout)
            n = -(-t4 // c4)
            geom[name] = (n, c4)
        else:
            c = -(-frames // n)
            n = -(-frames // c)
            geom[name] = (n, c)

    # --- margins. A sweep phase of n chunks of c frames covers
    # [0, n*c): writes overshoot the logical extent by n*c - t on the
    # right, and the backward lane's flip-reads underrun by the same
    # amount on the left — THAT (not the chunk size) is what the margin
    # must absorb. The VGG interior chunks additionally read an 8-frame
    # halo each side. (An earlier draft used max chunk size, which let
    # the single-chunk STFT phase balloon every T buffer ~3x.)
    def _overshoot(name, frames):
        n, c = geom[name]
        return n * c - frames

    m_t = max(
        [_overshoot(k, t) for k in geom
         if k != "vgg" and not k.startswith("enc")] + [16]
    )
    m_t = -(-m_t // 4) * 4  # keep VGG slice arithmetic aligned
    m_t4 = max([_overshoot(k, t4) for k in geom if k.startswith("enc")]
               + [4]) + 4

    # --- lay the stages out in dependency order.
    stages = []
    step = 0

    def add(kind, n_chunks, chunk, layer=0, group=""):
        nonlocal step
        stages.append(Stage(kind, step, n_chunks, chunk, layer, group))
        step += n_chunks

    add("stft", *geom["stft"])
    for i in range(nl_enh):
        add("lstm", *geom[f"enh{i}"], layer=i, group="enh")
    add("fbank", 1, 0)
    # VGG boundary chunks need EXACT input geometry: at both edges the
    # monolithic conv SAME-pads and pools over windows that a zero-
    # extended chunk computes differently (margin-zero frames conv to
    # bias-driven nonzeros that leak through the pools). Interior rows
    # q in [2, t4-2) provably depend only on in-range data (receptive
    # field [4q-6, 4q+9], pooled half-rows [2q-3, 2q+3]), so only the
    # head and tail chunks take the exact-slice branches.
    c4 = geom["vgg"][1]
    has_head, n_reg, _ = _vgg_layout(t4, c4)
    if has_head:
        add("vgg_head", 1, c4)
    if n_reg > 0:
        add("vgg", n_reg, c4)
    add("vgg_tail", 1, c4)
    for i in range(nl_enc):
        add("lstm", *geom[f"enc{i}"], layer=i, group="enc")
        if i < nl_enc - 1:
            add("proj", 1, 0, layer=i, group="enc")
    add("heads", 1, 0)
    total = step
    # explicit noop stage absorbs beam steps past the schedule (cheap:
    # carry passes through untouched instead of re-running heads)
    stages.append(Stage("noop", total, 1 << 30, 0))

    shift, flen = fcfg.frame_shift, fcfg.frame_length
    n_wav_pad = (geom["stft"][0] * geom["stft"][1] - 1) * shift + flen
    return ChunkPlan(
        stages=tuple(stages), total_steps=step, t=t, t4=t4,
        m_t=m_t, m_t4=m_t4, n_wav_pad=max(n_wav_pad, num_samples),
    )


def _blstm_chunk(p, x2, m2, state, dtype):
    """Advance a 2-lane (fwd, flipped-bwd) BLSTM by one chunk.

    Mirrors models/rnn.py::BLSTM's scan body exactly (same casts, f32
    gate math, mask-gated state) so chunked == monolithic bitwise.
    x2: (2, B, c, D) lane inputs; m2: (2, B, c); state: ((2,B,H) h, c).
    """
    wx = p["wx"].astype(dtype)
    wh = p["wh"].astype(dtype)
    bias = p["bias"]
    gates_x = (
        jnp.einsum(
            "zbtd,zdg->zbtg", x2.astype(dtype), wx,
            preferred_element_type=jnp.float32,
        )
        + bias[:, None, None, :]
    )

    def step(carry, inputs):
        h_prev, c_prev = carry
        gx_t, m_t = inputs
        gh = jnp.einsum(
            "zbh,zhg->zbg", h_prev, wh,
            preferred_element_type=jnp.float32,
        )
        i, f, g, o = jnp.split(gx_t.astype(jnp.float32) + gh, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        m = m_t[..., None]
        c_out = m * c_new + (1.0 - m) * c_prev
        h_out = m * h_new + (1.0 - m) * h_prev
        return (h_out, c_out), h_out * m

    # FULLY unrolled: an inner lax.scan would be one XLA while op —
    # an ATOMIC unit on the TPU serial schedule that can never
    # interleave with the decode step's ops (the same structural rule
    # that killed schedule-level staging; measured: the scan-bodied
    # chunks ran the staged program 1.76x SLOWER than sequential,
    # results/r5_hw/bench_b.log). Straight-line frame ops are what the
    # scheduler CAN overlap with the co-resident decode chain.
    state, ys = jax.lax.scan(
        step, state,
        (jnp.moveaxis(gates_x, 2, 0), jnp.moveaxis(m2, 2, 0)),
        unroll=True,
    )
    return state, jnp.moveaxis(ys, 0, 2)  # (2, B, c, H) f32


def _slice_t(buf, m, start, c):
    """Read logical rows [start, start+c) of a margined (B, M+T+M, ...)
    buffer (negative/overshoot rows land in the zero margin)."""
    return jax.lax.dynamic_slice_in_dim(buf, m + start, c, axis=1)


def _write_t(buf, m, start, chunk):
    return jax.lax.dynamic_update_slice_in_dim(
        buf, chunk.astype(buf.dtype), m + start, axis=1
    )


def _lane_chunk(fwd_buf, bwd_buf, m, extent, s, c):
    """(2, B, c, D) lane inputs of a BLSTM layer whose logical input is
    z[t] = concat(fwd_buf[t], bwd_buf[extent-1-t]) (the standard
    flip-read of the previous sweep's backward lane)."""
    # lane 0 (forward order): z[s : s+c]
    lane0 = jnp.concatenate(
        [_slice_t(fwd_buf, m, s, c),
         jnp.flip(_slice_t(bwd_buf, m, extent - s - c, c), axis=1)],
        axis=-1,
    )
    # lane 1 (flipped order): z[extent-1-s : extent-1-s-c : -1]
    lane1 = jnp.concatenate(
        [jnp.flip(_slice_t(fwd_buf, m, extent - s - c, c), axis=1),
         _slice_t(bwd_buf, m, s, c)],
        axis=-1,
    )
    return jnp.stack([lane0, lane1])


def _mask_lanes(mask_buf, m, extent, s, c):
    m0 = _slice_t(mask_buf, m, s, c)
    m1 = jnp.flip(_slice_t(mask_buf, m, extent - s - c, c), axis=1)
    return jnp.stack([m0, m1])


def build_chunked_encode(
    model, jcfg: JointConfig, plan: ChunkPlan, use_enhancer: bool = True,
) -> Tuple[Callable, Callable, Callable]:
    """(init_fn, step_fn, finalize_fn) implementing the staged encode.

    init_fn(params, wav, wav_lengths) -> carry (buffers + masks; no
      stage work — everything heavy runs inside the beam scan).
    step_fn(params, carry, i) -> carry — advance by the stage chunk
      that beam step ``i`` owns (noop for i >= plan.total_steps).
    finalize_fn(params, carry) -> (hs, hmask, hlens, ctc_logits,
      enc_proj), running any stages past the beam-step budget first.

    Semantics match RobustE2E.encode_for_decode with lstm_impl="scan"
    (tests/test_chunked_encode.py asserts exact agreement); only
    cmvn="utterance" | "none" is supported — callers with global/
    speaker CMVN use the sequential searcher.
    """
    fcfg = jcfg.e2e.frontend
    hcfg = jcfg.enhancer
    ecfg = jcfg.e2e.encoder
    acfg = jcfg.e2e.attention
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        jcfg.compute_dtype
    ]
    if fcfg.cmvn == "global" and getattr(model, "cmvn_stats", None) is None:
        raise ValueError(
            'cmvn="global" requires cmvn_stats on the model (see '
            "RobustE2E)"
        )
    if fcfg.cmvn not in ("utterance", "global", "none"):
        # "speaker" needs per-batch stats the staged stream cannot carry
        raise ValueError(
            f'chunked encode supports cmvn="utterance"|"global"|"none", '
            f"got {fcfg.cmvn!r} — use the sequential searcher"
        )
    t, t4, m_t, m_t4 = plan.t, plan.t4, plan.m_t, plan.m_t4
    n_freqs = fcfg.n_fft // 2 + 1
    vgg_dim = (((fcfg.n_mels + 1) // 2 + 1) // 2) * ecfg.vgg_channels[-1]

    def init_fn(params, wav, wav_lengths):
        b = wav.shape[0]
        pad = max(plan.n_wav_pad - wav.shape[1], 0)
        wav_pad = jnp.pad(wav.astype(jnp.float32), ((0, 0), (0, pad)))
        n_valid = fbank_ops.frame_lengths_from_wav_lengths(
            wav_lengths, fcfg
        )
        fmask = jnp.zeros((b, m_t + t + m_t), jnp.float32)
        fmask = fmask.at[:, m_t : m_t + t].set(
            (jnp.arange(t, dtype=jnp.int32)[None, :] < n_valid[:, None])
            .astype(jnp.float32)
        )
        hlens = subsampled_lengths(n_valid.astype(jnp.int32))
        hmask4 = jnp.zeros((b, m_t4 + t4 + m_t4), dtype)
        hmask4 = hmask4.at[:, m_t4 : m_t4 + t4].set(
            (jnp.arange(t4, dtype=jnp.int32)[None, :] < hlens[:, None])
            .astype(dtype)
        )
        eh = jcfg.enhancer.hidden_dim
        ch = ecfg.hidden_dim
        carry = {
            "wav": wav_pad,
            "fmask": fmask,
            "hmask4": hmask4,
            "hlens": hlens,
            "power": jnp.zeros((b, m_t + t + m_t, n_freqs), jnp.float32),
            "feats": jnp.zeros((b, m_t + t + m_t, fcfg.n_mels), dtype),
            "vgg": jnp.zeros((b, m_t4 + t4 + m_t4, vgg_dim), dtype),
            "h": jnp.zeros((2, b, max(eh, ch)), jnp.float32),
            "c": jnp.zeros((2, b, max(eh, ch)), jnp.float32),
            "hs": jnp.zeros((b, t4, ecfg.proj_dim), dtype),
            "ctc": jnp.zeros(
                (b, t4, jcfg.e2e.decoder.vocab_size), dtype
            ),
            "eproj": jnp.zeros((b, t4, acfg.dim), dtype),
        }
        for i in range(hcfg.num_layers if use_enhancer else 0):
            carry[f"enh_y{i}"] = jnp.zeros(
                (2, b, m_t + t + m_t, eh), dtype
            )
        for i in range(ecfg.num_layers):
            carry[f"enc_y{i}"] = jnp.zeros(
                (2, b, m_t4 + t4 + m_t4, ch), dtype
            )
            if i < ecfg.num_layers - 1:
                carry[f"enc_p{i}"] = jnp.zeros(
                    (b, m_t4 + t4 + m_t4, ecfg.proj_dim), dtype
                )
        return carry

    # ---- per-stage branch bodies -------------------------------------
    def stft_branch(stage):
        shift, flen = fcfg.frame_shift, fcfg.frame_length
        c = stage.chunk

        def run(params, carry, local):
            s = local * c
            wav_c = jax.lax.dynamic_slice_in_dim(
                carry["wav"], s * shift, (c - 1) * shift + flen, axis=1
            )
            power = fbank_ops.stft_power(wav_c, fcfg)
            power = power * _slice_t(
                carry["fmask"], m_t, s, c
            )[..., None]
            carry = dict(carry)
            carry["power"] = _write_t(carry["power"], m_t, s, power)
            return carry

        return run

    def lstm_state(carry, h_dim, local):
        # shared sweep state, reset at each stage's first chunk
        h = carry["h"][..., :h_dim]
        cc = carry["c"][..., :h_dim]
        zero = local == 0
        h = jnp.where(zero, jnp.zeros_like(h), h)
        cc = jnp.where(zero, jnp.zeros_like(cc), cc)
        return h, cc

    def store_state(carry, h, cc):
        carry["h"] = carry["h"].at[..., : h.shape[-1]].set(h)
        carry["c"] = carry["c"].at[..., : cc.shape[-1]].set(cc)
        return carry

    def enh_lstm_branch(stage):
        layer, c = stage.layer, stage.chunk
        pkey = f"blstm{layer}"

        def run(params, carry, local):
            s = local * c
            if layer == 0:
                p0 = _slice_t(carry["power"], m_t, s, c)
                p1 = jnp.flip(
                    _slice_t(carry["power"], m_t, t - s - c, c), axis=1
                )
                x2 = jnp.stack([p0, p1])
                if hcfg.compression == "log1p":
                    x2 = jnp.log1p(x2)
                elif hcfg.compression == "log":
                    x2 = jnp.log(jnp.maximum(x2, 1e-7))
            else:
                prev = carry[f"enh_y{layer - 1}"]
                x2 = _lane_chunk(prev[0], prev[1], m_t, t, s, c)
            m2 = _mask_lanes(carry["fmask"], m_t, t, s, c)
            st = lstm_state(carry, hcfg.hidden_dim, local)
            st, ys = _blstm_chunk(
                params["enhancer"][pkey], x2, m2, st, dtype
            )
            carry = dict(carry)
            carry = store_state(carry, *st)
            buf = carry[f"enh_y{layer}"]
            buf = jax.lax.dynamic_update_slice_in_dim(
                buf, ys.astype(buf.dtype), m_t + s, axis=2
            )
            carry[f"enh_y{layer}"] = buf
            return carry

        return run

    def fbank_branch(stage):
        dense = nn.Dense(hcfg.input_dim, dtype=dtype)

        def run(params, carry, local):
            carry = dict(carry)
            power_l = carry["power"][:, m_t : m_t + t]
            fmask_l = carry["fmask"][:, m_t : m_t + t]
            if use_enhancer:
                yl = carry[f"enh_y{hcfg.num_layers - 1}"]
                h = jnp.concatenate(
                    [yl[0, :, m_t : m_t + t],
                     jnp.flip(yl[1, :, m_t : m_t + t], axis=1)],
                    axis=-1,
                )
                tf = jax.nn.sigmoid(
                    dense.apply(
                        {"params": params["enhancer"]["mask_out"]}, h
                    )
                )
                if hcfg.mask_floor > 0.0:
                    tf = hcfg.mask_floor + (1.0 - hcfg.mask_floor) * tf
                power_l = tf * power_l
                power_l = power_l * fmask_l[..., None].astype(
                    power_l.dtype
                )
            feats = fbank_ops.log_mel(power_l, fcfg)
            if fcfg.cmvn == "utterance":
                feats = fbank_ops.utterance_cmvn(feats, fmask_l)
            else:
                if fcfg.cmvn == "global":
                    mean, inv_std = model.cmvn_stats
                    feats = fbank_ops.apply_cmvn(
                        feats, jnp.asarray(mean), jnp.asarray(inv_std)
                    )
                feats = feats * fmask_l[..., None].astype(feats.dtype)
            carry["feats"] = _write_t(carry["feats"], m_t, 0, feats)
            return carry

        return run

    def vgg_branch(stage):
        c4 = stage.chunk
        c_in = 4 * c4
        vgg = VGG2L(ecfg.vgg_channels, dtype=dtype)

        def run(params, carry, local):
            # regular (interior) chunks: the head stage owns rows
            # [0, c4), so chunk ``local`` covers [(local+1)*c4, ...)
            s4 = (local + 1) * c4
            s = 4 * s4
            # halo 8: kept output row q's receptive field spans input
            # rows [4q-6, 4q+9] (two 3x3 conv pairs + two ceil pools);
            # 8 keeps the slice 4-aligned so pooling windows match the
            # absolute frame grid.
            x = _slice_t(carry["feats"], m_t, s - 8, c_in + 16)
            out = vgg.apply(
                {"params": params["asr"]["encoder"]["vgg"]}, x
            )  # (B, c4 + 4, vgg_dim)
            out = out[:, 2 : 2 + c4]
            out = out * _slice_t(
                carry["hmask4"], m_t4, s4, c4
            )[..., None]
            carry = dict(carry)
            carry["vgg"] = _write_t(carry["vgg"], m_t4, s4, out)
            return carry

        return run

    def enc_lstm_branch(stage):
        layer, c = stage.layer, stage.chunk
        pkey = f"blstm{layer}"

        def run(params, carry, local):
            s = local * c
            if layer == 0:
                x0 = _slice_t(carry["vgg"], m_t4, s, c)
                x1 = jnp.flip(
                    _slice_t(carry["vgg"], m_t4, t4 - s - c, c), axis=1
                )
                x2 = jnp.stack([x0, x1])
            else:
                pb = carry[f"enc_p{layer - 1}"]
                x0 = _slice_t(pb, m_t4, s, c)
                x1 = jnp.flip(
                    _slice_t(pb, m_t4, t4 - s - c, c), axis=1
                )
                x2 = jnp.stack([x0, x1])
            mask_f = carry["hmask4"].astype(jnp.float32)
            m2 = _mask_lanes(mask_f, m_t4, t4, s, c)
            st = lstm_state(carry, ecfg.hidden_dim, local)
            st, ys = _blstm_chunk(
                params["asr"]["encoder"]["blstmp"][pkey], x2, m2, st,
                dtype,
            )
            carry = dict(carry)
            carry = store_state(carry, *st)
            buf = carry[f"enc_y{layer}"]
            buf = jax.lax.dynamic_update_slice_in_dim(
                buf, ys.astype(buf.dtype), m_t4 + s, axis=2
            )
            carry[f"enc_y{layer}"] = buf
            return carry

        return run

    def proj_full(params, carry, layer):
        """Dense+tanh+mask over the full margined buffer (frame-local,
        cheap) — shared by the proj stage and the heads stage."""
        dense = nn.Dense(ecfg.proj_dim, dtype=dtype)
        yl = carry[f"enc_y{layer}"]
        h = jnp.concatenate(
            [yl[0, :, m_t4 : m_t4 + t4],
             jnp.flip(yl[1, :, m_t4 : m_t4 + t4], axis=1)],
            axis=-1,
        )
        p = params["asr"]["encoder"]["blstmp"][f"proj{layer}"]
        h = jnp.tanh(dense.apply({"params": p}, h))
        h = h * carry["hmask4"][:, m_t4 : m_t4 + t4, None].astype(h.dtype)
        return h  # (B, t4, proj_dim), logical rows only

    def make_proj_branch(stage):
        layer = stage.layer

        def run(params, carry, local):
            h = proj_full(params, carry, layer)
            carry = dict(carry)
            carry[f"enc_p{layer}"] = _write_t(
                carry[f"enc_p{layer}"], m_t4, 0, h
            )
            return carry

        return run

    def heads_branch(stage):
        ctc_dense = nn.Dense(jcfg.e2e.decoder.vocab_size, dtype=dtype)
        eproj_dense = nn.Dense(
            acfg.dim, use_bias=getattr(acfg, "enc_proj_bias", False),
            dtype=dtype,
        )

        def run(params, carry, local):
            hs = proj_full(params, carry, ecfg.num_layers - 1)
            carry = dict(carry)
            carry["hs"] = hs
            carry["ctc"] = ctc_dense.apply(
                {"params": params["asr"]["ctc"]["ctc_lo"]}, hs
            )
            carry["eproj"] = eproj_dense.apply(
                {"params": params["asr"]["decoder"]["enc_projection"][
                    "mlp_enc"]},
                hs,
            )
            return carry

        return run

    def vgg_head_branch(stage):
        c4 = stage.chunk
        c_in = 4 * c4
        vgg = VGG2L(ecfg.vgg_channels, dtype=dtype)

        def run(params, carry, local):
            # slice starts EXACTLY at frame 0: the module's own SAME
            # padding then reproduces the monolithic left edge
            x = _slice_t(carry["feats"], m_t, 0, c_in + 8)
            out = vgg.apply(
                {"params": params["asr"]["encoder"]["vgg"]}, x
            )[:, :c4]
            out = out * _slice_t(
                carry["hmask4"], m_t4, 0, c4
            )[..., None]
            carry = dict(carry)
            carry["vgg"] = _write_t(carry["vgg"], m_t4, 0, out)
            return carry

        return run

    def vgg_tail_branch(stage):
        c4 = stage.chunk
        _, _, s4_tail = _vgg_layout(t4, c4)
        start_in = max(4 * s4_tail - 8, 0)
        length = t - start_in  # static; slice ends EXACTLY at frame t
        r0 = s4_tail - start_in // 4  # kept rows' offset in the slice
        keep = t4 - s4_tail
        vgg = VGG2L(ecfg.vgg_channels, dtype=dtype)

        def run(params, carry, local):
            x = jax.lax.dynamic_slice_in_dim(
                carry["feats"], m_t + start_in, length, axis=1
            )
            out = vgg.apply(
                {"params": params["asr"]["encoder"]["vgg"]}, x
            )
            out = out[:, r0 : r0 + keep]
            out = out * _slice_t(
                carry["hmask4"], m_t4, s4_tail, keep
            )[..., None]
            carry = dict(carry)
            carry["vgg"] = _write_t(carry["vgg"], m_t4, s4_tail, out)
            return carry

        return run

    def noop_branch(stage):
        def run(params, carry, local):
            return carry

        return run

    builders = {
        "stft": stft_branch,
        "fbank": fbank_branch,
        "vgg": vgg_branch,
        "vgg_head": vgg_head_branch,
        "vgg_tail": vgg_tail_branch,
        "proj": make_proj_branch,
        "heads": heads_branch,
        "noop": noop_branch,
    }

    branches = []
    starts = []
    for stage in plan.stages:
        if stage.kind == "lstm":
            fn = (enh_lstm_branch if stage.group == "enh"
                  else enc_lstm_branch)(stage)
        else:
            fn = builders[stage.kind](stage)
        branches.append((stage, fn))
        starts.append(stage.start)
    starts_arr = np.asarray(starts, np.int32)

    def step_fn(params, carry, i):
        i = jnp.asarray(i, jnp.int32)
        # stage owning step i: starts are sorted, the trailing noop
        # stage has an effectively unbounded range, so ``local`` is
        # in-range for every branch by construction (no masking of the
        # result — a guard select over the multi-hundred-MB carry would
        # cost more HBM traffic than the chunks themselves)
        idx = jnp.sum(i >= jnp.asarray(starts_arr)) - 1
        idx = jnp.clip(idx, 0, len(branches) - 1)

        def wrap(stage, fn):
            def branch(args):
                carry, i = args
                return fn(params, carry, i - stage.start)

            return branch

        return jax.lax.switch(
            idx, [wrap(s, f) for s, f in branches], (carry, i)
        )

    def finalize_fn(params, carry, steps_done: int):
        """Run stages [steps_done, total) that the beam loop didn't
        cover, then assemble the encode_for_decode output tuple."""
        if steps_done < plan.total_steps:
            carry = jax.lax.fori_loop(
                steps_done, plan.total_steps,
                lambda i, c: step_fn(params, c, i), carry,
            )
        hmask = carry["hmask4"][:, m_t4 : m_t4 + t4]
        return (
            carry["hs"], hmask, carry["hlens"], carry["ctc"],
            carry["eproj"],
        )

    return init_fn, step_fn, finalize_fn
