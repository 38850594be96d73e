"""Fused Pallas TPU kernel: framing -> STFT -> log-mel -> CMVN in one pass.

BASELINE.json north-star: "Fuse the hot feature transforms — framing, STFT,
log-mel fbank, CMVN — into a single Pallas kernel". The reference computed
features offline with Kaldi C++ binaries (SURVEY.md section 2b); this kernel
produces the same features on-chip in one HBM round-trip: the waveform is
read once, every intermediate (frames, spectra, mel energies) lives only in
VMEM, and normalized log-mel features are the only HBM write.

Kernel design (see /opt/skills/guides/pallas_guide.md):
  * The host reshapes the padded waveform to (B, S, shift) rows. Because
    frame_length = 2*shift + rem (400 = 2*160 + 80 at 16 kHz defaults),
    frame t is exactly rows [t], [t+1] and the first ``rem`` samples of row
    [t+2] — so framing needs NO gather and NO lane-unaligned concat. The
    three row-shifted views are stacked on the host (Mosaic requires
    sublane-dim slice starts to be 8-aligned, so the +1/+2 row shifts must
    happen outside the kernel); that costs n_seg x the waveform bytes in
    HBM, negligible next to the (T, n_freqs) spectra the fusion avoids.
  * DC-removal, pre-emphasis and the analysis window are linear maps on the
    frame, so they are folded into the DFT bases on the host (numpy,
    float64): M = A_dc^T P_pre^T diag(w) C. The per-frame segment structure
    then turns windowed-DFT into THREE (TILE_T, shift) @ (shift, n_freqs)
    MXU matmuls per cos/sin basis — matmul distributes over the segments.
  * Grid is (B,): one program per utterance holds the whole (S, shift) row
    block and the (T_pad, n_mels) output in VMEM, loops over frame tiles
    (fori_loop, static trip count), computes power -> mel -> log per tile,
    and finishes with exact two-pass masked CMVN over the VMEM-resident
    features (same math as ops.fbank.utterance_cmvn, parity-tested).
  * Valid frame counts arrive via PrefetchScalarGridSpec scalar prefetch;
    pad frames are zeroed before the stats so the CMVN matches the masked
    pure-JAX reference bit-for-bit within float tolerance.

``fbank_fused`` is the forward kernel; ``fbank_fused_trainable`` adds a
custom_vjp whose backward pass is a SECOND fused Pallas kernel (round-1
VERDICT missing #5): it recomputes the spectra tile-by-tile in VMEM (cheaper
than storing (T, n_freqs) re/im residuals in HBM), applies the CMVN/log/mel
chain rule, and emits the waveform cotangent through the transposed DFT
bases. This makes the fused frontend usable on the clean-ASR pretrain path
(pipeline.py asr_forward with use_enhancer=False; the joint objective still
uses the split pure-JAX chain in ops/fbank.py because the enhancer inserts
*between* STFT and mel). Gradient parity vs the pure-JAX chain is asserted
in tests/test_fbank_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from robust_e2e_gan_tpu.config import FrontendConfig
from robust_e2e_gan_tpu.ops import fbank as fbank_ref

TILE_T = 64  # frames per inner tile (sublane-aligned)


@functools.lru_cache(maxsize=4)
def _combined_bases(cfg: FrontendConfig) -> Tuple[np.ndarray, ...]:
    """Fold DC-removal, pre-emphasis and window into the DFT bases.

    Returns (cos_segs, sin_segs, fb): cos/sin as (n_seg, shift, n_freqs)
    stacked per frame segment, fb as (n_freqs, n_mels).
    """
    L, shift = cfg.frame_length, cfg.frame_shift
    n_seg = -(-L // shift)  # frames span this many shift-rows
    w = fbank_ref.window_fn(cfg).astype(np.float64)

    # frame' = diag(w) @ P @ A @ frame   (applied left-to-right: DC,
    # preemph, window — the order of ops.fbank._preprocess_frames)
    A = np.eye(L) - (np.ones((L, L)) / L if cfg.remove_dc else 0.0)
    P = np.eye(L)
    if cfg.preemphasis > 0.0:
        P = P - cfg.preemphasis * np.diag(np.ones(L - 1), k=-1)
        P[0, 0] -= cfg.preemphasis  # x'[0] = x[0] - p*x[0]
    T_pre = np.diag(w) @ P @ A  # (L, L)

    cos_m, sin_m = fbank_ref.dft_matrices(cfg.n_fft)
    M_cos = T_pre.T @ cos_m[:L].astype(np.float64)  # (L, n_freqs)
    M_sin = T_pre.T @ sin_m[:L].astype(np.float64)

    def segs(M):
        out = np.zeros((n_seg, shift, M.shape[1]), np.float32)
        for s in range(n_seg):
            rows = M[s * shift : (s + 1) * shift]
            out[s, : rows.shape[0]] = rows
        return out

    fb = fbank_ref.mel_filterbank(cfg)  # (n_freqs, n_mels)
    return segs(M_cos), segs(M_sin), fb.astype(np.float32)


def _kernel(cfg: FrontendConfig, t_pad: int, norm_var: bool, eps: float):
    n_seg = -(-cfg.frame_length // cfg.frame_shift)
    n_tiles = t_pad // TILE_T

    def kernel(nvalid_ref, wav_ref, cos_ref, sin_ref, fb_ref, out_ref):
        b = pl.program_id(0)
        n_valid = nvalid_ref[b]

        def tile_body(ti, _):
            t0 = ti * TILE_T
            re = jnp.zeros((TILE_T, cfg.n_freqs), jnp.float32)
            im = jnp.zeros((TILE_T, cfg.n_freqs), jnp.float32)
            for s in range(n_seg):  # static unroll (3 segments at 16 kHz)
                rows = wav_ref[s, 0, pl.ds(t0, TILE_T), :]
                re = re + jnp.dot(
                    rows, cos_ref[s], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                im = im + jnp.dot(
                    rows, sin_ref[s], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            power = re * re + im * im
            if not cfg.use_power:
                power = jnp.sqrt(jnp.maximum(power, 0.0))
            mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            logmel = jnp.log(jnp.maximum(mel, cfg.log_floor))
            fi = t0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_T, 1), 0)
            logmel = jnp.where(fi < n_valid, logmel, 0.0)
            out_ref[0, pl.ds(t0, TILE_T), :] = logmel
            return 0

        jax.lax.fori_loop(0, n_tiles, tile_body, 0)

        # ---- exact two-pass masked CMVN over the VMEM-resident features.
        feats = out_ref[0]  # (T_pad, n_mels); pad rows are exact zeros
        denom = jnp.maximum(n_valid.astype(jnp.float32), 1.0)
        mean = jnp.sum(feats, axis=0, keepdims=True) / denom
        fi = jax.lax.broadcasted_iota(jnp.int32, (t_pad, 1), 0)
        valid = fi < n_valid
        centered = jnp.where(valid, feats - mean, 0.0)
        if norm_var:
            var = jnp.sum(centered * centered, axis=0, keepdims=True) / denom
            centered = centered * jax.lax.rsqrt(var + eps)
        out_ref[0] = centered

    return kernel


def fbank_fused(
    wav: jnp.ndarray,
    cfg: FrontendConfig,
    wav_lengths: Optional[jnp.ndarray] = None,
    norm_var: bool = True,
    eps: float = 1e-8,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, N) waveform -> ((B, T, n_mels) CMVN'd log-mel, (B, T) mask).

    Output matches ``ops.fbank.fbank(..., cmvn="utterance")`` (parity test:
    tests/test_fbank_pallas.py). Runs compiled on TPU; in interpret mode on
    CPU for tests.
    """
    if cfg.frame_length % 8:  # segment rows must stay sublane-aligned
        raise ValueError("frame_length must be a multiple of 8")
    b, n = wav.shape
    t = fbank_ref.num_frames(n, cfg)
    if t == 0:
        feats = jnp.zeros((b, 0, cfg.n_mels), jnp.float32)
        return feats, jnp.zeros((b, 0), jnp.float32)

    if wav_lengths is None:
        n_valid = jnp.full((b,), t, jnp.int32)
    else:
        n_valid = fbank_ref.frame_lengths_from_wav_lengths(wav_lengths, cfg)
        n_valid = jnp.minimum(n_valid, t).astype(jnp.int32)
    return _fbank_fused_core(wav, n_valid, cfg, norm_var, eps, interpret)


def _fbank_fused_core(
    wav: jnp.ndarray,
    n_valid: jnp.ndarray,
    cfg: FrontendConfig,
    norm_var: bool,
    eps: float,
    interpret: Optional[bool],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, n = wav.shape
    shift = cfg.frame_shift
    t = fbank_ref.num_frames(n, cfg)
    u, t_pad, n_seg, s_rows, n_pad = _host_prep(wav, cfg, t)

    cos_s, sin_s, fb = _combined_bases(cfg)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (n_seg, 1, t_pad, shift), lambda i, *_: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(cos_s.shape, lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sin_s.shape, lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(fb.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t_pad, cfg.n_mels), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    feats = pl.pallas_call(
        _kernel(cfg, t_pad, norm_var, eps),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, cfg.n_mels), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(n_valid, u, jnp.asarray(cos_s), jnp.asarray(sin_s), jnp.asarray(fb))

    feats = feats[:, :t]
    mask = (
        jnp.arange(t, dtype=jnp.int32)[None, :] < n_valid[:, None]
    ).astype(jnp.float32)
    return feats, mask


def _bwd_kernel(cfg: FrontendConfig, t_pad: int, norm_var: bool, eps: float):
    """Backward kernel: cotangent of the CMVN'd log-mel w.r.t. the stacked
    waveform rows. Recomputes the forward spectra per tile (VMEM-resident,
    no re/im residuals in HBM) and chains CMVN -> log -> mel -> power ->
    transposed DFT."""
    n_seg = -(-cfg.frame_length // cfg.frame_shift)
    n_tiles = t_pad // TILE_T

    def kernel(nvalid_ref, wav_ref, cos_ref, sin_ref, fb_ref,
               cos_t_ref, sin_t_ref, fbt_ref, g_ref, du_ref,
               feats_ref, dfeats_ref):
        b = pl.program_id(0)
        n_valid = nvalid_ref[b]

        # ---- pass A: recompute masked log-mel into VMEM scratch.
        def tile_fwd(ti, _):
            t0 = ti * TILE_T
            re = jnp.zeros((TILE_T, cfg.n_freqs), jnp.float32)
            im = jnp.zeros((TILE_T, cfg.n_freqs), jnp.float32)
            for s in range(n_seg):
                rows = wav_ref[s, 0, pl.ds(t0, TILE_T), :]
                re = re + jnp.dot(
                    rows, cos_ref[s], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                im = im + jnp.dot(
                    rows, sin_ref[s], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            power = re * re + im * im
            mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            logmel = jnp.log(jnp.maximum(mel, cfg.log_floor))
            fi = t0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_T, 1), 0)
            feats_ref[pl.ds(t0, TILE_T), :] = jnp.where(
                fi < n_valid, logmel, 0.0
            )
            return 0

        jax.lax.fori_loop(0, n_tiles, tile_fwd, 0)

        # ---- CMVN backward over the full utterance (exact transpose of the
        # forward's two-pass masked CMVN).
        feats = feats_ref[:]  # (T_pad, n_mels), pad rows exact zeros
        denom = jnp.maximum(n_valid.astype(jnp.float32), 1.0)
        fi = jax.lax.broadcasted_iota(jnp.int32, (t_pad, 1), 0)
        valid = fi < n_valid
        mean = jnp.sum(feats, axis=0, keepdims=True) / denom
        c = jnp.where(valid, feats - mean, 0.0)
        gm = jnp.where(valid, g_ref[0], 0.0)
        if norm_var:
            var = jnp.sum(c * c, axis=0, keepdims=True) / denom
            s = jax.lax.rsqrt(var + eps)
            dvar = jnp.sum(gm * c, axis=0, keepdims=True) * (-0.5) * s * s * s
            dc = gm * s + (2.0 / denom) * c * dvar
        else:
            dc = gm
        dfeats = jnp.where(
            valid, dc - jnp.sum(dc, axis=0, keepdims=True) / denom, 0.0
        )
        dfeats_ref[:] = dfeats

        # ---- pass B: per tile, chain log -> mel -> power -> DFT^T.
        def tile_bwd(ti, _):
            t0 = ti * TILE_T
            re = jnp.zeros((TILE_T, cfg.n_freqs), jnp.float32)
            im = jnp.zeros((TILE_T, cfg.n_freqs), jnp.float32)
            for s in range(n_seg):
                rows = wav_ref[s, 0, pl.ds(t0, TILE_T), :]
                re = re + jnp.dot(
                    rows, cos_ref[s], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                im = im + jnp.dot(
                    rows, sin_ref[s], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            power = re * re + im * im
            mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            g_t = dfeats_ref[pl.ds(t0, TILE_T), :]
            # d log(max(mel, floor)): zero where the floor clamps
            dmel = jnp.where(
                mel > cfg.log_floor, g_t / jnp.maximum(mel, cfg.log_floor),
                0.0,
            )
            dpower = jnp.dot(
                dmel, fbt_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            dre = 2.0 * re * dpower
            dim = 2.0 * im * dpower
            for s in range(n_seg):
                du_ref[s, 0, pl.ds(t0, TILE_T), :] = (
                    jnp.dot(dre, cos_t_ref[s],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                    + jnp.dot(dim, sin_t_ref[s],
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
                )
            return 0

        jax.lax.fori_loop(0, n_tiles, tile_bwd, 0)

    return kernel


def _host_prep(wav: jnp.ndarray, cfg: FrontendConfig, t: int):
    """Shared host-side framing prep: padded row-shifted views + geometry."""
    b, n = wav.shape
    shift = cfg.frame_shift
    t_pad = -(-t // TILE_T) * TILE_T
    n_seg = -(-cfg.frame_length // shift)
    s_rows = t_pad + n_seg
    n_pad = s_rows * shift
    wav_p = jnp.pad(wav, ((0, 0), (0, max(n_pad - n, 0))))[:, :n_pad]
    rows = wav_p.reshape(b, s_rows, shift)
    u = jnp.stack([rows[:, s : s + t_pad] for s in range(n_seg)], axis=0)
    return u, t_pad, n_seg, s_rows, n_pad


def _fbank_fused_bwd_impl(
    wav: jnp.ndarray,
    n_valid: jnp.ndarray,
    g: jnp.ndarray,
    cfg: FrontendConfig,
    norm_var: bool,
    eps: float,
    interpret: Optional[bool],
) -> jnp.ndarray:
    b, n = wav.shape
    shift = cfg.frame_shift
    t = fbank_ref.num_frames(n, cfg)
    u, t_pad, n_seg, s_rows, n_pad = _host_prep(wav, cfg, t)
    g_pad = jnp.pad(
        g.astype(jnp.float32), ((0, 0), (0, t_pad - g.shape[1]), (0, 0))
    )

    cos_s, sin_s, fb = _combined_bases(cfg)
    cos_t = np.ascontiguousarray(np.swapaxes(cos_s, 1, 2))
    sin_t = np.ascontiguousarray(np.swapaxes(sin_s, 1, 2))
    fbt = np.ascontiguousarray(fb.T)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((n_seg, 1, t_pad, shift), lambda i, *_: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cos_s.shape, lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sin_s.shape, lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(fb.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cos_t.shape, lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sin_t.shape, lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(fbt.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, cfg.n_mels), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_seg, 1, t_pad, shift), lambda i, *_: (0, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((t_pad, cfg.n_mels), jnp.float32),
            pltpu.VMEM((t_pad, cfg.n_mels), jnp.float32),
        ],
    )
    du = pl.pallas_call(
        _bwd_kernel(cfg, t_pad, norm_var, eps),
        out_shape=jax.ShapeDtypeStruct(
            (n_seg, b, t_pad, shift), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(n_valid, u, jnp.asarray(cos_s), jnp.asarray(sin_s), jnp.asarray(fb),
      jnp.asarray(cos_t), jnp.asarray(sin_t), jnp.asarray(fbt), g_pad)

    # overlap-add the row-shifted cotangents back onto the waveform rows:
    # u[s, b, t] = rows[b, t + s]  =>  drows[b, r] = sum_s du[s, b, r - s]
    drows = jnp.zeros((b, s_rows, shift), jnp.float32)
    for s in range(n_seg):
        drows = drows.at[:, s : s + t_pad].add(du[s])
    dwav = drows.reshape(b, n_pad)[:, :n]
    if n_pad < n:  # wav was truncated, no grad past n_pad
        dwav = jnp.pad(dwav, ((0, 0), (0, n - n_pad)))
    return dwav.astype(wav.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fbank_fused_diff(wav, n_valid_f, cfg, norm_var, eps, interpret):
    n_valid = n_valid_f.astype(jnp.int32)
    return _fbank_fused_core(wav, n_valid, cfg, norm_var, eps, interpret)


def _fbank_fused_fwd(wav, n_valid_f, cfg, norm_var, eps, interpret):
    out = _fbank_fused_diff(wav, n_valid_f, cfg, norm_var, eps, interpret)
    return out, (wav, n_valid_f)


def _fbank_fused_bwd(cfg, norm_var, eps, interpret, res, cot):
    wav, n_valid_f = res
    g, _ = cot  # mask output carries no gradient
    dwav = _fbank_fused_bwd_impl(
        wav, n_valid_f.astype(jnp.int32), g, cfg, norm_var, eps, interpret
    )
    return dwav, jnp.zeros_like(n_valid_f)


_fbank_fused_diff.defvjp(_fbank_fused_fwd, _fbank_fused_bwd)


def fbank_fused_trainable(
    wav: jnp.ndarray,
    cfg: FrontendConfig,
    wav_lengths: Optional[jnp.ndarray] = None,
    norm_var: bool = True,
    eps: float = 1e-8,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``fbank_fused`` with a fused-Pallas backward pass (differentiable
    w.r.t. the waveform). Same outputs as ``fbank_fused``; gradients match
    the pure-JAX chain (tests/test_fbank_pallas.py)."""
    if cfg.frame_length % 8:
        raise ValueError("frame_length must be a multiple of 8")
    if not cfg.use_power:
        raise NotImplementedError(
            "fused backward implements the power-spectrum (Kaldi default) "
            "path; use the pure-JAX chain for magnitude spectra"
        )
    b, n = wav.shape
    t = fbank_ref.num_frames(n, cfg)
    if t == 0:
        feats = jnp.zeros((b, 0, cfg.n_mels), jnp.float32)
        return feats, jnp.zeros((b, 0), jnp.float32)
    if wav_lengths is None:
        n_valid = jnp.full((b,), t, jnp.int32)
    else:
        n_valid = fbank_ref.frame_lengths_from_wav_lengths(wav_lengths, cfg)
        n_valid = jnp.minimum(n_valid, t).astype(jnp.int32)
    return _fbank_fused_diff(
        wav, n_valid.astype(jnp.float32), cfg, norm_var, eps, interpret
    )
