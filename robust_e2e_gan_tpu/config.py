"""Configuration dataclasses.

TPU-native replacement for the reference's pix2pix-style ``options/`` argparse
classes (SURVEY.md section 2a "Options/config": BaseOptions/TrainOptions/
TestOptions namespaces threaded everywhere). Here a single tree of frozen
dataclasses defines the whole experiment; it is hashable so it can be a static
argument of jitted step functions, serializable to JSON into the experiment
dir, and overridable from the CLI (see train/cli.py).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


@dataclass(frozen=True)
class FrontendConfig:
    """Feature frontend: framing -> STFT power -> log-mel -> CMVN.

    Semantics follow Kaldi fbank defaults (dither=0, snip-edges=true,
    povey window, preemphasis 0.97) which the reference inherited through
    its offline Kaldi feature pipeline (SURVEY.md L0/L2); locked by golden
    vectors in tests/test_fbank.py.
    """

    sample_rate: int = 16000
    frame_length: int = 400  # 25 ms
    frame_shift: int = 160  # 10 ms
    n_fft: int = 512
    n_mels: int = 80
    f_min: float = 20.0
    f_max: Optional[float] = None  # None -> Nyquist
    preemphasis: float = 0.97
    remove_dc: bool = True
    window: str = "povey"  # povey | hann | hamming
    log_floor: float = 1.1920928955078125e-07  # FLT_EPSILON, Kaldi log floor
    use_power: bool = True  # power spectrum (Kaldi default) vs magnitude
    # feature normalization: per-utterance (ESPnet-style), global stats
    # (Kaldi apply-cmvn with precomputed stats; see data/cmvn.py), or none.
    cmvn: str = "utterance"  # utterance | global | none
    # Use the fused Pallas frontend kernel (ops/fbank_pallas.py) on paths
    # without the enhancer (clean-ASR pretrain, no-enhancer decode); the
    # joint objective splits the chain at the enhancer so it keeps the
    # pure-JAX frontend. Requires cmvn="utterance".
    fused: bool = False

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1


@dataclass(frozen=True)
class EncoderConfig:
    """VGG conv frontend + BLSTM stack (reference: ESPnet-style VGG2L+BLSTMP,
    SURVEY.md section 2a "ASR Encoder")."""

    input_dim: int = 80
    vgg_channels: Tuple[int, int] = (64, 128)
    num_layers: int = 3  # BLSTM layers
    hidden_dim: int = 512  # per direction
    proj_dim: int = 512  # projection after each BLSTM layer
    dropout_rate: float = 0.0
    subsample_factor: int = 4  # fixed by the two VGG 2x2 maxpools
    remat: bool = False  # jax.checkpoint each BLSTM layer (HBM vs recompute)
    # LSTM scan unroll (0 = models/rnn.py DEFAULT_UNROLL). v5e-measured:
    # 4 speeds the joint train step ~11% but slows batched decode ~9%, so
    # training configs opt in (train CLI --scan-unroll) and decode keeps 1.
    scan_unroll: int = 0
    # BLSTM frame-loop implementation: "scan" (XLA lax.scan,
    # differentiable), "tiled" (fused forward-only Pallas kernel,
    # ops/blstm_pallas.py), "fused" (differentiable fused Pallas
    # forward + custom-VJP backward, ops/blstm_train_pallas.py — the
    # training fast path; oversize layers use its gate-stream variant),
    # "auto" (tiled on TPU, scan elsewhere). Decode and bench rebuild
    # with "auto"; parameters are impl-independent.
    lstm_impl: str = "scan"
    # Storage dtype of the scan's hoisted gate projections (the backward
    # pass's dominant HBM residual): "f32" exact, "compute" rounds to the
    # compute dtype (train CLI --gate-storage; v5e numbers in BASELINE.md).
    gate_storage: str = "f32"


@dataclass(frozen=True)
class AttentionConfig:
    """Location-aware attention (reference: ESPnet AttLoc, SURVEY.md
    section 2a "Attention"): 1-D conv over the previous alignment feeds an
    additive (tanh) scorer."""

    dim: int = 512  # attention inner dim
    conv_channels: int = 10
    conv_kernel: int = 201  # odd; reference-era aconv_filts=100 -> 2*100+1
    sharpening: float = 2.0  # scaling of pre-softmax scores
    variant: str = "location"  # location | add | dot (reference atype)
    # Beam-mode score implementation: "xla" (reference-exact broadcast
    # path), "fused" (ops/att_pallas.py one-kernel step, serving fast
    # path), "auto" (fused on TPU, xla elsewhere). Training and the
    # non-beam step always use the XLA path; parameters are
    # impl-independent.
    score_impl: str = "auto"
    # The reference-era AttLoc mlp_enc Linear carries a bias (the other
    # attention projections are bias-free). Default False keeps this
    # framework's historical parameter tree; imported reference
    # checkpoints (tools/import_reference_ckpt.py) set it True so the
    # encoder-side projection matches bit-for-bit.
    enc_proj_bias: bool = False


@dataclass(frozen=True)
class DecoderConfig:
    """LSTM attention decoder (reference: ESPnet Decoder, SURVEY.md
    section 2a "ASR Decoder")."""

    vocab_size: int = 52
    embed_dim: int = 512
    num_layers: int = 1
    hidden_dim: int = 512
    dropout_rate: float = 0.0
    label_smoothing: float = 0.0
    sampling_probability: float = 0.0  # scheduled sampling
    # Teacher-forcing scan unroll for TRAINING (0 = no unroll): like the
    # BLSTM scan_unroll, lets XLA software-pipeline several decode steps
    # per loop iteration in the per-token attention/cell chain.
    scan_unroll: int = 0
    # Beam-mode step implementation: "xla" (reference-exact), "fused"
    # (ops/att_pallas.py att_dec_step_fused — attention + embedding +
    # LSTM cell + readout in ONE Mosaic program; requires num_layers=1,
    # the location attention variant), "auto" = xla: the round-4 on-chip
    # A/B measured the fully-fused step ~3% slower than the fused
    # attention kernel + XLA cell (2120.2 vs 2184.6 utt/s at bench
    # shapes, results/kernel_ab.json), so auto takes the measured winner.
    # Training and the non-beam step always use the XLA path; parameters
    # are impl-independent.
    step_impl: str = "auto"


@dataclass(frozen=True)
class EnhancerConfig:
    """Mask-estimating BLSTM enhancement generator G (SURVEY.md section 2a
    "Enhancement generator"): BLSTM over compressed noisy spectra -> sigmoid
    T-F mask -> mask * noisy = enhanced."""

    input_dim: int = 257  # n_fft//2 + 1
    num_layers: int = 2
    hidden_dim: int = 512
    mask_floor: float = 0.0  # optional lower bound on the mask
    compression: str = "log1p"  # input compression: log1p | log | none
    remat: bool = False  # jax.checkpoint each BLSTM layer
    scan_unroll: int = 0  # see EncoderConfig.scan_unroll
    lstm_impl: str = "scan"  # see EncoderConfig.lstm_impl
    gate_storage: str = "f32"  # see EncoderConfig.gate_storage


@dataclass(frozen=True)
class DiscriminatorConfig:
    """Conv discriminator D over feature maps (SURVEY.md section 2a
    "Discriminator"): classifies enhanced vs clean features."""

    input_dim: int = 80  # operates on log-mel features
    channels: Tuple[int, ...] = (32, 64, 128)
    kernel: Tuple[int, int] = (3, 3)
    loss_type: str = "lsgan"  # lsgan | bce


@dataclass(frozen=True)
class E2EConfig:
    """Hybrid CTC/attention E2E model (SURVEY.md section 2a "E2E wrapper"):
    loss = mtlalpha * ctc + (1 - mtlalpha) * att."""

    frontend: FrontendConfig = field(default_factory=FrontendConfig)
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    attention: AttentionConfig = field(default_factory=AttentionConfig)
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    mtlalpha: float = 0.5
    blank_id: int = 0
    sos_id: int = 1  # shared <sos>/<eos> per ESPnet convention
    eos_id: int = 1
    ignore_id: int = -1  # label padding (ESPnet converter convention)
    # CTC alpha-recursion impl: "scan" (XLA, oracle), "fused" (custom-VJP
    # Mosaic kernels, ops/ctc_pallas.py; VMEM-plan fallback to scan),
    # "auto" (fused on TPU). Parameters are impl-independent.
    ctc_impl: str = "auto"


@dataclass(frozen=True)
class JointConfig:
    """Joint adversarial fine-tuning objective (SURVEY.md call stack 3.1):
    loss_G = L_ASR(enhanced) + lambda_adv * L_adv + mu_enh * L_enh."""

    e2e: E2EConfig = field(default_factory=E2EConfig)
    enhancer: EnhancerConfig = field(default_factory=EnhancerConfig)
    discriminator: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    lambda_adv: float = 1.0
    mu_enh: float = 1.0
    enh_loss: str = "l2"  # l2 | l1 on (enhanced, clean) spectra
    # model compute dtype ("float32" | "bfloat16"); params stay float32
    # (mixed precision: bf16 feeds the MXU, f32 master weights/accumulation)
    compute_dtype: str = "float32"


@dataclass(frozen=True)
class BeamSearchConfig:
    """Joint CTC/attention one-pass beam search (reference: ESPnet
    recognize_beam + CTCPrefixScore, SURVEY.md call stack 3.2). Decoded
    fully on device with static shapes (SURVEY.md section 7 step 5)."""

    beam_size: int = 8
    ctc_weight: float = 0.3
    penalty: float = 0.0  # per-token insertion bonus
    max_steps: int = 64  # static decode-step count (>= longest transcript)
    min_len: int = 1  # eos masked below this output length
    # Per-utterance length bounds as ratios of the encoded length (reference
    # recog_args maxlenratio/minlenratio). 0 disables. min_len and
    # minlen_ratio compose (the max of both applies); maxlen_ratio forces
    # eos once an utterance's output reaches ratio * hlen, bounded by the
    # static max_steps.
    maxlen_ratio: float = 0.0
    minlen_ratio: float = 0.0
    length_normalize: bool = False  # normalize final scores by length
    # CTC prefix recursion implementation, v5e-measured on the benchmark
    # decode (B=128, beam 8, ~7 s utterances, full 48-step scan):
    #   "auto"     DEFAULT: "tiled" on TPU, "twopass" elsewhere.
    #   "tiled"   69.5 ms/batch — round-3 batch-tiled Pallas kernels
    #              (ops/ctc_prefix_tiled.py): ALL (B,K) lanes advance per
    #              frame with carries VMEM-resident and lpz streamed by
    #              double-buffered DMA; bit-exact vs "twopass" on-chip.
    #   "twopass"  78 ms/batch — psi-only XLA recursion + selected-token
    #              state recompute (no (T,B,K,V) stacked outputs); the
    #              XLA scan round-trips its (B,K,V) carries through HBM
    #              every frame, which the tiled kernel eliminates.
    #   "scan"    146 ms/batch — round-1 full recursion, stacked outputs.
    #   "pallas"  556 ms/batch — round-2 kernel, exact vs scan, but its
    #              per-utterance grid serializes B x T.
    #   "parallel" ~100x slower — cumlogsumexp lowers poorly on XLA:TPU.
    # All five are equivalence-tested (tests/test_beam.py).
    prefix_impl: str = "auto"
    # Early exit: run the decode loop as a lax.while_loop that stops once
    # every hypothesis in the batch has emitted eos (or end-detect fires),
    # instead of always scanning max_steps. Token-exact with the scan path
    # (frozen eos self-loops make post-finish steps no-ops); cuts latency on
    # short utterances.
    early_exit: bool = True
    # ESPnet-style end detection (reference call stack 3.2 "end-detect
    # pruning"), streaming form: an utterance stops once end_detect_window
    # consecutive steps each end hypotheses scoring more than
    # end_detect_margin below its best ended score.
    end_detect: bool = False
    end_detect_window: int = 3
    end_detect_margin: float = 10.0
    # RNNLM shallow fusion: score += lm_weight * log p_LM(token). 0 = off.
    lm_weight: float = 0.0
    # Unroll factor for the decode-step scan (early_exit=False path only;
    # while_loop cannot unroll). Lets XLA software-pipeline several decode
    # steps per loop iteration at the cost of a bigger compiled body.
    scan_unroll: int = 1


@dataclass(frozen=True)
class TrainConfig:
    """Optimization + loop settings (reference: Adadelta/Adam, grad-clip 5,
    eps-decay on dev plateau — SURVEY.md section 2a "Train scripts")."""

    optimizer: str = "adadelta"  # adadelta | adam
    learning_rate: float = 1.0  # adadelta rho-style lr; adam uses 1e-3
    # linear LR warmup over this many steps (adam only; 0 = constant LR).
    # The adadelta side's stability knob is the reference's eps-decay; this
    # is the adam-side equivalent, needed for >10M-param configs where a
    # cold 1e-3 step destabilizes the BLSTM stacks.
    warmup_steps: int = 0
    adadelta_rho: float = 0.95
    adadelta_eps: float = 1e-8
    eps_decay: float = 0.01  # multiply eps on dev-accuracy plateau
    grad_clip: float = 5.0
    batch_size: int = 16
    num_epochs: int = 15
    seed: int = 1
    # static-shape bucketing (SURVEY.md section 5 long-context row)
    length_buckets: Tuple[int, ...] = (256, 512, 1024, 1600)
    max_label_len: int = 128
    checkpoint_dir: str = "checkpoints/default"
    log_every: int = 10


def to_dict(cfg: Any) -> Dict[str, Any]:
    """Recursively convert a config dataclass to a plain dict."""
    if isinstance(cfg, dict):
        return {k: to_dict(v) if dataclasses.is_dataclass(v) else v
                for k, v in cfg.items()}
    return dataclasses.asdict(cfg)


def save_config(cfg: Any, path: str) -> None:
    """Serialize a config into the experiment dir (reference saved its opt
    namespace into the checkpoint dir; SURVEY.md section 5 Config row)."""
    with open(path, "w") as f:
        json.dump(to_dict(cfg), f, indent=2, default=str)


_NESTED = {
    "frontend": FrontendConfig,
    "encoder": EncoderConfig,
    "attention": AttentionConfig,
    "decoder": DecoderConfig,
    "e2e": E2EConfig,
    "enhancer": EnhancerConfig,
    "discriminator": DiscriminatorConfig,
}


def from_dict(cls, data: Dict[str, Any]):
    """Build a config dataclass tree from a plain dict."""
    kwargs = {}
    for fld in dataclasses.fields(cls):
        if fld.name not in data:
            continue
        v = data[fld.name]
        if fld.name in _NESTED and isinstance(v, dict):
            kwargs[fld.name] = from_dict(_NESTED[fld.name], v)
        elif isinstance(v, list):
            kwargs[fld.name] = tuple(v)
        else:
            kwargs[fld.name] = v
    return cls(**kwargs)


def load_config(cls, path: str):
    """Load a config dataclass tree from JSON."""
    with open(path) as f:
        return from_dict(cls, json.load(f))
