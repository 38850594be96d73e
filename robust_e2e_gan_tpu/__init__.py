"""robust_e2e_gan_tpu — TPU-native jointly-adversarial robust end-to-end ASR.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the public
``bliunlpr/Robust_e2e_gan`` repo (Interspeech 2019, "Jointly Adversarial
Enhancement Training for Robust End-to-End Speech Recognition"):

- a differentiable feature frontend (framing -> STFT power -> log-mel fbank ->
  CMVN), with a fused Pallas TPU kernel for the whole chain,
- a mask-estimating BLSTM speech-enhancement generator and a conv
  discriminator trained adversarially,
- an ESPnet-style hybrid CTC/attention encoder-decoder ASR model
  (VGG conv frontend + BLSTM encoder, location-aware attention decoder,
  CTC branch),
- alternating jitted generator/discriminator training steps with the joint
  enhancement + CTC + attention loss,
- batched joint CTC/attention beam search fully on device,
- data-parallel training over a ``jax.sharding.Mesh``.

The reference tree was unavailable at build time (see SURVEY.md provenance
note); component parity is against SURVEY.md section 2's inventory and
BASELINE.json's capability spec.
"""

__version__ = "0.1.0"

from robust_e2e_gan_tpu.config import (  # noqa: F401
    FrontendConfig,
    EncoderConfig,
    DecoderConfig,
    AttentionConfig,
    EnhancerConfig,
    DiscriminatorConfig,
    E2EConfig,
    BeamSearchConfig,
    TrainConfig,
    JointConfig,
)


def __getattr__(name):
    """Lazy top-level API (avoids importing jax at package-import time for
    pure-host tools like the Kaldi I/O utilities)."""
    lazy = {
        "RobustE2E": ("robust_e2e_gan_tpu.pipeline", "RobustE2E"),
        "build_model": ("robust_e2e_gan_tpu.pipeline", "build_model"),
        "make_beam_searcher": (
            "robust_e2e_gan_tpu.decode.beam", "make_beam_searcher"
        ),
        "make_pipelined_beam_searcher": (
            "robust_e2e_gan_tpu.decode.beam", "make_pipelined_beam_searcher"
        ),
        "make_chunked_pipelined_beam_searcher": (
            "robust_e2e_gan_tpu.decode.beam",
            "make_chunked_pipelined_beam_searcher",
        ),
        "train": ("robust_e2e_gan_tpu.train.loop", "train"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
