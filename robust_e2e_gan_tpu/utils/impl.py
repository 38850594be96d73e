"""Shared impl-knob resolution for the fused Pallas kernels.

Every kernel-impl config field (lstm_impl, score_impl, step_impl,
ctc_impl, ...) resolves "auto" the same way; this is the single encoding
of that rule.
"""

from __future__ import annotations

import jax

_KNOWN = ("xla", "scan", "fused", "tiled", "auto")


def fused_enabled(impl: str, default: str = "auto") -> bool:
    """True when a fused Pallas path should be used for this impl value.

    "fused" forces it, "auto" enables it on TPU, anything XLA-ish
    disables it; unknown strings raise (silent typo -> silently measuring
    the wrong path)."""
    impl = impl or default
    if impl not in _KNOWN:
        raise ValueError(
            f"unknown kernel impl {impl!r}; expected one of {_KNOWN}"
        )
    if impl == "fused":
        return True
    if impl == "auto":
        return jax.default_backend() == "tpu"
    return False
