"""Test configuration: run everything on a virtual 8-device CPU mesh.

Per SURVEY.md section 4, multi-device behavior is testable without TPUs via
XLA's host platform device-count override. Must be set before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The image's sitecustomize force-registers a TPU PJRT plugin regardless of
# JAX_PLATFORMS; this post-import config update is what actually pins tests
# to the 8-device virtual CPU platform.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

from robust_e2e_gan_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

# Pin the LSTM scan unroll to 1 regardless of tuning defaults: larger
# unrolls inflate XLA:CPU compile time (measured 9.5 -> 16.5 min suite at
# unroll 4) with zero semantic effect (unroll is a scheduling knob).
from robust_e2e_gan_tpu.models import rnn as _rnn  # noqa: E402

_rnn.DEFAULT_UNROLL = 1

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
