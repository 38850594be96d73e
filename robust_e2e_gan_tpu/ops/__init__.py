"""Core numeric ops: feature frontend, CTC, scoring, Pallas kernels.

Import submodules directly (``from robust_e2e_gan_tpu.ops import fbank``);
function re-exports are intentionally avoided so submodule names are never
shadowed.
"""

from robust_e2e_gan_tpu.ops import fbank  # noqa: F401
from robust_e2e_gan_tpu.ops import ctc  # noqa: F401
from robust_e2e_gan_tpu.ops import editdistance  # noqa: F401
