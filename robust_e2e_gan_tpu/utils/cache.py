"""Persistent XLA compilation cache.

Compilation of the scan-heavy programs (BLSTM stacks, the beam-search decode
loop, the fused GAN train step) costs minutes on the remote-compile TPU
platform; the persistent cache cuts repeat compiles across processes to
sub-second (measured 187.5 s -> 0.7 s). Every entry point (bench,
__graft_entry__, CLIs, tests) calls ``enable_persistent_cache()`` before
building programs.
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point JAX's compilation cache at a repo-local directory."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "RG_JAX_CACHE_DIR",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)
                ))),
                ".jax_cache",
            ),
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
