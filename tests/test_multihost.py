"""Real 2-process multi-host feeding test (round-1 VERDICT missing #7).

Launches two separate Python processes coordinated via
``jax.distributed.initialize`` on a local gRPC port, each pinned to a
4-device virtual CPU platform, so ``jax.process_count() == 2`` and the
global mesh spans 8 devices across the two processes. Each process
materializes only ITS slice of the global batch (``process_batch_slice``)
and ``shard_batch`` assembles the global array from per-process shards
(``jax.make_array_from_process_local_data``). A jitted global reduction
must then equal the full-batch value — proving the sharded host feeding
path (SURVEY.md section 2c "sharded host data loading") end to end.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")  # defeat the image's TPU pin

coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(
    coordinator_address=coord, num_processes=2, process_id=pid,
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()
assert len(jax.local_devices()) == 4

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, {repo!r})
from robust_e2e_gan_tpu.parallel import (
    make_mesh, process_batch_slice, shard_batch,
)

mesh = make_mesh(8, 1)
GLOBAL_B = 16
# deterministic global batch both processes agree on
full = {
    "x": np.arange(GLOBAL_B * 5, dtype=np.float32).reshape(GLOBAL_B, 5),
    "n": np.arange(GLOBAL_B, dtype=np.int32),
}
sl = process_batch_slice(GLOBAL_B)
assert sl == slice(pid * 8, (pid + 1) * 8), (pid, sl)
local = {k: v[sl] for k, v in full.items()}
sharded = shard_batch(local, mesh)
assert sharded["x"].shape == (GLOBAL_B, 5)  # global logical shape

@jax.jit
def reduce(b):
    return jnp.sum(b["x"]) + jnp.sum(b["n"]).astype(jnp.float32)

got = float(reduce(sharded))
want = float(full["x"].sum() + full["n"].sum())
assert abs(got - want) < 1e-3, (got, want)
print(f"proc {pid} OK global_sum={got}", flush=True)
""".replace("{repo!r}", repr(REPO))


def test_two_process_feeding(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append("--xla_force_host_platform_device_count=4")
    env["XLA_FLAGS"] = " ".join(flags)
    env.pop("JAX_PLATFORM_NAME", None)

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, coord, str(pid)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out, out
