"""Device-mesh sharding: data-parallel batches + an exposed model axis.

Reference parity: SURVEY.md section 2c — the reference is single-process,
single-GPU with no distributed stack at all; the TPU-native plan is first-class
data parallelism via ``jax.sharding`` over a ``Mesh('data', 'model')`` with XLA
placing the gradient all-reduces on ICI (the scaling-book recipe: pick a mesh,
annotate shardings, let the compiler insert collectives). No NCCL/MPI-style
hand-written communication exists anywhere in this framework.

Design:
  * ``data`` axis: batches are sharded on their leading dimension; every jitted
    train/eval step from train/steps.py runs unchanged — jit sees sharded
    inputs, keeps the loss a *global*-batch mean, and emits a ``psum`` for the
    gradients.
  * ``model`` axis: exposed per SURVEY.md section 2c ("design for it, don't
    build first"). ``partition_rule`` shards large 2-D+ parameter matrices
    column-wise over ``model`` so encoder/decoder matmuls *can* tensor-shard;
    with ``model=1`` (the default) this degenerates to full replication.

Everything here is shape-driven: parameter and optimizer-state pytrees are
sharded leaf-by-leaf from array shapes alone, so optax states (whose leaves
mirror parameter shapes) need no structural matching.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Any] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    With ``n_data=None`` all remaining devices go to the data axis. On a
    v5e-8 slice the default is an 8-way data mesh; tests use the 8-device
    virtual CPU platform (see tests/conftest.py).
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devs) % n_model:
            raise ValueError(
                f"{len(devs)} devices not divisible by model={n_model}"
            )
        n_data = len(devs) // n_model
    need = n_data * n_model
    if need > len(devs):
        raise ValueError(f"mesh ({n_data},{n_model}) needs {need} devices, "
                         f"have {len(devs)}")
    grid = np.asarray(devs[:need]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis (per-device batch shards)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch onto the mesh, sharded on the batch dimension.

    Single process: ``batch`` is the GLOBAL batch; its leading dim must
    divide by the data-axis size. Multi-process (multi-host feeding,
    SURVEY.md section 2c): each process passes only its LOCAL slice of the
    global batch (see ``process_batch_slice``) and the global array is
    assembled from the per-process shards — ``jax.device_put`` cannot
    address other hosts' devices, so the local-data constructor is used.
    Exercised by a real 2-process run in tests/test_multihost.py.
    """
    sh = batch_sharding(mesh)
    n_data = mesh.shape[DATA_AXIS]
    multi = jax.process_count() > 1

    def put(x):
        if multi:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        x = jnp.asarray(x)
        if x.ndim == 0 or x.shape[0] % n_data:
            raise ValueError(
                f"batch dim {x.shape} not divisible by data axis {n_data}"
            )
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def partition_rule(
    shape: Tuple[int, ...], n_model: int, min_shard_dim: int = 512
) -> P:
    """Shape-based tensor-parallel rule for a parameter/optimizer leaf.

    2-D+ weights whose last dim is large and divisible by the model axis are
    sharded column-wise (output-feature sharding: each model shard computes a
    slice of the matmul output; XLA all-gathers where the next op needs the
    full width). Everything else replicates. With n_model=1 this is P().
    """
    if (
        n_model > 1
        and len(shape) >= 2
        and shape[-1] >= min_shard_dim
        and shape[-1] % n_model == 0
    ):
        return P(*([None] * (len(shape) - 1)), MODEL_AXIS)
    return P()


def shard_params(tree: Any, mesh: Mesh, min_shard_dim: int = 512) -> Any:
    """Place a parameter-shaped pytree (params or optimizer state) onto the
    mesh using ``partition_rule`` leaf-by-leaf. Scalars replicate.

    Multi-process: each process holds the same host copy (deterministic
    same-seed init) and ``jax.device_put`` cannot address remote devices, so
    the global array is assembled shard-by-shard from the host copy via
    ``make_array_from_callback`` (exercised in tests/test_multihost.py).
    """
    n_model = mesh.shape[MODEL_AXIS]
    multi = jax.process_count() > 1

    def put(x):
        spec = partition_rule(jnp.shape(x), n_model, min_shard_dim)
        sh = NamedSharding(mesh, spec)
        if multi:
            arr = np.asarray(x)
            return jax.make_array_from_callback(
                arr.shape, sh, lambda idx: arr[idx]
            )
        return jax.device_put(jnp.asarray(x), sh)

    return jax.tree_util.tree_map(put, tree)


def shard_train_state(state: Any, mesh: Mesh, min_shard_dim: int = 512) -> Any:
    """Shard a TrainState: params/opt leaves by shape rule, rest replicated.

    Works on any pytree of arrays — the shape rule handles every leaf, so the
    optax state (mirroring param shapes) and counters (scalars) fall out
    naturally.
    """
    return shard_params(state, mesh, min_shard_dim)


def process_batch_slice(global_batch: int) -> slice:
    """This host's slice of a globally-indexed batch (multi-host feeding:
    each process materializes only its shard of the global batch before
    ``shard_batch``; single-process -> the whole range). SURVEY.md section
    2c "sharded host data loading"."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} % processes {n} != 0")
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} % data axis {n} != 0")
    return global_batch // n


# --------------------------------------------------------------------------
# Pallas kernels under a mesh: shard_map at the kernel boundary
# --------------------------------------------------------------------------
#
# XLA's auto-sharding cannot partition a pallas_call (an opaque custom
# call): under a data mesh it ALL-GATHERS the sharded batch onto every
# device, runs the kernel replicated, then re-shards — measured as 6
# all-gathers per BLSTM layer on the 8-way CPU mesh. The fix is the
# scaling-book-idiomatic one: run the kernel inside jax.shard_map over the
# data axis, so each device executes it on its own batch shard and the
# surrounding jitted program keeps its auto-sharded semantics (replicated
# weights transpose to a psum of per-shard cotangents, which IS the DP
# gradient all-reduce).
#
# Kernel call sites (models/rnn.py, decode/beam.py, ...) cannot see the
# mesh through their module configs, so the mesh is ambient: CLIs and
# steps that build a data mesh register it here, and sharded_kernel_call
# wraps a kernel invocation when (a) a mesh is registered, (b) the data
# axis has >1 devices, and (c) the batch divides evenly. Otherwise the
# call runs unwrapped (single-device semantics, still correct).

_KERNEL_MESH: Optional[Tuple[Mesh, str]] = None

# Count of kernel calls traced UNWRAPPED (no mesh registered) while this
# process could see >1 device. Such traces are cached by jit keyed on
# avals only, so registering a mesh afterwards silently leaves those
# compiled programs all-gathering their kernels — the one ambient-state
# failure mode of this design. set_kernel_mesh turns it into a loud
# warning instead of a silent performance loss.
_UNWRAPPED_MULTIDEVICE_TRACES: int = 0


def set_kernel_mesh(mesh: Optional[Mesh], axis: str = DATA_AXIS) -> None:
    """Register (or clear, with None) the ambient kernel mesh.

    Must be called BEFORE the first invocation of any jitted function
    whose trace should shard_map its kernels: sharded_kernel_call reads
    the registration at trace time, and jit caches are keyed on argument
    avals only — a function traced earlier keeps its unwrapped
    (all-gathering) kernels for those shapes. The CLIs register the mesh
    immediately after building it, before any model call; registering
    after kernel-bearing traces already happened warns loudly (those
    cached programs keep the slow semantics until re-jitted).
    """
    global _KERNEL_MESH, _UNWRAPPED_MULTIDEVICE_TRACES
    if mesh is not None and _UNWRAPPED_MULTIDEVICE_TRACES:
        import warnings

        warnings.warn(
            f"set_kernel_mesh called after {_UNWRAPPED_MULTIDEVICE_TRACES} "
            "kernel call(s) were already traced without a mesh on a "
            "multi-device process. jit caches are keyed on shapes only, "
            "so those compiled programs will KEEP all-gathering their "
            "Pallas kernels; register the mesh before the first model "
            "call (or re-jit / change batch shape) to get shard_map'd "
            "kernels.",
            stacklevel=2,
        )
        _UNWRAPPED_MULTIDEVICE_TRACES = 0
    if mesh is None:
        # explicitly clearing is deliberate scope management (CLIs do it
        # on their no-mesh paths) — start the late-registration tally
        # fresh from here
        _UNWRAPPED_MULTIDEVICE_TRACES = 0
    _KERNEL_MESH = None if mesh is None else (mesh, axis)


def current_kernel_mesh() -> Optional[Tuple[Mesh, str]]:
    return _KERNEL_MESH


class kernel_mesh:
    """Context manager form of set_kernel_mesh (used by tests; scoped
    use intentionally interleaves wrapped and unwrapped traces, so it
    skips the late-registration warning)."""

    def __init__(self, mesh: Optional[Mesh], axis: str = DATA_AXIS):
        self.arg = (mesh, axis)

    def __enter__(self):
        global _KERNEL_MESH
        self.prev = _KERNEL_MESH
        mesh, axis = self.arg
        _KERNEL_MESH = None if mesh is None else (mesh, axis)

    def __exit__(self, *exc):
        global _KERNEL_MESH
        _KERNEL_MESH = self.prev


def local_kernel_batch(batch_size: int) -> int:
    """Per-device batch a kernel will see inside sharded_kernel_call's
    shard_map — or the full batch when the call would run unwrapped.
    Kernel call sites use this for VMEM budget planning; it is the single
    encoding of the same gating rule sharded_kernel_call applies."""
    km = _KERNEL_MESH
    if km is None:
        return batch_size
    n = int(km[0].shape[km[1]])
    if n <= 1 or batch_size % n:
        return batch_size
    return batch_size // n


def sharded_kernel_call(fn, batch_size: int, in_batched, out_batched=True):
    """Wrap a kernel-calling fn in shard_map over the ambient data mesh.

    in_batched: bool per positional argument — True shards dim 0 on the
    data axis, False replicates. out_batched likewise for outputs (a bool
    or a tuple matching the output structure). Returns fn unchanged when
    no mesh is registered, the axis is trivial, or batch_size does not
    divide over it.
    """
    km = _KERNEL_MESH
    if km is None:
        if len(jax.devices()) > 1:
            global _UNWRAPPED_MULTIDEVICE_TRACES
            _UNWRAPPED_MULTIDEVICE_TRACES += 1
        return fn
    mesh, axis = km
    n = int(mesh.shape[axis])
    if n <= 1 or batch_size % n:
        return fn
    in_specs = tuple(P(axis) if b else P() for b in in_batched)
    if isinstance(out_batched, bool):
        out_specs = P(axis) if out_batched else P()
    else:
        out_specs = tuple(P(axis) if b else P() for b in out_batched)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
