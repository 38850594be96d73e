"""Atomic checkpoint save/restore with best+latest retention.

Reference parity: SURVEY.md section 5 "Checkpoint/resume" — the reference
torch.save()s model+optimizer state dicts per epoch into
checkpoints/<name>/ and tracks the best dev metric. TPU-native plan from the
survey: atomic checkpoints that survive preemption, a resumable loop keyed
on the step counter, best+latest retention.

Implementation: the full TrainState pytree (G/D params, both optimizer
states, PRNG key, step) is serialized with flax msgpack into a temp file and
atomically renamed — a preempted write can never corrupt the latest
checkpoint. A sidecar JSON carries step/metric metadata. Device arrays are
pulled to host once (fully replicated save; per-shard saving is unnecessary
at this model scale — params are MBs, not GBs).
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_host(tree: Any) -> Any:
    def pull(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            # multi-process run: np.asarray would raise on a global array.
            # Replicated leaves (params/opt state under pure DP) read their
            # local copy; genuinely sharded leaves are all-gathered.
            if x.sharding.is_fully_replicated:
                return np.asarray(x.addressable_data(0))
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree_util.tree_map(pull, tree)


# most recent save-history entries retained in checkpoints.json
_HISTORY_CAP = 200


def save_checkpoint(
    ckpt_dir: str,
    state: Any,
    step: int,
    metric: Optional[float] = None,
    keep: int = 3,
    best_mode: str = "max",
    extra: Optional[Dict] = None,
) -> str:
    """Write ckpt_dir/ckpt_<step>.msgpack atomically; update latest/best.

    Returns the checkpoint path. ``metric`` (e.g. dev accuracy) drives the
    'best' symlink; ``keep`` bounds non-best retained checkpoints.
    ``extra`` is a small JSON-able dict stored in the sidecar alongside the
    'latest' entry (epoch counter, plateau best_acc, steps_per_epoch) so the
    train loop can resume its schedule without re-scanning the corpus.
    """
    return _save_hosted(
        ckpt_dir, _to_host(state), step, metric, keep, best_mode, extra
    )


def _save_hosted(
    ckpt_dir: str,
    host_state: Any,
    step: int,
    metric: Optional[float] = None,
    keep: int = 3,
    best_mode: str = "max",
    extra: Optional[Dict] = None,
) -> str:
    """save_checkpoint body on an already host-pulled pytree (worker-thread
    safe: no device access, no collectives)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    data = serialization.to_bytes(host_state)
    path = os.path.join(ckpt_dir, f"ckpt_{step}.msgpack")
    fd, tmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)  # atomic on POSIX
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)

    meta = _read_meta(ckpt_dir)
    meta["latest"] = {"step": step, "path": os.path.basename(path)}
    if extra is not None:
        meta["latest"]["extra"] = extra
    if metric is not None:
        best = meta.get("best")
        better = (
            best is None
            or (best_mode == "max" and metric > best["metric"])
            or (best_mode == "min" and metric < best["metric"])
        )
        if better:
            meta["best"] = {
                "step": step,
                "metric": float(metric),
                "path": os.path.basename(path),
            }
    hist = meta.setdefault("history", [])
    hist.append(
        {"step": step, "metric": None if metric is None else float(metric)}
    )
    # bound the sidecar: with save_every_steps a long run would otherwise
    # append one entry per save forever
    if len(hist) > _HISTORY_CAP:
        del hist[: len(hist) - _HISTORY_CAP]
    _write_meta(ckpt_dir, meta)
    _prune(ckpt_dir, meta, keep)
    return path


class AsyncCheckpointer:
    """Checkpoint saves off the training thread.

    The reference's torch.save blocks the epoch loop for the full
    serialize+write; here only the device->host pull stays synchronous
    (the next step may donate those buffers, and in multi-process runs
    the pull can involve a collective, which must not run off-thread) —
    msgpack serialization, the atomic file write, sidecar update and
    pruning all run on a single worker. At most one save is in flight:
    a new save (or ``wait()``) joins the previous one first, preserving
    sidecar ordering and bounding host memory to one snapshot. Worker
    exceptions re-raise on the next save()/wait().
    """

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def save(self, ckpt_dir: str, state: Any, step: int, **kw) -> None:
        # join the in-flight write FIRST so its snapshot is released
        # before the new pull — this is what bounds host memory to one
        # snapshot; the pull itself stays synchronous (donation +
        # collective safety, see class docstring)
        self.wait()
        host_state = _to_host(state)

        def work():
            try:
                _save_hosted(ckpt_dir, host_state, step, **kw)
            except BaseException as e:  # surfaced on next save()/wait()
                self._error = e

        self._thread = threading.Thread(
            target=work, name="ckpt-writer", daemon=True
        )
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        # drain the in-flight write even on error exits; swallow worker
        # errors only if the body is already raising
        try:
            self.wait()
        except BaseException:
            if exc[0] is None:
                raise


def restore_checkpoint(
    ckpt_dir: str, state_template: Any, which: str = "latest"
) -> Tuple[Any, int]:
    """Restore 'latest' or 'best' into the template pytree; returns
    (state, step). Raises FileNotFoundError if absent."""
    meta = _read_meta(ckpt_dir)
    entry = meta.get(which)
    if not entry:
        raise FileNotFoundError(f"no '{which}' checkpoint in {ckpt_dir}")
    path = os.path.join(ckpt_dir, entry["path"])
    with open(path, "rb") as f:
        state = serialization.from_bytes(state_template, f.read())
    return state, int(entry["step"])


def read_extra(ckpt_dir: str, which: str = "latest") -> Dict:
    """Sidecar ``extra`` dict saved with the checkpoint ({} if absent)."""
    entry = _read_meta(ckpt_dir).get(which) or {}
    return dict(entry.get("extra") or {})


def has_checkpoint(ckpt_dir: str, which: str = "latest") -> bool:
    entry = _read_meta(ckpt_dir).get(which)
    return bool(entry) and os.path.exists(
        os.path.join(ckpt_dir, entry["path"])
    )


def _meta_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "checkpoints.json")


def _read_meta(ckpt_dir: str) -> Dict:
    p = _meta_path(ckpt_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def _write_meta(ckpt_dir: str, meta: Dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f, indent=2)
        os.replace(tmp, _meta_path(ckpt_dir))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _prune(ckpt_dir: str, meta: Dict, keep: int) -> None:
    protect = {
        e["path"] for e in (meta.get("latest"), meta.get("best")) if e
    }
    cands: List[Tuple[int, str]] = []
    for fn in os.listdir(ckpt_dir):
        if fn.startswith("ckpt_") and fn.endswith(".msgpack"):
            if fn not in protect:
                try:
                    cands.append((int(fn[5:-8]), fn))
                except ValueError:
                    pass
    cands.sort(reverse=True)
    for _, fn in cands[max(keep - 1, 0):]:
        os.unlink(os.path.join(ckpt_dir, fn))
