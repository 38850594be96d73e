"""ctypes binding + lazy build of the native (C++) runtime components.

The reference's native code was all external (Kaldi binaries, warp-ctc —
SURVEY.md section 2b); the rebuild keeps the device compute path in
JAX/XLA/Pallas and puts host-side hot paths (scoring) in C++ under csrc/,
bound via ctypes (no pybind11 in the image). The shared object is built on
first use with g++ and cached next to the sources; if no compiler is
available every entry point degrades to the pure-Python fallback (callers
check for None).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CSRC = os.path.join(_REPO, "csrc")
_SO_PATH = os.path.join(_CSRC, "librg_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[str]:
    src = os.path.join(_CSRC, "editdistance.cpp")
    if not os.path.exists(src):
        return None
    if os.path.exists(_SO_PATH) and (
        os.path.getmtime(_SO_PATH) >= os.path.getmtime(src)
    ):
        return _SO_PATH
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        src, "-o", _SO_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return _SO_PATH


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _build()
        if path is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _build_failed = True
            return None
        lib.rg_edit_distance_i32.restype = ctypes.c_int64
        lib.rg_edit_distance_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
        lib.rg_edit_distance_corpus_i32.restype = ctypes.c_int64
        lib.rg_edit_distance_corpus_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
        ]
        _lib = lib
        return _lib


def _to_ids(seqs: Sequence[Sequence], vocab: Dict) -> List[np.ndarray]:
    out = []
    for s in seqs:
        ids = np.empty(len(s), np.int32)
        for i, tok in enumerate(s):
            if tok not in vocab:
                vocab[tok] = len(vocab)
            ids[i] = vocab[tok]
        out.append(ids)
    return out


def native_edit_distance(ref: Sequence, hyp: Sequence) -> Optional[int]:
    """Single-pair distance; None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    vocab: Dict = {}
    r, h = _to_ids([ref], vocab) + _to_ids([hyp], vocab)
    rp = r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    hp = h.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    return int(lib.rg_edit_distance_i32(rp, len(r), hp, len(h)))


def native_edit_distance_corpus(
    refs: Sequence[Sequence], hyps: Sequence[Sequence],
    n_threads: int = 0,
) -> Optional[Tuple[np.ndarray, int]]:
    """Per-utterance distances + total; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    vocab: Dict = {}
    r_ids = _to_ids(refs, vocab)
    h_ids = _to_ids(hyps, vocab)
    r_flat = np.concatenate(r_ids) if r_ids else np.empty(0, np.int32)
    h_flat = np.concatenate(h_ids) if h_ids else np.empty(0, np.int32)
    r_off = np.zeros(len(r_ids) + 1, np.int64)
    np.cumsum([len(x) for x in r_ids], out=r_off[1:])
    h_off = np.zeros(len(h_ids) + 1, np.int64)
    np.cumsum([len(x) for x in h_ids], out=h_off[1:])
    out = np.zeros(len(r_ids), np.int64)
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    p32 = ctypes.POINTER(ctypes.c_int32)
    p64 = ctypes.POINTER(ctypes.c_int64)
    total = lib.rg_edit_distance_corpus_i32(
        r_flat.ctypes.data_as(p32), r_off.ctypes.data_as(p64),
        h_flat.ctypes.data_as(p32), h_off.ctypes.data_as(p64),
        len(r_ids), out.ctypes.data_as(p64), n_threads,
    )
    return out, int(total)
