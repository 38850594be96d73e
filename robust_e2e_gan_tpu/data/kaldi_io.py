"""Kaldi ark/scp matrix and vector I/O (pure numpy).

Reference parity: SURVEY.md section 2a "Kaldi I/O" — the reference reads
features, CMVN stats and targets produced by Kaldi recipes (`kaldi_io.py`:
read_mat_scp / read_mat_ark / write_mat). This is a from-scratch
implementation of the Kaldi binary table format:

  ark entry:  <key> ' ' <binary-blob>
  blob:       '\\0B' magic, then 'FM'/'DM' (float/double matrix) or
              'FV'/'DV' (vector), then for matrices
              '\\4' int32 rows '\\4' int32 cols, then row-major data.
  scp entry:  <key> ' ' <ark-path>:<byte-offset>\\n

Text-format ark ("[ 1 2\\n 3 4 ]") is also read, since CMVN stats are often
shipped that way. Compression (CM*) is not implemented — the rebuild's
native path is npz/jsonl (data/dataset.py); gate with a clear error.
"""

from __future__ import annotations

import os
import struct
from typing import BinaryIO, Dict, Iterator, Tuple

import numpy as np


def _read_token(f: BinaryIO) -> str:
    chars = []
    while True:
        c = f.read(1)
        if not c or c == b" ":
            break
        chars.append(c)
    return b"".join(chars).decode()


def _expect(f: BinaryIO, token: bytes) -> None:
    got = f.read(len(token))
    if got != token:
        raise ValueError(f"expected {token!r}, got {got!r}")


def _read_int32(f: BinaryIO) -> int:
    size = f.read(1)
    if size != b"\x04":
        raise ValueError(f"expected int32 size byte, got {size!r}")
    return struct.unpack("<i", f.read(4))[0]


def read_matrix(f: BinaryIO) -> np.ndarray:
    """Read one matrix/vector blob at the current position."""
    binary = f.read(2)
    if binary != b"\x00B":
        # text format: everything up to the closing ']'
        rest = binary + f.readline()
        rows = []
        if b"[" in rest:
            rest = rest.split(b"[", 1)[1]
        while True:
            line = rest if rows == [] and rest.strip() else f.readline()
            rest = b""
            if not line:
                raise ValueError("unterminated text matrix")
            done = b"]" in line
            line = line.replace(b"]", b" ")
            vals = line.split()
            if vals:
                rows.append([float(x) for x in vals])
            if done:
                break
        return np.asarray(rows, dtype=np.float32)

    kind = _read_token(f)
    if kind in ("FM", "DM"):
        rows = _read_int32(f)
        cols = _read_int32(f)
        dt = np.float32 if kind == "FM" else np.float64
        data = np.frombuffer(f.read(rows * cols * dt().itemsize), dtype=dt)
        return data.reshape(rows, cols).astype(np.float32)
    if kind in ("FV", "DV"):
        n = _read_int32(f)
        dt = np.float32 if kind == "FV" else np.float64
        data = np.frombuffer(f.read(n * dt().itemsize), dtype=dt)
        return data.astype(np.float32)
    if kind.startswith("CM"):
        raise NotImplementedError(
            "compressed Kaldi matrices (CM*) are not supported; "
            "use copy-feats to decompress or the native npz format"
        )
    raise ValueError(f"unknown Kaldi blob kind {kind!r}")


def read_mat_ark(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Iterate (key, matrix) over a binary/text ark file."""
    with open(path, "rb") as f:
        while True:
            key = _read_token(f)
            if not key:
                break
            yield key, read_matrix(f)


def read_mat_scp(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Iterate (key, matrix) following an scp's ark:offset pointers."""
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            key, rx = line.split(None, 1)
            ark_path, _, offset = rx.rpartition(":")
            with open(ark_path, "rb") as a:
                a.seek(int(offset))
                yield key, read_matrix(a)


def read_scp_index(path: str) -> Dict[str, Tuple[str, int]]:
    """scp -> {key: (ark_path, offset)} for random access."""
    out: Dict[str, Tuple[str, int]] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            key, rx = line.split(None, 1)
            ark_path, _, offset = rx.rpartition(":")
            out[key] = (ark_path, int(offset))
    return out


def read_mat_at(ark_path: str, offset: int) -> np.ndarray:
    with open(ark_path, "rb") as f:
        f.seek(offset)
        return read_matrix(f)


def write_mat(
    f: BinaryIO, key: str, mat: np.ndarray
) -> int:
    """Append one (key, float matrix/vector) entry; returns blob offset."""
    f.write(key.encode() + b" ")
    offset = f.tell()
    f.write(b"\x00B")
    mat = np.ascontiguousarray(mat, dtype=np.float32)
    if mat.ndim == 2:
        f.write(b"FM ")
        f.write(b"\x04" + struct.pack("<i", mat.shape[0]))
        f.write(b"\x04" + struct.pack("<i", mat.shape[1]))
    elif mat.ndim == 1:
        f.write(b"FV ")
        f.write(b"\x04" + struct.pack("<i", mat.shape[0]))
    else:
        raise ValueError(f"only 1-D/2-D supported, got shape {mat.shape}")
    f.write(mat.tobytes())
    return offset


def write_ark_scp(
    entries: Iterator[Tuple[str, np.ndarray]],
    ark_path: str,
    scp_path: str = None,
) -> None:
    """Write an ark (and optional matching scp) from (key, matrix) pairs."""
    scp = open(scp_path, "w") if scp_path else None
    try:
        with open(ark_path, "wb") as f:
            for key, mat in entries:
                offset = write_mat(f, key, mat)
                if scp:
                    scp.write(f"{key} {os.path.abspath(ark_path)}:{offset}\n")
    finally:
        if scp:
            scp.close()
