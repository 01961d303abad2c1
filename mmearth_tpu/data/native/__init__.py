"""ctypes bindings for the native gather core (built on demand with g++).

Falls back cleanly: :func:`get_lib` returns None when no compiler/toolchain is
available and the loader uses the numpy path instead.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "gather.cc"
_LIB = None
_TRIED = False


def _build() -> Path | None:
    src = _SRC.read_bytes()
    tag = hashlib.sha1(src).hexdigest()[:12]
    out = Path(tempfile.gettempdir()) / f"libmmgather_{tag}.so"
    if out.exists():
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           "-o", str(out), str(_SRC)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except (OSError, subprocess.SubprocessError) as e:
        print(f"native gather build failed ({e}); using numpy fallback")
        return None


def get_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("MMEARTH_TPU_NO_NATIVE"):
        return None
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.mm_gather_rows.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64,
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int,
    ]
    lib.mm_gather_rows.restype = None
    lib.mm_prefetch_rows.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_uint64,
    ]
    lib.mm_prefetch_rows.restype = None
    _LIB = lib
    return _LIB


def gather_rows(src: np.ndarray, rows: np.ndarray, out: np.ndarray | None = None,
                n_threads: int = 0) -> np.ndarray:
    """out[i] = src[rows[i]] via the native core; src must be C-contiguous
    along axis 0 (memmap or ndarray)."""
    lib = get_lib()
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    row_bytes = src.strides[0]
    if out is None:
        out = np.empty((len(rows),) + src.shape[1:], dtype=src.dtype)
    if lib is None:
        np.take(src, rows, axis=0, out=out)
        return out
    lib.mm_gather_rows(
        ctypes.c_void_p(src.ctypes.data), ctypes.c_void_p(out.ctypes.data),
        ctypes.c_uint64(row_bytes), ctypes.c_void_p(rows.ctypes.data),
        ctypes.c_uint64(len(rows)), ctypes.c_int(n_threads),
    )
    return out


def prefetch_rows(src: np.ndarray, rows: np.ndarray) -> None:
    lib = get_lib()
    if lib is None:
        return
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    lib.mm_prefetch_rows(
        ctypes.c_void_p(src.ctypes.data), ctypes.c_uint64(src.strides[0]),
        ctypes.c_void_p(rows.ctypes.data), ctypes.c_uint64(len(rows)),
    )
