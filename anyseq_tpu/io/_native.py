"""ctypes bindings for the native runtime library (native/anyseq_native.cpp).

Auto-builds libanyseq_native.so with g++ on first use (cached under the
package's build dir); every caller has a pure-Python fallback, so a missing
toolchain degrades gracefully.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "anyseq_native.cpp",
)
_SO_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_build")
_SO = os.path.join(_SO_DIR, "libanyseq_native.so")


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    os.makedirs(_SO_DIR, exist_ok=True)
    try:
        src_mtime = os.path.getmtime(_SRC)
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= src_mtime:
            return True
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _SO + ".tmp", _SRC],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
            u8p = ctypes.POINTER(ctypes.c_ubyte)
            lp = ctypes.POINTER(ctypes.c_long)
            lib.read_first_fasta.restype = ctypes.c_long
            lib.read_first_fasta.argtypes = [ctypes.c_char_p, u8p,
                                             ctypes.c_long]
            lib.read_first_fastq.restype = ctypes.c_long
            lib.read_first_fastq.argtypes = [ctypes.c_char_p, u8p,
                                             ctypes.c_long]
            lib.traceback_linear.restype = None
            lib.traceback_linear.argtypes = [
                u8p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
                ctypes.c_long, u8p, u8p, u8p, u8p, ctypes.c_long, lp,
            ]
            lib.traceback_affine.restype = None
            lib.traceback_affine.argtypes = [
                u8p, u8p, u8p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
                ctypes.c_long, u8p, u8p, u8p, u8p, ctypes.c_long, lp,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _u8p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))


def read_first_sequence_native(path: str):
    """First FASTA/FASTQ record via the native reader, or None to signal
    the caller to fall back to Python."""
    lib = get_lib()
    if lib is None:
        return None
    lower = path.lower()
    if lower.endswith((".fq", ".fnq", ".fastq")):
        fn = lib.read_first_fastq
    elif lower.endswith((".fa", ".fna", ".fasta")):
        fn = lib.read_first_fasta
    else:
        return None
    try:
        cap = max(1 << 20, os.path.getsize(path))
    except OSError:
        return None
    buf = np.empty(cap, dtype=np.uint8)
    n = fn(path.encode(), _u8p(buf), cap)
    if n < 0:
        return None
    return bytes(buf[:n])


def traceback_linear_native(P: np.ndarray, q: np.ndarray, s: np.ndarray,
                            end, out_q: np.ndarray, out_s: np.ndarray,
                            off: int):
    """Native linear traceback walk; returns start (i, j) or None."""
    lib = get_lib()
    if lib is None:
        return None
    P = np.ascontiguousarray(P)
    q = np.ascontiguousarray(q)
    s = np.ascontiguousarray(s)
    m = len(q)
    n = len(s)
    start = (ctypes.c_long * 2)()
    lib.traceback_linear(
        _u8p(P), m, n, end[0], end[1], _u8p(q), _u8p(s),
        _u8p(out_q), _u8p(out_s), off, start,
    )
    return int(start[0]), int(start[1])


def traceback_affine_native(PH, PE, PF, q, s, end, out_q, out_s, off):
    lib = get_lib()
    if lib is None:
        return None
    PH = np.ascontiguousarray(PH)
    PE = np.ascontiguousarray(PE)
    PF = np.ascontiguousarray(PF)
    q = np.ascontiguousarray(q)
    s = np.ascontiguousarray(s)
    start = (ctypes.c_long * 2)()
    lib.traceback_affine(
        _u8p(PH), _u8p(PE), _u8p(PF), len(q), len(s), end[0], end[1],
        _u8p(q), _u8p(s), _u8p(out_q), _u8p(out_s), off, start,
    )
    return int(start[0]), int(start[1])
