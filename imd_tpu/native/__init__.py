"""Native (C++) host-runtime components, loaded via ctypes.

The TPU compute path is JAX/XLA/Pallas; these are the host-side runtime
pieces the reference implements in C (SURVEY.md §2.7): bulk ASCII
parse/format for .chkpt-scale files.  Compiled on demand with g++ (-O3
-fopenmp) and cached next to the sources; everything degrades to NumPy
if no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[str]:
    src = os.path.join(_HERE, "chkptio.cpp")
    so = os.path.join(_HERE, "libchkptio.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           src, "-o", so]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so
    except Exception:
        try:
            # retry without -march=native / openmp (portability)
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", src,
                            "-o", so], check=True, capture_output=True,
                           timeout=120)
            return so
        except Exception:
            return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.chkpt_count_rows.restype = ctypes.c_long
        lib.chkpt_count_rows.argtypes = [ctypes.c_char_p, ctypes.c_long]
        lib.chkpt_parse.restype = ctypes.c_long
        lib.chkpt_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long]
        lib.chkpt_format.restype = ctypes.c_long
        lib.chkpt_format.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_int, ctypes.c_char_p, ctypes.c_long]
        _LIB = lib
        return _LIB


def parse_table(body: bytes, ncols: int) -> Optional[np.ndarray]:
    """Parse an ASCII table body to [rows, ncols] float64, or None if
    the native library is unavailable (caller falls back to NumPy)."""
    lib = get_lib()
    if lib is None:
        return None
    buf = body + b"\n\x00"
    rows = lib.chkpt_count_rows(buf, len(body))
    out = np.empty((max(rows, 1), ncols), np.float64)
    got = lib.chkpt_parse(buf, len(body),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                          ncols, rows)
    if got < 0:
        raise ValueError(f"malformed table row {-(got + 1)}")
    return out[:got]


def format_table(data: np.ndarray, int_cols: int = 0,
                 precision: int = 16) -> Optional[bytes]:
    """Format [rows, ncols] float64 as the reference's ASCII layout."""
    lib = get_lib()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.float64)
    rows, ncols = data.shape
    cap = rows * ncols * (precision + 10) + 1024
    out = ctypes.create_string_buffer(cap)
    n = lib.chkpt_format(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rows, ncols, int_cols, precision, out, cap)
    if n < 0:
        raise RuntimeError("format buffer overflow")
    return out.raw[:n]
