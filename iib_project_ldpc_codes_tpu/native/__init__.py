"""Native (C) host-side kernels, loaded via ctypes.

The one genuinely hot host-side loop in the framework is GF(2) row
reduction for the ML decoder (the reference used the ``galois`` package
and three ad-hoc ``.so``s via ctypes; SURVEY.md native-component summary).
The TPU compute path needs no native code -- JAX/XLA/Pallas covers it --
so this package only ships the elimination kernel.

Build: ``python -m iib_project_ldpc_codes_tpu.native.build`` (or import;
it auto-builds with the system C compiler on first use).  All callers fall
back to the pure-numpy implementation when the library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(__file__)
_SO_PATH = os.path.join(_HERE, "libgf2.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def build(force: bool = False) -> str:
    """Compile gf2.c into libgf2.so with the system compiler."""
    src = os.path.join(_HERE, "gf2.c")
    if force or not os.path.exists(_SO_PATH) or \
            os.path.getmtime(_SO_PATH) < os.path.getmtime(src):
        cc = os.environ.get("CC", "cc")
        cmd = [cc, "-O3", "-march=native", "-shared", "-fPIC", src,
               "-o", _SO_PATH]
        subprocess.run(cmd, check=True, capture_output=True)
    return _SO_PATH


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        build()
        lib = ctypes.CDLL(_SO_PATH)
        lib.gf2_row_reduce.restype = ctypes.c_int
        lib.gf2_row_reduce.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        lib.gf2_rank.restype = ctypes.c_int
        lib.gf2_rank.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def gf2_row_reduce_native(aug: np.ndarray, num_cols: int
                          ) -> Optional[Tuple[np.ndarray, list]]:
    """Native Gauss-Jordan on uint64[rows, words]; None if lib unavailable.

    Mutates ``aug`` in place (like ops.ml.gf2_row_reduce) and returns
    (aug, pivot_columns).
    """
    lib = load()
    if lib is None:
        return None
    aug = np.ascontiguousarray(aug, dtype=np.uint64)
    rows, words = aug.shape
    pivots = np.zeros(min(rows, num_cols) + 1, dtype=np.int32)
    rank = lib.gf2_row_reduce(
        aug.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        rows, words, num_cols,
        pivots.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return aug, pivots[:rank].tolist()


def gf2_rank_native(mat: np.ndarray, num_cols: int) -> Optional[int]:
    lib = load()
    if lib is None:
        return None
    mat = np.ascontiguousarray(mat, dtype=np.uint64)
    rows, words = mat.shape
    return lib.gf2_rank(
        mat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        rows, words, num_cols)
