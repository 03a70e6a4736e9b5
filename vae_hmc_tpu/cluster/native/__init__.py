"""ctypes bindings + lazy build for the native ward NN-chain."""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "ward.cpp"
_LIB_PATH = Path(__file__).parent / "_ward.so"
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _get_lib() -> ctypes.CDLL:
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        raise RuntimeError(_build_error)
    try:
        if (not _LIB_PATH.exists()
                or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime):
            proc = subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC),
                 "-o", str(_LIB_PATH)], capture_output=True, text=True)
            if proc.returncode != 0:
                raise RuntimeError(f"ward build failed:\n{proc.stderr}")
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.ward_nn_chain.restype = ctypes.c_int
        lib.ward_nn_chain.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ctypes.POINTER(ctypes.c_double)]
        _lib = lib
        return lib
    except Exception as e:
        _build_error = f"{type(e).__name__}: {e}"
        raise


def ward_nn_chain_native(d2: np.ndarray) -> np.ndarray:
    """d2: (N, N) float64 squared distances (consumed/modified).
    Returns the scipy-format (N-1, 4) linkage matrix, sorted by distance
    with relabeled cluster ids (same post-processing as the numpy path)."""
    lib = _get_lib()
    d2 = np.ascontiguousarray(d2, dtype=np.float64)
    n = d2.shape[0]
    merges = np.zeros((n - 1, 4), dtype=np.float64)
    rc = lib.ward_nn_chain(
        d2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        merges.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise RuntimeError(f"ward_nn_chain failed rc={rc}")
    order = np.argsort(merges[:, 2], kind="stable")
    merges = merges[order]
    old_new = {n + int(old): n + new for new, old in enumerate(order)}
    for step in range(n - 1):
        for col in (0, 1):
            v = int(merges[step, col])
            if v >= n:
                merges[step, col] = old_new[v]
    return merges
