"""ctypes bindings + lazy build of the native audio I/O library.

Builds audioio.cpp with g++ -O3 into the package's build cache on first use
(mtime-checked), then binds the C ABI via ctypes.  Falls back cleanly: the
pure-python paths in io.audio work without the native library (slower
resampler), matching the degrade-gracefully policy used for optional deps
elsewhere (SURVEY.md §5 config/fallback conventions).
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "audioio.cpp"
_LIB_PATH = Path(__file__).parent / "_audioio.so"
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           str(_SRC), "-o", str(_LIB_PATH), "-ldl"]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"native build failed:\n{proc.stderr}")


class NativeDecoderUnavailable(RuntimeError):
    """The native layer exists but the codec library (libmpg123) is not on
    this host — callers should fall back to another decoder.  Distinct from
    IOError, which means the FILE failed to decode and must not be
    silently retried as an environment problem."""


def get_lib() -> ctypes.CDLL:
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        raise RuntimeError(_build_error)
    try:
        if (not _LIB_PATH.exists()
                or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime):
            _build()
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.audioio_load_wav.restype = ctypes.c_int
        lib.audioio_load_wav.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_long)]
        lib.audioio_resample.restype = ctypes.c_int
        lib.audioio_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_long)]
        lib.audioio_load_mp3.restype = ctypes.c_int
        lib.audioio_load_mp3.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_long)]
        _lib = lib
        return lib
    except Exception as e:      # remember failure; don't retry every call
        _build_error = f"{type(e).__name__}: {e}"
        raise


def load_wav_native(path: Path, target_sr: int,
                    max_seconds: Optional[float] = None) -> np.ndarray:
    lib = get_lib()
    # capacity bound: header peek would need another call; oversize generously
    cap = int(target_sr * (max_seconds + 1.0)) if max_seconds else (
        target_sr * 60 * 30)
    out = np.zeros(cap, dtype=np.float32)
    n = ctypes.c_long(0)
    rc = lib.audioio_load_wav(
        str(path).encode(), target_sr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
        ctypes.byref(n))
    if rc != 0:
        raise IOError(f"native wav load failed rc={rc} for {path}")
    y = out[: n.value].copy()
    if max_seconds is not None:
        y = y[: int(target_sr * max_seconds)]
    return y


def load_mp3_native(path: Path, target_sr: int,
                    max_seconds: Optional[float] = None) -> np.ndarray:
    """In-process MPEG audio decode (libmpg123 dlopen'd by the C++ layer) —
    no per-file subprocess.  rc=-20 means libmpg123 isn't on this host; the
    caller (io.audio.load_audio) then falls back to the ffmpeg pipe."""
    lib = get_lib()
    cap = int(target_sr * (max_seconds + 1.0)) if max_seconds else (
        target_sr * 60 * 30)
    out = np.zeros(cap, dtype=np.float32)
    n = ctypes.c_long(0)
    rc = lib.audioio_load_mp3(
        str(path).encode(), target_sr,
        float(max_seconds) if max_seconds else -1.0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
        ctypes.byref(n))
    if rc == -20:
        raise NativeDecoderUnavailable(f"libmpg123 not found on this host "
                                       f"(rc={rc})")
    if rc != 0:
        raise IOError(f"native mp3 load failed rc={rc} for {path}")
    y = out[: n.value].copy()
    if max_seconds is not None:
        y = y[: int(target_sr * max_seconds)]
    return y


def resample_native(y: np.ndarray, in_sr: int, out_sr: int) -> np.ndarray:
    lib = get_lib()
    y = np.ascontiguousarray(y, dtype=np.float32)
    cap = int(len(y) * (out_sr / in_sr)) + 16
    out = np.zeros(cap, dtype=np.float32)
    n = ctypes.c_long(0)
    rc = lib.audioio_resample(
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(y), in_sr,
        out_sr, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
        ctypes.byref(n))
    if rc != 0:
        raise RuntimeError(f"native resample failed rc={rc}")
    return out[: n.value].copy()
