"""ctypes binding + on-demand build of the native data runtime.

Builds `collate.cpp` with g++ into a shared library on first use (cached in
the package directory) and exposes:

- ``npy_shape(path)`` / ``npy_read_f32(path, max_rows, max_cols)``
- ``wav_read_f32(path)`` -> (audio float32, sample_rate)
- ``collate_features(paths, max_rows, max_cols)`` -> (batch, lengths):
  parallel zero-padded batch assembly of cached feature files.

Every entry point has a numpy fallback, so the pipeline degrades gracefully
where no compiler exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "collate.cpp")
_LIB = os.path.join(_HERE, "_native_collate.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        "-pthread", _SRC, "-o", _LIB,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.npy_shape.restype = ctypes.c_int
            lib.npy_shape.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.npy_read_f32.restype = ctypes.c_int64
            lib.npy_read_f32.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_int64,
            ]
            lib.wav_read_f32.restype = ctypes.c_int64
            lib.wav_read_f32.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.collate_features.restype = ctypes.c_int
            lib.collate_features.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
            ]
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
        return _lib


def available() -> bool:
    return _build() is not None


def npy_shape(path: str) -> Tuple[int, int]:
    lib = _build()
    if lib is None:
        arr = np.load(path, mmap_mode="r")
        return (arr.shape[0], arr.shape[1] if arr.ndim == 2 else 1)
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.npy_shape(path.encode(), ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"npy_shape({path}) failed: {rc}")
    return rows.value, cols.value


def npy_read_f32(path: str, max_rows: int, max_cols: int) -> Tuple[np.ndarray, int]:
    """Zero-padded (max_rows, max_cols) float32 + true row count."""
    lib = _build()
    out = np.zeros((max_rows, max_cols), np.float32)
    if lib is None:
        arr = np.load(path).astype(np.float32)
        if arr.ndim == 1:
            arr = arr[:, None]
        r = min(arr.shape[0], max_rows)
        c = min(arr.shape[1], max_cols)
        out[:r, :c] = arr[:r, :c]
        return out, r
    rows = lib.npy_read_f32(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_rows,
        max_cols,
    )
    if rows < 0:
        raise IOError(f"npy_read_f32({path}) failed: {rows}")
    return out, int(rows)


def wav_read_f32(path: str) -> Tuple[np.ndarray, int]:
    lib = _build()
    if lib is None:
        from viet_tts_tpu.dsp.audio import read_wav

        audio, sr = read_wav(path)
        return audio.astype(np.float32), sr

    sr = ctypes.c_int32()
    n = lib.wav_read_f32(path.encode(), None, 0, ctypes.byref(sr))
    if n < 0:
        raise IOError(f"wav_read_f32({path}) failed: {n}")
    out = np.zeros(int(n), np.float32)
    got = lib.wav_read_f32(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(n),
        ctypes.byref(sr),
    )
    if got < 0:
        raise IOError(f"wav_read_f32({path}) failed: {got}")
    return out[: int(got)], int(sr.value)


def collate_features(
    paths: List[str], max_rows: int, max_cols: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Parallel zero-padded batch (B, max_rows, max_cols) + lengths (B,)."""
    lib = _build()
    B = len(paths)
    if lib is None:
        out = np.zeros((B, max_rows, max_cols), np.float32)
        lengths = np.zeros(B, np.int32)
        for i, p in enumerate(paths):
            out[i], lengths[i] = npy_read_f32(p, max_rows, max_cols)
        return out, lengths
    blob = b"".join(p.encode() + b"\0" for p in paths)
    out = np.zeros((B, max_rows, max_cols), np.float32)
    lengths = np.zeros(B, np.int32)
    rc = lib.collate_features(
        blob,
        B,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_rows,
        max_cols,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise IOError(f"collate_features failed: {rc}")
    return out, lengths
