"""DTW alignment (native C++ kernel with numpy fallback).

The reference's DTW is numba-JIT native (`utils/oversmoothing.py:109-200`);
here the same DP runs in a C++ shared library (`native/dtw.cc`, built with
`make -C native`) called through ctypes. If the library is missing and a
compiler is available it's built on first use; otherwise a vectorized numpy
fallback runs the identical recurrence.
"""
from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libdtw.so"
_lib = None


def _load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.dtw_path.restype = ctypes.c_int
    lib.dtw_path.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def _dtw_native(A, B, metric: int, window: int):
    lib = _load_library()
    if lib is None:
        return None
    Ta, M = A.shape
    Tb = B.shape[0]
    A = np.ascontiguousarray(A, np.float32)
    B = np.ascontiguousarray(B, np.float32)
    cost = ctypes.c_float()
    path = np.empty((Ta + Tb, 2), np.int32)
    plen = ctypes.c_int32()
    rc = lib.dtw_path(
        A.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        B.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        Ta, Tb, M, metric, window, ctypes.byref(cost),
        path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(plen))
    if rc != 0:
        return None
    return float(cost.value), path[: plen.value].copy()


def _dtw_numpy(A, B, metric: int, window: int):
    """Reference-identical recurrence, row-vectorized in numpy."""
    Ta, M = A.shape
    Tb = B.shape[0]
    inf = np.float32(1e30)
    D = np.full((Ta + 1, Tb + 1), inf, np.float32)
    D[0, 0] = 0.0
    P = np.full((Ta, Tb), -1, np.int8)
    for i in range(1, Ta + 1):
        j_min, j_max = 1, Tb
        if window >= 0:
            j_min = max(1, i - window)
            j_max = min(Tb, i + window)
        ai = A[i - 1]
        Bs = B[j_min - 1: j_max]
        if metric == 0:
            costs = np.sqrt(((ai[None, :] - Bs) ** 2).sum(1))
        else:
            denom = (np.linalg.norm(ai) * np.linalg.norm(Bs, axis=1) + 1e-12)
            costs = 1.0 - (Bs @ ai) / denom
        # the 'left' dependency is within-row sequential
        for idx, j in enumerate(range(j_min, j_max + 1)):
            up = D[i - 1, j]
            left = D[i, j - 1]
            diag = D[i - 1, j - 1]
            best, bp = up, 0
            if left < best:
                best, bp = left, 1
            if diag < best:
                best, bp = diag, 2
            D[i, j] = costs[idx] + best
            P[i - 1, j - 1] = bp
    i, j = Ta - 1, Tb - 1
    rev = []
    while i >= 0 and j >= 0:
        rev.append((i, j))
        bp = P[i, j]
        if bp == 2:
            i -= 1
            j -= 1
        elif bp == 0:
            i -= 1
        elif bp == 1:
            j -= 1
        else:
            rev.pop()  # unreachable: reference drops the final pair
            break
    return (float(D[Ta, Tb]),
            np.asarray(rev[::-1], np.int32).reshape(-1, 2))


def dtw_path(A: np.ndarray, B: np.ndarray, metric: str = "cosine",
             window: Optional[int] = None):
    """DTW between time-major feature sequences A [Ta, M], B [Tb, M].
    Returns (total_cost, path [L, 2])."""
    mcode = 0 if metric.lower() == "l2" else 1
    w = -1 if window is None else int(window)
    out = _dtw_native(A, B, mcode, w)
    if out is None:
        out = _dtw_numpy(np.asarray(A, np.float32),
                         np.asarray(B, np.float32), mcode, w)
    return out


def dtw_align_mels(mel_a: np.ndarray, mel_b: np.ndarray,
                   metric: str = "cosine", window: Optional[int] = None,
                   return_aligned: bool = True):
    """Align [B, T] mel spectrograms (reference `dtw_align_mels`,
    oversmoothing.py:202-248)."""
    A = np.ascontiguousarray(mel_a.T, np.float32)
    B = np.ascontiguousarray(mel_b.T, np.float32)
    total_cost, path = dtw_path(A, B, metric, window)
    if not return_aligned:
        return total_cost, path
    return total_cost, path, A[path[:, 0]], B[path[:, 1]]


def using_native_kernel() -> bool:
    return _load_library() is not None
