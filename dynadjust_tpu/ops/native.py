"""ctypes bindings for the native host kernels (native/libdta_native.so),
with transparent numpy fallbacks when the library isn't built.

Build: `make -C native` (g++, no external deps).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(here, "native", "libdta_native.so")
    if not os.path.exists(path):
        _LIB = False
        return False
    lib = ctypes.CDLL(path)
    c_d = ctypes.POINTER(ctypes.c_double)
    c_i = ctypes.POINTER(ctypes.c_int64)
    lib.scatter_rhs.argtypes = [c_i, c_d, c_d, ctypes.c_double,
                                ctypes.c_int64, c_d]
    lib.baseline_residuals.argtypes = [c_i, c_d, c_d, ctypes.c_int64, c_d]
    lib.block_matvec.argtypes = [c_d, c_d, c_d, c_d, c_d,
                                 ctypes.c_int64, ctypes.c_int64,
                                 ctypes.c_int64, c_d, c_d]
    _LIB = lib
    return lib


def native_available() -> bool:
    return bool(_load())


def _ptr_d(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ptr_i(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def baseline_residuals(pairs: np.ndarray, obs: np.ndarray,
                       x: np.ndarray) -> np.ndarray:
    """mmc[m] = obs[m] - (x[j] - x[i])."""
    lib = _load()
    if not lib:
        return obs - (x[pairs[:, 1]] - x[pairs[:, 0]])
    pairs = np.ascontiguousarray(pairs, dtype=np.int64)
    obs = np.ascontiguousarray(obs, dtype=np.float64)
    x = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty_like(obs)
    lib.baseline_residuals(_ptr_i(pairs), _ptr_d(obs), _ptr_d(x),
                           len(pairs), _ptr_d(out))
    return out


def block_matvec(Nii, Nij, Njj, xi, xj_b):
    """(yi, yj_b) = blocked symmetric matvec (f64)."""
    lib = _load()
    if not lib:
        yi = (np.einsum("bij,bj->bi", Nii, xi) +
              np.einsum("bij,bj->bi", Nij, xj_b))
        yj = (np.einsum("bij,bi->bj", Nij, xi) +
              np.einsum("bij,bj->bi", Njj, xj_b))
        return yi, yj
    B, ni, _ = Nii.shape
    nj = Njj.shape[1]
    Nii = np.ascontiguousarray(Nii, dtype=np.float64)
    Nij = np.ascontiguousarray(Nij, dtype=np.float64)
    Njj = np.ascontiguousarray(Njj, dtype=np.float64)
    xi = np.ascontiguousarray(xi, dtype=np.float64)
    xj_b = np.ascontiguousarray(xj_b, dtype=np.float64)
    yi = np.empty((B, ni))
    yj = np.empty((B, nj))
    lib.block_matvec(_ptr_d(Nii), _ptr_d(Nij), _ptr_d(Njj), _ptr_d(xi),
                     _ptr_d(xj_b), B, ni, nj, _ptr_d(yi), _ptr_d(yj))
    return yi, yj
