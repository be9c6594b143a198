"""ctypes loader for the native host-runtime kernels (native/admm_host.cpp).

The shared library is built lazily with g++ on first use and cached under
``admm_tpu/_build/``.  Every entry point has a pure-NumPy fallback, so
the framework works even without a compiler; the native path exists for
host-side throughput parity with the reference's AVX/OpenMP layer
(reference: src/Linalg/AVX.h, src/Makevars:3-4).
"""
from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = Path(__file__).resolve().parent.parent / "native" / "admm_host.cpp"
_BUILD_DIR = Path(__file__).resolve().parent / "_build"
_SO = _BUILD_DIR / "libadmm_host.so"
# Bump together with admm_native_version() in the C++ source; a cached
# .so from an older source is rebuilt, not silently used.
_EXPECTED_VERSION = 2


def _build() -> Optional[ctypes.CDLL]:
    if not _SRC.exists():
        return None
    _BUILD_DIR.mkdir(exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           str(_SRC), "-o", str(_SO)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    return _load_so()


def _load_so() -> Optional[ctypes.CDLL]:
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.admm_standardize_cols.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double)]
    lib.admm_standardize_vec.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
    lib.admm_pack_beta_csc.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double)]
    lib.admm_pack_beta_csc.restype = ctypes.c_int64
    lib.admm_native_version.restype = ctypes.c_int
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, building it on first call; None on failure.
    A cached .so with a stale ``admm_native_version`` is rebuilt."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if _SO.exists():
            _LIB = _load_so()
            if (_LIB is not None
                    and _LIB.admm_native_version() != _EXPECTED_VERSION):
                _LIB = None
        if _LIB is None:
            _LIB = _build()
        if (_LIB is not None
                and _LIB.admm_native_version() != _EXPECTED_VERSION):
            _LIB = None
        return _LIB


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def pack_beta_csc(beta0: np.ndarray, coef: np.ndarray, drop_tol: float = 0.0):
    """Pack intercepts + a (nlambda, p) path into the reference's sparse
    (p+1) x nlambda CSC beta matrix; native fast path with scipy fallback."""
    from scipy import sparse

    beta0 = np.ascontiguousarray(np.atleast_1d(np.asarray(beta0, np.float64)))
    coef = np.ascontiguousarray(np.atleast_2d(np.asarray(coef, np.float64)))
    nlam, p = coef.shape
    dense = np.concatenate([beta0[:, None], coef], axis=1)  # (nlam, p+1)

    lib = get_lib()
    if lib is not None:
        cap = nlam * (p + 1)
        indptr = np.empty(nlam + 1, np.int64)
        indices = np.empty(cap, np.int32)
        data = np.empty(cap, np.float64)
        nnz = lib.admm_pack_beta_csc(
            _dptr(dense), nlam, p + 1, ctypes.c_double(drop_tol),
            indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            _dptr(data))
        return sparse.csc_matrix(
            (data[:nnz], indices[:nnz], indptr), shape=(p + 1, nlam))
    return sparse.csc_matrix(dense.T)


def standardize_host(X: np.ndarray, y: np.ndarray, flag: int):
    """In-place host standardization (native; NumPy fallback).

    Column-major X required for the native path; returns
    (mean_x, scale_x, mean_y, scale_y).
    """
    lib = get_lib()
    n, p = X.shape
    if lib is not None and X.flags.f_contiguous and X.dtype == np.float64:
        mean_x = np.empty(p, np.float64)
        scale_x = np.empty(p, np.float64)
        my = ctypes.c_double()
        sy = ctypes.c_double()
        lib.admm_standardize_cols(_dptr(X), n, p, flag, _dptr(mean_x),
                                  _dptr(scale_x))
        lib.admm_standardize_vec(_dptr(y), n, flag, ctypes.byref(my),
                                 ctypes.byref(sy))
        return mean_x, scale_x, my.value, sy.value
    # NumPy fallback, same semantics (two-pass centered variance +
    # relative zero-variance guard, matching the native and JAX paths)
    center = bool(flag & 2)
    scale = bool(flag & 1)
    mx = X.mean(0)
    sd = np.sqrt(np.mean((X - mx) ** 2, axis=0))
    floor_x = 8.0 * np.finfo(np.float64).eps * np.abs(mx)
    mean_x = mx if center else np.zeros(p)
    scale_x = np.where(sd > floor_x, sd, 1.0) if scale else np.ones(p)
    X -= mean_x
    X /= scale_x
    my = y.mean() if center else 0.0
    sdy_c = float(np.sqrt(np.mean((y - y.mean()) ** 2)))
    floor_y = 8.0 * np.finfo(np.float64).eps * abs(float(y.mean()))
    sdy = (sdy_c if sdy_c > floor_y else 1.0) if flag else 1.0
    y -= my
    y /= sdy
    return mean_x, scale_x, float(my), sdy
