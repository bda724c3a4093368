"""ctypes bindings to the native (C++) resampling oracle.

The JAX resamplers are the production path; the native library provides an
independent sequential implementation used as a test oracle and as the honest
single-core CPU baseline for benchmarking (see ``cpp/resampling.cpp``).

The shared library is built on demand with ``g++`` (no pip/pybind needed).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ["available", "load", "systematic", "stratified", "multinomial", "residual", "lgssm_sweep"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "cpp", "resampling.cpp")
_SO = os.path.join(_REPO_ROOT, "cpp", "libaps_native.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        return None
    lib = ctypes.CDLL(_SO)
    i64, i32p, f32, f32p = (
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    )
    lib.aps_systematic.argtypes = [f32, f32p, i64, i64, i32p]
    lib.aps_stratified.argtypes = [f32p, f32p, i64, i64, i32p]
    lib.aps_multinomial.argtypes = [f32p, f32p, i64, i64, i32p]
    lib.aps_residual.argtypes = [f32p, f32p, i64, i64, i32p]
    lib.aps_lgssm_sweep.argtypes = [
        f32p, f32p, f32p, f32p, i64, i64, f32, f32, f32, f32, f32,
    ]
    lib.aps_lgssm_sweep.restype = ctypes.c_double
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def systematic(u: float, w: np.ndarray, n: int) -> np.ndarray:
    lib = load()
    w = np.ascontiguousarray(w, dtype=np.float32)
    out = np.empty(n, dtype=np.int32)
    lib.aps_systematic(float(u), _fp(w), len(w), n, _ip(out))
    return out


def stratified(us: np.ndarray, w: np.ndarray, n: int) -> np.ndarray:
    lib = load()
    us = np.ascontiguousarray(us, dtype=np.float32)
    w = np.ascontiguousarray(w, dtype=np.float32)
    out = np.empty(n, dtype=np.int32)
    lib.aps_stratified(_fp(us), _fp(w), len(w), n, _ip(out))
    return out


def multinomial(us: np.ndarray, w: np.ndarray, n: int) -> np.ndarray:
    lib = load()
    us = np.ascontiguousarray(us, dtype=np.float32)
    w = np.ascontiguousarray(w, dtype=np.float32)
    out = np.empty(n, dtype=np.int32)
    lib.aps_multinomial(_fp(us), _fp(w), len(w), n, _ip(out))
    return out


def residual(us: np.ndarray, w: np.ndarray, n: int) -> np.ndarray:
    lib = load()
    us = np.ascontiguousarray(us, dtype=np.float32)
    w = np.ascontiguousarray(w, dtype=np.float32)
    out = np.empty(n, dtype=np.int32)
    lib.aps_residual(_fp(us), _fp(w), len(w), n, _ip(out))
    return out


def lgssm_sweep(
    obs: np.ndarray,
    init_noise: np.ndarray,
    step_noise: np.ndarray,
    res_uniforms: np.ndarray,
    n: int,
    a: float,
    q: float,
    r: float,
    sigma0: float,
    ess_threshold: float = 0.5,
) -> float:
    """Sequential native bootstrap sweep; returns log-evidence."""
    lib = load()
    T = len(obs)
    obs = np.ascontiguousarray(obs, dtype=np.float32)
    init_noise = np.ascontiguousarray(init_noise, dtype=np.float32)
    step_noise = np.ascontiguousarray(step_noise, dtype=np.float32)
    res_uniforms = np.ascontiguousarray(res_uniforms, dtype=np.float32)
    return float(
        lib.aps_lgssm_sweep(
            _fp(obs),
            _fp(init_noise),
            _fp(step_noise),
            _fp(res_uniforms),
            n,
            T,
            a,
            q,
            r,
            sigma0,
            ess_threshold,
        )
    )
