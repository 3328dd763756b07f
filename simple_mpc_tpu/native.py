"""ctypes loader for the native host runtime (native/qp_admm.cpp).

Builds the shared library on first use (make in native/) and exposes
`solve_qp_host`, the deployment-path counterpart of id/qp.solve_qp — same
ADMM scheme, same semantics, plain C++ for the robot-side 1 kHz loop
(ProxQP role in the reference, kinodynamics-id.hpp:84).  Falls back to None
if no toolchain is available; callers must handle that.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsimple_mpc_native.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    dp = ctypes.POINTER(ctypes.c_double)
    lib.qp_solve.restype = ctypes.c_int
    lib.qp_solve.argtypes = [ctypes.c_int, ctypes.c_int, dp, dp, dp, dp, dp,
                             ctypes.c_int, ctypes.c_double, ctypes.c_double,
                             ctypes.c_double, dp, dp, dp]
    lib.qp_residuals.restype = None
    lib.qp_residuals.argtypes = [ctypes.c_int, ctypes.c_int, dp, dp, dp, dp,
                                 dp, dp, dp, dp, dp]
    lib.smt_executor_run.restype = ctypes.c_int
    lib.smt_executor_run.argtypes = (
        [ctypes.c_int] * 4 + [dp] * 5  # n m nv nu, H A gs ls us
        + [dp, dp, dp, ctypes.c_int]   # M h JcT nf
        + [dp, dp, dp]                 # fric_dry fric_visc vjs
        + [ctypes.c_int] * 2           # n_sub iters
        + [ctypes.c_double] * 3        # rho sigma alpha
        + [dp] * 4)                    # z y taus work
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def solve_qp_host(H, g, A, l, u, iters: int = 100, rho: float = 0.1,
                  sigma: float = 1e-6, alpha: float = 1.6,
                  z0=None, y0=None) -> Tuple[np.ndarray, np.ndarray, float, float]:
    """Native ADMM solve; returns (z, y, prim_res, dual_res)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (no C++ toolchain?)")
    H = np.ascontiguousarray(H, dtype=np.float64)
    g = np.ascontiguousarray(g, dtype=np.float64)
    A = np.ascontiguousarray(A, dtype=np.float64)
    l = np.ascontiguousarray(l, dtype=np.float64)
    u = np.ascontiguousarray(u, dtype=np.float64)
    m, n = A.shape
    z = (np.zeros(n) if z0 is None else np.array(z0, dtype=np.float64))
    y = (np.zeros(m) if y0 is None else np.array(y0, dtype=np.float64))
    work = np.empty(n * n + 3 * m + 2 * n, dtype=np.float64)
    dp = ctypes.POINTER(ctypes.c_double)

    def p(a):
        return a.ctypes.data_as(dp)

    rc = lib.qp_solve(n, m, p(H), p(g), p(A), p(l), p(u), iters, rho, sigma,
                      alpha, p(z), p(y), p(work))
    if rc != 0:
        raise RuntimeError("native QP factorization failed")
    prim = ctypes.c_double()
    dual = ctypes.c_double()
    lib.qp_residuals(n, m, p(H), p(g), p(A), p(l), p(u), p(z), p(y),
                     ctypes.byref(prim), ctypes.byref(dual))
    return z, y, prim.value, dual.value


def executor_run(H, A, gs, ls, us, M, h, JcT, nv: int, nu: int,
                 fric_dry=None, fric_visc=None, vjs=None,
                 iters: int = 100, rho: float = 0.1, sigma: float = 1e-6,
                 alpha: float = 1.6, z0=None, y0=None):
    """Native 1 kHz substep executor (native/executor.cpp): n_sub
    warm-started ADMM solves against a tick-frozen QP structure with one
    shared factorization, torque recovery and friction compensation.
    Returns (taus (n_sub, nu), z, y)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (no C++ toolchain?)")
    H = np.ascontiguousarray(H, dtype=np.float64)
    A = np.ascontiguousarray(A, dtype=np.float64)
    gs = np.ascontiguousarray(gs, dtype=np.float64)
    ls = np.ascontiguousarray(ls, dtype=np.float64)
    us = np.ascontiguousarray(us, dtype=np.float64)
    M = np.ascontiguousarray(M, dtype=np.float64)
    h = np.ascontiguousarray(h, dtype=np.float64)
    JcT = np.ascontiguousarray(JcT, dtype=np.float64)
    m, n = A.shape
    n_sub = gs.shape[0]
    nf = JcT.shape[1]
    assert gs.shape == (n_sub, n) and ls.shape == (n_sub, m) \
        and us.shape == (n_sub, m)
    # The C torque recovery indexes z[nv + j] for j < nf and M rows up to
    # nv — inconsistent shapes would be a silent out-of-bounds read in
    # native code, so validate them here where a Python error is possible.
    assert n == nv + nf, f"n={n} != nv+nf={nv + nf}"
    assert M.shape == (nv, nv), M.shape
    assert h.shape == (nv,), h.shape
    assert JcT.shape == (nv, nf), JcT.shape
    # The executor classifies each constraint row as equality (l==u) or
    # inequality from the FIRST substep only (tick-frozen structure,
    # native/executor.cpp).  A row that changes class in a later substep
    # would silently diverge from the per-substep qp_solve path — reject it.
    eq_pattern = np.abs(us - ls) < 1e-12
    if not (eq_pattern == eq_pattern[0]).all():
        raise ValueError(
            "equality-row pattern (l == u) must be identical across all "
            "n_sub substeps: the executor freezes the per-row rho "
            "classification at substep 0")
    z = (np.zeros(n) if z0 is None else np.array(z0, dtype=np.float64))
    y = (np.zeros(m) if y0 is None else np.array(y0, dtype=np.float64))
    taus = np.empty((n_sub, nu), dtype=np.float64)
    work = np.empty(n * n + 3 * m + 2 * n, dtype=np.float64)
    dp = ctypes.POINTER(ctypes.c_double)

    def p(a):
        return a.ctypes.data_as(dp) if a is not None else None

    fd = (np.ascontiguousarray(fric_dry, dtype=np.float64)
          if fric_dry is not None else None)
    fv = (np.ascontiguousarray(fric_visc, dtype=np.float64)
          if fric_visc is not None else None)
    vj = (np.ascontiguousarray(vjs, dtype=np.float64)
          if vjs is not None else None)
    rc = lib.smt_executor_run(
        n, m, nv, nu, p(H), p(A), p(gs), p(ls), p(us), p(M), p(h), p(JcT),
        nf, p(fd), p(fv), p(vj), n_sub, iters, rho, sigma, alpha,
        p(z), p(y), p(taus), p(work))
    if rc != 0:
        raise RuntimeError("native executor factorization failed")
    return taus, z, y
