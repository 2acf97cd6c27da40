"""Native (C++) runtime components, loaded via ctypes.

The shared library is built lazily with g++ on first use and cached next to
the sources. No pybind11 — plain C ABI + ctypes keeps the binding layer
dependency-free (per environment constraints).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "nelder_mead.cpp")
_LIB = os.path.join(_HERE, "_egx_native.so")
_lock = threading.Lock()
_lib = None

_OBJFN = ctypes.CFUNCTYPE(
    ctypes.c_double, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
    ctypes.c_void_p,
)


def _build() -> str:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(
        _SRC
    ):
        return _LIB
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def load():
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            lib.egx_nelder_mead.restype = ctypes.c_int
            lib.egx_nelder_mead.argtypes = [
                _OBJFN, ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int, ctypes.c_double, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double),
            ]
            _lib = lib
    return _lib


def nelder_mead(fun, x0, lower, upper, max_eval: int = 1000,
                xatol: float = 1e-8, fatol: float = 1e-10):
    """Minimize ``fun(x) -> float`` over the box [lower, upper] with the
    native derivative-free simplex solver. Returns (x, f, n_evals)."""
    import numpy as np

    lib = load()
    x = np.ascontiguousarray(np.asarray(x0, dtype=np.float64)).copy()
    lo = np.ascontiguousarray(np.asarray(lower, dtype=np.float64))
    hi = np.ascontiguousarray(np.asarray(upper, dtype=np.float64))
    n = x.shape[0]
    if lo.shape[0] != n or hi.shape[0] != n:
        raise ValueError("bound shapes must match x0")

    err_holder = []

    @_OBJFN
    def cb(px, nn, _user):
        try:
            xi = np.ctypeslib.as_array(px, shape=(nn,))
            return float(fun(xi.copy()))
        except Exception as e:  # noqa: BLE001 — must not unwind into C
            err_holder.append(e)
            return 1e300

    fmin = ctypes.c_double(0.0)
    n_evals = lib.egx_nelder_mead(
        cb, None, n,
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        lo.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        hi.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(max_eval), float(xatol), float(fatol), ctypes.byref(fmin),
    )
    if err_holder:
        raise err_holder[0]
    if n_evals < 0:
        raise RuntimeError("egx_nelder_mead: invalid input")
    return x, float(fmin.value), int(n_evals)


def minimize_dfo_constrained(fun, cstrs, x0, lower, upper,
                             max_eval: int = 1000, n_penalty_rounds: int = 4):
    """Derivative-free constrained minimization: adaptive quadratic penalty
    around the native simplex solver (the COBYLA usage pattern of the
    reference: fun + inequality constraints g_i(x) <= 0)."""
    import numpy as np

    x = np.asarray(x0, dtype=np.float64).copy()
    mu = 10.0
    budget = max(max_eval // max(n_penalty_rounds, 1), 10)
    f = np.inf
    for _ in range(max(n_penalty_rounds, 1)):
        def penalized(xx, _mu=mu):
            viol = np.array([max(0.0, float(c(xx))) for c in cstrs])
            return float(fun(xx)) + 0.5 * _mu * float(np.sum(viol**2))

        x, f, _ = nelder_mead(penalized, x, lower, upper, max_eval=budget)
        mu *= 10.0
        if not cstrs:
            break
    return x, f
