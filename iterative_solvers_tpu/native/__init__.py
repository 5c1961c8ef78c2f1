"""ctypes bindings for the native Newton–Krylov library (libnksolve).

Build on demand with CMake + ninja/make (``ensure_built()``); the library is
cached under ``native/build/``.  API mirrors SURVEY.md §2.11's reconstructed
signatures: ``nonlin_solve`` (JFNK with a Python residual callback),
``lgmres_csr``, ``spmv_csr``, and the Swift–Hohenberg driver ``sh_evolve``.
"""
from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_BUILD = _DIR / "build"
_LIB: ctypes.CDLL | None = None

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

_RESIDUAL_CB = ctypes.CFUNCTYPE(
    None, ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ctypes.c_int64, ctypes.c_void_p,
)


def ensure_built(force: bool = False) -> pathlib.Path:
    lib = _BUILD / "libnksolve.so"
    if lib.exists() and not force:
        return lib
    _BUILD.mkdir(exist_ok=True)
    gen = []
    try:
        subprocess.run(["ninja", "--version"], capture_output=True, check=True)
        gen = ["-G", "Ninja"]
    except (OSError, subprocess.CalledProcessError):
        pass
    subprocess.run(
        ["cmake", *gen, "-DCMAKE_BUILD_TYPE=Release", ".."],
        cwd=_BUILD, check=True, capture_output=True,
    )
    subprocess.run(
        ["cmake", "--build", ".", "-j"], cwd=_BUILD, check=True,
        capture_output=True,
    )
    return lib


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        _LIB = ctypes.CDLL(str(ensure_built()))
        _LIB.nk_nonlin_solve.restype = ctypes.c_int
        _LIB.nk_nonlin_solve.argtypes = [
            _RESIDUAL_CB, ctypes.c_void_p, _f64p, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, _f64p, _f64p,
        ]
        _LIB.nk_lgmres_csr.restype = ctypes.c_int
        _LIB.nk_lgmres_csr.argtypes = [
            ctypes.c_int64, _i64p, _i64p, _f64p, _f64p, _f64p,
            ctypes.c_double, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            _f64p, _f64p,
        ]
        _LIB.nk_spmv_csr.restype = None
        _LIB.nk_spmv_csr.argtypes = [ctypes.c_int64, _i64p, _i64p, _f64p,
                                     _f64p, _f64p]
        _LIB.nk_sh_evolve.restype = ctypes.c_int
        _LIB.nk_sh_evolve.argtypes = [
            ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, _f64p, ctypes.c_int, ctypes.c_double, _f64p,
        ]
        _LIB.nk_sh_operator_nnz.restype = ctypes.c_int64
        _LIB.nk_sh_operator_nnz.argtypes = [ctypes.c_int, ctypes.c_double,
                                            ctypes.c_double]
    return _LIB


def nonlin_solve(residual, x0, *, f_tol=6.05545445239334e-06,
                 f_rtol=np.inf, x_tol=np.inf, x_rtol=np.inf, maxiter=100,
                 inner_m=30, outer_k=10):
    """JFNK on a Python residual ``F(x) -> F`` (numpy in/out).

    Returns (x, info dict).
    """
    lib = _lib()
    x0 = np.ascontiguousarray(x0, dtype=np.float64).reshape(-1)
    n = x0.size
    out = np.empty(n)
    stats = np.zeros(3)

    @_RESIDUAL_CB
    def cb(xp, fp, nn, user):
        x = np.ctypeslib.as_array(xp, shape=(nn,))
        f = np.asarray(residual(x.copy()), dtype=np.float64).reshape(-1)
        ctypes.memmove(fp, f.ctypes.data, 8 * nn)

    ok = lib.nk_nonlin_solve(cb, None, x0, n, f_tol, f_rtol, x_tol, x_rtol,
                             maxiter, inner_m, outer_k, out, stats)
    return out, {"converged": bool(ok), "iterations": int(stats[0]),
                 "func_evals": int(stats[1]), "f_norm": float(stats[2])}


def lgmres_csr(a_csr, b, x0=None, *, tol=1e-8, maxiter=1000, inner_m=30,
               outer_k=3):
    """LGMRES solve of a scipy CSR system in the native library."""
    lib = _lib()
    a = a_csr.tocsr()
    n = a.shape[0]
    indptr = np.ascontiguousarray(a.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(a.indices, dtype=np.int64)
    data = np.ascontiguousarray(a.data, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    x0 = np.zeros(n) if x0 is None else np.ascontiguousarray(x0, np.float64)
    out = np.empty(n)
    stats = np.zeros(3)
    ok = lib.nk_lgmres_csr(n, indptr, indices, data, b, x0, tol, maxiter,
                           inner_m, outer_k, out, stats)
    return out, {"converged": bool(ok), "outer_cycles": int(stats[0]),
                 "matvecs": int(stats[1]), "residual": float(stats[2])}


def spmv_csr(a_csr, x):
    lib = _lib()
    a = a_csr.tocsr()
    y = np.empty(a.shape[0])
    lib.nk_spmv_csr(
        a.shape[0],
        np.ascontiguousarray(a.indptr, np.int64),
        np.ascontiguousarray(a.indices, np.int64),
        np.ascontiguousarray(a.data, np.float64),
        np.ascontiguousarray(x, np.float64), y,
    )
    return y


def sh_evolve(u0, nsteps, *, n=64, d=40.0, k=0.2, r=0.01, g=1.0,
              f_tol=6.05545445239334e-06):
    """Native Swift–Hohenberg CN/NK evolution (reference main.cpp workload)."""
    lib = _lib()
    u0 = np.ascontiguousarray(u0, dtype=np.float64).reshape(-1)
    out = np.empty_like(u0)
    ok = lib.nk_sh_evolve(n, d, k, r, g, u0, nsteps, f_tol, out)
    return out, int(ok)


def sh_operator_nnz(n, d, r):
    return int(_lib().nk_sh_operator_nnz(n, d, r))
