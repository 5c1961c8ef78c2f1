"""Native C++ library (libnksolve): parity vs scipy and the JAX stack."""
import shutil
import subprocess

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.optimize import newton_krylov as scipy_nk

from iterative_solvers_tpu import native
from iterative_solvers_tpu.ops.sparse import sh_operator

pytestmark = pytest.mark.skipif(
    shutil.which("cmake") is None, reason="cmake unavailable"
)

RNG = np.random.default_rng(17)


@pytest.fixture(scope="module", autouse=True)
def built():
    native.ensure_built()


def test_spmv_parity():
    m = sp.random(200, 200, density=0.1,
                  random_state=np.random.RandomState(2), format="csr")
    x = RNG.standard_normal(200)
    np.testing.assert_allclose(native.spmv_csr(m, x), m @ x, atol=1e-13)


def test_lgmres_solves_csr():
    n = 120
    a = sp.diags([np.full(n, 4.0), np.full(n - 1, -1.0), np.full(n - 1, -2.0)],
                 [0, 1, -1]).tocsr()
    b = RNG.standard_normal(n)
    x, info = native.lgmres_csr(a, b, tol=1e-10, inner_m=20, outer_k=4)
    assert info["converged"]
    np.testing.assert_allclose(a @ x, b, atol=1e-8)


def test_lgmres_iters_comparable_to_scipy():
    from scipy.sparse.linalg import lgmres as scipy_lgmres

    n = 150
    a = sp.diags([np.full(n, 4.0), np.full(n - 1, -1.0), np.full(n - 1, -2.0)],
                 [0, 1, -1]).tocsr()
    b = RNG.standard_normal(n)
    x_sp, info = scipy_lgmres(a, b, rtol=1e-10, atol=0.0, inner_m=15,
                              outer_k=3, maxiter=200)
    assert info == 0
    x, st = native.lgmres_csr(a, b, tol=1e-10, inner_m=15, outer_k=3,
                              maxiter=200)
    assert st["converged"]
    np.testing.assert_allclose(x, x_sp, atol=1e-6)


def test_nonlin_solve_callback_parity():
    """Native JFNK on a Python residual matches scipy newton_krylov."""

    def F(x):
        return np.tanh(x) + 0.4 * np.roll(x, 3) ** 2 - 0.2

    x_scipy = scipy_nk(F, np.zeros(40), f_tol=1e-10)
    x, info = native.nonlin_solve(F, np.zeros(40), f_tol=1e-10)
    assert info["converged"]
    np.testing.assert_allclose(x, x_scipy, atol=1e-6)
    np.testing.assert_allclose(F(x), 0, atol=1e-9)


def test_sh_operator_assembly_matches_python():
    n, d, r = 16, 40.0, 0.01
    want = sh_operator(n, d / n, r)
    assert native.sh_operator_nnz(n, d, r) == want.nnz


def test_sh_evolve_matches_scipy_trajectory():
    """Native SH CN/NK trajectory vs the scipy-driven oracle, 3 steps."""
    from tests.reference_oracles import sh_L

    n, d, k, r, g = 24, 40.0, 0.2, 0.01, 1.0
    h = d / n
    L = sh_L(n, h, r)
    u0 = RNG.standard_normal(n * n)

    u_sp = u0.copy()
    for _ in range(3):
        uo = u_sp.copy()
        uo2, uo3 = uo * uo, uo ** 3

        def residual(u):
            uu = u * u
            return (u - uo) / k - (
                L @ u + g * uu - u * uu + L @ uo + g * uo2 - uo3
            ) / 2

        u_sp = scipy_nk(residual, uo, f_tol=6e-6)

    u_native, converged = native.sh_evolve(u0, 3, n=n, d=d, k=k, r=r, g=g)
    assert converged == 3
    np.testing.assert_allclose(u_native, u_sp, atol=2e-5)


def test_sh_driver_executable(tmp_path):
    exe = native.ensure_built().parent / "sh_driver"
    out = tmp_path / "out.txt"
    res = subprocess.run(
        [str(exe), "32", "40", "0.2", "1.0", "0.01", "1.0", str(out)],
        capture_output=True, text=True, check=True,
    )
    assert "converged=5" in res.stdout
    data = np.loadtxt(out)
    assert data.shape == (32 * 32,)
    assert np.isfinite(data).all()
