"""Sparse containers, tridiagonal LU, CG, fast Poisson solvers."""
import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sp

from iterative_solvers_tpu.ops.sparse import (
    DIA, CSR, COO, BSR, laplacian_5pt_periodic, sh_operator,
    laplacian_5pt_dirichlet,
)
from iterative_solvers_tpu.solvers.tridiag import trilu, trisolve, tridiag_solve
from iterative_solvers_tpu.solvers.cg import cg
from iterative_solvers_tpu.solvers.fast_poisson import (
    poisson_dirichlet_solve, helmholtz_dirichlet_solve,
)

RNG = np.random.default_rng(5)


@pytest.fixture(scope="module")
def rand_sparse():
    m = sp.random(120, 120, density=0.15, random_state=np.random.RandomState(8),
                  format="csr")
    m = m + sp.identity(120)
    x = RNG.standard_normal(120)
    return m, x, m @ x


@pytest.mark.parametrize("fmt", ["dia", "csr", "coo", "bsr"])
def test_spmv_formats(fmt, rand_sparse):
    m, x, want = rand_sparse
    xj = jnp.array(x)
    if fmt == "dia":
        a = DIA.from_scipy(m)
    elif fmt == "csr":
        a = CSR.from_scipy(m)
    elif fmt == "coo":
        a = COO.from_scipy(m)
    else:
        a = BSR.from_scipy(m, blocksize=8)
    got = np.asarray(a.matvec(xj)).reshape(-1)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_coo_to_csr(rand_sparse):
    m, x, want = rand_sparse
    a = COO.from_scipy(m).to_csr()
    np.testing.assert_allclose(np.asarray(a.matvec(jnp.array(x))), want,
                               atol=1e-12)


def test_assembled_operators_match_reference_assembly():
    from tests.reference_oracles import periodic_laplacian, sh_L

    n, h, r = 12, 0.7, 0.01
    got = laplacian_5pt_periodic(n, h).toarray()
    want = periodic_laplacian(n, h).toarray()
    np.testing.assert_allclose(got, want, atol=1e-13)
    np.testing.assert_allclose(sh_operator(n, h, r).toarray(),
                               sh_L(n, h, r).toarray(), atol=1e-11)


def test_dia_spmv_stencil_parity():
    """DIA SpMV of the assembled SH operator == matrix-free stencil."""
    from iterative_solvers_tpu.ops.stencils import sh_linear_operator

    n, d, r = 16, 40.0, 0.01
    h = d / n
    a = DIA.from_scipy(sh_operator(n, h, r))
    u = RNG.standard_normal((n, n))
    got = np.asarray(a.matvec(jnp.array(u.reshape(-1)))).reshape(n, n)
    want = np.asarray(sh_linear_operator(jnp.array(u), h, r))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_tridiag():
    n = 50
    alpha = RNG.standard_normal(n - 1) * 0.3
    gamma = RNG.standard_normal(n - 1) * 0.3
    beta = 2.0 + RNG.random(n)
    b = RNG.standard_normal(n)
    a_dense = np.diag(beta) + np.diag(alpha, -1) + np.diag(gamma, 1)
    want = np.linalg.solve(a_dense, b)
    got = np.asarray(tridiag_solve(jnp.array(alpha), jnp.array(beta),
                                   jnp.array(gamma), jnp.array(b)))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_tridiag_lu_reuse():
    n = 30
    alpha = jnp.full(n - 1, -1.0)
    beta = jnp.full(n, 4.0)
    lu = trilu(alpha, beta, alpha)
    for seed in range(3):
        b = RNG.standard_normal(n)
        got = np.asarray(trisolve(lu, jnp.array(b)))
        a_dense = np.diag(np.full(n, 4.0)) + np.diag(np.full(n - 1, -1.0), 1) \
            + np.diag(np.full(n - 1, -1.0), -1)
        np.testing.assert_allclose(got, np.linalg.solve(a_dense, b), atol=1e-12)


def test_cg_poisson():
    from iterative_solvers_tpu.ops.stencils import lap_dirichlet_5pt

    n, h = 31, 1 / 32
    b = jnp.array(RNG.standard_normal((n, n)))
    res = cg(lambda u: -lap_dirichlet_5pt(u, h), b, tol=1e-12)
    assert res.converged
    np.testing.assert_allclose(
        np.asarray(-lap_dirichlet_5pt(res.x, h)), np.asarray(b), atol=1e-9
    )


def test_fast_poisson_vs_sparse_direct():
    from scipy.sparse.linalg import spsolve

    n = 32  # intervals
    h = 1.0 / n
    m = n - 1
    a = laplacian_5pt_dirichlet(n, h)
    f = RNG.standard_normal(m * m)
    want = spsolve(a.tocsc(), f)
    got = np.asarray(poisson_dirichlet_solve(jnp.array(f.reshape(m, m)), h))
    np.testing.assert_allclose(got.reshape(-1), want, atol=1e-10)


def test_fast_helmholtz():
    from scipy.sparse.linalg import spsolve
    from scipy.sparse import identity

    n, h, shift = 24, 1 / 24, 7.5
    m = n - 1
    a = shift * identity(m * m) - laplacian_5pt_dirichlet(n, h)
    f = RNG.standard_normal(m * m)
    want = spsolve(a.tocsc(), f)
    got = np.asarray(helmholtz_dirichlet_solve(jnp.array(f.reshape(m, m)),
                                               shift, h))
    np.testing.assert_allclose(got.reshape(-1), want, atol=1e-10)


# -- SpMM + structured-grid DIA (round-2 additions) ---------------------------

def test_spmm_formats(rand_sparse):
    m, x, _ = rand_sparse
    X = RNG.standard_normal((120, 7))
    want = m @ X
    Xj = jnp.array(X)
    for a in (DIA.from_scipy(m), CSR.from_scipy(m),
              BSR.from_scipy(m, blocksize=8)):
        np.testing.assert_allclose(np.asarray(a.matmat(Xj)), want, atol=1e-12)


def test_grid_dia_periodic_sh_operator():
    """GridDIA must reproduce the periodic SH operator exactly — including
    the wrap diagonals that split into two 2-D shift terms."""
    from iterative_solvers_tpu.ops.sparse import GridDIA

    n, h, r = 12, 0.7, 0.01
    m = sh_operator(n, h, r)
    a = GridDIA.from_scipy(m, (n, n))
    x = RNG.standard_normal(n * n)
    np.testing.assert_allclose(np.asarray(a.matvec(jnp.array(x))), m @ x,
                               rtol=1e-12, atol=1e-9)
    X = RNG.standard_normal((n * n, 5))
    np.testing.assert_allclose(np.asarray(a.matmat(jnp.array(X))), m @ X,
                               rtol=1e-12, atol=1e-9)
    assert a.nnz == m.nnz


def test_grid_dia_dirichlet_rect():
    """Non-square grid + Dirichlet operator (no wraps)."""
    from iterative_solvers_tpu.ops.sparse import GridDIA

    ny, nx = 9, 14
    ex = np.ones(nx - 0)
    lap1x = sp.diags([ex[:-1], -2 * ex, ex[:-1]], [-1, 0, 1],
                     shape=(nx, nx))
    ey = np.ones(ny)
    lap1y = sp.diags([ey[:-1], -2 * ey, ey[:-1]], [-1, 0, 1],
                     shape=(ny, ny))
    m = (sp.kron(sp.identity(ny), lap1x) + sp.kron(lap1y, sp.identity(nx))).tocsr()
    a = GridDIA.from_scipy(m, (ny, nx))
    x = RNG.standard_normal(ny * nx)
    np.testing.assert_allclose(np.asarray(a.matvec(jnp.array(x))), m @ x,
                               rtol=1e-12, atol=1e-12)


def test_grid_dia_cyclic_minimal_fields():
    """cyclic=True merges periodic wrap residues onto the interior shifts:
    the 13-point SH operator stores exactly 13 fields, parity exact, and
    the canonicalisation is exact for arbitrary (non-grid) sparsity too."""
    from iterative_solvers_tpu.ops.sparse import GridDIA

    n = 16
    m = sh_operator(n, 0.7, 0.01)
    a = GridDIA.from_scipy(m, (n, n), cyclic=True)
    assert len(a.shifts) == 13
    assert max(abs(dy) for dy, _ in a.shifts) == 2
    assert a.nnz == m.nnz
    x = RNG.standard_normal(n * n)
    np.testing.assert_allclose(np.asarray(a.matvec(jnp.array(x))), m @ x,
                               rtol=1e-12, atol=1e-9)
    X = RNG.standard_normal((n * n, 4))
    np.testing.assert_allclose(np.asarray(a.matmat(jnp.array(X))), m @ X,
                               rtol=1e-12, atol=1e-9)

    mr = sp.random(n * n, n * n, density=0.002, random_state=3, format="csr")
    ar = GridDIA.from_scipy(mr, (n, n), cyclic=True)
    xr = RNG.standard_normal(n * n)
    np.testing.assert_allclose(np.asarray(ar.matvec(jnp.array(xr))), mr @ xr,
                               rtol=1e-12, atol=1e-12)


def test_pallas_spmv_cyclic_fallback_matches_scipy():
    """The Pallas wrapper on a cyclic container (off-TPU: the XLA wrap-pad
    fallback) must reproduce the periodic operator exactly."""
    from iterative_solvers_tpu.ops.sparse import GridDIA
    from iterative_solvers_tpu.ops.pallas_spmv import grid_dia_matvec_pallas

    n = 24
    m = sh_operator(n, 0.7, 0.01)
    a = GridDIA.from_scipy(m, (n, n), cyclic=True)
    x = RNG.standard_normal(n * n)
    got = np.asarray(grid_dia_matvec_pallas(a, jnp.array(x.reshape(n, n))))
    np.testing.assert_allclose(got.reshape(-1), m @ x, rtol=1e-12, atol=1e-9)


def test_pallas_spmv_fallbacks_match_scipy():
    """Off-TPU the Pallas SpMV wrappers take the XLA fallback — gate both
    against scipy (the TPU kernels are parity-gated in benchmarks/run_all.py
    against these same XLA paths)."""
    from iterative_solvers_tpu.ops.sparse import GridDIA
    from iterative_solvers_tpu.ops.pallas_spmv import (
        grid_dia_matvec_pallas, dia_flat_matvec_pallas,
    )

    n = 24
    m = sh_operator(n, 0.7, 0.01)
    x = RNG.standard_normal(n * n)
    a = GridDIA.from_scipy(m, (n, n))
    got = np.asarray(grid_dia_matvec_pallas(a, jnp.array(x.reshape(n, n))))
    np.testing.assert_allclose(got.reshape(-1), m @ x, rtol=1e-12, atol=1e-9)

    md = laplacian_5pt_dirichlet(n + 1, 2.0)
    d = DIA.from_scipy(md)
    got = np.asarray(dia_flat_matvec_pallas(d, (n, n), jnp.array(x)))
    np.testing.assert_allclose(got, md @ x, rtol=1e-12, atol=1e-12)


def test_pallas_spmm_fallback_matches_scipy():
    """Off-TPU the SpMM wrapper falls back to per-rhs XLA application; gate
    the (nrhs, ny, nx) stacking against scipy on both container kinds."""
    from iterative_solvers_tpu.ops.sparse import GridDIA
    from iterative_solvers_tpu.ops.pallas_spmv import grid_dia_matmat_pallas

    n = 24
    m = sh_operator(n, 0.7, 0.01)
    X = RNG.standard_normal((3, n * n))
    from iterative_solvers_tpu.ops.pallas_spmv import (
        grid_dia_matmat_interleaved_pallas,
    )

    for cyclic in (True, False):
        a = GridDIA.from_scipy(m, (n, n), cyclic=cyclic)
        got = np.asarray(grid_dia_matmat_pallas(
            a, jnp.array(X.reshape(3, n, n))))
        want = (m @ X.T).T.reshape(3, n, n)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)
        # row-interleaved layout (ny, nrhs, nx): same product, transposed
        xi = jnp.array(np.moveaxis(X.reshape(3, n, n), 0, 1))
        goti = np.asarray(grid_dia_matmat_interleaved_pallas(a, xi))
        np.testing.assert_allclose(np.moveaxis(goti, 1, 0), want,
                                   rtol=1e-12, atol=1e-9)
