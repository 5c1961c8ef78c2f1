"""Preconditioner tests: correctness + iteration-count reduction."""
import numpy as np
import pytest
import jax.numpy as jnp
import scipy.sparse as sp

from iterative_solvers_tpu.solvers.gmres import gmres
from iterative_solvers_tpu.solvers.preconditioners import (
    jacobi, block_jacobi_dense, ILU0, spectral_helmholtz,
)
from iterative_solvers_tpu.ops.sparse import laplacian_5pt_dirichlet

RNG = np.random.default_rng(23)


@pytest.fixture(scope="module")
def poisson_system():
    n = 24            # intervals -> 23^2 unknowns
    h = 1.0 / n
    a = (sp.identity((n - 1) ** 2) * 5.0 - laplacian_5pt_dirichlet(n, h)).tocsr()
    b = RNG.standard_normal((n - 1) ** 2)
    return a, b, n, h


def _iters(a, b, M=None):
    dense = jnp.array(a.toarray())
    res = gmres(lambda v: dense @ v, jnp.array(b), tol=1e-10, restart=30,
                maxiter=600, M=M)
    assert res.converged
    np.testing.assert_allclose(a @ np.asarray(res.x), b, atol=1e-7)
    return int(res.iters)


def test_jacobi_reduces_iters(poisson_system):
    a, b, n, h = poisson_system
    base = _iters(a, b)
    jac = _iters(a, b, M=jacobi(jnp.array(a.diagonal())))
    assert jac <= base


def test_block_jacobi(poisson_system):
    a, b, n, h = poisson_system
    base = _iters(a, b)
    blk = _iters(a, b, M=block_jacobi_dense(a, block=n - 1))
    assert blk < base  # line-blocks must beat unpreconditioned


def test_ilu0(poisson_system):
    a, b, n, h = poisson_system
    base = _iters(a, b)
    ilu = ILU0(a, sweeps=8)
    it = _iters(a, b, M=ilu)
    assert it < base


def test_ilu0_exact_on_triangular():
    """ILU(0) of a triangular matrix is exact -> one-shot preconditioner."""
    n = 30
    a = sp.csr_matrix(np.tril(RNG.standard_normal((n, n))) + 5 * np.eye(n))
    ilu = ILU0(a, sweeps=40)
    v = RNG.standard_normal(n)
    z = np.asarray(ilu(jnp.array(v)))
    np.testing.assert_allclose(a @ z, v, atol=1e-8)


def test_spectral_preconditioner_one_shot(poisson_system):
    """DST inverse of the exact operator: GMRES converges in O(1) iters."""
    a, b, n, h = poisson_system
    m = n - 1
    M = spectral_helmholtz(5.0, h, h)
    dense = jnp.array(a.toarray())
    res = gmres(
        lambda v: (dense @ v.reshape(-1)).reshape(m, m),
        jnp.array(b.reshape(m, m)),
        tol=1e-10, restart=10, M=M,
    )
    assert res.converged
    assert int(res.iters) <= 3
