"""Iterative (Chebyshev/CG) PMA solve vs the spectral DCT solve.

The spectral PMA solve inverts a DCT-II-diagonal operator; the iterative
path solves the *consistent* shifted Neumann-Laplacian stencil system
(I - gamma lap) x = rhs.  Gates:

1. operator consistency — the DCT-II transform with eigenvalues
   (2 cos(pi k/N) - 2)/(dx dy) really is the inverse of the stencil
   operator (applies A to the spectral solution, recovers rhs);
2. Chebyshev and CG both reproduce that solution to tight tolerance;
3. against the *reference-quirk* spectral solve (pma_leig's pi k/(N-1)
   frequencies, droplet.py:830-833), the solutions agree loosely —
   the O(1/N) eigenvalue inconsistency of the reference bounds the gap.
"""
import numpy as np
import jax.numpy as jnp

from iterative_solvers_tpu.core.grid import Grid2D
from iterative_solvers_tpu.meshmove.pma import (
    PMAParams, neumann_laplacian, shifted_neumann_eig_bounds,
    solve_shifted_neumann, solve_pma,
)
from iterative_solvers_tpu.ops.dct import dct2, idct2

RNG = np.random.default_rng(11)


def _consistent_spectral_solve(rhs, grid, gamma):
    ey = (2.0 * np.cos(np.pi * np.arange(grid.ny) / grid.ny) - 2.0)
    ex = (2.0 * np.cos(np.pi * np.arange(grid.nx) / grid.nx) - 2.0)
    leig = (ey[:, None] + ex[None, :]) / (grid.dx * grid.dy)
    return idct2(dct2(rhs) / (1.0 - gamma * jnp.asarray(leig, rhs.dtype)))


def test_spectral_inverse_matches_stencil_operator():
    grid = Grid2D(nx=17, ny=24, xl=-3.0, xr=6.0, yb=-3.0, yt=3.0)
    gamma = 0.1
    rhs = jnp.array(RNG.standard_normal(grid.shape))
    x = _consistent_spectral_solve(rhs, grid, gamma)
    back = x - gamma * neumann_laplacian(x, grid)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rhs),
                               rtol=1e-10, atol=1e-10)


def test_chebyshev_and_cg_match_spectral():
    grid = Grid2D(nx=31, ny=22, xl=-1.0, xr=1.0, yb=-1.0, yt=1.0)
    params = PMAParams(gamma=0.1)
    rhs = jnp.array(RNG.standard_normal(grid.shape))
    want = np.asarray(_consistent_spectral_solve(rhs, grid, params.gamma))
    scale = np.abs(want).max()
    for method in ("chebyshev", "cg"):
        got = np.asarray(solve_shifted_neumann(rhs, grid, params,
                                               method=method, tol=1e-10))
        assert np.abs(got - want).max() / scale < 1e-8, method


def test_eig_bounds_are_bounds():
    grid = Grid2D(nx=13, ny=9)
    gamma = 0.25
    lo, hi = shifted_neumann_eig_bounds(grid, gamma)
    # assemble the operator densely and check its spectrum
    n = grid.n
    eye = np.eye(n)
    cols = [np.asarray(
        (jnp.asarray(eye[:, j].reshape(grid.shape))
         - gamma * neumann_laplacian(jnp.asarray(eye[:, j].reshape(grid.shape)),
                                     grid)).reshape(-1))
        for j in range(n)]
    A = np.stack(cols, axis=1)
    w = np.linalg.eigvalsh(0.5 * (A + A.T))
    assert w.min() >= lo - 1e-10
    assert w.max() <= hi + 1e-10


def test_iterative_vs_reference_quirk_spectral():
    """Same dQ/dt to (loose) tolerance vs the reference-eigenvalue solve —
    the gap is the reference's own pi k/(N-1) vs pi k/N inconsistency."""
    grid = Grid2D(nx=91, ny=61, xl=-3.0, xr=6.0, yb=-3.0, yt=3.0)
    params = PMAParams(alpha=0.01, gamma=0.1)
    # a smooth positive monitor-like field
    xx, yy = np.meshgrid(np.linspace(0, 1, grid.nx), np.linspace(0, 1, grid.ny))
    mon = jnp.asarray(1.0 + np.exp(-30 * ((xx - 0.4) ** 2 + (yy - 0.5) ** 2)))
    jac = jnp.ones(grid.shape)
    want = np.asarray(solve_pma(mon, jac, grid, params))
    rhs = jnp.sqrt(mon * jnp.abs(jac)) / params.alpha
    got = np.asarray(solve_shifted_neumann(rhs, grid, params, tol=1e-10))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.05, rel
