"""Poisson duct-flow benchmark (lab14_p2.py, SURVEY.md §2.14, §3.5).

Solves ``lap u = -1`` on the unit square with homogeneous Dirichlet BCs and
evaluates the flow rate ``Q = ∬ u`` by the 2-D trapezium rule.  The reference
does a 999²-unknown ``spsolve`` in 51.6 s; here the same system is solved
either directly by DST diagonalisation (milliseconds on TPU) or iteratively
by matrix-free CG — both to far below discretisation error.

Oracle note (SURVEY.md §4.1): the reference's own series constant
(lab14_p2.py:52-54) is mis-normalised; the correct separated-variables value
is ``Q = 1/12 - (16/pi^5) sum_{m odd} tanh(m pi/2)/m^5 ≈ 0.0351444``, which
:func:`flow_rate_exact` provides.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.stencils import lap_dirichlet_5pt
from ..solvers.cg import cg
from ..solvers.fast_poisson import poisson_dirichlet_solve


def solve_direct(n: int, dtype=jnp.float64):
    """DST direct solve of lap u = -1 with n intervals per direction.
    Returns the full (n+1, n+1) field including boundary zeros."""
    h = 1.0 / n
    m = n - 1
    f = jnp.full((m, m), -1.0, dtype)
    u_int = poisson_dirichlet_solve(f, h)
    return jnp.pad(u_int, ((1, 1), (1, 1)))


def solve_cg(n: int, tol=1e-10, dtype=jnp.float64):
    """Matrix-free CG solve of the same system (stencil matvec)."""
    h = 1.0 / n
    m = n - 1
    b = jnp.full((m, m), -1.0, dtype)
    res = cg(lambda u: lap_dirichlet_5pt(u, h), b, tol=tol, maxiter=20 * n)
    return jnp.pad(res.x, ((1, 1), (1, 1))), res


def flow_rate(u, h: float):
    """2-D trapezium rule ∬ u (lab14_p2.py:48-49)."""
    corners = u[0, 0] + u[0, -1] + u[-1, 0] + u[-1, -1]
    edges = (
        jnp.sum(u[0, :]) + jnp.sum(u[-1, :]) + jnp.sum(u[:, 0]) + jnp.sum(u[:, -1])
    )
    return 0.25 * h * h * (4.0 * jnp.sum(u) - 2.0 * edges + corners)


def flow_rate_exact(terms: int = 2000) -> float:
    """Correct separation-of-variables series for the unit-square duct:
    Q = 1/12 - (16/pi^5) * sum_{m odd} tanh(m pi / 2) / m^5 ≈ 0.03514425."""
    m = np.arange(1, 2 * terms, 2, dtype=np.float64)
    return float(1.0 / 12.0 - (16.0 / np.pi ** 5) * np.sum(np.tanh(m * np.pi / 2) / m ** 5))
