"""1-D heat-equation steppers (the reference's lab12 pair, SURVEY.md §2.12-13).

- :func:`ftcs_evolve` — explicit forward-time centred-space with the p >= 1/2
  stability bound exposed (lab12_p1.py:27-72), left-end insulated variant
  included.
- :func:`cn_evolve` — implicit Crank–Nicolson via the tridiagonal Thomas
  solver (lab12_p2.py:22-57), factored once and reused every step.

Both run the whole time loop under one jit via ``lax.scan``.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..solvers.tridiag import trilu, trisolve


def stability_parameter(a: float, k: float, n: int) -> float:
    """p = a k n^2 (explicit scheme stable iff p < 1/2)."""
    return a * k * n * n


def ftcs_step(u, p: float, insulated_left: bool = False):
    """One FTCS step on n+1 nodes with Dirichlet ends (u[0]=u[-1]=0) or an
    insulated (zero-flux) left end."""
    interior = p * u[2:] + (1 - 2 * p) * u[1:-1] + p * u[:-2]
    left = (2 * p * u[1] + (1 - 2 * p) * u[0]) if insulated_left else jnp.zeros((), u.dtype)
    return jnp.concatenate([left[None], interior, jnp.zeros((1,), u.dtype)])


def ftcs_evolve(u0, nsteps: int, a: float, k: float,
                insulated_left: bool = False):
    n = u0.shape[0] - 1
    p = stability_parameter(a, k, n)

    def body(u, _):
        u = ftcs_step(u, p, insulated_left)
        return u, None

    u, _ = lax.scan(body, u0, None, length=nsteps)
    return u


def cn_evolve(u0, nsteps: int, a: float, k: float):
    """Crank–Nicolson with homogeneous Dirichlet ends; interior solve by the
    tridiagonal LU factored once (lab12_p2.py:36-47)."""
    n = u0.shape[0] - 1
    p = a * k * n * n
    m = n - 1  # interior unknowns
    alpha = jnp.full(m - 1, -p, u0.dtype)
    beta = jnp.full(m, 2 * (p + 1), u0.dtype)
    lu = trilu(alpha, beta, alpha)

    def body(u, _):
        b = p * u[2:] + 2 * (1 - p) * u[1:-1] + p * u[:-2]
        interior = trisolve(lu, b)
        u = jnp.concatenate([jnp.zeros((1,), u.dtype), interior,
                             jnp.zeros((1,), u.dtype)])
        return u, None

    u, _ = lax.scan(body, u0, None, length=nsteps)
    return u


def exact_dirichlet(x, t, a: float = 1.0):
    """u = exp(-a pi^2 t) sin(pi x) (lab12_p2.py:20 oracle)."""
    return jnp.exp(-a * jnp.pi ** 2 * t) * jnp.sin(jnp.pi * x)


def exact_insulated(x, t, a: float = 1.0):
    """u = exp(-a pi^2 t/4) cos(pi x/2) (lab12_p1.py:84 oracle)."""
    return jnp.exp(-a * jnp.pi ** 2 * t / 4) * jnp.cos(jnp.pi * x / 2)
