"""Tridiagonal LU factorisation and solve.

Reference counterpart: ``trilu``/``trisolve`` (lab12_p2.py:59-101), used for
the implicit Crank–Nicolson heat equation.  The recurrences are inherently
sequential; here they are ``lax.scan``s (compiled once, O(n) on device) and
``solve`` is vmappable over batched right-hand sides — the TPU-appropriate
way to amortise many small tridiagonal solves (batch them, don't thread
them).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class TriLU(NamedTuple):
    l: jax.Array      # (n-1,) subdiagonal of L
    v: jax.Array      # (n,)   diagonal of U
    gamma: jax.Array  # (n-1,) superdiagonal (unchanged by the factorisation)


def trilu(alpha, beta, gamma) -> TriLU:
    """LU-factorise the tridiagonal matrix with sub/main/super diagonals
    ``alpha (n-1), beta (n), gamma (n-1)`` such that L U = A."""

    def step(v_prev, ab):
        a, b, g_prev = ab
        l = a / v_prev
        v = b - l * g_prev
        return v, (l, v)

    v0 = beta[0]
    _, (l, v_rest) = lax.scan(step, v0, (alpha, beta[1:], gamma))
    v = jnp.concatenate([v0[None], v_rest])
    return TriLU(l=l, v=v, gamma=gamma)


def trisolve(lu: TriLU, b):
    """Solve A x = b given the factorisation (forward then backward sweep)."""

    def fwd(y_prev, lb):
        l, bi = lb
        y = bi - l * y_prev
        return y, y

    y0 = b[0]
    _, y_rest = lax.scan(fwd, y0, (lu.l, b[1:]))
    y = jnp.concatenate([y0[None], y_rest])

    def bwd(u_next, yvg):
        yi, vi, gi = yvg
        u = (yi - gi * u_next) / vi
        return u, u

    un = y[-1] / lu.v[-1]
    _, u_rest = lax.scan(bwd, un, (y[:-1], lu.v[:-1], lu.gamma), reverse=True)
    return jnp.concatenate([u_rest, un[None]])


def tridiag_solve(alpha, beta, gamma, b):
    """One-shot Thomas solve."""
    return trisolve(trilu(alpha, beta, gamma), b)
