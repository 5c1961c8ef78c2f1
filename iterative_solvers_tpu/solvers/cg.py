"""Preconditioned conjugate gradients (SPD systems), jit-compatible.

Complements GMRES for the symmetric operators in the workload set (Poisson,
shifted Laplacians).  Same shape-agnostic conventions as :mod:`.gmres`.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .gmres import _dot, _norm


class CGResult(NamedTuple):
    x: jax.Array
    iters: jax.Array
    resnorm: jax.Array
    converged: jax.Array


def cg(matvec: Callable, b, x0=None, *, tol=1e-5, atol=0.0,
       maxiter: int | None = None, M: Callable | None = None) -> CGResult:
    """Solve SPD ``A x = b``; ``M`` applies an approximate inverse."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if maxiter is None:
        maxiter = 10 * b.size
    precond = M if M is not None else (lambda v: v)

    bnorm = _norm(b)
    tol_abs = jnp.maximum(tol * bnorm, atol).astype(b.dtype)

    r0 = b - matvec(x0)
    z0 = precond(r0)
    p0 = z0
    rz0 = _dot(r0, z0)

    def cond(state):
        x, r, z, p, rz, k = state
        return (_norm(r) > tol_abs) & (k < maxiter)

    def body(state):
        x, r, z, p, rz, k = state
        ap = matvec(p)
        alpha = rz / _dot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = _dot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, z, p, rz, k = lax.while_loop(
        cond, body, (x0, r0, z0, p0, rz0, jnp.int32(0))
    )
    res = _norm(b - matvec(x))
    return CGResult(x=x, iters=k, resnorm=res, converged=res <= tol_abs)
