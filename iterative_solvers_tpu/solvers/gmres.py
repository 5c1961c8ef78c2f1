"""Restarted GMRES, jit-compatible, TPU-first.

Replaces the scipy GMRES/LGMRES inner solves hidden behind the reference's
``scipy.optimize.newton_krylov`` call sites (droplet.py:383, PMA2_nk.py:100,
sh_scipy_nk.py:61) and the external C++ ``lgmres`` (SURVEY.md §2.11).

Design notes (TPU):
- Orthogonalisation is classical Gram–Schmidt with one re-orthogonalisation
  (CGS2): two ``(m+1, n) x (n,)`` matmuls per Arnoldi step instead of ``j``
  sequential dots — keeps the MXU/VPU busy and the loop shape static.  Rows of
  ``V`` beyond the current iteration are zero, so no masking is needed in the
  projection.
- The Arnoldi/Givens recurrence runs inside ``lax.while_loop`` with static
  shapes ``(restart+1, *field_shape)``; early exit on convergence.
- Works on fields of any shape (2-D grids stay 2-D; no flattening), so the
  caller's matvec can be a fused stencil pipeline.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class GmresResult(NamedTuple):
    x: jax.Array
    iters: jax.Array       # total inner (Arnoldi) iterations
    resnorm: jax.Array     # final residual norm estimate ||b - A x||
    converged: jax.Array


# All contractions run at HIGHEST precision: on TPU the default lowers f32
# dot_generals to bf16 MXU passes (~1e-3 relative error), which corrupts
# Gram–Schmidt orthogonality and the Givens residual recurrence.  The
# CGS2 matvecs are HBM-bandwidth-bound, so the extra MXU passes are free.
_PREC = lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.tensordot(a, b, axes=a.ndim, precision=_PREC)


def _norm(a):
    return jnp.sqrt(_dot(a, a))


def _round_up(n: int, c: int) -> int:
    return ((n + c - 1) // c) * c


def _basis_rows(m_plus_1: int, shape, itemsize: int) -> int:
    """Row count for the Arnoldi basis buffer: padded to the chunked-CGS2
    chunk multiple only when the field is large enough to take that path —
    small-field solves keep the exact ``(m+1, ...)`` buffer (the whole-buffer
    CGS2 reads every row, so padding there is pure waste; advisor r3)."""
    import numpy as np

    field_bytes = int(np.prod(shape, dtype=np.int64)) * itemsize
    if field_bytes < _CGS2_CHUNK_MIN_BYTES:
        return m_plus_1
    return _round_up(m_plus_1, 4)


# Fields at/above this size use the chunked active-row CGS2 (traffic win
# grows with the field; below it the whole-buffer matmuls are faster —
# measured at 1024² the chunked form costs +6 ms/step in loop overhead
# while at 4096² the whole-buffer form wastes ~5 GB HBM per Arnoldi step).
_CGS2_CHUNK_MIN_BYTES = 32 * 1024 * 1024


def _cgs2(V, w, rows):
    """CGS2 of ``w`` against the live rows of ``V`` — whole-buffer matmuls
    for small fields, chunked active-row passes (:func:`_cgs2_active`) for
    large ones.  The zero rows of ``V`` are inert in both forms."""
    import numpy as np

    field_bytes = int(np.prod(V.shape[1:], dtype=np.int64)) * V.dtype.itemsize
    if field_bytes < _CGS2_CHUNK_MIN_BYTES:
        h = jnp.tensordot(V, w, axes=w.ndim, precision=_PREC)
        w = w - jnp.tensordot(h, V, axes=1, precision=_PREC)
        h2 = jnp.tensordot(V, w, axes=w.ndim, precision=_PREC)
        w = w - jnp.tensordot(h2, V, axes=1, precision=_PREC)
        return h + h2, w
    return _cgs2_active(V, w, rows)


def _cgs2_active(V, w, rows, chunk: int = 4):
    """Two-round classical Gram–Schmidt of ``w`` against the first ``rows``
    (traced) rows of the orthonormal buffer ``V``.

    Mathematically identical to the whole-buffer form ``h = V·w; w -= h·V``
    (rows at/beyond ``rows`` are zero and contribute nothing) but touches
    only ``ceil(rows/chunk)`` static-size chunks of the basis per pass —
    the whole-buffer form reads the full static ``(mtot+1, n)`` allocation
    four times per Arnoldi step regardless of how many rows are live.  At
    4096² with ``inner_m + outer_k = 18`` that is ~5 GB of HBM traffic per
    inner iteration, the second-largest cost of a large-grid Newton step
    after the f64 residual (tools/profile_large_step.py).

    ``V.shape[0]`` must be a chunk multiple (callers pad the buffer; the
    extra zero rows are inert).  Returns ``(h, w_deflated)`` with ``h`` of
    length ``V.shape[0]``.
    """
    nrows = V.shape[0]
    assert nrows % chunk == 0, "pad V to a chunk multiple"
    nact = (rows + (chunk - 1)) // chunk

    def one_round(w):
        def proj(c, acc):
            h, w = acc
            vc = lax.dynamic_slice_in_dim(V, c * chunk, chunk, 0)
            hc = jnp.tensordot(vc, w, axes=w.ndim, precision=_PREC)
            return lax.dynamic_update_slice_in_dim(h, hc, c * chunk, 0), w

        h, _ = lax.fori_loop(
            0, nact, proj, (jnp.zeros((nrows,), V.dtype), w))

        def defl(c, w):
            vc = lax.dynamic_slice_in_dim(V, c * chunk, chunk, 0)
            hc = lax.dynamic_slice_in_dim(h, c * chunk, chunk, 0)
            return w - jnp.tensordot(hc, vc, axes=1, precision=_PREC)

        return h, lax.fori_loop(0, nact, defl, w)

    h1, w = one_round(w)
    h2, w = one_round(w)
    return h1 + h2, w


def _apply_givens(h, cs, sn, j):
    """Apply the first ``j`` stored rotations to the new column ``h``."""
    m = cs.shape[0]

    def body(i, h):
        hi, hi1 = h[i], h[i + 1]
        new_hi = cs[i] * hi + sn[i] * hi1
        new_hi1 = -sn[i] * hi + cs[i] * hi1
        active = i < j
        h = h.at[i].set(jnp.where(active, new_hi, hi))
        h = h.at[i + 1].set(jnp.where(active, new_hi1, hi1))
        return h

    return lax.fori_loop(0, m, body, h)


def _gmres_cycle(matvec, precond, b, x0, r0, r0norm, tol_abs, restart):
    """One restart cycle. Returns (x_new, resnorm_est, inner_iters)."""
    dtype = b.dtype
    shape = b.shape
    m = restart

    V = jnp.zeros((_basis_rows(m + 1, shape, b.dtype.itemsize),) + shape,
                  dtype=dtype)
    V = V.at[0].set(r0 / jnp.where(r0norm > 0, r0norm, 1.0))
    R = jnp.eye(m, dtype=dtype)
    g = jnp.zeros(m + 1, dtype=dtype).at[0].set(r0norm)
    cs = jnp.zeros(m, dtype=dtype)
    sn = jnp.zeros(m, dtype=dtype)

    def cond(state):
        V, R, g, cs, sn, j, res = state
        return (j < m) & (res > tol_abs)

    def body(state):
        V, R, g, cs, sn, j, res = state
        w = matvec(precond(V[j]))
        # CGS2 against the j+1 live basis rows (size-gated form)
        h, w = _cgs2(V, w, j + 1)
        beta = _norm(w)
        V = V.at[j + 1].set(w / jnp.where(beta > 0, beta, 1.0))

        h = _apply_givens(h, cs, sn, j)
        hj = h[j]
        rho = jnp.sqrt(hj * hj + beta * beta)
        rho_safe = jnp.where(rho > 0, rho, 1.0)
        c, s = hj / rho_safe, beta / rho_safe
        c = jnp.where(rho > 0, c, 1.0)
        s = jnp.where(rho > 0, s, 0.0)
        cs = cs.at[j].set(c)
        sn = sn.at[j].set(s)
        h = h.at[j].set(rho)
        R = R.at[:, j].set(h[:m])
        res_new = jnp.abs(-s * g[j])
        g = g.at[j + 1].set(-s * g[j]).at[j].set(c * g[j])
        return (V, R, g, cs, sn, j + 1, res_new)

    state = (V, R, g, cs, sn, jnp.int32(0), r0norm)
    V, R, g, cs, sn, j, res = lax.while_loop(cond, body, state)

    # entries of g at/beyond the active column count hold the residual value,
    # not least-squares data — mask them so unused basis vectors get y=0
    g_ls = jnp.where(jnp.arange(m) < j, g[:m], 0.0)
    y = jax.scipy.linalg.solve_triangular(R, g_ls, lower=False)
    dx = jnp.tensordot(y, V[:m], axes=1, precision=_PREC)
    x = x0 + precond(dx)
    return x, res, j


def gmres(
    matvec: Callable,
    b: jax.Array,
    x0: jax.Array | None = None,
    *,
    tol: float = 1e-5,
    atol: float = 0.0,
    restart: int = 30,
    maxiter: int | None = None,
    M: Callable | None = None,
) -> GmresResult:
    """Solve ``A x = b`` with right-preconditioned restarted GMRES.

    ``M``, if given, is a function applying an approximate inverse of ``A``
    (right preconditioning — the reported residual is the true residual).
    Convergence: ``||b - A x|| <= max(tol * ||b||, atol)``.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    precond = M if M is not None else (lambda v: v)
    restart = int(min(restart, b.size))
    if maxiter is None:
        maxiter = 10 * restart

    bnorm = _norm(b)
    tol_abs = jnp.maximum(tol * bnorm, atol).astype(b.dtype)

    def outer_cond(state):
        x, res, iters = state
        return (res > tol_abs) & (iters < maxiter)

    def outer_body(state):
        x, res, iters = state
        r = b - matvec(x)
        rnorm = _norm(r)
        x, _, j = _gmres_cycle(
            matvec, precond, b, x, r, rnorm, tol_abs, restart
        )
        # the Givens estimate can drift below the true residual (CGS2
        # roundoff); gate the outer loop on the true residual instead
        res_true = _norm(b - matvec(x))
        return (x, res_true, iters + j)

    r0 = b - matvec(x0)
    state = (x0, _norm(r0), jnp.int32(0))
    x, res, iters = lax.while_loop(outer_cond, outer_body, state)
    # one exact residual evaluation for an honest final report
    final_res = _norm(b - matvec(x))
    return GmresResult(x=x, iters=iters, resnorm=final_res,
                       converged=final_res <= tol_abs)
