"""LGMRES with outer-vector recycling ("loose GMRES"), jit-compatible.

Mirrors the semantics of scipy's ``lgmres`` (and therefore of the reference's
external C++ port — SURVEY.md §2.11: ``Vec lgmres(matvec, psolve, x0, b,
outer_v, tol, maxiter, inner_m, outer_k)``): each outer cycle builds an
augmented subspace of ``inner_m`` Arnoldi vectors plus up to ``outer_k``
recycled approximate-solution directions from previous cycles, solves the
least-squares problem over that subspace (flexible-GMRES: minimise
``||r0 - A Z y||`` with the ``A z_j`` orthonormalised into ``V`` and the
Hessenberg reduced by Givens rotations), and appends the new correction to the
recycle buffer.

TPU-first details are the same as :mod:`.gmres`: CGS2 orthogonalisation via
two whole-basis matmuls, static ``(m+1, *field_shape)`` buffers, and
``lax.while_loop`` recurrences with early exit.

Used by :mod:`.newton` exactly as scipy's ``KrylovJacobian`` uses lgmres for
Newton–Krylov: one outer cycle per Newton iteration (``maxiter=1``), recycle
buffer persisting across Newton iterations, ``store_av=False`` because the
Jacobian changes between iterations.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .gmres import _norm, _apply_givens, _cgs2, _basis_rows, _PREC


class LgmresRecycle(NamedTuple):
    """Fixed-size recycle buffer of normalised outer directions.

    ``z[i]`` are previous solution updates ``dx/||dx||`` (newest last among
    the first ``count`` slots); ``az[i]`` caches ``A z[i]`` when
    ``store_av`` is on (invalid/zero otherwise).
    """

    z: jax.Array       # (outer_k, *shape)
    az: jax.Array      # (outer_k, *shape)
    count: jax.Array   # int32, number of valid entries


class LgmresResult(NamedTuple):
    x: jax.Array
    iters: jax.Array
    resnorm: jax.Array
    converged: jax.Array


def init_recycle(shape, outer_k: int, dtype) -> LgmresRecycle:
    z = jnp.zeros((outer_k,) + tuple(shape), dtype=dtype)
    return LgmresRecycle(z=z, az=jnp.zeros_like(z), count=jnp.int32(0))


def _push_recycle(rec: LgmresRecycle, dx, adx) -> LgmresRecycle:
    """Append (dx, A dx)/||dx|| to the buffer, evicting the oldest entry."""
    nx = _norm(dx)
    ok = nx > 0
    scale = jnp.where(ok, 1.0 / jnp.where(ok, nx, 1.0), 0.0)
    k = rec.z.shape[0]
    full = rec.count >= k

    def shifted(buf, new):
        rolled = jnp.roll(buf, -1, axis=0).at[-1].set(new)
        appended = buf.at[jnp.minimum(rec.count, k - 1)].set(new)
        return jnp.where(full, rolled, appended)

    z_new = shifted(rec.z, dx * scale)
    az_new = shifted(rec.az, adx * scale)
    count = jnp.where(ok, jnp.minimum(rec.count + 1, k), rec.count)
    return LgmresRecycle(
        z=jnp.where(ok, z_new, rec.z),
        az=jnp.where(ok, az_new, rec.az),
        count=count,
    )


def _lgmres_cycle(matvec, precond, x, r, rnorm, tol_abs, inner_m, rec, store_av):
    """One augmented (inner_m + count) cycle. Returns (x, res_est, j, rec)."""
    dtype = r.dtype
    shape = r.shape
    outer_k = rec.z.shape[0]
    mtot = inner_m + outer_k
    steps = inner_m + rec.count  # dynamic trip count <= mtot

    V = jnp.zeros((_basis_rows(mtot + 1, shape, r.dtype.itemsize),) + shape,
                  dtype=dtype)
    # flexible-right preconditioning: the Arnoldi basis starts from the raw
    # residual (scipy _fgmres: v0 = r/||r||); M^{-1} enters only through the
    # aux directions z_j = precond(V[j]) below.  Starting from precond(r)
    # breaks the least-squares identity V[0] g[0] ~ r whenever M != I.
    V = V.at[0].set(r / jnp.where(rnorm > 0, rnorm, 1.0))
    Z = jnp.zeros((mtot,) + shape, dtype=dtype)
    R = jnp.eye(mtot, dtype=dtype)
    g = jnp.zeros(mtot + 1, dtype=dtype).at[0].set(rnorm)
    cs = jnp.zeros(mtot, dtype=dtype)
    sn = jnp.zeros(mtot, dtype=dtype)

    def cond(state):
        V, Z, R, g, cs, sn, j, res = state
        return (j < steps) & (res > tol_abs)

    def body(state):
        V, Z, R, g, cs, sn, j, res = state
        aug = j >= inner_m
        aug_i = jnp.clip(j - inner_m, 0, outer_k - 1)
        z = jnp.where(aug, rec.z[aug_i], precond(V[j]))
        have_cached = aug & (jnp.bool_(store_av))
        w = lax.cond(
            have_cached,
            lambda: rec.az[aug_i],
            lambda: matvec(z),
        )
        Z = Z.at[j].set(z)
        # CGS2 against the j+1 live basis rows (size-gated form)
        h, w = _cgs2(V, w, j + 1)
        beta = _norm(w)
        V = V.at[j + 1].set(w / jnp.where(beta > 0, beta, 1.0))

        h = _apply_givens(h, cs, sn, j)
        hj = h[j]
        rho = jnp.sqrt(hj * hj + beta * beta)
        rho_safe = jnp.where(rho > 0, rho, 1.0)
        c = jnp.where(rho > 0, hj / rho_safe, 1.0)
        s = jnp.where(rho > 0, beta / rho_safe, 0.0)
        cs = cs.at[j].set(c)
        sn = sn.at[j].set(s)
        h = h.at[j].set(rho)
        R = R.at[:, j].set(h[:mtot])
        res_new = jnp.abs(-s * g[j])
        g = g.at[j + 1].set(-s * g[j]).at[j].set(c * g[j])
        return (V, Z, R, g, cs, sn, j + 1, res_new)

    state = (V, Z, R, g, cs, sn, jnp.int32(0), rnorm)
    V, Z, R, g, cs, sn, j, res = lax.while_loop(cond, body, state)

    # mask the residual value sitting in g at/beyond the active column count
    g_ls = jnp.where(jnp.arange(mtot) < j, g[:mtot], 0.0)
    y = jax.scipy.linalg.solve_triangular(R, g_ls, lower=False)
    dx = jnp.tensordot(y, Z, axes=1, precision=_PREC)
    # A dx in the V basis: V @ (H y) = V @ (Q R y) — reconstruct cheaply for
    # the recycle buffer when store_av is requested.
    adx = matvec(dx) if store_av else jnp.zeros_like(dx)
    rec = _push_recycle(rec, dx, adx)
    return x + dx, res, j, rec


def lgmres(
    matvec: Callable,
    b: jax.Array,
    x0: jax.Array | None = None,
    *,
    tol: float = 1e-5,
    atol: float = 0.0,
    inner_m: int = 30,
    outer_k: int = 3,
    maxiter: int = 1000,
    M: Callable | None = None,
    recycle: LgmresRecycle | None = None,
    store_av: bool = True,
) -> tuple[LgmresResult, LgmresRecycle]:
    """Solve ``A x = b`` by LGMRES.  Returns (result, updated recycle buffer).

    ``maxiter`` counts *outer cycles* (scipy convention).  Pass the returned
    recycle buffer back in to accelerate a sequence of related solves.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    precond = M if M is not None else (lambda v: v)
    inner_m = int(min(inner_m, b.size))
    if recycle is None:
        recycle = init_recycle(b.shape, outer_k, b.dtype)

    bnorm = _norm(b)
    tol_abs = jnp.maximum(tol * bnorm, atol).astype(b.dtype)

    def outer_cond(state):
        x, res, iters, cycles, rec = state
        return (res > tol_abs) & (cycles < maxiter)

    def outer_body(state):
        x, res, iters, cycles, rec = state
        r = b - matvec(x)
        rnorm = _norm(r)
        x, _, j, rec = _lgmres_cycle(
            matvec, precond, x, r, rnorm, tol_abs, inner_m, rec, store_av
        )
        # gate the outer loop on the true residual (Givens estimate drifts)
        res_true = _norm(b - matvec(x))
        return (x, res_true, iters + j, cycles + 1, rec)

    r0 = b - matvec(x0)
    state = (x0, _norm(r0), jnp.int32(0), jnp.int32(0), recycle)
    x, res, iters, cycles, rec = lax.while_loop(outer_cond, outer_body, state)
    final_res = _norm(b - matvec(x))
    return (
        LgmresResult(x=x, iters=iters, resnorm=final_res,
                     converged=final_res <= tol_abs),
        rec,
    )
