"""Jacobian-free Newton–Krylov, jit-compatible, TPU-first.

Re-implements the semantics of ``scipy.optimize.newton_krylov`` /
``scipy.optimize._nonlin.nonlin_solve`` — the solver behind every implicit
step in the reference (droplet.py:383, PMA2_nk.py:100, sh_scipy_nk.py:61,
sh_vscode_nk.py:59) and of its external C++ port (``nonlin_solve``,
``KrylovJacobian``, ``_nonlin_line_search`` — SURVEY.md §2.11):

- **KrylovJacobian matvec**: finite-difference directional derivative
  ``J v ≈ (F(x + sc v) - F(x)) / sc`` with ``sc = omega / ||v||`` and
  ``omega = rdiff * max(1, max|x|) / max(1, max|F|)``, ``rdiff = eps**0.5``
  (scipy's update rule).  Because residuals here are pure JAX functions, an
  *exact* JVP via ``jax.jvp`` is also available (``jvp_mode="exact"``) — on
  TPU this costs one fused forward pass and avoids FD cancellation in f32.
- **Inner solver**: one LGMRES cycle per Newton iteration with the recycled
  outer vectors persisting across iterations (``maxiter=1``,
  ``store_av=False``), matching scipy's ``KrylovJacobian`` + lgmres coupling.
- **Forcing term**: Eisenstat–Walker-style update of the inner tolerance
  ``eta`` (scipy _nonlin.py's ``gamma=0.9`` / ``eta_max=0.9999`` /
  ``eta_threshold=0.1`` schedule).
- **Line search**: Armijo backtracking on ``phi(s) = ||F(x + s dx)||^2``.
- **Termination**: max-norm criteria with scipy's defaults
  (``f_tol = eps**(1/3) ≈ 6e-6``, others inf).

The whole Newton loop is a single ``lax.while_loop`` — one XLA computation
per (residual, options) pair, no host round-trips inside the solve.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .gmres import _norm
from .lgmres import _lgmres_cycle, init_recycle


def _maxnorm(v):
    return jnp.max(jnp.abs(v))


class NewtonResult(NamedTuple):
    x: jax.Array
    f_norm: jax.Array       # max|F(x)| at the solution
    iters: jax.Array        # Newton iterations taken
    func_evals: jax.Array   # number of residual evaluations (approximate)
    converged: jax.Array


@dataclasses.dataclass(frozen=True)
class NewtonKrylov:
    """Configured JFNK solver; call ``.solve(residual, x0, *args)``.

    Defaults mirror ``scipy.optimize.newton_krylov``.
    """

    f_tol: float | None = None         # None -> eps**(1/3) (≈6.06e-6 in f64)
    f_rtol: float = np.inf
    x_tol: float = np.inf
    x_rtol: float = np.inf
    maxiter: int = 100
    inner_m: int = 30                  # lgmres subspace per Newton iteration
    outer_k: int = 10                  # recycled vectors (scipy KrylovJacobian)
    inner_maxiter: int = 1             # lgmres cycles per Newton iteration
    # (scipy KrylovJacobian passes maxiter=1; >1 restarts the cycle on the
    # true linear residual with the recycle buffer carrying over — the
    # unpreconditioned way to buy a deeper inner solve at stiff dt without
    # growing the O(m^2 n) orthogonalisation buffers)
    rdiff: float | None = None         # None -> eps**0.5 of the dtype
    jvp_mode: str = "fd"               # "fd" (scipy-parity) | "exact" (jax.jvp)
    line_search: bool = True
    max_backtracks: int = 8
    inner_dtype: str | None = None     # e.g. "float32": run the LGMRES cycle
    # in reduced precision while residual/JVP evaluations stay in the state
    # dtype.  Inexact-Newton theory needs only ~forcing-tolerance-accurate
    # directions, and f64 is emulated on TPU — this keeps the O(m^2 n)
    # orthogonalisation work native-speed without touching convergence of
    # the outer (full-precision) residual.
    matvec_factory: Callable | None = None
    # Optional analytic Jacobian: ``matvec_factory(x, fx) -> (v -> J v)``,
    # evaluated in the *inner* dtype.  When the model can express J·v in
    # closed form (e.g. Swift–Hohenberg: J v = v/k - (L v + (2gu - 3u^2)v)/2)
    # this removes every full-precision residual evaluation from the Krylov
    # loop — the fastest path on TPU.  Compared statically; the dataclass
    # stays hashable because functions hash by identity.
    psolve_factory: Callable | None = None
    # Optional right/flexible preconditioner: ``psolve_factory(x, fx) ->
    # (v -> M^{-1} v)``, applied inside the LGMRES cycle in the *inner*
    # dtype (the scipy ``KrylovJacobian``/lgmres ``psolve`` hook, which the
    # reference's C++ port also carries — SURVEY.md §2.11).  The cycle is
    # flexible (preconditioned directions are stored in Z and the update is
    # taken from Z), so M may change between Newton iterations; recycled
    # outer vectors from earlier iterations remain valid directions.

    def solve(self, residual: Callable, x0: jax.Array, *args) -> NewtonResult:
        """Solve ``residual(x, *args) = 0`` starting from ``x0``.

        ``residual`` must be a pure function of its first argument (extra
        ``args`` are closed over statically for the lax loop).
        """
        dtype = x0.dtype
        inner_dt = jnp.dtype(self.inner_dtype) if self.inner_dtype else None
        if inner_dt == dtype:
            inner_dt = None
        eps = float(np.finfo(np.dtype(dtype)).eps)
        f_tol = jnp.asarray(
            self.f_tol if self.f_tol is not None else float(np.finfo(np.float64).eps) ** (1 / 3),
            dtype,
        )
        rdiff = jnp.asarray(
            self.rdiff if self.rdiff is not None else eps ** 0.5, dtype
        )

        func = lambda x: residual(x, *args)

        def fd_matvec(x, f0, v):
            """scipy KrylovJacobian.matvec (FD directional derivative)."""
            nv = _norm(v)
            omega = rdiff * jnp.maximum(1.0, _maxnorm(x)) / jnp.maximum(1.0, _maxnorm(f0))
            sc = omega / jnp.where(nv > 0, nv, 1.0)
            return jnp.where(nv > 0, (func(x + sc * v) - f0) / sc, jnp.zeros_like(v))

        def exact_matvec(x, f0, v):
            return jax.jvp(func, (x,), (v,))[1]

        matvec_at = exact_matvec if self.jvp_mode == "exact" else fd_matvec

        gamma = jnp.asarray(0.9, dtype)
        eta_max = jnp.asarray(0.9999, dtype)
        eta_threshold = jnp.asarray(0.1, dtype)

        def armijo(x, dx, f0_sqnorm):
            """Backtracking line search on phi(s) = ||F(x + s dx)||^2."""
            t = jnp.asarray(1e-4, dtype)

            def cond(state):
                s, k, phi_s, _ = state
                return (phi_s > (1 - t * s) ** 2 * f0_sqnorm) & (
                    k < self.max_backtracks
                )

            def body(state):
                s, k, _, _ = state
                s_new = s * 0.5
                fx = func(x + s_new * dx)
                return (s_new, k + 1, _norm(fx) ** 2, fx)

            f1 = func(x + dx)
            state = (jnp.asarray(1.0, dtype), jnp.int32(0), _norm(f1) ** 2, f1)
            s, k, phi_s, fx = lax.while_loop(cond, body, state)
            return s, fx, k + 1

        def loop_cond(state):
            x, fx, f0_norm, eta, rec, it, nfev, done = state
            return (~done) & (it < self.maxiter)

        def loop_body(state):
            x, fx, f0_norm, eta, rec, it, nfev, done = state
            f_norm = _maxnorm(fx)

            # inner solve: one lgmres cycle on J dx = -F with recycled vectors
            if self.matvec_factory is not None:
                mv = self.matvec_factory(x, fx)
                rhs = (-fx).astype(inner_dt) if inner_dt is not None else -fx
            elif inner_dt is not None:
                mv = lambda v: matvec_at(x, fx, v.astype(dtype)).astype(inner_dt)
                rhs = (-fx).astype(inner_dt)
            else:
                mv = partial(matvec_at, x, fx)
                rhs = -fx
            ps = (self.psolve_factory(x, fx) if self.psolve_factory
                  is not None else (lambda v: v))
            rnorm = _norm(rhs)
            tol_inner = (jnp.minimum(eta, eta * rnorm) * rnorm).astype(rhs.dtype)
            dx, _, inner_j, rec = _lgmres_cycle(
                mv, ps, jnp.zeros_like(rhs), rhs, rnorm,
                tol_inner, self.inner_m, rec, store_av=False,
            )
            if self.inner_maxiter > 1:
                def cycle_cond(cs):
                    dxc, recc, jc, cyc = cs
                    r = rhs - mv(dxc)
                    return (_norm(r) > tol_inner) & (cyc < self.inner_maxiter)

                def cycle_body(cs):
                    dxc, recc, jc, cyc = cs
                    r = rhs - mv(dxc)
                    dxc, _, jstep, recc = _lgmres_cycle(
                        mv, ps, dxc, r, _norm(r), tol_inner, self.inner_m,
                        recc, store_av=False,
                    )
                    return (dxc, recc, jc + jstep, cyc + 1)

                dx, rec, inner_j, _ = lax.while_loop(
                    cycle_cond, cycle_body, (dx, rec, inner_j, jnp.int32(1)))
            dx = dx.astype(dtype)

            if self.line_search:
                s, fx_new, ls_evals = armijo(x, dx, _norm(fx) ** 2)
            else:
                s = jnp.asarray(1.0, dtype)
                fx_new = func(x + dx)
                ls_evals = jnp.int32(1)
            x_new = x + s * dx
            f_norm_new = _maxnorm(fx_new)
            dx_norm = _maxnorm(s * dx)

            # Eisenstat–Walker forcing-term schedule (scipy _nonlin.py)
            eta_A = gamma * (f_norm_new / jnp.maximum(f_norm, 1e-300)) ** 2
            eta_new = jnp.where(
                gamma * eta ** 2 < eta_threshold,
                jnp.minimum(eta_max, eta_A),
                jnp.minimum(eta_max, jnp.maximum(eta_A, gamma * eta ** 2)),
            )

            # scipy TerminationCondition.check with maxnorm: the f- and
            # x-criteria are AND-ed, so inf-defaults reduce to f_norm <= f_tol
            x_norm = _maxnorm(x_new)
            converged = (
                (f_norm_new <= f_tol)
                & (f_norm_new / self.f_rtol <= f0_norm)
                & (dx_norm <= self.x_tol)
                & (dx_norm / self.x_rtol <= x_norm)
            ) | (f_norm_new == 0.0)

            nfev_new = nfev + inner_j + ls_evals
            return (
                x_new, fx_new, f0_norm, eta_new, rec, it + 1, nfev_new,
                converged,
            )

        fx0 = func(x0)
        rec0 = init_recycle(x0.shape, self.outer_k,
                            inner_dt if inner_dt is not None else dtype)
        init_done = _maxnorm(fx0) <= f_tol
        state = (
            x0, fx0, _maxnorm(fx0), jnp.asarray(1e-3, dtype), rec0,
            jnp.int32(0), jnp.int32(1), init_done,
        )
        x, fx, _, _, _, it, nfev, done = lax.while_loop(
            loop_cond, loop_body, state
        )
        return NewtonResult(
            x=x, f_norm=_maxnorm(fx), iters=it, func_evals=nfev, converged=done
        )


def newton_krylov(residual, x0, *args, **options) -> NewtonResult:
    """Functional one-shot API: ``newton_krylov(F, x0, f_tol=..., ...)``."""
    return NewtonKrylov(**options).solve(residual, x0, *args)
