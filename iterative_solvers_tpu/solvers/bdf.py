"""Adaptive BDF integrator (orders 1-2) with Newton–Krylov stages.

TPU-native replacement for the reference's ``solve_ivp(..., method="BDF")``
path (PMA.py:68, SURVEY.md §3.2): a stiff implicit multistep method whose
stage equations are solved Jacobian-free.  scipy's BDF does dense/banded LU
on an approximated Jacobian — no TPU equivalent; the semantics preserved
here are *implicit multistep + Newton + adaptive error-controlled dt*:

- variable-step BDF2 with BDF1 (backward Euler) bootstrap,
- local error from the corrector-vs-predictor difference with a WRMS
  (rtol/atol) norm, step accept/reject and PI-style dt control,
- stage solves via :class:`..solvers.newton.NewtonKrylov` (LGMRES inner,
  recycled outer vectors),
- the whole integration is one ``lax.while_loop`` — no host round-trips.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .newton import NewtonKrylov


class BDFResult(NamedTuple):
    y: jax.Array
    t: jax.Array
    steps: jax.Array         # accepted steps
    rejected: jax.Array      # rejected step attempts
    newton_failures: jax.Array
    dt_final: jax.Array
    success: jax.Array


@dataclasses.dataclass(frozen=True)
class BDF:
    rtol: float = 1e-3        # scipy solve_ivp defaults
    atol: float = 1e-6
    dt0: float = 1e-4
    dt_min: float = 1e-14
    dt_max: float = np.inf
    safety: float = 0.9
    max_steps: int = 100_000
    newton: NewtonKrylov = dataclasses.field(
        default_factory=lambda: NewtonKrylov(f_tol=1e-10, maxiter=12,
                                             inner_m=20, outer_k=5)
    )

    def _wrms(self, err, y):
        sc = self.atol + self.rtol * jnp.abs(y)
        return jnp.sqrt(jnp.mean((err / sc) ** 2))

    def solve(self, f: Callable, y0: jax.Array, t0: float, t1: float) -> BDFResult:
        """Integrate ``dy/dt = f(t, y)`` from t0 to t1."""
        dtype = y0.dtype
        t0 = jnp.asarray(t0, dtype)
        t1 = jnp.asarray(t1, dtype)

        def stage_residual_bdf1(y_new, y_n, t_new, dt):
            return y_new - y_n - dt * f(t_new, y_new)

        def stage_residual_bdf2(y_new, y_n, y_nm1, t_new, dt, rho):
            # variable-step BDF2: y+ - c1 y_n + c2 y_{n-1} = beta dt f(y+)
            c1 = (1 + rho) ** 2 / (1 + 2 * rho)
            c2 = rho ** 2 / (1 + 2 * rho)
            beta = (1 + rho) / (1 + 2 * rho)
            return y_new - c1 * y_n + c2 * y_nm1 - beta * dt * f(t_new, y_new)

        def body(state):
            (t, dt, y, y_prev, y_prev2, dt_prev, dt_prev2, have_two,
             have_three, steps, rejected, nfail, done) = state
            dt_eff = jnp.minimum(dt, t1 - t)
            t_new = t + dt_eff
            rho = dt_eff / dt_prev

            # predictors: linear extrapolation through (y_prev, y), and —
            # once three history points exist — quadratic extrapolation.
            # The error estimate needs the quadratic one: BDF2's LTE is
            # O(h^3) while (corrector - linear predictor) is O(h^2), which
            # over-rejects and caps dt growth.
            y_lin = jnp.where(have_two, y + rho * (y - y_prev), y)
            a, b, c = dt_eff, dt_prev, dt_prev2
            l0 = (a + b) * (a + b + c) / (b * (b + c))
            l1 = -a * (a + b + c) / (b * c)
            l2 = a * (a + b) / ((b + c) * c)
            y_quad = l0 * y + l1 * y_prev + l2 * y_prev2
            y_pred = jnp.where(have_three, y_quad, y_lin)

            # one Newton solve per attempt: BDF1 only during bootstrap
            # (lax.cond executes a single branch at runtime)
            res = lax.cond(
                have_two,
                lambda yp: self.newton.solve(
                    partial(stage_residual_bdf2, y_n=y, y_nm1=y_prev,
                            t_new=t_new, dt=dt_eff, rho=rho), yp),
                lambda yp: self.newton.solve(
                    partial(stage_residual_bdf1, y_n=y, t_new=t_new,
                            dt=dt_eff), yp),
                y_pred,
            )
            y_new = res.x
            newton_ok = res.converged

            err = self._wrms(y_new - y_pred, y_new)
            # bootstrap steps: no same-order predictor -> accept on Newton
            # success with conservative dt growth
            err = jnp.where(have_three, err, jnp.asarray(0.5, dtype))
            accept = newton_ok & (err <= 1.0)

            # err ~ dt^3 once the quadratic predictor is live
            order = jnp.where(have_three, 3.0, 2.0)
            factor = jnp.clip(
                self.safety * err ** (-1.0 / order), 0.2, 5.0
            )
            dt_next = jnp.clip(jnp.where(newton_ok, dt_eff * factor,
                                         dt_eff * 0.25),
                               self.dt_min, self.dt_max)

            t_out = jnp.where(accept, t_new, t)
            y_out = jnp.where(accept, y_new, y)
            y_prev_out = jnp.where(accept, y, y_prev)
            y_prev2_out = jnp.where(accept, y_prev, y_prev2)
            dt_prev_out = jnp.where(accept, dt_eff, dt_prev)
            dt_prev2_out = jnp.where(accept, dt_prev, dt_prev2)
            have_three_out = have_three | (have_two & accept)
            have_two_out = have_two | accept
            done_out = done | (t_out >= t1 - 1e-300) | (dt_next <= self.dt_min)

            return (
                t_out, dt_next, y_out, y_prev_out, y_prev2_out, dt_prev_out,
                dt_prev2_out, have_two_out, have_three_out,
                steps + accept.astype(jnp.int32),
                rejected + (1 - accept.astype(jnp.int32)),
                nfail + (1 - newton_ok.astype(jnp.int32)),
                done_out,
            )

        def cond(state):
            done = state[-1]
            steps, rejected = state[-4], state[-3]
            return (~done) & (steps + rejected < self.max_steps)

        dt0 = jnp.asarray(self.dt0, dtype)
        state = (
            t0, dt0, y0, y0, y0, dt0, dt0, jnp.bool_(False),
            jnp.bool_(False), jnp.int32(0), jnp.int32(0), jnp.int32(0),
            jnp.bool_(False),
        )
        (t, dt, y, _, _, _, _, _, _, steps, rejected, nfail, done) = (
            lax.while_loop(cond, body, state))
        return BDFResult(y=y, t=t, steps=steps, rejected=rejected,
                         newton_failures=nfail, dt_final=dt,
                         success=t >= t1 - 1e-300)
