"""Adaptive variable-order BDF integrator (orders 1-3) with Newton–Krylov
stages.

TPU-native replacement for the reference's ``solve_ivp(..., method="BDF")``
path (PMA.py:68, SURVEY.md §3.2): a stiff implicit multistep method whose
stage equations are solved Jacobian-free.  scipy's BDF does dense/banded LU
on an approximated Jacobian — no TPU equivalent; the semantics preserved
here are *implicit multistep + Newton + adaptive error- and
order-controlled dt*:

- variable-step BDF of order 1-3.  The order-k stage residual comes from
  the Lagrange form: the interpolant P through (t_new, y_new) and the last
  k history points must satisfy ``P'(t_new) = f(t_new, y_new)`` — the
  derivative weights ``g_j`` are computed for the *actual* step ratios, so
  no constant-step coefficient tables and no restart penalty on dt change.
- local error of the order-k corrector from the degree-k predictor
  difference (``~ h^{k+1}``), WRMS (rtol/atol) norm, accept/reject +
  dt factor ``err^(-1/(k+1))``.
- order control: after each accepted step the degree-2 and degree-3
  predictor errors give the permissible dt factors at orders 2 and 3; the
  next step runs at whichever order allows the larger step (scipy's
  maximise-step heuristic, restricted to the 1-3 range).
- stage solves via :class:`..solvers.newton.NewtonKrylov` (LGMRES inner,
  recycled outer vectors); ``lax.switch`` picks the order's residual, so
  the whole integration stays one ``lax.while_loop`` — no host round-trips.
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


def _lagrange_weights_at(x0, xs):
    """Weights w_j with P(x0) = sum_j w_j y_j for nodes ``xs`` (list of
    traced scalars)."""
    ws = []
    for j, xj in enumerate(xs):
        num = 1.0
        den = 1.0
        for m, xm in enumerate(xs):
            if m == j:
                continue
            num = num * (x0 - xm)
            den = den * (xj - xm)
        ws.append(num / den)
    return ws


def _lagrange_dweights_at_node(xs):
    """Weights g_j with P'(xs[0]) = sum_j g_j y_j (derivative at the FIRST
    node — the BDF formula's new-time node)."""
    x0 = xs[0]
    gs = []
    # g_0 = sum_{m != 0} 1/(x0 - x_m)
    g0 = 0.0
    for m, xm in enumerate(xs):
        if m:
            g0 = g0 + 1.0 / (x0 - xm)
    gs.append(g0)
    for j in range(1, len(xs)):
        num = 1.0
        den = 1.0
        for m, xm in enumerate(xs):
            if m == j:
                continue
            if m:
                num = num * (x0 - xm)
            den = den * (xs[j] - xm)
        gs.append(num / den)
    return gs


@dataclasses.dataclass(frozen=True)
class BDF:
    rtol: float = 1e-3        # scipy solve_ivp defaults
    atol: float = 1e-6
    dt0: float = 1e-4
    dt_min: float = 1e-14
    dt_max: float = np.inf
    safety: float = 0.9
    max_order: int = 3
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
        kmax = int(self.max_order)
        assert 1 <= kmax <= 3

        def stage_residual(k, y_new, hist, t_new, dt, dts):
            """Order-k BDF residual in y-scaled form: the interpolant
            through (t_new, y_new) and k history points has derivative f at
            t_new.  Node offsets measured from t_new (x0 = 0)."""
            xs = [jnp.asarray(0.0, dtype), -dt]
            acc = dt
            for i in range(k - 1):
                acc = acc + dts[i]
                xs.append(-acc)
            gs = _lagrange_dweights_at_node(xs)
            r = y_new + sum((g / gs[0]) * h for g, h in zip(gs[1:], hist[:k]))
            return r - f(t_new, y_new) / gs[0]

        def predictor(k, hist, dt, dts):
            """Degree-k extrapolation to t_new through hist[0..k] (history
            node offsets from t_n: 0, -dt1, -(dt1+dt2), ...)."""
            offs = [jnp.asarray(0.0, dtype)]
            acc = jnp.asarray(0.0, dtype)
            for i in range(k):
                acc = acc + dts[i]
                offs.append(-acc)
            ws = _lagrange_weights_at(dt, offs)
            return sum(w * h for w, h in zip(ws, hist[:k + 1]))

        def body(state):
            (t, dt, hist, dts, nhist, order, since, steps, rejected, nfail,
             done) = state
            dt_eff = jnp.minimum(dt, t1 - t)
            t_new = t + dt_eff

            # predictors at every available degree (cheap: weights only)
            preds = [hist[0]]  # degree 0
            for k in range(1, kmax + 1):
                preds.append(jnp.where(nhist >= k + 1,
                                       predictor(k, hist, dt_eff, dts),
                                       preds[-1]))
            y_pred = preds[-1]
            for k in range(kmax, 0, -1):
                y_pred = jnp.where(order == k, preds[k], y_pred)

            branches = [
                (lambda kk: lambda yp: self.newton.solve(
                    partial(stage_residual, kk, hist=hist, t_new=t_new,
                            dt=dt_eff, dts=dts), yp))(k)
                for k in range(1, kmax + 1)
            ]
            res = lax.switch(order - 1, branches, y_pred)
            y_new = res.x
            newton_ok = res.converged

            # same-order predictor difference ~ h^(k+1)
            errs = [jnp.asarray(jnp.inf, dtype)]  # order 0 placeholder
            for k in range(1, kmax + 1):
                e = self._wrms(y_new - preds[k], y_new)
                # usable only with full history for that degree
                errs.append(jnp.where(nhist >= k + 1, e,
                                      jnp.asarray(0.5, dtype)))
            err = errs[-1]
            for k in range(kmax, 0, -1):
                err = jnp.where(order == k, errs[k], err)
            accept = newton_ok & (err <= 1.0)

            # per-order permissible dt factors; next order maximises the
            # step.  The current order (its factor from the accept-gating
            # error) is always a candidate, so the controller degrades to
            # plain step control while history is short.
            ordf = order.astype(dtype)
            factor_cur = self.safety * jnp.maximum(err, 1e-16) ** (
                -1.0 / (ordf + 1.0))
            # scipy's equilibration rule: consider an order change only
            # after order+1 consecutive accepted steps at the current order
            # (prevents order/step thrash on noisy error estimates)
            may_switch = since + 1 >= order + 1
            best = order
            bestf = factor_cur
            for k in range(1, kmax + 1):
                fk = self.safety * jnp.maximum(errs[k], 1e-16) ** (
                    -1.0 / (k + 1.0))
                # candidate only once its error estimate is live
                ok = (nhist >= k + 1) & (fk > bestf) & may_switch
                best = jnp.where(ok, jnp.int32(k), best)
                bestf = jnp.where(ok, fk, bestf)
            order_out = jnp.where(accept, best, order)
            since_out = jnp.where(
                accept & (order_out == order), since + 1, jnp.int32(0))
            factor = jnp.clip(jnp.where(accept, bestf, factor_cur), 0.2, 5.0)
            dt_next = jnp.clip(jnp.where(newton_ok, dt_eff * factor,
                                         dt_eff * 0.25),
                               self.dt_min, self.dt_max)

            hist_out = [jnp.where(accept, y_new, hist[0])]
            for i in range(len(hist) - 1):
                hist_out.append(jnp.where(accept, hist[i], hist[i + 1]))
            dts_out = [jnp.where(accept, dt_eff, dts[0])]
            for i in range(len(dts) - 1):
                dts_out.append(jnp.where(accept, dts[i], dts[i + 1]))
            nhist_out = jnp.where(accept,
                                  jnp.minimum(nhist + 1, kmax + 2), nhist)

            t_out = jnp.where(accept, t_new, t)
            done_out = done | (t_out >= t1 - 1e-300) | (dt_next <= self.dt_min)

            return (
                t_out, dt_next, tuple(hist_out), tuple(dts_out), nhist_out,
                order_out, since_out,
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
        hist0 = tuple(y0 for _ in range(kmax + 1))
        dts0 = tuple(dt0 for _ in range(kmax))
        state = (
            t0, dt0, hist0, dts0, jnp.int32(1), jnp.int32(1), jnp.int32(0),
            jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.bool_(False),
        )
        (t, dt, hist, _, _, _, _, steps, rejected, nfail, done) = (
            lax.while_loop(cond, body, state))
        return BDFResult(y=hist[0], t=t, steps=steps, rejected=rejected,
                         newton_failures=nfail, dt_final=dt,
                         success=t >= t1 - 1e-300)
