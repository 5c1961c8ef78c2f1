"""Solver-level failure detection and recovery (SURVEY.md §5.3).

The reference's only failure handling is scipy raising ``NoConvergence`` and
two hand-tuned heuristics (the ``scale`` growth law droplet.py:411 and the
``compute_g`` touchdown clamp PMA2_nk.py:91).  This module formalises both:

- :func:`step_with_backoff` — run an implicit step; on Newton divergence or
  NaN, halve dt and retry (bounded), else accept and let dt grow.  The whole
  retry loop is jit-compatible (``lax.while_loop``); no exceptions cross the
  device boundary.
- :func:`check_finite` — NaN/Inf detection on states (pairs with
  ``jax.config.jax_debug_nans`` for origin tracing during debugging).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class AdaptiveStepResult(NamedTuple):
    u: jax.Array
    dt_used: jax.Array
    dt_next: jax.Array
    attempts: jax.Array
    ok: jax.Array


def check_finite(u) -> jax.Array:
    return jnp.all(jnp.isfinite(u))


def step_with_backoff(step_fn: Callable, u, dt, *, max_retries: int = 6,
                      backoff: float = 0.5, growth: float = 1.5,
                      dt_min: float = 0.0) -> AdaptiveStepResult:
    """``step_fn(u, dt) -> (u_new, converged)``; retry with smaller dt on
    failure.  Returns the accepted state and the dt to try next step."""

    def cond(state):
        u_new, dt_try, k, ok = state
        return (~ok) & (k < max_retries) & (dt_try > dt_min)

    def body(state):
        _, dt_try, k, _ = state
        dt_new = dt_try * jnp.where(k > 0, backoff, 1.0)
        u_new, converged = step_fn(u, dt_new)
        ok = converged & check_finite(u_new)
        return (u_new, dt_new, k + 1, ok)

    u0 = jnp.full_like(u, jnp.nan)
    u_new, dt_used, attempts, ok = lax.while_loop(
        cond, body, (u0, jnp.asarray(dt, u.dtype), jnp.int32(0),
                     jnp.bool_(False))
    )
    u_out = jnp.where(ok, u_new, u)  # reject entirely if all retries failed
    dt_next = jnp.where(ok, dt_used * growth, dt_used)
    return AdaptiveStepResult(u=u_out, dt_used=dt_used, dt_next=dt_next,
                              attempts=attempts, ok=ok)


def evolve_with_backoff(step_fn: Callable, u0, dt0, nsteps: int, **kw):
    """Drive ``nsteps`` accepted/rejected attempts of the backoff stepper
    under one jit; returns final state and per-step (dt, attempts, ok)."""

    def body(carry, _):
        u, dt = carry
        out = step_with_backoff(step_fn, u, dt, **kw)
        return (out.u, out.dt_next), (out.dt_used, out.attempts, out.ok)

    (u, dt), aux = lax.scan(body, (u0, jnp.asarray(dt0, u0.dtype)), None,
                            length=nsteps)
    return u, dt, aux
