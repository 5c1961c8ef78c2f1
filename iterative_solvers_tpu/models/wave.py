"""Explicit wave-equation steppers (lab13.py, lab14_p1.py; SURVEY.md §2.13).

- :func:`damped_wave_1d` — damped 1-D wave with an oscillating-inlet boundary
  (lab13.py:42-49).
- :func:`tank_wave_2d` — 2-D wave in a tank with Neumann walls and corner
  averaging (lab14_p1.py:45-70).

Whole trajectories run under one jit (``lax.scan``); the 2-D stepper is a
fused 5-point stencil pipeline.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from jax import lax


def damped_wave_1d(n: int, k: float, nsteps: int, inlet: Callable,
                   dtype=jnp.float64):
    """u_tt + u_t = u_xx on (0,1), u(0,t) = inlet(t), u(1,t)=0, zero IC.

    Returns the final state and the full trajectory (nsteps+1, n+1).
    """
    a = 1 + k / 2
    b = 1 - k / 2
    c = k * k * n * n

    u0 = jnp.zeros(n + 1, dtype)
    u1 = u0.at[0].set(inlet(k))

    def body(carry, s):
        u_prev, u = carry
        interior = (2 * u[1:-1] - b * u_prev[1:-1]
                    + c * (u[2:] - 2 * u[1:-1] + u[:-2])) / a
        u_new = jnp.concatenate(
            [inlet(s * k)[None].astype(dtype), interior,
             jnp.zeros((1,), dtype)]
        )
        return (u, u_new), u_new

    (_, u), traj = lax.scan(body, (u0, u1), jnp.arange(1, nsteps + 1))
    return u, jnp.concatenate([u0[None], u1[None], traj[:-1]], axis=0)


def _tank_laplacian(u, p: float):
    """p-scaled 5-point Laplacian with mirrored (Neumann) walls
    (lab14_p1.py:45-52)."""
    lap = jnp.zeros_like(u)
    lap = lap.at[1:-1, 1:-1].set(
        p * (u[2:, 1:-1] + u[1:-1, 2:] - 4 * u[1:-1, 1:-1]
             + u[:-2, 1:-1] + u[1:-1, :-2])
    )
    lap = lap.at[0, 1:-1].set(
        p * (2 * u[1, 1:-1] + u[0, 2:] - 4 * u[0, 1:-1] + u[0, :-2])
    )
    lap = lap.at[-1, 1:-1].set(
        p * (u[-1, 2:] - 4 * u[-1, 1:-1] + 2 * u[-2, 1:-1] + u[-1, :-2])
    )
    lap = lap.at[1:-1, 0].set(
        p * (u[2:, 0] + 2 * u[1:-1, 1] - 4 * u[1:-1, 0] + u[:-2, 0])
    )
    lap = lap.at[1:-1, -1].set(
        p * (u[2:, -1] - 4 * u[1:-1, -1] + u[:-2, -1] + 2 * u[1:-1, -2])
    )
    return lap


def _average_corners(u):
    u = u.at[0, 0].set(0.5 * (u[0, 1] + u[1, 0]))
    u = u.at[0, -1].set(0.5 * (u[0, -2] + u[1, -1]))
    u = u.at[-1, 0].set(0.5 * (u[-2, 0] + u[-1, 1]))
    u = u.at[-1, -1].set(0.5 * (u[-2, -1] + u[-1, -2]))
    return u


def tank_wave_2d(u0, nsteps: int, k: float, p: float = 0.4,
                 damping: float = 4.0):
    """Damped 2-D wave with Neumann walls; first step applies the zero-
    velocity condition (lab14_p1.py:54-58)."""
    u_first = _average_corners(u0 + 0.5 * _tank_laplacian(u0, p))

    def body(carry, _):
        u_prev, u = carry
        lap = _tank_laplacian(u, p)
        u_new = (2 * u - (1 - 0.5 * damping * k) * u_prev + lap) / (
            1 + 0.5 * damping * k
        )
        u_new = _average_corners(u_new)
        return (u, u_new), None

    (_, u), _ = lax.scan(body, (u0, u_first), None, length=max(nsteps - 1, 0))
    return u
