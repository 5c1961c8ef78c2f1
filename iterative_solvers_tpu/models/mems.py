"""MEMS / touchdown workload on an adaptive moving mesh.

TPU-native form of the reference's PMA2_nk.py (operator-split Crank–Nicolson
JFNK; SURVEY.md §2.8, §3.3) and of PMA.py's coupled method-of-lines variant:

    du/dt = -(-lap)^p u * beta^2 - lambda/(1+u)^2 + lambda eps^(m-2)/(1+u)^m

on the moving mesh (p=1 Laplacian or p=2 biharmonic via a double application
of the curvilinear Laplacian), with homogeneous boundary values, the
``1/(1+u)^6`` monitor (epsilon=0), the adaptive near-touchdown time step
``dt = k min (1+u)^3`` (``compute_g``, PMA2_nk.py:446-450), and an explicit
PMA mesh update per physical step.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.grid import Grid2D
from ..ops import curvilinear, stencils
from ..ops.curvilinear import MeshGeometry
from ..meshmove.pma import PMAParams, solve_pma
from ..meshmove.monitor import smooth_and_regularise
from ..solvers.newton import NewtonKrylov


@dataclasses.dataclass(frozen=True)
class MEMSConfig:
    """Reference globals PMA2_nk.py:22-40."""

    n: int = 51
    p: int = 2               # 1: Laplacian, 2: biharmonic
    m: int = 3               # 3: Van der Waals, 4: Casimir
    alpha: float = 0.1
    gamma: float = 0.1
    epsilon: float = 0.0
    beta: float = 0.15
    lambd: float = 1.0
    smoothing_iters: int = 4
    k: float = 1e-4          # base time step
    tf: float = 0.3

    @property
    def grid(self) -> Grid2D:
        return Grid2D(nx=self.n, ny=self.n, xl=-1, xr=1, yb=-1, yt=1)

    @property
    def pma(self) -> PMAParams:
        return PMAParams(alpha=self.alpha, gamma=self.gamma, mackenzie_c=1.0,
                         smoothing_iters=self.smoothing_iters)


def lap_xy_raw(v, geom: MeshGeometry, grid: Grid2D):
    """Curvilinear Laplacian with raw first derivatives (PMA2_nk residual
    convention — no boundary zeroing of v_ksi/v_eta)."""
    v_ksi = stencils.d1_x(v, grid.dx)
    v_eta = stencils.d1_y(v, grid.dy)
    vxx, vyy = curvilinear.laplace(v, v_ksi, v_eta, geom, grid)
    return vxx + vyy


def rhs_pde(u, geom: MeshGeometry, cfg: MEMSConfig):
    """du/dt excluding the (disabled) Lagrangian mesh-advection term
    (PMA2_nk.py:405-419); zero on the boundary."""
    grid = cfg.grid
    rhs = -cfg.lambd / (1.0 + u) ** 2 + cfg.lambd * (
        cfg.epsilon ** (cfg.m - 2)
    ) / (1.0 + u) ** cfg.m
    lap_u = lap_xy_raw(u, geom, grid)
    if cfg.p == 1:
        rhs = rhs + cfg.beta * cfg.beta * lap_u
    else:
        rhs = rhs - cfg.beta * cfg.beta * lap_xy_raw(lap_u, geom, grid)
    bdy = jnp.asarray(grid.mask_boundary)
    return jnp.where(bdy, 0.0, rhs)


def lagrangian_term(u, q_dt, geom: MeshGeometry, cfg: MEMSConfig):
    """Upwinded mesh-advection term grad_x{u} . grad_ksi{Q_t}
    (PMA2_nk.py:421-444 — implemented there but never enabled; provided here
    for completeness, with the *correctly scaled* upwind differences, see the
    stencils.py note on the reference's inert 1/(2h) bug)."""
    grid = cfg.grid
    a = stencils.d1_x(q_dt, grid.dx)
    b = stencils.d1_y(q_dt, grid.dy)
    uf_x = stencils.d1_x_forward(u, grid.dx)
    ub_x = stencils.d1_x_backward(u, grid.dx)
    uf_y = stencils.d1_y_forward(u, grid.dy)
    ub_y = stencils.d1_y_backward(u, grid.dy)
    j = geom.jac
    am, ap = jnp.minimum(a, 0), jnp.maximum(a, 0)
    bm, bp = jnp.minimum(b, 0), jnp.maximum(b, 0)
    ret = am * (bp * (geom.yy * ub_x - geom.xy * uf_y) / j
                + bm * (geom.yy * ub_x - geom.xy * ub_y) / j) \
        + ap * (bp * (geom.yy * uf_x - geom.xy * uf_y) / j
                + bm * (geom.yy * uf_x - geom.xy * ub_y) / j)
    ret = ret + am * (bp * (-geom.xy * ub_x + geom.xx * uf_y) / j
                      + bm * (-geom.xy * ub_x + geom.xx * ub_y) / j) \
        + ap * (bp * (-geom.xy * uf_x + geom.xx * uf_y) / j
                + bm * (-geom.xy * uf_x + geom.xx * ub_y) / j)
    return ret


def monitor_source(u, geom: MeshGeometry, grid: Grid2D, cfg: MEMSConfig):
    """PMA2_nk.py:345-367 monitor selection."""
    if cfg.epsilon == 0:
        return 1.0 / (1.0 + u) ** 6
    v_ksi = stencils.d1_x(u, grid.dx)
    v_eta = stencils.d1_y(u, grid.dy)
    if cfg.p == 1:
        ux, uy = curvilinear.grad_xy(v_ksi, v_eta, geom)
        return 1.0 + ux * ux + uy * uy
    uxx, uyy = curvilinear.laplace(u, v_ksi, v_eta, geom, grid)
    return jnp.abs(uxx + uyy) ** 2


def compute_g(u, cfg: MEMSConfig):
    """Adaptive step factor: min (1+u)^3 near touchdown (PMA2_nk.py:446)."""
    if cfg.epsilon == 0:
        return jnp.min((1.0 + u) ** 3)
    return jnp.asarray(1.0, u.dtype)


def cn_residual(u, u_old, cn_term, dt, geom: MeshGeometry, cfg: MEMSConfig):
    """Crank–Nicolson residual (PMA2_nk.py:121-159):
    F(u) = (u - u_old)/dt - (rhs(u) + rhs(u_old))/2, with rhs zeroed on the
    boundary (the geometry is frozen at the old mesh during the solve)."""
    return (u - u_old) / dt - (rhs_pde(u, geom, cfg) + cn_term) / 2.0


class MEMSStepResult(NamedTuple):
    u: jax.Array
    q: jax.Array
    dt: jax.Array
    newton_iters: jax.Array
    converged: jax.Array


def make_step(cfg: MEMSConfig, solver: NewtonKrylov | None = None):
    """One operator-split step (PMA2_nk.py:80-106): geometry -> adaptive dt
    -> PMA dQ/dt -> CN/JFNK update of u -> explicit mesh update."""
    if solver is None:
        solver = NewtonKrylov()
    grid = cfg.grid

    def step(u, q):
        geom = curvilinear.mesh_geometry(q, grid)
        dt = compute_g(u, cfg) * cfg.k
        src = monitor_source(u, geom, grid, cfg)
        mon = smooth_and_regularise(src, geom.jac, grid.dx, grid.dy,
                                    cfg.smoothing_iters, 1.0)
        q_dt = solve_pma(mon, geom.jac, grid, cfg.pma)
        cn_term = rhs_pde(u, geom, cfg)
        res = solver.solve(
            partial(cn_residual, u_old=u, cn_term=cn_term, dt=dt, geom=geom,
                    cfg=cfg),
            u,
        )
        q_new = q + dt * q_dt
        return MEMSStepResult(u=res.x, q=q_new, dt=dt,
                              newton_iters=res.iters, converged=res.converged)

    return step


def initial_state(cfg: MEMSConfig, dtype=jnp.float64):
    """u = 0, Q = (ksi^2 + eta^2)/2 (PMA2_nk.py:68-71)."""
    grid = cfg.grid
    q = 0.5 * (grid.xx_op(dtype) ** 2 + grid.yy_op(dtype) ** 2)
    u = jnp.zeros(grid.shape, dtype)
    return u, q


def coupled_rhs(t, y, cfg: MEMSConfig):
    """Method-of-lines RHS of the *coupled* (u, Q) system — the PMA.py
    formulation (ode_coupled_systems, PMA.py:377-415): mesh and solution
    evolve as one stiff ODE system.  ``y`` stacks [u, q] as (2, n, n)."""
    grid = cfg.grid
    u, q = y[0], y[1]
    geom = curvilinear.mesh_geometry(q, grid)
    src = monitor_source(u, geom, grid, cfg)
    mon = smooth_and_regularise(src, geom.jac, grid.dx, grid.dy,
                                cfg.smoothing_iters, 1.0)
    dqdt = solve_pma(mon, geom.jac, grid, cfg.pma)
    dudt = rhs_pde(u, geom, cfg)
    return jnp.stack([dudt, dqdt])


def evolve_coupled(cfg: MEMSConfig, tf: float, bdf=None, u0=None, q0=None):
    """Integrate the coupled system to ``tf`` with the adaptive BDF/JFNK
    integrator (the reference hands it to scipy's BDF — PMA.py:68)."""
    from ..solvers.bdf import BDF

    if bdf is None:
        bdf = BDF()
    if u0 is None or q0 is None:
        u0, q0 = initial_state(cfg)
    y0 = jnp.stack([u0, q0])
    res = bdf.solve(partial(coupled_rhs, cfg=cfg), y0, 0.0, tf)
    return res.y[0], res.y[1], res


def evolve(cfg: MEMSConfig, nsteps: int, solver: NewtonKrylov | None = None,
           u0=None, q0=None):
    """Fixed-step-count evolution under one jit (time horizon emerges from
    the adaptive dt; the reference loops while t < Tf)."""
    step = make_step(cfg, solver)
    if u0 is None or q0 is None:
        u0, q0 = initial_state(cfg)

    def body(carry, _):
        u, q, t = carry
        out = step(u, q)
        return (out.u, out.q, t + out.dt), (out.dt, out.newton_iters)

    (u, q, t), (dts, iters) = lax.scan(body, (u0, q0, 0.0), None,
                                       length=nsteps)
    return u, q, t, dts, iters
