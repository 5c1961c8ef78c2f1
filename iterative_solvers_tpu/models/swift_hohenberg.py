"""Swift–Hohenberg pattern-formation workload, TPU-native.

Re-expresses the reference's four Swift–Hohenberg implementations
(sh_scipy_nk.py, sh_linearised.py, sh_vscode_nk.py, cpp main.cpp — SURVEY.md
§2.9-2.10) as pure jitted functions on 2-D ``(N, N)`` fields:

    du/dt = L u + g u^2 - u^3,   L = -(1 + lap)^2 + r  (periodic)

with the reference's discrete form ``L = -Lap^2 - 2 Lap + (r-1) I`` built
matrix-free from the 5-point periodic Laplacian (ops.stencils).

Two steppers, matching the reference:
- :func:`cn_step` — Crank–Nicolson residual solved by Newton–Krylov
  (sh_scipy_nk.py:47-61; C++ main.cpp:19-32,94-107).
- :func:`semi_implicit_step` — linearised lagged-nonlinearity step
  ``(I + D - kL/2) u+ = (I + kL/2) u`` (sh_linearised.py:51-57); the
  reference uses a sparse direct solve, here it is a (preconditioned)
  GMRES solve — the TPU-native equivalent of ``spsolve``.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.stencils import lap_periodic, sh_linear_operator
from ..ops.pallas_stencil import sh_operator_pallas
from ..solvers.newton import NewtonKrylov, NewtonResult
from ..solvers.gmres import gmres


@dataclasses.dataclass(frozen=True)
class SHConfig:
    """Reference defaults: sh_scipy_nk.py:15-29."""

    d: float = 40.0      # domain size
    n: int = 64          # points per direction
    k: float = 0.2       # time step
    r: float = 0.01      # bifurcation parameter
    g: float = 1.0       # quadratic coefficient

    @property
    def h(self) -> float:
        return self.d / self.n


def apply_L(u, cfg: SHConfig):
    """Apply L = -Lap^2 - 2 Lap + (r-1) I.

    Routes through the fused double-buffered Pallas kernel on TPU for f32
    fields on large evenly-blocked grids (the production inner-Krylov path —
    3-8x the XLA stencil at 2048²+); everything else (f64 outer residuals,
    CPU tests, small grids) takes the XLA shifted-slice pipeline, which is
    numerically identical to f32/f64 roundoff.  Note: the Pallas path has no
    JVP rule — use ``jvp_mode="fd"`` or the analytic ``matvec_factory``
    (both are the defaults here) when it is active.
    """
    return sh_operator_pallas(u, cfg.h, cfg.r)


def cn_residual(u, u_old, L_uold, cfg: SHConfig):
    """Crank–Nicolson residual (sh_scipy_nk.py:47-49):

    F(u) = (u - u_old)/k - (L u + g u^2 - u^3 + L u_old + g u_old^2 - u_old^3)/2
    """
    uu = u * u
    uo2 = u_old * u_old
    rhs_new = apply_L(u, cfg) + cfg.g * uu - u * uu
    rhs_old = L_uold + cfg.g * uo2 - u_old * uo2
    return (u - u_old) / cfg.k - (rhs_new + rhs_old) / 2.0


def jacobian_matvec_factory(cfg: SHConfig, inner_dtype=None):
    """Analytic Jacobian of the CN residual for NewtonKrylov.matvec_factory:

    ``J v = v/k - (L v + (2 g u - 3 u^2) v) / 2`` — exact, linear in v, and
    evaluated entirely in the inner (f32) dtype on TPU.
    """

    def factory(x, fx):
        coef = 2.0 * cfg.g * x - 3.0 * x * x
        if inner_dtype is not None:
            coef = coef.astype(inner_dtype)

        def mv(v):
            return v / cfg.k - (apply_L(v, cfg) + coef * v) / 2.0

        return mv

    return factory


def fast_solver(cfg: SHConfig, f_tol: float = 6e-6, inner_m: int = 10,
                outer_k: int = 5) -> NewtonKrylov:
    """TPU-tuned JFNK for the SH workload: analytic f32 Jacobian matvecs +
    f32 inner Krylov, f64 outer residuals — converges to the same f_tol with
    the same Newton counts as the pure-f64 scipy-parity configuration."""
    return NewtonKrylov(
        f_tol=f_tol, inner_m=inner_m, outer_k=outer_k,
        inner_dtype="float32",
        matvec_factory=jacobian_matvec_factory(cfg, "float32"),
    )


def make_cn_step(cfg: SHConfig, solver: NewtonKrylov | None = None):
    """Returns a jittable ``step(u_old) -> (u_new, NewtonResult)``."""
    if solver is None:
        # scipy newton_krylov defaults: f_tol = eps**(1/3) ≈ 6e-6
        solver = NewtonKrylov(maxiter=100)

    def step(u_old):
        L_uold = apply_L(u_old, cfg)
        res = solver.solve(partial(cn_residual, u_old=u_old, L_uold=L_uold,
                                   cfg=cfg), u_old)
        return res.x, res

    return step


def evolve_cn(u0, nsteps: int, cfg: SHConfig,
              solver: NewtonKrylov | None = None):
    """Run ``nsteps`` CN/JFNK steps under one jit (lax.scan over steps)."""
    step = make_cn_step(cfg, solver)

    def body(u, _):
        u_new, res = step(u)
        return u_new, (res.iters, res.f_norm)

    u_final, (iters, f_norms) = lax.scan(body, u0, None, length=nsteps)
    return u_final, iters, f_norms


def semi_implicit_step(u, u_old, cfg: SHConfig, *, tol=1e-10, restart=40,
                       maxiter=400):
    """Linearised step of sh_linearised.py:51-57.

    D = diag((5u - u_old)^2 k/16 - g k u); solve
    ``(I + D - kL/2) u_new = (I + kL/2) u``.

    The operator is elliptic and diagonally dominated; Jacobi (diagonal of
    I + D plus the constant stencil diagonal) makes a cheap right
    preconditioner.
    """
    k = cfg.k
    D = (5.0 * u - u_old) ** 2 * (k / 16.0) - cfg.g * k * u
    b = u + (k / 2.0) * apply_L(u, cfg)

    def matvec(v):
        return v + D * v - (k / 2.0) * apply_L(v, cfg)

    # diagonal of L: -(diag(Lap^2)) - 2 diag(Lap) + (r-1); diag(Lap) = -4/h^2,
    # diag(Lap^2) = 20/h^4 for the periodic 5-point stencil
    h2 = cfg.h * cfg.h
    diag_L = -(20.0 / (h2 * h2)) + 8.0 / h2 + (cfg.r - 1.0)
    diag = 1.0 + D - (k / 2.0) * diag_L
    res = gmres(matvec, b, x0=u, tol=tol, restart=restart, maxiter=maxiter,
                M=lambda v: v / diag)
    return res.x, res


def evolve_semi_implicit(u0, nsteps: int, cfg: SHConfig, **kw):
    """sh_linearised.py main loop: u_old lags one step behind u."""

    def body(carry, _):
        u, u_old = carry
        u_new, _ = semi_implicit_step(u, u_old, cfg, **kw)
        return (u_new, u), None

    (u, _), _ = lax.scan(body, (u0, u0), None, length=nsteps)
    return u
