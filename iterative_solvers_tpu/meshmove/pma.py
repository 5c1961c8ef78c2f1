"""Parabolic Monge–Ampère spectral mesh solver.

TPU-native form of the reference's ``solve_PMA``/``loop_pma``
(droplet.py:578-599, PMA2_nk.py:393-403):

    dQ/dt = [alpha (I - gamma lap_ksi)]^{-1} sqrt(mon |J|)

applied spectrally — forward 2-D DCT, pointwise divide by ``1 - gamma Leig``,
inverse DCT — with the DCTs as MXU matmuls (ops.dct).  ``Leig`` uses the
reference's exact eigenvalue array (droplet.py:830-833), including its
``/(dksi*deta)`` normalisation for both axes.

``loop_pma`` runs the PMA sub-iteration (re-deriving mesh geometry, the
solution's physical derivatives, and the smoothed monitor each pass, then an
explicit Euler update of Q) as a ``lax.fori_loop`` — one compiled loop, no
host round trips, in contrast to the reference's 400-iteration Python loop at
2.1 ms/iter (BASELINE.md row 3).
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core.grid import Grid2D
from ..ops import curvilinear
from ..ops.dct import dct2, idct2
from .monitor import smooth_and_regularise


@dataclasses.dataclass(frozen=True)
class PMAParams:
    """Mesh-adaptivity knobs (droplet.py:41-45, PMA2_nk.py:27-31)."""

    alpha: float = 0.01        # mesh adaption speed
    gamma: float = 0.1         # smoothing extent
    mackenzie_c: float = 1.0   # Mackenzie constant (0.15 for droplet)
    smoothing_iters: int = 4
    spectral_dtype: str | None = None
    # e.g. "float32": run the DCT matmuls (the O(N^3) part of the mesh
    # solve) in reduced precision — f64 matmuls are emulated on TPU and
    # dominate at large grids, while the mesh velocity tolerates ~1e-6
    # relative noise (it is integrated with tiny explicit dtmesh steps).
    # None keeps the state dtype (parity mode).
    spectral_precision: str = "highest"
    # MXU precision of the DCT matmuls: "highest" (full f32, 6 bf16
    # passes) or "high" (3 passes, ~5e-7 relative — inside the mesh
    # velocity's ~1e-6 noise budget, half the MXU cost at large grids).
    # "default" (bf16, ~1e-3) is the r3 on-chip NaN class and is rejected.
    monitor_cap: float | None = None
    # bound the smoothed monitor at cap x its Mackenzie floor (bounded
    # mesh-compression regularisation for resolved-interface fine grids —
    # see meshmove.monitor.smooth_and_regularise).  None = reference-exact.
    mesh_dtype: str | None = None
    # e.g. "float32": run the ENTIRE PMA sub-iteration (geometry, monitor
    # smoothing, spectral solve, Euler update) in reduced precision —
    # f64 elementwise ops are ~5-15x emulated on TPU, and the mesh
    # sub-loop is the bulk of a droplet step's wall time.  The mesh is a
    # coordinate map integrated with tiny explicit steps; f32 noise in it
    # perturbs the *discretisation*, not the converged solution (the JFNK
    # solve still runs at the outer dtype on whatever mesh it is given).
    # Pair with the deviation-form geometry at fine grids.  None keeps the
    # state dtype (parity mode).


@lru_cache(maxsize=16)
def pma_leig(grid: Grid2D) -> np.ndarray:
    """Reference eigenvalue array for the (I - gamma lap) DCT solve.

    droplet.py:830-833: ``(2 cos(pi i/(Ny-1)) - 2) + (2 cos(pi j/(Nx-1)) - 2)``
    over ``dksi * deta`` (the reference divides *both* axes' eigenvalues by
    the mixed spacing product; reproduced exactly).
    """
    ey = 2.0 * np.cos(np.pi * np.arange(grid.ny) / (grid.ny - 1)) - 2.0
    ex = 2.0 * np.cos(np.pi * np.arange(grid.nx) / (grid.nx - 1)) - 2.0
    return (ey[:, None] + ex[None, :]) / (grid.dx * grid.dy)


def solve_pma(mon, jac, grid: Grid2D, params: PMAParams):
    """dQ/dt from a smoothed monitor and mesh Jacobian (droplet.py:578-588)."""
    q_rhs = jnp.sqrt(mon * jnp.abs(jac)) / params.alpha
    out_dtype = q_rhs.dtype
    if params.spectral_dtype is not None:
        q_rhs = q_rhs.astype(params.spectral_dtype)
    leig = jnp.asarray(pma_leig(grid), dtype=q_rhs.dtype)
    if params.spectral_precision not in ("highest", "high"):
        # not an assert: -O must not let "default" (bf16 MXU passes, the r3
        # on-chip NaN class) fall through to the else branch below
        raise ValueError(
            f"spectral_precision={params.spectral_precision!r}: only "
            "'highest'/'high' are allowed (bf16-pass spectral matmuls NaN "
            "the mesh on chip, r3 root cause)")
    prec = (lax.Precision.HIGHEST if params.spectral_precision == "highest"
            else lax.Precision.HIGH)
    dqdt = idct2(dct2(q_rhs, precision=prec) / (1.0 - params.gamma * leig),
                 precision=prec)
    return dqdt.astype(out_dtype)


def neumann_laplacian(v, grid: Grid2D):
    """3-point computational-space Laplacian with half-sample-symmetric
    (DCT-II) Neumann closure, over the reference's mixed ``dx*dy`` spacing.

    This is the stencil form of the operator the spectral PMA solve inverts:
    the DCT-II basis diagonalises it exactly with eigenvalues
    ``(2 cos(pi k / N) - 2) / (dx dy)`` per axis.  (The reference's ``Leig``
    uses ``pi k / (N-1)`` frequencies — droplet.py:830-833, an O(1/N)
    inconsistency reproduced verbatim in :func:`pma_leig`; the iterative
    path below solves the *consistent* operator instead.)

    Being a width-1 stencil, it is the distribution-friendly PMA operator:
    sharded application needs only a 1-row halo exchange (see dist.droplet),
    vs the all-gather-heavy distributed DCT matmuls.
    """
    lap_y = (jnp.concatenate([v[1:2] - v[:1],
                              v[:-2] + v[2:] - 2.0 * v[1:-1],
                              v[-2:-1] - v[-1:]], axis=0))
    lap_x = (jnp.concatenate([v[:, 1:2] - v[:, :1],
                              v[:, :-2] + v[:, 2:] - 2.0 * v[:, 1:-1],
                              v[:, -2:-1] - v[:, -1:]], axis=1))
    return (lap_y + lap_x) / (grid.dx * grid.dy)


def shifted_neumann_eig_bounds(grid: Grid2D, gamma: float):
    """Exact extreme eigenvalues of ``I - gamma * neumann_laplacian``."""
    ey = 2.0 - 2.0 * np.cos(np.pi * (grid.ny - 1) / grid.ny)
    ex = 2.0 - 2.0 * np.cos(np.pi * (grid.nx - 1) / grid.nx)
    return 1.0, 1.0 + gamma * (ey + ex) / (grid.dx * grid.dy)


def solve_shifted_neumann(rhs, grid: Grid2D, params: PMAParams, *,
                          method: str = "chebyshev", tol: float = 1e-8,
                          lap: Callable | None = None, maxiter: int = 2000):
    """Iteratively solve ``(I - gamma lap_neumann) x = rhs`` — the
    halo-only alternative to the spectral PMA solve (SURVEY §7's planned
    "Krylov solve of (I - gamma grad^2)"; VERDICT round-1 item 7).

    ``method="chebyshev"`` runs a fixed-count Chebyshev iteration with the
    *exact* analytic eigenvalue bounds — zero inner products, so a sharded
    run communicates only the stencil halos (no all-reduces at all).
    ``method="cg"`` uses conjugate gradients (inner products become psums
    when sharded).  ``lap`` overrides the Laplacian application (e.g. the
    explicit-halo sharded chain from dist.droplet).
    """
    gamma = params.gamma
    lap_fn = lap if lap is not None else (lambda v: neumann_laplacian(v, grid))
    op = lambda v: v - gamma * lap_fn(v)
    lam_min, lam_max = shifted_neumann_eig_bounds(grid, gamma)

    if method == "cg":
        from ..solvers.cg import cg

        return cg(op, rhs, tol=tol, maxiter=maxiter).x

    # Chebyshev iteration (Saad, "Iterative Methods for Sparse Linear
    # Systems", alg. 12.1) with a static iteration count from the
    # convergence factor rho = (sqrt(kappa)-1)/(sqrt(kappa)+1)
    kappa = lam_max / lam_min
    conv = (np.sqrt(kappa) - 1.0) / (np.sqrt(kappa) + 1.0)
    iters = min(maxiter,
                max(3, int(np.ceil(np.log(tol / 2.0) / np.log(conv)))))
    theta = jnp.asarray((lam_max + lam_min) / 2.0, rhs.dtype)
    delta = jnp.asarray((lam_max - lam_min) / 2.0, rhs.dtype)
    sigma = theta / delta

    def body(_, state):
        x, r, dvec, rho_prev = state
        x = x + dvec
        r = r - op(dvec)
        rho = 1.0 / (2.0 * sigma - rho_prev)
        dvec = rho * rho_prev * dvec + (2.0 * rho / delta) * r
        return (x, r, dvec, rho)

    x0 = jnp.zeros_like(rhs)
    state = (x0, rhs, rhs / theta, 1.0 / sigma)
    x, r, dvec, _ = lax.fori_loop(0, iters, body, state)
    return x


def pma_dqdt(q, u, grid: Grid2D, params: PMAParams,
             monitor_source: Callable, geometry_fn: Callable | None = None):
    """Full chain: geometry -> monitor source -> smoothing -> spectral solve.

    ``monitor_source(u, geom, grid)`` returns the raw adaptivity field (model
    specific — |lap u|^2, arclength, or 1/(1+u)^6; see models.*).
    ``geometry_fn`` defaults to the full-potential ``mesh_geometry``; pass
    ``curvilinear.mesh_geometry_dev`` to run on deviation potentials (the
    f32-robust large-grid form — ``q`` then holds phi).
    """
    geom = (geometry_fn or curvilinear.mesh_geometry)(q, grid)
    src = monitor_source(u, geom, grid)
    mon = smooth_and_regularise(
        src, geom.jac, grid.dx, grid.dy,
        smoothing_iters=params.smoothing_iters,
        mackenzie_c=params.mackenzie_c,
        cap=params.monitor_cap,
    )
    return solve_pma(mon, geom.jac, grid, params)


def loop_pma(q, u, dt: float, loops: int, grid: Grid2D, params: PMAParams,
             monitor_source: Callable, geometry_fn: Callable | None = None):
    """``loops`` explicit PMA sub-steps (droplet.py:590-599) under one jit.

    With ``params.mesh_dtype`` set, the whole sub-loop runs in that dtype —
    the TPU fast path for f64 states.  The loop carries the accumulated
    *increment* separately (``q0 + acc``), not the updated potential: the
    per-step update ``dt * dqdt`` is ~1e-9 of ``q``'s magnitude, far below
    f32 ULP, so naively casting ``q`` would quantise the updates away;
    the increment itself is small-scale and accumulates accurately.
    """
    if params.mesh_dtype is None:
        def body(_, q):
            dqdt = pma_dqdt(q, u, grid, params, monitor_source, geometry_fn)
            return q + dt * dqdt

        return lax.fori_loop(0, loops, body, q)

    md = params.mesh_dtype
    q0 = q.astype(md)
    um = u.astype(md)

    def body(_, acc):
        dqdt = pma_dqdt(q0 + acc, um, grid, params, monitor_source,
                        geometry_fn)
        return acc + jnp.asarray(dt, md) * dqdt

    acc = lax.fori_loop(0, loops, body, jnp.zeros_like(q0))
    return q + acc.astype(q.dtype)


def mesh_steady_state(q, u, dt: float, grid: Grid2D, params: PMAParams,
                      monitor_source: Callable, atol: float,
                      max_iters: int = 10000):
    """Iterate the PMA to mesh steady state (reference ``check_mesh``,
    droplet.py:250-314): stop when ``max ||delta(x, y)||_2 < atol``.

    Returns (q, iterations, converged).
    """

    def cond(state):
        q, x_old, y_old, i, diff = state
        return (diff >= atol) & (i < max_iters)

    def body(state):
        q, x_old, y_old, i, _ = state
        dqdt = pma_dqdt(q, u, grid, params, monitor_source)
        q_new = q + dt * dqdt
        geom = curvilinear.mesh_geometry(q_new, grid)
        diff = jnp.max(jnp.sqrt((geom.x - x_old) ** 2 + (geom.y - y_old) ** 2))
        return (q_new, geom.x, geom.y, i + 1, diff)

    geom0 = curvilinear.mesh_geometry(q, grid)
    state = (q, geom0.x, geom0.y, jnp.int32(0),
             jnp.asarray(jnp.inf, q.dtype))
    q, _, _, iters, diff = lax.while_loop(cond, body, state)
    return q, iters, diff < atol
