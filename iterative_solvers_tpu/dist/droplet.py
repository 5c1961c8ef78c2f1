"""Explicit-halo distributed droplet step (VERDICT round-1 item 5).

Row-shards the droplet workload (reference droplet.py:360-411 — the
curvilinear CN residual, the monitor/smoothing chain, and the PMA mesh
solve) over a 1-D device mesh with *explicit* halo exchange, replacing the
GSPMD-only distribution of round 1:

- every operator chain is lifted with :func:`..dist.halo.sharded_y_chain`,
  so each residual/monitor evaluation does ONE fused ppermute halo exchange
  per input field instead of one collective-permute per stencil (what GSPMD
  inserts), and the one-sided boundary rows (droplet.py:601-681's three
  rings) are evaluated exactly on the global edge shards;
- Krylov/Newton reductions stay at the global level (GSPMD all-reduces);
- the PMA mesh solve is selectable: the spectral DCT path (MXU matmuls,
  all-gather-heavy when sharded) or the iterative Chebyshev/CG path
  (meshmove.pma.solve_shifted_neumann) whose only communication is the
  width-1 halo of the 3-point Laplacian.

The x direction stays local to each shard (columns replicated): the
curvilinear operator's x-direction one-sided formulas are the deep ones,
and a 1-D row decomposition over all chips is the natural layout for the
``(Ny, Nx)`` fields at production sizes.  State is carried as the
*deviation* potential phi (Q = identity + phi, ops.curvilinear
mesh_geometry_dev) — the f32-robust large-grid form.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..core.grid import Grid2D
from ..models import droplet as dp
from ..ops import curvilinear, stencils
from ..meshmove.monitor import smooth_pass
from ..meshmove import pma
from ..solvers.newton import NewtonKrylov
from .halo import sharded_y_chain, sharded_xy_chain

# Influence depth of the deepest chain (residual/pde_rhs): phi reaches the
# output through geometry (radius 2) -> laplace metric terms (radius 3) ->
# pressure gradient (radius 2) -> flux divergence (radius 2) = 9; one-sided
# edge formulas at rows <= 2 spread the same way.  12 adds safety margin —
# the sharded == single-device tests in tests/test_dist_droplet.py would
# catch an underestimate.
DEPTH_RESIDUAL = 12
DEPTH_MONITOR = 12   # monitor_source (<= 8) + 4 smoothing passes
DEPTH_GEOM = 4       # geometry derivatives (radius 2, specials depth 2)


class ShardedDropletOps(NamedTuple):
    """Jit-composable distributed operators on globally-sharded arrays."""

    residual: callable        # (u, u_old, F, phi, dt) -> r
    pde_rhs: callable         # (u, phi) -> F
    monitor: callable         # (u, phi) -> (smoothed mon, jac)
    pma_dqdt: callable        # (phi, u) -> dphi/dt
    loop_pma: callable        # (phi, u, dtmesh, loops) -> phi
    step: callable            # (u, phi, dt, dtmesh, pma_loops) -> result
    sharding: NamedSharding


def make_sharded_ops(cfg: "dp.DropletConfig", mesh: Mesh,
                     axis_name: str = "y",
                     pma_solver: str = "spectral",
                     solver: NewtonKrylov | None = None,
                     x_axis_name: str | None = None,
                     jvp_dtype: str | None = None) -> ShardedDropletOps:
    """Build the explicit-halo distributed droplet operators.

    ``pma_solver``: "spectral" (DCT matmuls at the global level) or
    "chebyshev" / "cg" (iterative shifted-Neumann solve whose operator is a
    width-1 sharded halo chain — see meshmove.pma.solve_shifted_neumann).

    ``x_axis_name``: name of a second (column) mesh axis for 2-D block
    decomposition — every chain is then lifted with
    :func:`..dist.halo.sharded_xy_chain` (edge strips + corner patches),
    so the explicit path runs on a ``(py, px)`` mesh instead of rows-only.
    Defaults to rows-only when omitted or when the mesh lacks the axis.

    ``jvp_dtype="float32"`` is the PRODUCTION inner-Krylov configuration
    (VERDICT r4 item 5 — models.droplet.make_step's fast path, distributed):
    the Newton matvec becomes the *exact* JVP (jax.jvp) of the f32-cast
    sharded residual chain — forward-mode differentiates straight through
    the shard_map/ppermute halo exchanges — and the LGMRES cycle runs in
    f32 (``inner_dtype``), while outer residuals, line search, and
    convergence checks stay at the state dtype.  Halo traffic in the inner
    loop halves (f32 edges), and the O(m^2 n) orthogonalisation runs
    native-speed instead of f64-emulated.
    """
    grid = cfg.grid
    two_d = (x_axis_name is not None
             and x_axis_name in mesh.axis_names
             and mesh.shape[x_axis_name] > 1)
    spec = P(axis_name, x_axis_name) if two_d else P(axis_name, None)
    import inspect

    _check_kw = ("check_vma" if "check_vma"
                 in inspect.signature(shard_map).parameters else "check_rep")
    smap = partial(shard_map, mesh=mesh, **{_check_kw: False})

    def _lift(chain, depth):
        if two_d:
            return sharded_xy_chain(chain, depth, (axis_name, x_axis_name))
        return sharded_y_chain(chain, depth, axis_name)

    def sharded(chain, depth, n_in):
        return smap(_lift(chain, depth),
                    in_specs=(spec,) * n_in, out_specs=spec)

    def _coords(ref):
        # in-graph lazy broadcasts (grid.xx_op) rather than closed-over
        # device arrays: a closed-over (Ny, Nx) f64 coordinate plane becomes
        # an O(n²) literal in every jitted graph using these ops (134 MB at
        # 4096² — overflows the remote-compile request limit).  The returned
        # ops are meant to be consumed under jit (the production path), where
        # the broadcast is free; eager callers pay a per-call materialisation.
        return grid.xx_op(ref.dtype), grid.yy_op(ref.dtype)

    def _geom(phi, xxb, yyb):
        return curvilinear.mesh_geometry_dev(phi, grid, coords=(xxb, yyb))

    # -- residual / rhs chains (single-device bodies, reused verbatim) ------
    def _residual_chain(dt, u, u_old, F, phi, xxb, yyb):
        geom = _geom(phi, xxb, yyb)
        u_ksi = stencils.d1_x(u, grid.dx)
        u_eta = stencils.d1_y(u, grid.dy)
        u_xx, u_yy = curvilinear.laplace(u, u_ksi, u_eta, geom, grid)
        p = dp.pressure(u, u_xx, u_yy, cfg)
        p_dx, p_dy = dp.pressure_grad_xy(p, geom, grid)
        F2 = dp._flux_divergence(p_dx, p_dy, u, geom, grid, cfg)
        return (u - u_old) - dt * (F2 + F) / 2.0

    def residual(u, u_old, F, phi, dt):
        body = sharded(partial(_residual_chain, dt), DEPTH_RESIDUAL, 6)
        xx, yy = _coords(phi)
        return body(u, u_old, F, phi, xx, yy)

    def _pde_rhs_chain(u, phi, xxb, yyb):
        geom = _geom(phi, xxb, yyb)
        u_ksi, u_eta = curvilinear.grad_ksi_neumann(u, grid, quirk=True)
        u_xx, u_yy = curvilinear.laplace(u, u_ksi, u_eta, geom, grid)
        p = dp.pressure(u, u_xx, u_yy, cfg)
        p_dx, p_dy = dp.pressure_grad_xy(p, geom, grid)
        return dp._flux_divergence(p_dx, p_dy, u, geom, grid, cfg)

    def pde_rhs(u, phi):
        xx, yy = _coords(phi)
        return sharded(_pde_rhs_chain, DEPTH_RESIDUAL, 4)(u, phi, xx, yy)

    # -- monitor chain + Mackenzie (global reduction outside shard_map) -----
    def _monitor_chain(u, phi, xxb, yyb):
        geom = _geom(phi, xxb, yyb)
        mon = dp.monitor_source(u, geom, grid)
        for _ in range(cfg.pma.smoothing_iters):
            mon = smooth_pass(mon)
        return mon

    def _jac_chain(phi, xxb, yyb):
        return _geom(phi, xxb, yyb).jac

    def monitor(u, phi):
        xx, yy = _coords(phi)
        mon = sharded(_monitor_chain, DEPTH_MONITOR, 4)(u, phi, xx, yy)
        jac = sharded(_jac_chain, DEPTH_GEOM, 3)(phi, xx, yy)
        integral = jnp.sum(mon * jnp.abs(jac)) * grid.dx * grid.dy
        floor = cfg.pma.mackenzie_c * integral
        if cfg.pma.monitor_cap is not None:
            mon = jnp.minimum(mon, cfg.pma.monitor_cap * floor)
        return mon + floor, jac

    # -- PMA mesh solve ------------------------------------------------------
    def _lap_chain(v):
        return pma.neumann_laplacian(v, grid)

    sharded_lap = smap(_lift(_lap_chain, 1), in_specs=spec, out_specs=spec)

    def pma_dqdt(phi, u):
        mon, jac = monitor(u, phi)
        rhs = jnp.sqrt(mon * jnp.abs(jac)) / cfg.pma.alpha
        if pma_solver == "spectral":
            return pma.solve_pma(mon, jac, grid, cfg.pma)
        return pma.solve_shifted_neumann(
            rhs, grid, cfg.pma, method=pma_solver, lap=sharded_lap
        ).astype(rhs.dtype)

    def loop_pma(phi, u, dtmesh, loops: int):
        def body(_, q):
            return q + dtmesh * pma_dqdt(q, u)

        return lax.fori_loop(0, loops, body, phi)

    # -- full step (mirrors models.droplet.make_step) ------------------------
    import dataclasses as _dc

    nk = solver or dp.fast_solver()

    def step(u, phi, dt, dtmesh, pma_loops: int):
        F = pde_rhs(u, phi)
        slv = nk
        if jvp_dtype is not None:
            jd = jnp.dtype(jvp_dtype)
            u_j, f_j, phi_j = u.astype(jd), F.astype(jd), phi.astype(jd)
            dt_j = jnp.asarray(dt, jd)

            def factory(x, fxv):
                x_j = x.astype(jd)
                res_j = lambda w: residual(w, u_j, f_j, phi_j, dt_j)  # noqa: E731
                return lambda v: jax.jvp(res_j, (x_j,), (v,))[1]

            slv = _dc.replace(nk, matvec_factory=factory,
                              inner_dtype=str(jd))
        res = slv.solve(lambda v: residual(v, u, F, phi, dt), u)
        phi_new = loop_pma(phi, u, dtmesh, pma_loops)
        return dp.DropletStepResult(u=res.x, q=phi_new,
                                    newton_iters=res.iters,
                                    f_norm=res.f_norm,
                                    converged=res.converged)

    return ShardedDropletOps(
        residual=residual, pde_rhs=pde_rhs, monitor=monitor,
        pma_dqdt=pma_dqdt, loop_pma=loop_pma, step=step,
        sharding=NamedSharding(mesh, spec),
    )
