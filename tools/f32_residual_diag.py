"""Diagnose the f32 droplet-residual error at fine grids (VERDICT #4).

Compares the CN residual evaluated in (a) pure f32, (b) f32 with f64
one-sided boundary columns (ops.curvilinear edge_dtype), (c) f64 truth,
on an upsampled coalescence state.  CPU, x64.  Prints the max abs error of
each variant split into boundary-ring columns/rows vs interior.

Usage: python tools/f32_residual_diag.py [n]
"""
import dataclasses
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from iterative_solvers_tpu.io import fixtures as fx
from iterative_solvers_tpu.models import droplet as dp
from iterative_solvers_tpu.ops import curvilinear, stencils

COAL = "/root/reference/python_work/initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt"
DROPS = [(0.0, 0.0, 1.0, 1.0), (3.0, 0.0, 1.0, 1.0)]


def residual(u, u_old, F, dt, q, cfg, dtype, edge_dtype=None):
    """cn_residual re-expressed with explicit dtypes + deviation geometry."""
    grid = cfg.grid
    u = u.astype(dtype)
    phi = curvilinear.to_deviation(q, grid).astype(dtype)
    geom = curvilinear.mesh_geometry_dev(phi, grid)
    u_ksi = stencils.d1_x(u, grid.dx)
    u_eta = stencils.d1_y(u, grid.dy)
    u_xx, u_yy = curvilinear.laplace(u, u_ksi, u_eta, geom, grid, edge_dtype)
    p = dp.pressure(u, u_xx, u_yy, cfg)
    p_dx, p_dy = dp.pressure_grad_xy(p, geom, grid)
    F2 = dp._flux_divergence(p_dx, p_dy, u, geom, grid, cfg)
    return (u - u_old.astype(dtype)) - dt * (F2 + F.astype(dtype)) / 2.0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    dt = 1e-9

    fixture = fx.load(COAL)
    big = fx.upsample(fixture, n, n)
    cfg = fx.config_for(big)
    grid = cfg.grid
    q = jnp.array(big.q)
    geom = curvilinear.mesh_geometry(q, grid)
    u = dp.seeded_solution(geom, cfg, DROPS)
    F = dp.pde_rhs(u, geom, cfg)
    # evaluate at a slightly perturbed state (mid-Newton conditions)
    u_old = u
    u_eval = u * (1.0 + 1e-6 * jnp.sin(jnp.arange(n)[:, None] * 0.37)
                  * jnp.cos(jnp.arange(n)[None, :] * 0.53))

    r64 = np.asarray(jax.jit(
        lambda: residual(u_eval, u_old, F, dt, q, cfg, jnp.float64))())
    scale = np.abs(r64).max()
    print(f"n={n}  |r64|_max={scale:.3e}  (driver f_tol=1e-5)")

    for name, kw in [("pure f32", dict(dtype=jnp.float32)),
                     ("f32 + f64 edges", dict(dtype=jnp.float32,
                                              edge_dtype=jnp.float64))]:
        r = np.asarray(jax.jit(
            lambda kw=kw: residual(u_eval, u_old, F, dt, q, cfg, **kw))())
        err = np.abs(r.astype(np.float64) - r64)
        edge = np.zeros_like(err, dtype=bool)
        edge[:3, :] = edge[-3:, :] = True
        edge[:, :3] = edge[:, -3:] = True
        print(f"{name:18s} err_edge={err[edge].max():.3e} "
              f"err_interior={err[~edge].max():.3e}")


if __name__ == "__main__":
    main()
