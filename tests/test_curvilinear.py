"""Parity: curvilinear geometry / Laplacian / monitor / PMA vs reference goldens.

Fixtures were produced by tools/make_golden.py executing the actual reference
code headless on deterministic inputs.
"""
import pathlib

import numpy as np
import pytest
import jax.numpy as jnp

from iterative_solvers_tpu.core.grid import Grid2D
from iterative_solvers_tpu.ops import curvilinear, stencils
from iterative_solvers_tpu.meshmove.monitor import smooth_and_regularise
from iterative_solvers_tpu.meshmove.pma import PMAParams, solve_pma

FIX = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def drop():
    d = np.load(FIX / "golden_droplet.npz")
    grid = Grid2D(
        nx=int(d["nx"]), ny=int(d["ny"]),
        xl=float(d["endl"]), xr=float(d["endr"]),
        yb=float(d["endb"]), yt=float(d["endt"]),
    )
    q = jnp.array(d["q"].reshape(grid.shape))
    geom = curvilinear.mesh_geometry(q, grid)
    return d, grid, q, geom


def _2d(d, key, grid):
    return d[key].reshape(grid.shape)


def test_mesh_geometry(drop):
    d, grid, q, geom = drop
    np.testing.assert_allclose(np.asarray(geom.x), _2d(d, "q_dksi", grid), atol=1e-11)
    np.testing.assert_allclose(np.asarray(geom.y), _2d(d, "q_deta", grid), atol=1e-11)
    np.testing.assert_allclose(np.asarray(geom.xx), _2d(d, "q_d2ksi", grid), atol=1e-10)
    np.testing.assert_allclose(np.asarray(geom.yy), _2d(d, "q_d2eta", grid), atol=1e-10)
    np.testing.assert_allclose(np.asarray(geom.xy), _2d(d, "q_dksideta", grid), atol=1e-10)
    np.testing.assert_allclose(np.asarray(geom.jac), _2d(d, "jac", grid), atol=1e-9)


def test_laplace_raw_derivatives(drop):
    """Laplace_operator with raw (un-BC'd) first derivatives — the form used
    inside the droplet residual (droplet.py:437)."""
    d, grid, q, geom = drop
    u = jnp.array(_2d(d, "u", grid))
    v_ksi = stencils.d1_x(u, grid.dx)
    v_eta = stencils.d1_y(u, grid.dy)
    vxx, vyy = curvilinear.laplace(u, v_ksi, v_eta, geom, grid)
    np.testing.assert_allclose(np.asarray(vxx), _2d(d, "lap_raw_xx", grid), atol=1e-8)
    np.testing.assert_allclose(np.asarray(vyy), _2d(d, "lap_raw_yy", grid), atol=1e-8)


def test_u_spatial_ders_quirk(drop):
    """compute_u_spatial_ders parity, including the reference's bottom-edge
    quirk (droplet.py:722)."""
    d, grid, q, geom = drop
    u = jnp.array(_2d(d, "u", grid))
    v_ksi, v_eta = curvilinear.grad_ksi_neumann(u, grid, quirk=True)
    ux, uy = curvilinear.grad_xy(v_ksi, v_eta, geom)
    np.testing.assert_allclose(np.asarray(ux), _2d(d, "u_dx", grid), atol=1e-10)
    np.testing.assert_allclose(np.asarray(uy), _2d(d, "u_dy", grid), atol=1e-10)
    uxx, uyy = curvilinear.laplace(u, v_ksi, v_eta, geom, grid)
    np.testing.assert_allclose(np.asarray(uxx), _2d(d, "u_xx", grid), atol=1e-8)
    np.testing.assert_allclose(np.asarray(uyy), _2d(d, "u_yy", grid), atol=1e-8)


def test_monitor_and_pma(drop):
    d, grid, q, geom = drop
    u = jnp.array(_2d(d, "u", grid))
    v_ksi, v_eta = curvilinear.grad_ksi_neumann(u, grid, quirk=True)
    uxx, uyy = curvilinear.laplace(u, v_ksi, v_eta, geom, grid)
    src = jnp.abs(uxx + uyy) ** 2
    mon = smooth_and_regularise(src, geom.jac, grid.dx, grid.dy,
                                smoothing_iters=4, mackenzie_c=float(d["C"]))
    want = _2d(d, "monitor", grid)
    np.testing.assert_allclose(np.asarray(mon), want, rtol=1e-10, atol=1e-8)

    params = PMAParams(alpha=float(d["alpha"]), gamma=float(d["gamma"]),
                       mackenzie_c=float(d["C"]))
    dqdt = solve_pma(mon, geom.jac, grid, params)
    np.testing.assert_allclose(
        np.asarray(dqdt), _2d(d, "q_dt", grid), rtol=1e-9, atol=1e-7
    )


@pytest.fixture(scope="module")
def pma2():
    d = np.load(FIX / "golden_pma2.npz")
    n = int(d["n"])
    grid = Grid2D(nx=n, ny=n, xl=-1, xr=1, yb=-1, yt=1)
    q = jnp.array(d["q"].reshape(grid.shape))
    geom = curvilinear.mesh_geometry(q, grid)
    return d, grid, q, geom


def test_pma2_geometry(pma2):
    d, grid, q, geom = pma2
    np.testing.assert_allclose(np.asarray(geom.xx), _2d(d, "q_d2ksi", grid), atol=1e-10)
    np.testing.assert_allclose(np.asarray(geom.jac), _2d(d, "jac", grid), atol=1e-9)


def test_pma2_u_ders_no_bc(pma2):
    """PMA2_nk applies *no* boundary zeroing to the solution derivatives
    (PMA2_nk.py:253-261)."""
    d, grid, q, geom = pma2
    u = jnp.array(_2d(d, "u", grid))
    v_ksi = stencils.d1_x(u, grid.dx)
    v_eta = stencils.d1_y(u, grid.dy)
    ux, uy = curvilinear.grad_xy(v_ksi, v_eta, geom)
    np.testing.assert_allclose(np.asarray(ux), _2d(d, "u_dx", grid), atol=1e-10)
    np.testing.assert_allclose(np.asarray(uy), _2d(d, "u_dy", grid), atol=1e-10)
    uxx, uyy = curvilinear.laplace(u, v_ksi, v_eta, geom, grid)
    np.testing.assert_allclose(np.asarray(uxx), _2d(d, "u_xx", grid), atol=1e-8)
    np.testing.assert_allclose(np.asarray(uyy), _2d(d, "u_yy", grid), atol=1e-8)


def test_pma2_monitor_and_pma(pma2):
    """epsilon=0 monitor: 1/(1+u)^6, Mackenzie C=1 (PMA2_nk.py:361-390)."""
    d, grid, q, geom = pma2
    u = jnp.array(_2d(d, "u", grid))
    src = 1.0 / (1.0 + u) ** 6
    mon = smooth_and_regularise(src, geom.jac, grid.dx, grid.dy,
                                smoothing_iters=4, mackenzie_c=1.0)
    np.testing.assert_allclose(np.asarray(mon), _2d(d, "monitor", grid),
                               rtol=1e-10, atol=1e-9)
    params = PMAParams(alpha=float(d["alpha"]), gamma=float(d["gamma"]))
    dqdt = solve_pma(mon, geom.jac, grid, params)
    np.testing.assert_allclose(np.asarray(dqdt), _2d(d, "q_dt", grid),
                               rtol=1e-9, atol=1e-7)
