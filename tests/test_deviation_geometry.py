"""Deviation-form mesh geometry: exactness vs the full-potential form and
f32 robustness at fine grids (the large-grid enabler)."""
import numpy as np
import jax.numpy as jnp

from iterative_solvers_tpu.core.grid import Grid2D
from iterative_solvers_tpu.ops import curvilinear

RNG = np.random.default_rng(9)


def _smooth_phi(grid, scale=0.3):
    """Smooth deviation with zero normal derivative at the boundary."""
    # cos modes have zero normal derivative on [0, pi] in each direction
    ky, kx = 2, 3
    yy = np.linspace(0, np.pi, grid.ny)[:, None]
    xx = np.linspace(0, np.pi, grid.nx)[None, :]
    return scale * np.cos(ky * yy) * np.cos(kx * xx)


def test_deviation_matches_full_f64():
    grid = Grid2D(nx=91, ny=61, xl=-3, xr=6, yb=-3, yt=3)
    phi = jnp.array(_smooth_phi(grid))
    q_full = jnp.array(
        0.5 * (grid.xx ** 2 + grid.yy ** 2)
    ) + phi
    g_full = curvilinear.mesh_geometry(q_full, grid)
    g_dev = curvilinear.mesh_geometry_dev(phi, grid)
    for a, b, tol in [
        (g_full.x, g_dev.x, 1e-10),
        (g_full.y, g_dev.y, 1e-10),
        (g_full.xx, g_dev.xx, 1e-8),
        (g_full.yy, g_dev.yy, 1e-8),
        (g_full.xy, g_dev.xy, 1e-9),
        (g_full.jac, g_dev.jac, 1e-8),
    ]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol)


def test_to_deviation_roundtrip():
    grid = Grid2D(nx=33, ny=21, xl=-3, xr=6, yb=-3, yt=3)
    phi = jnp.array(_smooth_phi(grid))
    q = jnp.array(0.5 * (grid.xx ** 2 + grid.yy ** 2)) + phi
    np.testing.assert_allclose(
        np.asarray(curvilinear.to_deviation(q, grid)), np.asarray(phi),
        atol=1e-12,
    )


def test_f32_deviation_robust_at_fine_grid():
    """At 1024^2, f32 full-potential geometry is garbage (1e9-scale stencil
    cancellation) while f32 deviation-form stays ~1e-4-accurate."""
    n = 1024
    grid = Grid2D(nx=n, ny=n, xl=-3, xr=6, yb=-3, yt=3)
    phi64 = jnp.array(_smooth_phi(grid))
    q64 = jnp.array(0.5 * (grid.xx ** 2 + grid.yy ** 2)) + phi64

    ref = curvilinear.mesh_geometry(q64, grid)  # f64 truth

    g_dev32 = curvilinear.mesh_geometry_dev(phi64.astype(jnp.float32), grid)
    err_dev = np.abs(np.asarray(g_dev32.jac, dtype=np.float64)
                     - np.asarray(ref.jac)).max()
    assert err_dev < 5e-2, err_dev           # ~2% of jac ~ O(1): usable

    g_full32 = curvilinear.mesh_geometry(q64.astype(jnp.float32), grid)
    err_full = np.abs(np.asarray(g_full32.jac, dtype=np.float64)
                      - np.asarray(ref.jac)).max()
    # the full-potential f32 form must be far worse — documenting exactly
    # why the deviation form exists (the margin grows with grid size and
    # with the sharper deviations of real adapted meshes)
    assert err_full > 10 * err_dev, (err_full, err_dev)


def test_coords_op_bit_identical():
    """grid.xx_op/yy_op (in-graph broadcast coordinates — no O(n^2) graph
    literal) must be bit-identical to the materialised grid.xx/yy in both
    dtypes, under jit and eagerly."""
    import jax

    grid = Grid2D(nx=91, ny=61, xl=-3, xr=6, yb=-3, yt=3)
    for dt in (jnp.float64, jnp.float32):
        want_x = np.asarray(grid.xx, dtype=dt)
        want_y = np.asarray(grid.yy, dtype=dt)
        assert np.array_equal(np.asarray(grid.xx_op(dt)), want_x)
        assert np.array_equal(np.asarray(grid.yy_op(dt)), want_y)
        jx = jax.jit(lambda: grid.xx_op(dt) + 0.0)()
        jy = jax.jit(lambda: grid.yy_op(dt) + 0.0)()
        assert np.array_equal(np.asarray(jx), want_x)
        assert np.array_equal(np.asarray(jy), want_y)
