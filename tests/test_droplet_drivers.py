"""Droplet driver surface: radius laws, explicit evolution, inflation,
upsampling, fast-solver parity."""
import dataclasses
import pathlib

import numpy as np
import jax.numpy as jnp

from iterative_solvers_tpu.io import fixtures as fx
from iterative_solvers_tpu.models import droplet as dp
from iterative_solvers_tpu.ops import curvilinear

FIX = pathlib.Path(__file__).parent / "fixtures"
COAL = "/root/reference/python_work/initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt"


def test_asymptotic_radius_trajectory_monotone():
    """The spreading law grows R toward its equilibrium (512^(1/9) ≈ 2)."""
    cfg = dp.DropletConfig()
    times = np.concatenate(([0.0], np.logspace(-5, 2, 50)))
    r = dp.asymptotic_radius_trajectory(cfg, 1.0, times)
    assert r.shape == times.shape
    assert np.all(np.diff(r) > -1e-12)           # monotone growth
    assert 1.9 < r[-1] < 2.1                     # -> 512^(1/9) = 2.0


def test_rdot_sign():
    cfg = dp.DropletConfig()
    # below equilibrium volume radius -> spreading; above -> receding
    assert float(dp.rdot(1.0, 1.0, cfg)) > 0     # 8V/R^3 = 8 > 1
    assert float(dp.rdot(3.0, 1.0, cfg)) < 0


def test_evolve_radius_explicit_grows():
    cfg = dp.DropletConfig(nx=31, ny=21)
    q0 = dp.initial_mesh_potential(cfg)
    geom = curvilinear.mesh_geometry(q0, cfg.grid)
    u0 = dp.seeded_solution(geom, cfg, [(0.0, 0.0, 1.0, 1.0)])
    u, q, r, steps = dp.evolve_radius_explicit(
        cfg, u0, q0, r0=1.0, r_final=1.3, tol=5e-2, pma_loops=2,
        max_steps=100,
    )
    assert 1.2 < float(r) <= 1.4
    assert int(steps) < 100
    geom = curvilinear.mesh_geometry(q, cfg.grid)
    assert float(jnp.min(geom.jac)) > 0


def test_inflation_short():
    """Short quasi-static inflation produces a valid adapted state."""
    cfg = dp.DropletConfig(nx=31, ny=21)
    q, u = dp.inflate(cfg, [[0.0, 0.0, 1.0, 0.25]], vsteps=10, dtmesh=5e-9,
                      pma_loops=3)
    geom = curvilinear.mesh_geometry(q, cfg.grid)
    assert float(jnp.min(geom.jac)) > 0
    assert float(jnp.max(u)) > 2 * cfg.epsilon   # drop present
    assert float(jnp.min(u)) >= cfg.epsilon - 1e-12


def test_upsample_preserves_mesh_validity():
    fixture = fx.load(COAL)
    big = fx.upsample(fixture, 256, 192)
    cfg = fx.config_for(big)
    geom = curvilinear.mesh_geometry(jnp.array(big.q), cfg.grid)
    assert float(jnp.min(geom.jac)) > 0
    # seeded solution on the refined mesh is positive and sharp
    u = dp.seeded_solution(geom, cfg, [(0.0, 0.0, 1.0, 1.0),
                                       (3.0, 0.0, 1.0, 1.0)])
    assert float(jnp.min(u)) >= cfg.epsilon - 1e-12
    assert float(jnp.max(u)) > 1.0


def test_fast_solver_parity_with_scipy_golden():
    """Mixed-precision droplet JFNK matches the scipy golden to 1e-6."""
    g = np.load(FIX / "golden_droplet_step.npz")
    fixture = fx.load(COAL)
    cfg = dataclasses.replace(fx.config_for(fixture), spectral_dtype="float32")
    u = jnp.array(fixture.u)
    q = jnp.array(fixture.q)
    step = dp.make_step(cfg, dt=float(g["dt"]), dtmesh=3e-9, pma_loops=5,
                        solver=dp.fast_solver())
    out = step(u, q, float(g["dt"]))
    assert bool(out.converged)
    np.testing.assert_allclose(np.asarray(out.u),
                               g["u_new"].reshape(cfg.grid.shape), atol=1e-6)
    # mesh potential: f32 spectral transforms add ~1e-6 absolute noise
    np.testing.assert_allclose(np.asarray(out.q),
                               g["q_new"].reshape(cfg.grid.shape), atol=1e-5)


def test_rect_fixture_step_parity():
    """BASELINE config 3: one JFNK step from the 61x61 rect fixture matches
    the scipy-driven reference to 1e-6."""
    g = np.load(FIX / "golden_rect_step.npz")
    fixture = fx.load(
        "/root/reference/python_work/initdrop_rect_1_61-61_100_0.01_0.01_0.1_0.15.txt"
    )
    cfg = fx.config_for(fixture)
    assert (cfg.nx, cfg.ny, cfg.epsilon) == (61, 61, 0.01)
    grid = cfg.grid
    u = jnp.array(fixture.u)
    q = jnp.array(fixture.q)
    step = dp.make_step(cfg, dt=float(g["dt"]), dtmesh=3e-9, pma_loops=5)
    out = step(u, q, float(g["dt"]))
    assert bool(out.converged)
    np.testing.assert_allclose(np.asarray(out.u),
                               g["u_new"].reshape(grid.shape), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.q),
                               g["q_new"].reshape(grid.shape), atol=1e-8)


def test_contact_line_diagnostics():
    """distance_to_contact_line/contact_line_stats (reference
    droplet.py:526-542): on the adapted fixture mesh, nodes cluster at the
    contact line and the band spacing is of order 1/a (droplet.py:487-489)."""
    fixture = fx.load(COAL)
    cfg = fx.config_for(fixture)
    geom = curvilinear.mesh_geometry(jnp.array(fixture.q), cfg.grid)
    d = dp.distance_to_contact_line(geom, cfg.R)
    assert d.shape == cfg.grid.shape
    # identity-mesh oracle: |sqrt(x^2+y^2) - R| at a few nodes
    r = np.sqrt(np.asarray(geom.x) ** 2 + np.asarray(geom.y) ** 2)
    np.testing.assert_allclose(np.asarray(d), np.abs(r - cfg.R), rtol=1e-12)
    stats = dp.contact_line_stats(geom, cfg.R, band=0.02)
    assert int(stats["band_nodes"]) > 0
    assert float(stats["min_distance"]) < 0.02
    # adapted mesh: band spacing within an order of magnitude of 1/a
    assert float(stats["min_band_spacing"]) < 10.0 / cfg.a


def test_inflation_reproduces_reference_fixture():
    """The reference's own checked-in coalescence fixture was generated by
    initialise_coalescing_droplets(1000, [[0,0,1,1],[3,0,1,1]], 5e-9, 20)
    (droplet.py:127); our fused-jit inflate must reproduce it from scratch.
    This is the strongest whole-driver parity gate in the suite: 20,000 PMA
    sub-iterations + 1000 seeded-solution updates, matching to f64
    roundoff accumulation (measured 8e-13 in q, 9e-12 in u)."""
    fixture = fx.load(COAL)
    cfg = fx.config_for(fixture)
    q, u = dp.inflate(cfg, [(0.0, 0.0, 1.0, 1.0), (3.0, 0.0, 1.0, 1.0)],
                      vsteps=1000, dtmesh=5e-9, pma_loops=20)
    np.testing.assert_allclose(np.asarray(q), np.asarray(fixture.q),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(u), np.asarray(fixture.u),
                               atol=1e-10)
