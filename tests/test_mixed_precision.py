"""Mixed-precision JFNK and analytic-Jacobian paths: same convergence as f64."""
import numpy as np
import jax.numpy as jnp
import pytest

from iterative_solvers_tpu.models.swift_hohenberg import (
    SHConfig, make_cn_step, jacobian_matvec_factory, fast_solver, cn_residual,
    apply_L,
)
from iterative_solvers_tpu.solvers.newton import NewtonKrylov

RNG = np.random.default_rng(31)


@pytest.fixture(scope="module")
def sh():
    cfg = SHConfig(n=24)
    u0 = jnp.array(RNG.standard_normal((cfg.n, cfg.n)))
    return cfg, u0


def test_inner_f32_same_convergence(sh):
    cfg, u0 = sh
    ref = make_cn_step(cfg, NewtonKrylov(f_tol=6e-6, inner_m=10, outer_k=5))
    mix = make_cn_step(cfg, NewtonKrylov(f_tol=6e-6, inner_m=10, outer_k=5,
                                         inner_dtype="float32"))
    u_ref, r_ref = ref(u0)
    u_mix, r_mix = mix(u0)
    assert bool(r_ref.converged) and bool(r_mix.converged)
    assert u_mix.dtype == jnp.float64
    # identical Newton counts and matching solutions to the outer tolerance
    assert abs(int(r_ref.iters) - int(r_mix.iters)) <= 1
    np.testing.assert_allclose(np.asarray(u_mix), np.asarray(u_ref),
                               atol=5e-6)


def test_analytic_jacobian_consistent_with_fd(sh):
    """J v from the closed form == FD directional derivative (to FD error)."""
    cfg, u0 = sh
    v = jnp.array(RNG.standard_normal(u0.shape))
    u_old = u0
    L_uold = apply_L(u_old, cfg)

    def F(u):
        return cn_residual(u, u_old, L_uold, cfg)

    mv = jacobian_matvec_factory(cfg)(u0, F(u0))
    analytic = np.asarray(mv(v))
    eps = 1e-7
    fd = np.asarray((F(u0 + eps * v) - F(u0 - eps * v)) / (2 * eps))
    np.testing.assert_allclose(analytic, fd, rtol=1e-5, atol=1e-5)


def test_fast_solver_end_to_end(sh):
    cfg, u0 = sh
    step_fast = make_cn_step(cfg, fast_solver(cfg))
    step_ref = make_cn_step(cfg, NewtonKrylov(f_tol=6e-6))
    u_f, r_f = step_fast(u0)
    u_r, r_r = step_ref(u0)
    assert bool(r_f.converged)
    np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_r), atol=2e-5)


def test_f32_mesh_loop_matches_f64():
    """mesh_dtype="float32" (whole PMA sub-loop in f32 — the TPU fast path
    for f64 droplet states) must reproduce the f64 mesh to ~f32 noise and
    leave the subsequent JFNK step's convergence unchanged."""
    import dataclasses
    import pathlib

    from iterative_solvers_tpu.io import fixtures as fx
    from iterative_solvers_tpu.models import droplet as dp
    from iterative_solvers_tpu.meshmove.pma import loop_pma
    from iterative_solvers_tpu.ops import curvilinear

    refdir = pathlib.Path("/root/reference/python_work")
    fixture = fx.load(
        refdir / "initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt")
    cfg = fx.config_for(fixture)
    grid = cfg.grid
    u = jnp.array(fixture.u)
    q = jnp.array(fixture.q)
    mon = lambda uu, geom, g: dp.monitor_source(uu, geom, g)

    q64 = loop_pma(q, u, 3e-9, 60, grid, cfg.pma, mon)
    cfg32 = dataclasses.replace(cfg, mesh_dtype="float32")
    q32 = loop_pma(q, u, 3e-9, 60, grid, cfg32.pma, mon)
    assert q32.dtype == q.dtype
    g64 = curvilinear.mesh_geometry(q64, grid)
    g32 = curvilinear.mesh_geometry(q32, grid)
    # mesh coordinates agree to f32 noise levels
    np.testing.assert_allclose(np.asarray(g32.x), np.asarray(g64.x),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(g32.y), np.asarray(g64.y),
                               atol=2e-5)

    # Chain two steps: step 1 produces an f32-updated mesh (mesh_dtype only
    # affects the post-solve loop_pma), so only step 2's JFNK actually solves
    # on a mesh that differs between the two paths.
    step64 = dp.make_step(cfg, dt=1e-5, dtmesh=3e-9, pma_loops=20)
    step32 = dp.make_step(cfg32, dt=1e-5, dtmesh=3e-9, pma_loops=20)
    o64 = step64(u, q, 1e-5)
    o32 = step32(u, q, 1e-5)
    o64b = step64(o64.u, o64.q, 1e-5)
    o32b = step32(o32.u, o32.q, 1e-5)
    assert bool(o64b.converged) and bool(o32b.converged)
    assert int(o64b.newton_iters) == int(o32b.newton_iters)
    np.testing.assert_allclose(np.asarray(o32b.u), np.asarray(o64b.u),
                               atol=1e-6)


def test_jvp_f32_inner_matches_fd():
    """make_step(jvp_dtype="float32") — exact f32 JVP matvecs in the inner
    Krylov — must converge with the same Newton count and solution as the
    default f64 FD path (advisor r2 high finding: the scalar constants in
    pressure()/_flux_divergence() must not re-promote the f32 residual)."""
    import pathlib

    from iterative_solvers_tpu.io import fixtures as fx
    from iterative_solvers_tpu.models import droplet as dp

    refdir = pathlib.Path("/root/reference/python_work")
    fixture = fx.load(
        refdir / "initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt")
    cfg = fx.config_for(fixture)
    u = jnp.array(fixture.u)
    q = jnp.array(fixture.q)

    step_fd = dp.make_step(cfg, dt=1e-5, dtmesh=3e-9, pma_loops=5)
    step_jvp = dp.make_step(cfg, dt=1e-5, dtmesh=3e-9, pma_loops=5,
                            jvp_dtype="float32")
    o_fd = step_fd(u, q, 1e-5)
    o_jvp = step_jvp(u, q, 1e-5)
    assert bool(o_fd.converged) and bool(o_jvp.converged)
    assert o_jvp.u.dtype == u.dtype
    assert abs(int(o_fd.newton_iters) - int(o_jvp.newton_iters)) <= 1
    np.testing.assert_allclose(np.asarray(o_jvp.u), np.asarray(o_fd.u),
                               atol=5e-7)
