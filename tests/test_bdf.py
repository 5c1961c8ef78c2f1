"""Adaptive BDF/JFNK integrator tests (PMA.py method-of-lines parity)."""
import numpy as np
import pytest
import jax.numpy as jnp
from scipy.integrate import solve_ivp

from iterative_solvers_tpu.solvers.bdf import BDF
from iterative_solvers_tpu.solvers.newton import NewtonKrylov


def test_bdf_linear_decay():
    """dy/dt = -50 y to t=0.2 vs exact (order-2 method, moderate rtol)."""
    f = lambda t, y: -50.0 * y
    y0 = jnp.ones(4)
    res = BDF(rtol=1e-5, atol=1e-10, dt0=1e-3).solve(f, y0, 0.0, 0.2)
    assert bool(res.success)
    exact = np.exp(-50.0 * 0.2)
    np.testing.assert_allclose(np.asarray(res.y), exact, rtol=5e-3)
    assert int(res.steps) < 6000


def test_bdf_van_der_pol_vs_scipy():
    """Mildly stiff Van der Pol (mu=5) vs scipy BDF."""
    mu = 5.0

    def f_jax(t, y):
        return jnp.stack([y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]])

    def f_np(t, y):
        return [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]]

    t1 = 3.0
    sol = solve_ivp(f_np, (0, t1), [2.0, 0.0], method="BDF", rtol=1e-6,
                    atol=1e-9)
    res = BDF(rtol=1e-6, atol=1e-9, dt0=1e-3,
              newton=NewtonKrylov(f_tol=1e-12, maxiter=20, inner_m=5,
                                  outer_k=2)).solve(
        f_jax, jnp.array([2.0, 0.0]), 0.0, t1
    )
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.y), sol.y[:, -1], rtol=2e-3,
                               atol=2e-3)


def test_bdf_adaptivity_rejects_and_recovers():
    """A RHS with a sharp transient forces rejections but still succeeds."""

    def f(t, y):
        return -y / (0.01 + jnp.abs(jnp.sin(40.0 * t)))

    res = BDF(rtol=1e-5, atol=1e-8, dt0=0.05).solve(f, jnp.ones(2), 0.0, 1.0)
    assert bool(res.success)
    assert int(res.steps) > 10


@pytest.mark.slow
def test_mems_coupled_bdf_short():
    """Coupled (u, Q) MEMS system integrates a short horizon; deflection
    matches the operator-split stepper's trend."""
    from iterative_solvers_tpu.models import mems

    cfg = mems.MEMSConfig(n=31)
    tf = 5e-3
    u, q, res = mems.evolve_coupled(
        cfg, tf,
        bdf=BDF(rtol=1e-4, atol=1e-7, dt0=1e-4,
                newton=NewtonKrylov(f_tol=1e-9, maxiter=15, inner_m=15,
                                    outer_k=5)),
    )
    assert bool(res.success)
    u_np = np.asarray(u)
    assert -0.05 < u_np.min() < -1e-3     # deflecting, rate ~ -lambda*t
    from iterative_solvers_tpu.ops import curvilinear
    geom = curvilinear.mesh_geometry(q, cfg.grid)
    assert float(jnp.min(geom.jac)) > 0


def test_coupled_bdf_full_trajectory_vs_scipy():
    """BASELINE config 3 (PMA.py:68) as a full-trajectory comparison:
    integrate the coupled (u, Q) MEMS system to Tf=0.15 and compare the
    final state against the scipy solve_ivp(method="BDF") golden
    (tests/fixtures/golden_pma_bdf_tf015.npz; see the generation numbers
    below).  Competitiveness record (this host, CPU):

      scipy BDF (order<=5, dense FD Jacobian): 93 steps, 360 rhs evals,
        25 Jacobian updates, 114 LU factorisations — 798.6 s wall
      r2 BDF2+JFNK (quadratic-predictor controller): 115 accepted steps
      r3 variable-order BDF1-3+JFNK (per-order dt factors + scipy's
        k+1-consecutive-steps equilibration rule): 81 accepted steps,
        53 rejected — FEWER steps than scipy's order-5 at the same rtol,
        final-state agreement 1.7e-5

    The reference's stated Tf=0.4 is aspirational at N=51: scipy itself
    grinds past 50 minutes without reaching t=0.2 on this host (stiffness
    grows toward touchdown), so the gate compares at Tf=0.15.
    """
    import pathlib

    import numpy as np
    import jax.numpy as jnp

    from iterative_solvers_tpu.models import mems
    from iterative_solvers_tpu.solvers.bdf import BDF

    fix = (pathlib.Path(__file__).parent / "fixtures"
           / "golden_pma_bdf_tf015.npz")
    g = np.load(fix)
    cfg = mems.MEMSConfig()
    nn = cfg.n * cfg.n

    bdf = BDF(rtol=1e-3, atol=1e-6, dt0=1e-6, max_steps=50000)
    u, q, res = mems.evolve_coupled(cfg, float(g["t"]), bdf=bdf)
    assert bool(res.success)
    # both integrators run at rtol=1e-3; the trajectories agree far tighter
    u_scipy = g["y"][:nn].reshape(cfg.n, cfg.n)
    assert np.abs(np.asarray(u) - u_scipy).max() < 1e-4
    # step-count competitiveness vs scipy's variable order <= 5
    # (measured 81 vs 93; 1.1x margin for platform-dependent rounding)
    assert int(res.steps) <= 1.1 * int(g["nsteps"])
