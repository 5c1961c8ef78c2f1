"""Heat / wave / Poisson workloads: analytic-oracle tests (SURVEY.md §4.1)."""
import numpy as np
import jax.numpy as jnp

from iterative_solvers_tpu.models import heat, wave, poisson


def test_ftcs_heat_insulated_oracle():
    """lab12_p1 setup: n=23, k=5e-4, 1000 steps vs the exact kernel."""
    n, k, a, nsteps = 23, 5e-4, 1.0, 1000
    x = jnp.linspace(0, 1, n + 1)
    u0 = jnp.cos(jnp.pi * x / 2)
    u = heat.ftcs_evolve(u0, nsteps, a, k, insulated_left=True)
    exact = heat.exact_insulated(x, nsteps * k, a)
    assert float(jnp.max(jnp.abs(u - exact))) < 2e-3


def test_cn_heat_oracle():
    """lab12_p2 setup: n=10, k=0.025, 100 steps vs the exact kernel."""
    n, k, a, nsteps = 10, 0.025, 1.0, 100
    x = jnp.linspace(0, 1, n + 1)
    u0 = jnp.sin(jnp.pi * x)
    u = heat.cn_evolve(u0, nsteps, a, k)
    exact = heat.exact_dirichlet(x, nsteps * k, a)
    # CN is 2nd order; coarse grid -> modest tolerance
    assert float(jnp.max(jnp.abs(u - exact))) < 2e-2


def test_ftcs_stability_parameter():
    assert heat.stability_parameter(1.0, 5e-4, 23) < 0.5
    assert heat.stability_parameter(1.0, 1e-3, 32) >= 0.5


def test_damped_wave_inlet():
    """lab13 setup: forced inlet propagates, stays bounded under damping."""
    n, k, nsteps = 50, 1e-2, 500
    inlet = lambda t: 2 * jnp.exp(-t) * jnp.sin(10 * t) / 5
    u, traj = wave.damped_wave_1d(n, k, nsteps, inlet)
    traj = np.asarray(traj)
    assert traj.shape == (nsteps + 1, n + 1)
    assert np.abs(traj).max() < 0.5          # bounded (damped)
    assert np.abs(traj[-1]).max() < 0.1      # decayed with the inlet
    assert np.abs(traj[150:, n // 2]).max() > 1e-4  # wave actually travelled


def test_tank_wave_energy_decay():
    """lab14_p1 setup: damped tank wave decays, stays finite."""
    k, p, c = 1e-2, 0.4, 1.0
    n = int(np.sqrt(p) / c / k)
    xx = jnp.arange(n + 1) / n
    x, y = jnp.meshgrid(xx, xx)
    u0 = -0.4 * jnp.exp(-100 * (x - 0.3) ** 2 - 100 * (y - 0.4) ** 2)
    u200 = wave.tank_wave_2d(u0, 200, k, p)
    u600 = wave.tank_wave_2d(u0, 600, k, p)
    assert np.isfinite(np.asarray(u600)).all()
    assert float(jnp.max(jnp.abs(u600))) < float(jnp.max(jnp.abs(u200)))
    assert float(jnp.max(jnp.abs(u600))) < float(jnp.max(jnp.abs(u0)))


def test_poisson_flow_rate_direct():
    """lab14_p2 benchmark at n=128: flow rate matches the corrected series
    to discretisation accuracy (and NOT the reference's wrong constant)."""
    n = 128
    u = poisson.solve_direct(n)
    q = float(poisson.flow_rate(u, 1.0 / n))
    q_exact = poisson.flow_rate_exact()
    assert abs(q_exact - 0.03514425) < 1e-6      # series sanity
    assert abs(q - q_exact) / q_exact < 1e-3     # 2nd-order accurate solve
    # guard against regressing to the reference's mis-normalised constant
    assert abs(q - 0.05717041928) > 0.01


def test_poisson_cg_matches_direct():
    n = 64
    u_direct = poisson.solve_direct(n)
    u_cg, res = poisson.solve_cg(n, tol=1e-12)
    assert res.converged
    np.testing.assert_allclose(np.asarray(u_cg), np.asarray(u_direct),
                               atol=1e-8)
