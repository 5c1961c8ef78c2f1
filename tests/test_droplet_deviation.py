"""Deviation-form droplet step == full-potential step (f64), enabling f32."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from iterative_solvers_tpu.io import fixtures as fx
from iterative_solvers_tpu.models import droplet as dp
from iterative_solvers_tpu.ops import curvilinear

COAL = "/root/reference/python_work/initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt"


def test_deviation_step_matches_full():
    fixture = fx.load(COAL)
    cfg = fx.config_for(fixture)
    grid = cfg.grid
    u = jnp.array(fixture.u)
    q = jnp.array(fixture.q)
    phi = curvilinear.to_deviation(q, grid)

    solver = dp.fast_solver()
    step_full = dp.make_step(cfg, dt=1e-5, dtmesh=3e-9, pma_loops=3,
                             solver=solver)
    step_dev = dp.make_step(cfg, dt=1e-5, dtmesh=3e-9, pma_loops=3,
                            solver=solver, deviation_form=True)

    out_f = step_full(u, q, 1e-5)
    out_d = step_dev(u, phi, 1e-5)
    assert bool(out_f.converged) and bool(out_d.converged)
    np.testing.assert_allclose(np.asarray(out_d.u), np.asarray(out_f.u),
                               atol=1e-9)
    # mesh states: phi_new + identity == q_new
    q_from_dev = out_d.q + (q - phi)
    np.testing.assert_allclose(np.asarray(q_from_dev), np.asarray(out_f.q),
                               atol=1e-9)
