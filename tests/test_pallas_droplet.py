"""Fused droplet JVP-matvec kernel: field math, window logic, end-to-end.

Three layers of validation, all on CPU (the TPU lane re-runs the slab
simulation + the real pallas_call on chip — tests/tpu/run_on_chip.py):

1. the jnp mirror (ops.pallas_droplet.jvp_apply_ref) against jax.jvp of the
   f32-cast cn_residual — validates jvp_field_stack's analytic
   linearisation;
2. the kernel's compute body chunk-by-chunk with DMA-identical slabs
   (chain_block_reference_sim) against the mirror — validates every
   window offset and global-edge select in _chain_block;
3. make_step(jvp_kernel=True) end-to-end (the CPU fallback path is the
   mirror) against the jax.jvp path — Newton counts and solution unchanged.
"""
import pathlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iterative_solvers_tpu.io import fixtures as fx
from iterative_solvers_tpu.models import droplet as dp
from iterative_solvers_tpu.ops import curvilinear
from iterative_solvers_tpu.ops.pallas_droplet import (
    jvp_apply_ref, chain_block_reference_sim,
)

REFDIR = pathlib.Path("/root/reference/python_work")
RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def state():
    fixture = fx.load(
        REFDIR / "initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt")
    cfg = fx.config_for(fixture)
    u = jnp.array(fixture.u)
    q = jnp.array(fixture.q)
    return cfg, u, q


def _f32_stack(cfg, u, q, dt):
    grid = cfg.grid
    geom = curvilinear.mesh_geometry(q, grid)
    geom32 = curvilinear.MeshGeometry(
        *(a.astype(jnp.float32) for a in geom))
    x32 = u.astype(jnp.float32)
    stack = dp.jvp_field_stack(x32, geom32, cfg, jnp.float32(dt))
    return grid, geom32, x32, stack


def test_mirror_matches_jax_jvp(state):
    cfg, u, q = state
    dt = 1e-5
    grid, geom32, x32, stack = _f32_stack(cfg, u, q, dt)
    v = jnp.array(RNG.standard_normal(u.shape), jnp.float32)

    res = lambda w: dp.cn_residual(w, u_old=x32, F=jnp.zeros_like(x32),
                                   dt=jnp.float32(dt), geom=geom32, cfg=cfg)
    want = jax.jvp(res, (x32,), (v,))[1]
    got = jvp_apply_ref(v, stack, grid)
    scale = float(jnp.abs(want).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5 * scale)


def test_chain_block_matches_mirror(state):
    """Kernel body on DMA-identical slabs == mirror, on a grid that blocks
    (the window/edge-select logic is shape-generic; nx=128 keeps lanes
    honest, ny=64 gives first/middle/last chunks at bm=16)."""
    cfg, u, q = state
    import dataclasses
    cfg2 = dataclasses.replace(cfg, nx=128, ny=64)
    grid = cfg2.grid
    q2 = dp.initial_mesh_potential(cfg2, jnp.float64)
    # perturb the mesh so the geometry is genuinely curvilinear
    qpert = 0.05 * jnp.sin(jnp.asarray(grid.xx)) * jnp.cos(jnp.asarray(grid.yy))
    geom = curvilinear.mesh_geometry(q2 + qpert, grid)
    geom32 = curvilinear.MeshGeometry(*(a.astype(jnp.float32) for a in geom))
    x32 = (cfg2.epsilon + jnp.exp(
        -(jnp.asarray(grid.xx) ** 2 + jnp.asarray(grid.yy) ** 2))
    ).astype(jnp.float32)
    stack = dp.jvp_field_stack(x32, geom32, cfg2, jnp.float32(1e-5))
    v = jnp.array(RNG.standard_normal((64, 128)), jnp.float32)

    want = jvp_apply_ref(v, stack, grid)
    for bm in (8, 16):
        got = chain_block_reference_sim(v, stack, grid, block_rows=bm)
        scale = float(jnp.abs(want).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5 * scale, err_msg=f"bm={bm}")


def test_make_step_jvp_kernel_parity(state):
    cfg, u, q = state
    step_jvp = dp.make_step(cfg, dt=1e-5, dtmesh=3e-9, pma_loops=5,
                            jvp_dtype="float32")
    step_ker = dp.make_step(cfg, dt=1e-5, dtmesh=3e-9, pma_loops=5,
                            jvp_dtype="float32", jvp_kernel=True)
    o_j = step_jvp(u, q, 1e-5)
    o_k = step_ker(u, q, 1e-5)
    assert bool(o_j.converged) and bool(o_k.converged)
    assert abs(int(o_j.newton_iters) - int(o_k.newton_iters)) <= 1
    np.testing.assert_allclose(np.asarray(o_k.u), np.asarray(o_j.u),
                               atol=5e-7)
