"""Distribution layer: halo exchange, sharded operators, sharded JFNK.

Runs on 8 virtual CPU devices (conftest sets
--xla_force_host_platform_device_count=8).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from iterative_solvers_tpu.dist.mesh import make_mesh, local_block_shape
from iterative_solvers_tpu.dist.halo import (
    sharded_lap_periodic, sharded_sh_operator, shard_field, with_halo, pdot,
)
from iterative_solvers_tpu.ops.stencils import lap_periodic, sh_linear_operator
from iterative_solvers_tpu.models.swift_hohenberg import SHConfig, make_cn_step
from iterative_solvers_tpu.solvers.newton import NewtonKrylov

try:
    from jax.experimental.shard_map import shard_map
except ImportError:
    from jax.shard_map import shard_map

RNG = np.random.default_rng(3)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(devices=jax.devices()[:8])


def test_mesh_factorisation(mesh8):
    assert mesh8.devices.shape == (2, 4)
    assert local_block_shape((32, 32), mesh8) == (16, 8)


def test_sharded_lap_matches_dense(mesh8):
    n, h = 32, 0.625
    u = jnp.array(RNG.standard_normal((n, n)))
    us = shard_field(u, mesh8)
    got = np.asarray(sharded_lap_periodic(us, h, mesh8))
    want = np.asarray(lap_periodic(u, h))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_sharded_sh_operator_matches_dense(mesh8):
    n, d, r = 32, 40.0, 0.01
    h = d / n
    u = jnp.array(RNG.standard_normal((n, n)))
    us = shard_field(u, mesh8)
    got = np.asarray(sharded_sh_operator(us, h, r, mesh8))
    want = np.asarray(sh_linear_operator(u, h, r))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_halo_nonperiodic_zeros(mesh8):
    """Non-periodic halos must be zero at the global edges: extended blocks
    reassembled along y equal the zero-padded global array."""
    n = 16
    u = jnp.array(RNG.standard_normal((n, n)))
    us = shard_field(u, mesh8)

    def local(block):
        ext = with_halo(block, 2, ("y", "x"), periodic=False)
        return ext[2:-2, :]  # strip y halos; keep x halos for inspection

    out = shard_map(local, mesh=mesh8, in_specs=P("y", "x"),
                    out_specs=P("y", "x"))(us)
    # each shard's x-extended block is width-2 wider on both sides:
    # reassembled width = n + 2*width*px = 16 + 2*2*4
    assert out.shape == (n, n + 2 * 2 * 4)


def test_pdot_matches_global(mesh8):
    n = 32
    a = jnp.array(RNG.standard_normal((n, n)))
    b = jnp.array(RNG.standard_normal((n, n)))

    def local(ab, bb):
        return pdot(ab, bb, ("y", "x"))[None]

    got = shard_map(
        local, mesh=mesh8, in_specs=(P("y", "x"), P("y", "x")),
        out_specs=P(None),
    )(shard_field(a, mesh8), shard_field(b, mesh8))
    np.testing.assert_allclose(float(got[0]), float(jnp.sum(a * b)),
                               rtol=1e-12)


@pytest.mark.parametrize("explicit", [True, False])
def test_sharded_sh_step_matches_single_device(mesh8, explicit):
    """Full distributed CN/JFNK step == single-device step (both halo
    styles)."""
    from iterative_solvers_tpu.dist.solvers import make_sharded_sh_step

    cfg = SHConfig(n=32)
    solver = NewtonKrylov(f_tol=1e-10, maxiter=40, inner_m=20, outer_k=5)
    u0 = jnp.array(RNG.standard_normal((cfg.n, cfg.n)))

    ref_step = make_cn_step(cfg, solver)
    want, res_ref = ref_step(u0)
    assert bool(res_ref.converged)

    step = make_sharded_sh_step(cfg, mesh8, solver=solver,
                                explicit_halos=explicit)
    got, res = step(shard_field(u0, mesh8))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-9)
    # result must still be sharded over the mesh
    assert len(got.sharding.device_set) == 8


def test_sharded_trajectory_scan(mesh8):
    """Multi-step sharded evolution under lax.scan: sharding must survive
    the scan and match the single-device trajectory."""
    from iterative_solvers_tpu.models.swift_hohenberg import evolve_cn

    cfg = SHConfig(n=32)
    solver = NewtonKrylov(f_tol=1e-9, maxiter=30, inner_m=15, outer_k=5)
    u0 = jnp.array(RNG.standard_normal((cfg.n, cfg.n)))

    want, _, _ = jax.jit(lambda u: evolve_cn(u, 4, cfg, solver))(u0)

    sharding = shard_field(u0, mesh8).sharding
    f = jax.jit(lambda u: evolve_cn(u, 4, cfg, solver),
                in_shardings=sharding,
                out_shardings=(sharding, None, None))
    got, iters, fn = f(shard_field(u0, mesh8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-9)
    assert len(got.sharding.device_set) == 8
