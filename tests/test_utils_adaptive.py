"""utils (metrics, roofline, timing) + adaptive backoff stepper + determinism."""
import json

import numpy as np
import jax
import jax.numpy as jnp

from iterative_solvers_tpu.utils.metrics import MetricsLogger
from iterative_solvers_tpu.utils.roofline import (
    stencil_cost, spmv_cost, device_hbm_gbps,
)
from iterative_solvers_tpu.utils.timing import median_ms
from iterative_solvers_tpu.solvers.adaptive import (
    step_with_backoff, evolve_with_backoff, check_finite,
)


def test_metrics_logger(tmp_path):
    p = tmp_path / "m.jsonl"
    log = MetricsLogger(path=p)
    log.log(0, resnorm=1e-3, iters=5)
    log.log(1, resnorm=np.float64(1e-4), iters=np.int32(3))
    lines = [json.loads(l) for l in p.read_text().splitlines()]
    assert lines[1]["resnorm"] == 1e-4 and lines[1]["iters"] == 3
    s = log.summary()
    assert s["resnorm"]["min"] == 1e-4 and s["iters"]["max"] == 5


def test_metrics_scan_outputs():
    log = MetricsLogger()
    log.log_scan_outputs({"dt": jnp.array([1.0, 2.0]),
                          "it": jnp.array([3, 4])})
    assert log.records[1]["dt"] == 2.0 and log.records[1]["it"] == 4


def test_roofline_accounting():
    c = stencil_cost((1024, 1024), 4)
    assert c.bytes_moved == 2 * 1024 * 1024 * 4
    assert abs(c.achieved_gbps(1e-3) - c.bytes_moved / 1e6) < 1e-9
    s = spmv_cost(nnz=5_000, n_rows=1000, n_cols=1000, dtype_bytes=8,
                  fmt="dia")
    assert s.bytes_moved == 5000 * 8 + 2000 * 8
    assert device_hbm_gbps() > 0


def test_median_ms_runs():
    f = jax.jit(lambda x: x * 2 + 1)
    t = median_ms(f, jnp.ones(128), iters=3, warmup=1)
    assert t >= 0


def test_backoff_accepts_good_step():
    step = lambda u, dt: (u + dt, jnp.bool_(True))
    out = step_with_backoff(step, jnp.zeros(3), 0.1)
    assert bool(out.ok) and int(out.attempts) == 1
    np.testing.assert_allclose(np.asarray(out.u), 0.1)
    assert float(out.dt_next) > 0.1


def test_backoff_halves_until_converged():
    """Step 'converges' only when dt <= 0.03 -> two halvings from 0.1."""

    def step(u, dt):
        return u + dt, dt <= 0.03

    out = step_with_backoff(step, jnp.zeros(3), 0.1)
    assert bool(out.ok)
    assert int(out.attempts) == 3
    np.testing.assert_allclose(float(out.dt_used), 0.025)


def test_backoff_rejects_nan():
    def step(u, dt):
        return u + jnp.nan * dt, jnp.bool_(True)

    out = step_with_backoff(step, jnp.zeros(3), 0.1, max_retries=3)
    assert not bool(out.ok)
    assert np.isfinite(np.asarray(out.u)).all()  # original state kept


def test_evolve_with_backoff():
    def step(u, dt):
        return u + dt, dt <= 0.5

    u, dt, (dts, attempts, oks) = evolve_with_backoff(
        step, jnp.zeros(2), 0.1, nsteps=5
    )
    assert bool(jnp.all(oks))
    assert float(dt) <= 0.5 * 1.5 + 1e-9  # growth capped by the accept rule


def test_determinism_bitwise():
    """SURVEY.md §5.2: bitwise-identical re-runs under fixed inputs."""
    from iterative_solvers_tpu.models.swift_hohenberg import SHConfig, make_cn_step
    from iterative_solvers_tpu.solvers.newton import NewtonKrylov

    cfg = SHConfig(n=16)
    step = jax.jit(make_cn_step(cfg, NewtonKrylov(f_tol=1e-9, maxiter=20)))
    u0 = jnp.array(np.random.default_rng(0).standard_normal((16, 16)))
    a = np.asarray(step(u0)[0])
    b = np.asarray(step(u0)[0])
    assert np.array_equal(a, b)
    assert bool(check_finite(jnp.array(a)))


def test_comm_stats_from_compiled_counts_collectives():
    """HLO collective counting on a known sharded graph: a width-1 halo
    exchange compiles to exactly 2 collective-permutes, and a psum to one
    all-reduce."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from iterative_solvers_tpu.dist.halo import halo_exchange_1d
    from iterative_solvers_tpu.utils.roofline import (
        comm_stats_from_compiled, halo_step_model,
    )

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    devs = jax.devices()
    if len(devs) < 4:
        import pytest

        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.array(devs[:4]), axis_names=("y",))

    def body(b):
        lo, hi = halo_exchange_1d(b, 1, "y", axis=0, periodic=True)
        return lo + hi + jax.lax.psum(jnp.sum(b), "y")

    f = shard_map(body, mesh=mesh, in_specs=P("y", None),
                  out_specs=P("y", None))
    x = jax.device_put(jnp.ones((32, 16)),
                       NamedSharding(mesh, P("y", None)))
    stats = comm_stats_from_compiled(jax.jit(f).lower(x).compile())
    assert stats.collective_permute_count == 2
    assert stats.all_reduce_count >= 1
    # HLO shapes are per-device: each permute moves this shard's (1, 16)
    # f64 halo strip to its neighbour
    assert stats.permute_bytes == 2 * 1 * 16 * 8

    m = halo_step_model(ny=1024, nx=1024, n_devices=8, halo_rows=12,
                        exchanges_per_step=4, dtype_bytes=8,
                        compute_passes=20, hbm_gbps=819.0)
    assert 0.8 < m["weak_scaling_efficiency"] < 1.0
    assert m["block_rows"] == 128
