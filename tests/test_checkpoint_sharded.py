"""Multi-host-safe sharded checkpointing (SURVEY §5.4, VERDICT r2 item 8).

Under the 8-virtual-device CPU mesh: save/restore of a sharded droplet
state must preserve values, sharding, and the trajectory (step -> save ->
load -> step == two continuous steps), and layout/config mismatches must
fail loudly.
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from iterative_solvers_tpu.io import checkpoint as ck
from iterative_solvers_tpu.models import droplet as dp
from iterative_solvers_tpu.ops import curvilinear

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def sharded_state():
    cfg = dataclasses.replace(
        dp.DropletConfig(), nx=64, ny=64, epsilon=0.05, a=10.0)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                axis_names=("y", "x"))
    sharding = NamedSharding(mesh, P("y", "x"))
    q = jax.device_put(dp.initial_mesh_potential(cfg, jnp.float64), sharding)
    geom = curvilinear.mesh_geometry(q, cfg.grid)
    u = jax.device_put(
        dp.seeded_solution(geom, cfg, [(0.0, 0.0, 1.0, 0.5)]), sharding)
    return cfg, mesh, sharding, u, q


def test_save_restore_preserves_values_and_sharding(sharded_state, tmp_path):
    cfg, mesh, sharding, u, q = sharded_state
    ck.save_sharded(tmp_path / "ckpt", {"u": u, "q": q}, config=cfg,
                    step=7, time=1.5e-4)
    out, meta = ck.load_sharded(tmp_path / "ckpt",
                                {"u": sharding, "q": sharding}, config=cfg)
    assert meta["step"] == 7 and meta["time"] == 1.5e-4
    np.testing.assert_array_equal(np.asarray(out["u"]), np.asarray(u))
    np.testing.assert_array_equal(np.asarray(out["q"]), np.asarray(q))
    assert out["u"].sharding.is_equivalent_to(u.sharding, u.ndim)
    # per-device blocks landed where the sharding says they belong
    for sh_new, sh_old in zip(out["u"].addressable_shards,
                              u.addressable_shards):
        assert sh_new.device == sh_old.device
        np.testing.assert_array_equal(np.asarray(sh_new.data),
                                      np.asarray(sh_old.data))


def test_restart_trajectory_continuity(sharded_state, tmp_path):
    cfg, mesh, sharding, u, q = sharded_state
    step = dp.make_step(cfg, dt=1e-7, dtmesh=1e-9, pma_loops=2)
    jf = jax.jit(lambda a, b: step(a, b, 1e-7)[:2],
                 in_shardings=(sharding, sharding),
                 out_shardings=(sharding, sharding))
    u1, q1 = jf(u, q)
    u2, q2 = jf(u1, q1)

    ck.save_sharded(tmp_path / "mid", {"u": u1, "q": q1}, config=cfg, step=1)
    out, _ = ck.load_sharded(tmp_path / "mid",
                             {"u": sharding, "q": sharding}, config=cfg)
    u2r, q2r = jf(out["u"], out["q"])
    np.testing.assert_array_equal(np.asarray(u2r), np.asarray(u2))
    np.testing.assert_array_equal(np.asarray(q2r), np.asarray(q2))


def test_mismatches_fail_loudly(sharded_state, tmp_path):
    cfg, mesh, sharding, u, q = sharded_state
    ck.save_sharded(tmp_path / "ck", {"u": u}, config=cfg)
    # config mismatch
    bad_cfg = dataclasses.replace(cfg, epsilon=0.01)
    with pytest.raises(ck.CheckpointMismatch, match="config mismatch"):
        ck.load_sharded(tmp_path / "ck", {"u": sharding}, config=bad_cfg)
    # partition-layout mismatch
    rows_only = NamedSharding(mesh, P("y", None))
    with pytest.raises(ck.CheckpointMismatch, match="stored partition"):
        ck.load_sharded(tmp_path / "ck", {"u": rows_only}, config=cfg)
