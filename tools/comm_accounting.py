"""Communication accounting for the sharded step (VERDICT round-1 item 6).

Two parts:

1. **Measured collective counts** — compile the explicit-halo sharded droplet
   residual / PMA dqdt / full step on an 8-way virtual mesh and count the
   collectives in the optimized HLO (utils.roofline.comm_stats_from_compiled),
   for both the explicit shard_map path and the GSPMD path.
2. **Analytic weak-scaling projection** — per-step halo bytes vs compute
   bytes for 1024²-4096² at 2/4/8-way row sharding, with the projected
   weak-scaling efficiency against v5e ICI bandwidth.

Prints a markdown table for PARITY.md.  CPU virtual devices; run with
``python tools/comm_accounting.py``.
"""
import dataclasses
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from iterative_solvers_tpu.models import droplet as dp
from iterative_solvers_tpu.ops import curvilinear
from iterative_solvers_tpu.dist.droplet import make_sharded_ops, DEPTH_RESIDUAL
from iterative_solvers_tpu.solvers.newton import NewtonKrylov
from iterative_solvers_tpu.utils.roofline import (
    comm_stats_from_compiled, halo_step_model, halo_step_model_2d,
)


def measured_collectives():
    n_dev = 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=("y",))
    cfg = dataclasses.replace(dp.DropletConfig(), nx=48, ny=32 * n_dev,
                              epsilon=0.05, a=10.0)
    grid = cfg.grid
    solver = NewtonKrylov(f_tol=1e-6, maxiter=4, inner_m=8, outer_k=4)
    ops = make_sharded_ops(cfg, mesh, solver=solver, pma_solver="chebyshev")

    phi = jax.device_put(jnp.zeros(grid.shape), ops.sharding)
    geom = curvilinear.mesh_geometry_dev(phi, grid)
    u = jax.device_put(dp.seeded_solution(geom, cfg, [(1.0, 0.0, 1.0, 0.8)]),
                       ops.sharding)
    F = jax.device_put(dp.pde_rhs(u, geom, cfg), ops.sharding)

    rows = []

    def record(name, fn, *args):
        compiled = jax.jit(fn).lower(*args).compile()
        s = comm_stats_from_compiled(compiled)
        rows.append((name, s))
        print(f"| {name} | {s.collective_permute_count} | "
              f"{s.permute_bytes} | {s.all_reduce_count} | "
              f"{s.all_gather_count} | {s.all_gather_bytes} |", flush=True)

    print("\n### Measured collectives per compiled graph "
          "(8-way virtual mesh, 256x48 f64 blocks)\n")
    print("| graph | permutes | permute bytes | all-reduces | all-gathers "
          "| all-gather bytes |")
    print("|---|---|---|---|---|---|")
    record("explicit residual eval", lambda a: ops.residual(a, u, F, phi, 1e-7), u)
    record("explicit PMA dqdt (chebyshev)", lambda p: ops.pma_dqdt(p, u), phi)
    record("explicit full step", lambda a, p: ops.step(a, p, 1e-7, 1e-9, 2).u,
           u, phi)

    # GSPMD comparison: the ordinary global residual jitted with shardings
    sharding = NamedSharding(mesh, P("y", None))
    def gspmd_residual(a):
        g = curvilinear.mesh_geometry_dev(phi, grid)
        return dp.cn_residual(a, u, F, 1e-7, g, cfg)
    compiled = (jax.jit(gspmd_residual, in_shardings=sharding,
                        out_shardings=sharding).lower(u).compile())
    s = comm_stats_from_compiled(compiled)
    print(f"| GSPMD residual eval | {s.collective_permute_count} | "
          f"{s.permute_bytes} | {s.all_reduce_count} | {s.all_gather_count} "
          f"| {s.all_gather_bytes} |")
    return rows


def measured_collectives_2d():
    """(2, 4) mesh: the 2-D explicit path's collectives vs GSPMD."""
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                axis_names=("y", "x"))
    cfg = dataclasses.replace(dp.DropletConfig(), nx=128, ny=256,
                              epsilon=0.05, a=10.0)
    grid = cfg.grid
    solver = NewtonKrylov(f_tol=1e-6, maxiter=4, inner_m=8, outer_k=4)
    ops = make_sharded_ops(cfg, mesh, solver=solver, pma_solver="chebyshev",
                           x_axis_name="x")

    phi = jax.device_put(jnp.zeros(grid.shape), ops.sharding)
    geom = curvilinear.mesh_geometry_dev(phi, grid)
    u = jax.device_put(dp.seeded_solution(geom, cfg, [(1.0, 0.0, 1.0, 0.8)]),
                       ops.sharding)
    F = jax.device_put(dp.pde_rhs(u, geom, cfg), ops.sharding)

    print("\n### Measured collectives, 2-D (2,4) mesh (256x128 f64 grid, "
          "128x32 blocks)\n")
    print("| graph | permutes | permute bytes | all-reduces | all-gathers "
          "| all-gather bytes |")
    print("|---|---|---|---|---|---|")

    def record(name, fn, *args):
        compiled = jax.jit(fn).lower(*args).compile()
        s = comm_stats_from_compiled(compiled)
        print(f"| {name} | {s.collective_permute_count} | "
              f"{s.permute_bytes} | {s.all_reduce_count} | "
              f"{s.all_gather_count} | {s.all_gather_bytes} |", flush=True)

    record("explicit 2-D residual eval",
           lambda a: ops.residual(a, u, F, phi, 1e-7), u)
    record("explicit 2-D full step",
           lambda a, p: ops.step(a, p, 1e-7, 1e-9, 2).u, u, phi)

    sharding = NamedSharding(mesh, P("y", "x"))

    def gspmd_residual(a):
        g = curvilinear.mesh_geometry_dev(phi, grid)
        return dp.cn_residual(a, u, F, 1e-7, g, cfg)

    compiled = (jax.jit(gspmd_residual, in_shardings=sharding,
                        out_shardings=sharding).lower(u).compile())
    s = comm_stats_from_compiled(compiled)
    print(f"| GSPMD 2-D residual eval | {s.collective_permute_count} | "
          f"{s.permute_bytes} | {s.all_reduce_count} | {s.all_gather_count} "
          f"| {s.all_gather_bytes} |")


def projection_table_2d():
    print("\n### Projected weak-scaling, 2-D blocks (residual eval, f64)\n")
    print("| grid | mesh | block | halo bytes/eval | comm/compute "
          "| weak-scaling eff |")
    print("|---|---|---|---|---|---|")
    for n in (2048, 4096, 8192):
        for (py, px) in ((2, 4), (4, 4), (4, 8), (8, 8)):
            m = halo_step_model_2d(
                ny=n, nx=n, py=py, px=px, halo=DEPTH_RESIDUAL,
                exchanges_per_step=4, dtype_bytes=8, compute_passes=20,
                hbm_gbps=819.0,
            )
            print(f"| {n}² | {py}x{px} | {m['block'][0]}x{m['block'][1]} | "
                  f"{m['comm_bytes']/1e6:.2f} MB | "
                  f"{m['comm_compute_ratio']:.4f} | "
                  f"{m['weak_scaling_efficiency']*100:.1f}% |", flush=True)


def projection_table():
    print("\n### Projected weak-scaling (residual eval, f64, explicit halos)\n")
    print("| grid | devices | block rows | halo bytes/eval | compute bytes/eval "
          "| comm/compute | weak-scaling eff |")
    print("|---|---|---|---|---|---|---|")
    # residual eval: 4 halo'd fields exchanged once at depth rows each
    # (u, u_old, F, phi; coords are static), ~20 field passes of compute
    for n in (1024, 2048, 4096):
        for p in (2, 4, 8):
            m = halo_step_model(
                ny=n, nx=n, n_devices=p, halo_rows=DEPTH_RESIDUAL,
                exchanges_per_step=4, dtype_bytes=8, compute_passes=20,
                hbm_gbps=819.0,
            )
            print(f"| {n}² | {p} | {m['block_rows']} | "
                  f"{m['comm_bytes']/1e6:.2f} MB | "
                  f"{m['compute_bytes']/1e9:.2f} GB | "
                  f"{m['comm_compute_ratio']:.4f} | "
                  f"{m['weak_scaling_efficiency']*100:.1f}% |", flush=True)


if __name__ == "__main__":
    measured_collectives()
    measured_collectives_2d()
    projection_table()
    projection_table_2d()
