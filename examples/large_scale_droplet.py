"""Large-scale droplet coalescence: the BASELINE.json scaling workflow.

The reference caps at 91x61 (dense-in-memory, serial, matplotlib-coupled —
SURVEY.md §5.7).  This driver scales the same physics to 1024²-4096² on TPU:

1. upsample a reference checkpoint's *mesh potential* to the fine grid
   (io.fixtures.upsample — boundary-consistent spline blending),
2. re-seed the coalescing droplets analytically on the refined mesh (the
   fine mesh resolves the 1/a interface the coarse state cannot),
3. equilibrate the mesh with PMA relaxation sweeps,
4. evolve with the mixed-precision JFNK stepper (f64 states/residuals —
   the fine-grid one-sided boundary stencils cancel ~1e9-scale terms and
   genuinely need f64 — with f32 inner Krylov and f32 spectral transforms).

Usage:  python examples/large_scale_droplet.py [n] [steps]
"""
import dataclasses
import json
import pathlib
import sys
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402

from iterative_solvers_tpu.io import fixtures as fx  # noqa: E402
from iterative_solvers_tpu.models import droplet as dp  # noqa: E402
from iterative_solvers_tpu.ops import curvilinear  # noqa: E402
from iterative_solvers_tpu.meshmove.pma import loop_pma  # noqa: E402
from iterative_solvers_tpu.solvers.newton import NewtonKrylov  # noqa: E402

COAL = "/root/reference/python_work/initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt"
DROPS = [(0.0, 0.0, 1.0, 1.0), (3.0, 0.0, 1.0, 1.0)]


def mesh_dt(n: int) -> float:
    """Resolution-scaled explicit PMA step.  The monitor |lap u|^2 grows
    ~(interface curvature)^2 as the 1/a interface becomes resolved — at
    4096² it is ~1e4x the 1024² value, and the 1024²-tuned dtmesh
    over-compresses then tangles the mesh (measured: jac -> -1e19 within
    10 iterations).  Scaling dtmesh by (1024/n)^2 keeps the explicit mesh
    flow stable at every grid."""
    return 1e-10 * min(1.0, (1024.0 / n) ** 2)


def prepare(n: int):
    """State preparation on the deviation-form mesh (phi = Q - identity):
    the f32-robust geometry at fine grids, which lets the whole PMA
    sub-loop run in f32 (mesh_dtype) without the ~Q/h² cancellation."""
    fixture = fx.load(COAL)
    big = fx.upsample(fixture, n, n)
    cfg = dataclasses.replace(fx.config_for(big), spectral_dtype="float32",
                              mesh_dtype="float32")
    phi = curvilinear.to_deviation(jnp.array(big.q), cfg.grid)
    mon = lambda a, b, c: dp.monitor_source(a, b, c)
    for _ in range(3):
        geom = curvilinear.mesh_geometry_dev(phi, cfg.grid)
        u = dp.seeded_solution(geom, cfg, DROPS)
        phi = loop_pma(phi, u, mesh_dt(n), 60, cfg.grid, cfg.pma, mon,
                       curvilinear.mesh_geometry_dev)
    geom = curvilinear.mesh_geometry_dev(phi, cfg.grid)
    u = dp.seeded_solution(geom, cfg, DROPS)
    assert float(jnp.min(geom.jac)) > 0, "mesh tangled during preparation"
    return cfg, u, phi


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # dt scaled at 4096²: the fully-resolved interface steepens the
    # nonlinear system; 5e-10 converges in 11 Newton iterations (measured
    # f_norm 7.4e-6), 1e-9 stalls at ~5e-5
    dt = 1e-9 * min(1.0, 2048.0 / n)

    t0 = time.time()
    cfg, u, q = prepare(n)
    print(f"prepared {n}x{n} state in {time.time()-t0:.0f}s", flush=True)

    solver = NewtonKrylov(f_tol=1e-5, maxiter=14, inner_m=12, outer_k=6,
                          inner_dtype="float32", max_backtracks=4)
    # inner Krylov: fused Pallas JVP matvec (analytic f32 linearisation,
    # ops/pallas_droplet.py) — outer residuals/line search stay f64
    mode = sys.argv[3] if len(sys.argv) > 3 else "kernel"
    jvp_kw = ({"jvp_dtype": "float32", "jvp_kernel": True,
               "residual_mode": "df64"} if mode == "dfres" else
              {"jvp_dtype": "float32", "jvp_kernel": True}
              if mode == "kernel" else
              {"jvp_dtype": "float32"} if mode == "jvp" else {})
    step = dp.make_step(cfg, dt=dt, dtmesh=mesh_dt(n), pma_loops=20,
                        solver=solver, deviation_form=True, **jvp_kw)
    jf = jax.jit(lambda u, q: step(u, q, dt))

    t0 = time.time()
    out = jf(u, q)
    float(jnp.sum(out.u))
    print(f"compile+first step {time.time()-t0:.0f}s", flush=True)

    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        out = jf(out.u, out.q)
        float(jnp.sum(out.u))
        times.append(time.perf_counter() - t0)
    print(json.dumps({
        "n": n,
        "step_ms": round(1000 * float(np.median(times)), 1),
        "converged": bool(out.converged),
        "newton_iters": int(out.newton_iters),
        "f_norm": float(out.f_norm),
        "dof_ratio_vs_reference": round(n * n / 5551.0, 1),
    }))


if __name__ == "__main__":
    main()
