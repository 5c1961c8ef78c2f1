"""Phase-level profile of the 91x61 headline droplet step (VERDICT r4 #4).

Where do bench.py's ~59 ms go?  The headline config is
``make_step(cfg, dt=1e-5, dtmesh=3e-9, pma_loops=400, solver=fast_solver())``
— f64 outer residuals + FD directional derivatives (every inner-Krylov
matvec is a full f64 residual eval), f32 inner LGMRES, 400 f32 PMA
sub-iterations.  This tool measures, with the suite's chained-marginal
methodology:

  - f64 residual eval cost x the solver's actual func_evals count
  - f32 PMA sub-iteration cost x 400
  - mesh geometry + pde_rhs (once per step)
  - LGMRES cycle overhead (the solve minus its residual evals)

and prints the reconstruction next to the measured full step.

Usage: python tools/profile_small_step.py
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
from jax import lax  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "benchmarks"))
from run_all import marginal_ms, chain_fn  # noqa: E402

from iterative_solvers_tpu.io import fixtures as fx  # noqa: E402
from iterative_solvers_tpu.models import droplet as dp  # noqa: E402
from iterative_solvers_tpu.ops import curvilinear  # noqa: E402
from iterative_solvers_tpu.meshmove.pma import loop_pma  # noqa: E402

FIXTURE = ("/root/reference/python_work/"
           "initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt")
DT = 1e-5


def main():
    fixture = fx.load(FIXTURE)
    cfg = dataclasses.replace(fx.config_for(fixture),
                              spectral_dtype="float32",
                              mesh_dtype="float32")
    grid = cfg.grid
    u = jnp.array(fixture.u)
    q = jnp.array(fixture.q)
    out = {}

    geom = jax.jit(curvilinear.mesh_geometry, static_argnums=1)(q, grid)
    F = jax.jit(dp.pde_rhs, static_argnums=2)(u, geom, cfg)

    # actual JFNK work per step: iters + func_evals from the solver itself
    solver = dp.fast_solver()
    from functools import partial

    res_fn = partial(dp.cn_residual, u_old=u, F=F, dt=DT, geom=geom, cfg=cfg)
    r = jax.jit(lambda x: solver.solve(res_fn, x))(u)
    out["newton_iters"] = int(r.iters)
    out["func_evals"] = int(r.func_evals)

    # f64 residual eval
    def res_op(w, uold, Fa, *g):
        gg = curvilinear.MeshGeometry(*g)
        return w + 0.0 * dp.cn_residual(w, u_old=uold, F=Fa, dt=DT,
                                        geom=gg, cfg=cfg)
    out["resid_f64_ms"] = marginal_ms(
        chain_fn(res_op, u, u, F, *geom), 10, 110, reps=5)

    # the whole JFNK solve (isolated)
    def solve_op(w, uold, Fa, *g):
        gg = curvilinear.MeshGeometry(*g)
        rf = partial(dp.cn_residual, u_old=uold, F=Fa, dt=DT, geom=gg,
                     cfg=cfg)
        rr = solver.solve(rf, w)
        return w + 0.0 * rr.x
    out["jfnk_solve_ms"] = marginal_ms(
        chain_fn(solve_op, u, u, F, *geom), 2, 12, reps=5)

    # f32 PMA sub-iteration (chain k as traced arg)
    mon = lambda a, b, c: dp.monitor_source(a, b, c)
    jp = jax.jit(lambda qq, uu, k: jnp.sum(loop_pma(
        qq, uu, 3e-9, k, grid, cfg.pma, mon)))
    fp = lambda k: jp(q, u, k)
    fp.traced_k = True
    out["pma_iter_ms"] = marginal_ms(fp, 50, 450, reps=5)

    # geometry + pde_rhs (once per step)
    out["geometry_ms"] = marginal_ms(chain_fn(
        lambda w: w + 0.0 * curvilinear.mesh_geometry(w, grid).jac, q),
        10, 110, reps=5)

    def rhs_op(w, *g):
        gg = curvilinear.MeshGeometry(*g)
        return w + 0.0 * dp.pde_rhs(w, gg, cfg)
    out["pde_rhs_ms"] = marginal_ms(chain_fn(rhs_op, u, *geom), 10, 110,
                                    reps=5)

    # full step (the headline row's own config)
    step = dp.make_step(cfg, dt=DT, dtmesh=3e-9, pma_loops=400,
                        solver=solver)

    def step_op(w, qq):
        o = step(w, qq, DT)
        return w + 0.0 * o.u, qq + 0.0 * o.q
    f = chain_fn(lambda w, qq: step_op(w, qq)[0], u, q)
    out["full_step_ms"] = marginal_ms(f, 2, 12, reps=5)

    out["reconstruction_ms"] = round(
        out["jfnk_solve_ms"] + 400 * out["pma_iter_ms"]
        + out["geometry_ms"] + out["pde_rhs_ms"], 2)
    out["jfnk_resid_part_ms"] = round(
        out["func_evals"] * out["resid_f64_ms"], 2)
    out["jfnk_overhead_ms"] = round(
        out["jfnk_solve_ms"] - out["jfnk_resid_part_ms"], 2)
    for k, v in out.items():
        if isinstance(v, float):
            out[k] = round(v, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
