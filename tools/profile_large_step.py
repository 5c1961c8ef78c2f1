"""Phase-level profile of the large-grid droplet step.

Where do the 4.9 s at 4096² actually go?  Measures the marginal cost of
each phase of models.droplet.make_step (jvp_kernel production config) with
the suite's chained-marginal methodology:

  - f64 outer residual eval (cn_residual chain)        x ~(iters + linesearch)
  - jvp_field_stack (per-Newton coefficient precompute) x iters
  - fused Pallas JVP matvec (f32)                      x iters*inner_m
  - loop_pma iteration (f32 spectral DCT solve)        x pma_loops
  - mesh_geometry_dev (f64, once)
  - pde_rhs (f64, once)

Usage: python tools/profile_large_step.py [n]
"""
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

from examples.large_scale_droplet import prepare, mesh_dt  # noqa: E402
from iterative_solvers_tpu.models import droplet as dp  # noqa: E402
from iterative_solvers_tpu.ops import curvilinear  # noqa: E402
from iterative_solvers_tpu.ops.pallas_droplet import jvp_matvec_pallas  # noqa: E402
from iterative_solvers_tpu.meshmove.pma import loop_pma  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    dt = 1e-9 * min(1.0, 2048.0 / n)

    t0 = time.time()
    cfg, u, q = prepare(n)
    grid = cfg.grid
    print(f"prepared {n}x{n} in {time.time()-t0:.0f}s", flush=True)

    geom = jax.jit(curvilinear.mesh_geometry_dev, static_argnums=1)(q, grid)
    F = jax.jit(dp.pde_rhs, static_argnums=2)(u, geom, cfg)

    # f64 outer residual (all big arrays passed as jit args — closed-over
    # arrays blow the remote-compile tunnel, CLAUDE.md)
    def res_op(w, uold, Fa, *g):
        gg = curvilinear.MeshGeometry(*g)
        return w + 0.0 * dp.cn_residual(w, u_old=uold, F=Fa, dt=dt,
                                        geom=gg, cfg=cfg)
    f = chain_fn(res_op, u, u, F, *geom)
    print(f"resid_f64_ms {marginal_ms(f, 2, 12, reps=3):.2f}", flush=True)

    # jvp_field_stack (f32 geometry + f32 x)
    geom32 = curvilinear.MeshGeometry(*(a.astype(jnp.float32) for a in geom))
    u32 = u.astype(jnp.float32)

    def stack_op(x, *g):
        gg = curvilinear.MeshGeometry(*g)
        s = dp.jvp_field_stack(x, gg, cfg, jnp.float32(dt))
        return x + 0.0 * jnp.sum(s, axis=0)
    f = chain_fn(stack_op, u32, *geom32)
    print(f"jvp_stack_ms {marginal_ms(f, 2, 12, reps=3):.2f}", flush=True)

    # fused Pallas JVP matvec
    def mkstack(x, *g):
        return dp.jvp_field_stack(x, curvilinear.MeshGeometry(*g), cfg,
                                  jnp.float32(dt))
    stack = jax.jit(mkstack)(u32, *geom32)
    f = chain_fn(lambda v, s: jvp_matvec_pallas(v, s, grid), u32, stack)
    print(f"jvp_matvec_ms {marginal_ms(f, 5, 55, reps=3):.2f}", flush=True)

    # PMA loop iteration (production config: f32 spectral + mesh dtype)
    mon = lambda a, b, c: dp.monitor_source(a, b, c)
    jp = jax.jit(lambda qq, uu, k: jnp.sum(loop_pma(
        qq, uu, mesh_dt(n), k, grid, cfg.pma, mon,
        curvilinear.mesh_geometry_dev)))
    fp = lambda k: jp(q, u, k)
    fp.traced_k = True
    print(f"pma_iter_ms {marginal_ms(fp, 5, 45, reps=3):.2f}", flush=True)

    # geometry + pde_rhs (once per step)
    f = chain_fn(lambda w: w + 0.0 * curvilinear.mesh_geometry_dev(w, grid).jac,
                 q)
    print(f"geometry_ms {marginal_ms(f, 2, 12, reps=3):.2f}", flush=True)

    def rhs_op(w, *g):
        gg = curvilinear.MeshGeometry(*g)
        return w + 0.0 * dp.pde_rhs(w, gg, cfg)
    f = chain_fn(rhs_op, u, *geom)
    print(f"pde_rhs_ms {marginal_ms(f, 2, 12, reps=3):.2f}", flush=True)


if __name__ == "__main__":
    main()
