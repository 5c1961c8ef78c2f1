"""Headline benchmark: Swift–Hohenberg CN Newton–Krylov step, 64² grid.

Reference baseline (BASELINE.md row 1): scipy newton_krylov via
sh_scipy_nk.py at ~43 ms/step median (64² dof, dt=0.2, f_tol=6e-6, f64) on
the survey host CPU.

This bench runs the same model and tolerance with the TPU-native JFNK stack
(f64 outer residuals / analytic f32 Jacobian matvecs in the inner LGMRES —
convergence checked against the same 6e-6 max-norm criterion every step).

Methodology: whole trajectories run under one jit (lax.scan); timing is the
*marginal* cost per step between a short and a long trajectory with a final
host fetch — this removes the fixed per-dispatch overhead of the measurement
harness (which on this tunnel is ~30 ms and would otherwise dominate) while
counting all real device work.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}
where vs_baseline = baseline_ms / our_ms (>1 means faster than reference).
"""
import json
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from iterative_solvers_tpu.models.swift_hohenberg import (  # noqa: E402
    SHConfig, evolve_cn, fast_solver,
)

BASELINE_MS = 43.0  # BASELINE.md row 1 (scipy, survey host CPU)
K_SHORT, K_LONG = 10, 110


def _timed(fn, u0, reps=3):
    out = fn(u0)
    float(jnp.sum(out[0]))  # warmup + compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        u, iters, f_norms = fn(u0)
        float(jnp.sum(u))  # host fetch = true synchronisation
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), f_norms


def main():
    cfg = SHConfig(n=64)
    solver = fast_solver(cfg, f_tol=6e-6, inner_m=10, outer_k=5)
    u0 = jnp.array(np.random.default_rng(0).standard_normal((cfg.n, cfg.n)))

    t_short, _ = _timed(jax.jit(lambda u: evolve_cn(u, K_SHORT, cfg, solver)), u0)
    t_long, f_norms = _timed(jax.jit(lambda u: evolve_cn(u, K_LONG, cfg, solver)), u0)

    ms = 1000.0 * (t_long - t_short) / (K_LONG - K_SHORT)
    worst = float(jnp.max(f_norms))
    assert worst <= 6e-6, f"JFNK failed f_tol=6e-6 (worst {worst:.2e})"

    print(
        json.dumps(
            {
                "metric": "sh64_cn_newton_krylov_step_f64tol",
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / ms, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
