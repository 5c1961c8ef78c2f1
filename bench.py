"""Headline benchmark: Swift–Hohenberg CN Newton–Krylov step, 64² grid, f64.

Reference baseline (BASELINE.md): scipy newton_krylov via sh_scipy_nk.py
measured at ~43 ms/step median on the survey host CPU (64² dof, dt=0.2,
f_tol=6e-6, f64).  This bench runs the same model/tolerances with the
TPU-native JFNK stack on the real chip and reports median ms/step.

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

from iterative_solvers_tpu.models.swift_hohenberg import SHConfig, make_cn_step  # noqa: E402
from iterative_solvers_tpu.solvers.newton import NewtonKrylov  # noqa: E402

BASELINE_MS = 43.0  # BASELINE.md row 1 (scipy, survey host CPU)


def main():
    cfg = SHConfig(n=64)
    solver = NewtonKrylov(f_tol=6e-6, jvp_mode="fd", inner_m=30, outer_k=10)
    step = jax.jit(make_cn_step(cfg, solver))

    u = jnp.array(np.random.default_rng(0).standard_normal((cfg.n, cfg.n)))
    # compile + warmup (not timed)
    u_w, res = step(u)
    u_w.block_until_ready()

    # time the same trajectory the reference times: steps from the random IC
    times = []
    state = u
    for i in range(30):
        t0 = time.perf_counter()
        state, res = step(state)
        state.block_until_ready()
        times.append(time.perf_counter() - t0)
    ms = 1000.0 * float(np.median(times))

    assert bool(res.converged), "JFNK failed to converge at f_tol=6e-6"
    print(
        json.dumps(
            {
                "metric": "sh64_cn_newton_krylov_step_f64",
                "value": round(ms, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / ms, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
