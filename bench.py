"""Headline benchmark: full droplet moving-mesh JFNK step, 91×61,
pma_loops=400 — the reference's flagship workload (droplet.py:360-411).

Reference baseline (BASELINE.md rows 2-3, survey host CPU): one
evolve_with_PDE step = ~91 residual evaluations x 1.6 ms (scipy
newton_krylov) + 400 PMA mesh sub-iterations x 2.1 ms ≈ 990 ms/step.

This bench runs the same step — curvilinear CN residual, JFNK at the
reference's f_tol=1e-7, 400 PMA sub-iterations — from the reference's own
checked-in fixture, with the production mixed-precision configuration
(f64 outer residuals/convergence checks, f32 inner Krylov, f32 PMA
sub-loop; convergence gated every step).

Methodology: whole trajectories run under one jit (lax.scan); timing is
the *marginal* cost per step between a short and a long trajectory with a
final host fetch — this removes the fixed per-dispatch overhead of the
measurement harness (~30 ms on this tunnel) while counting all real device
work.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}
where vs_baseline = baseline_ms / our_ms (>1 means faster than reference).
"""
import dataclasses
import json
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from iterative_solvers_tpu.io import fixtures as fx  # noqa: E402
from iterative_solvers_tpu.models import droplet as dp  # noqa: E402

BASELINE_MS = 990.0  # BASELINE.md rows 2-3 (composed reference step)
# r4 verdict item 4: the 1-vs-5-step marginal at reps=3 wandered 55-60 ms
# across runs; a longer chain and more reps tighten the committed number
K_SHORT, K_LONG = 2, 10
FIXTURE = ("/root/reference/python_work/"
           "initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt")


def main():
    fixture = fx.load(FIXTURE)
    cfg = dataclasses.replace(fx.config_for(fixture),
                              spectral_dtype="float32",
                              mesh_dtype="float32")
    u0 = jnp.array(fixture.u)
    q0 = jnp.array(fixture.q)
    step = dp.make_step(cfg, dt=1e-5, dtmesh=3e-9, pma_loops=400,
                        solver=dp.fast_solver())

    def chain(u, q, k):
        def body(carry, _):
            uu, qq = carry
            out = step(uu, qq, 1e-5)
            return (out.u, out.q), (out.f_norm, out.converged)

        (uu, qq), (fns, conv) = lax.scan(body, (u, q), None, length=k)
        return jnp.sum(uu) + jnp.sum(fns), jnp.all(conv), jnp.max(fns)

    jf = jax.jit(chain, static_argnums=2)

    def timed(k, reps=7):
        s, conv, worst = jf(u0, q0, k)
        float(s)  # warmup + compile
        assert bool(conv), f"JFNK failed f_tol=1e-7 (worst {float(worst):.2e})"
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            s, conv, worst = jf(u0, q0, k)
            float(s)  # host fetch = true synchronisation
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_short, t_long = timed(K_SHORT), timed(K_LONG)
    ms = 1000.0 * (t_long - t_short) / (K_LONG - K_SHORT)

    print(json.dumps({
        "metric": "droplet_full_step_91x61_pma400",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 2),
    }))


if __name__ == "__main__":
    main()
