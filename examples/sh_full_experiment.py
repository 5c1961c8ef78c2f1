"""The reference's complete Swift–Hohenberg experiment (sh_scipy_nk.py):
64² grid, dt=0.2 to Tf=500 (2500 CN/JFNK steps at f_tol=6e-6) — run
end-to-end on TPU with per-step convergence stats and an offline snapshot.

The reference takes ~43 ms/step in scipy => ~108 s of pure solve time (plus
live 3-D plotting each unit of time).  Usage:

    python examples/sh_full_experiment.py [steps] [out.png]
"""
import json
import pathlib
import sys
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402

from iterative_solvers_tpu.models.swift_hohenberg import (  # noqa: E402
    SHConfig, evolve_cn, fast_solver,
)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    out_png = sys.argv[2] if len(sys.argv) > 2 else None

    cfg = SHConfig(n=64)  # reference defaults: d=40, k=0.2, r=0.01, g=1
    solver = fast_solver(cfg, f_tol=6e-6, inner_m=10, outer_k=5)
    u0 = jnp.array(np.random.default_rng(0).standard_normal((cfg.n, cfg.n)))

    run = jax.jit(lambda u: evolve_cn(u, steps, cfg, solver))
    # compile (not counted — the reference's import/assembly isn't either)
    jax.block_until_ready(run(u0))

    t0 = time.perf_counter()
    u, iters, f_norms = run(u0)
    float(jnp.sum(u))  # host fetch = true synchronisation
    wall = time.perf_counter() - t0

    f_norms = np.asarray(f_norms)
    print(json.dumps({
        "steps": steps,
        "t_final": steps * cfg.k,
        "wall_s": round(wall, 2),
        "ms_per_step": round(1000 * wall / steps, 3),
        "all_converged": bool((f_norms <= 6e-6).all()),
        "worst_fnorm": float(f_norms.max()),
        "mean_newton_iters": round(float(np.mean(np.asarray(iters))), 2),
        "scipy_reference_estimate_s": round(steps * 0.043, 1),
    }))
    if out_png:
        from iterative_solvers_tpu.utils.render import save_field_image

        save_field_image(u, out_png, title=f"SH t={steps * cfg.k:.0f}")


if __name__ == "__main__":
    main()
