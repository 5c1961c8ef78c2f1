"""Coupled-BDF MEMS run toward touchdown (VERDICT r4 item 6, BDF half).

The reference's PMA.py hands the coupled (u, Q) system to
scipy.solve_ivp(method="BDF") with Tf=0.4 and the comment "solver should
terminate before touchdown" (PMA.py:36).  The operator-split touchdown run
(benchmarks/mems_touchdown.jsonl) MEASURES the touchdown time of this
configuration: t* ~ 0.312 (t asymptotes there as u_min -> -1), so Tf=0.4
is unreachable by construction — every integrator grinds to a halt at t*.
The honest extended comparison is therefore: integrate the coupled system
as deep toward t* as the step budget allows and cross-check u_min(t)
against the operator-split trajectory (itself parity-checked step-by-step
against the reference's own loop).

scipy's own BDF on this system needed 798.6 s for Tf=0.15 and could not
pass t=0.2 in 50 minutes (dense FD Jacobian; see
tests/test_bdf.py::test_coupled_bdf_full_trajectory_vs_scipy) — the
matrix-free BDF+JFNK here is what makes the deeper horizon feasible.

Usage: python examples/mems_bdf_touchdown.py [tf] [segments]
Writes benchmarks/mems_bdf_touchdown.jsonl.
"""
import json
import pathlib
import sys
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402

from iterative_solvers_tpu.models import mems  # noqa: E402
from iterative_solvers_tpu.solvers.bdf import BDF  # noqa: E402
from iterative_solvers_tpu.solvers.newton import NewtonKrylov  # noqa: E402

BENCH = pathlib.Path(__file__).resolve().parent.parent / "benchmarks"


def main():
    tf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
    segments = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cfg = mems.MEMSConfig()

    # operator-split reference curve (parity-proven vs the reference loop)
    os_rows = [json.loads(l) for l in
               open(BENCH / "mems_touchdown.jsonl")][1:]
    os_t = np.array([r["t"] for r in os_rows])
    os_umin = np.array([r["u_min"] for r in os_rows])

    bdf = BDF(rtol=1e-3, atol=1e-6, dt0=1e-6, max_steps=200000,
              newton=NewtonKrylov(f_tol=1e-10, maxiter=12, inner_m=20,
                                  outer_k=5))
    u, q = mems.initial_state(cfg)
    rows = []
    t = 0.0
    t0w = time.time()
    total_steps = 0
    for seg in range(segments):
        # the coupled system is autonomous: integrate each segment over
        # [0, tf/segments] from the current state and accumulate t here
        u, q, res = mems.evolve_coupled(cfg, tf / segments, bdf=bdf,
                                        u0=u, q0=q)
        assert bool(res.success), f"BDF failed in segment {seg}"
        t += float(res.t)
        total_steps += int(res.steps)
        umin = float(jnp.min(u))
        umin_os = float(np.interp(t, os_t, os_umin))
        rows.append({
            "t": t, "u_min_bdf": umin, "u_min_split": umin_os,
            "diff": umin - umin_os, "steps_cum": total_steps,
            "rejected": int(res.rejected), "dt_final": float(res.dt_final),
            "wall_s": round(time.time() - t0w, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    out = BENCH / "mems_bdf_touchdown.jsonl"
    with open(out, "w") as f:
        f.write(json.dumps({
            "summary": True, "tf": tf, "touchdown_time_measured": 0.312,
            "t_reached": t, "u_min_final": rows[-1]["u_min_bdf"],
            "max_abs_diff_vs_split": max(abs(r["diff"]) for r in rows),
            "accepted_steps": total_steps,
            "wall_s": round(time.time() - t0w, 1),
            "note": "Tf=0.4 (PMA.py:36) exceeds the measured touchdown "
                    "time t* ~ 0.312; comparison runs toward t* instead.",
        }) + "\n")
        for r in rows:
            f.write(json.dumps(r) + "\n")
    with open(out) as f:
        print(f.readline().strip())


if __name__ == "__main__":
    main()
