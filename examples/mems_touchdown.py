"""MEMS touchdown experiment (VERDICT r4 item 6).

Drives the reference's PMA2_nk.py configuration (p=2 biharmonic, m=3 Van
der Waals, lambda=1, beta=0.15, N=51, k=1e-4 — PMA2_nk.py:22-40) from the
flat state toward touchdown (u -> -1), with the adaptive clamp
``dt = k min(1+u)^3`` (compute_g, PMA2_nk.py:446-450) shrinking the step as
the membrane approaches the substrate.  The reference's while-loop horizon
Tf=0.3/0.4 is aspirational: touchdown is a finite-time quenching
singularity and the clamp makes t asymptote to the touchdown time t* — the
run is characterised by how far u_min gets, not by reaching Tf ("solver
should terminate before touchdown", PMA.py:36).

Optionally cross-checks against a headless scipy run of the reference's
own main loop over the same step horizon (``oracle=1``; the first
``oracle_steps`` steps are compared step-by-step on u_min/dt).

Writes benchmarks/mems_touchdown.jsonl: per-step rows (t, dt, u_min,
newton_iters, min mesh spacing) + a summary line.

Usage: python examples/mems_touchdown.py [key=val ...]
  keys: u_stop (-0.9), max_steps, chunk, k, oracle (0|1), oracle_steps,
        cpu (1 = force CPU)
"""
import json
import pathlib
import sys
import time

import numpy as np
import jax

_opts = {k: v for k, v in (a.split("=", 1) for a in sys.argv[1:] if "=" in a)}
if _opts.get("cpu", "1") == "1":  # default CPU: 51² physics, TPU not needed
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from iterative_solvers_tpu.models import mems  # noqa: E402
from iterative_solvers_tpu.ops import curvilinear  # noqa: E402
from iterative_solvers_tpu.models.droplet import min_spacing  # noqa: E402
from iterative_solvers_tpu.solvers.newton import NewtonKrylov  # noqa: E402

BENCH = pathlib.Path(__file__).resolve().parent.parent / "benchmarks"


def run_ours(cfg, u_stop, max_steps, chunk):
    solver = NewtonKrylov(f_tol=6e-6, maxiter=40, inner_m=20, outer_k=8)
    step = mems.make_step(cfg, solver)
    grid = cfg.grid

    def body(carry, _):
        u, q, t = carry
        out = step(u, q)
        geom = curvilinear.mesh_geometry(out.q, grid)
        return (out.u, out.q, t + out.dt), (
            out.dt, t + out.dt, jnp.min(out.u), out.newton_iters,
            out.converged, min_spacing(geom))

    jf = jax.jit(lambda c: lax.scan(body, c, None, length=chunk))
    u, q = mems.initial_state(cfg)
    carry = (u, q, jnp.asarray(0.0, u.dtype))
    rows = []
    t0 = time.time()
    while len(rows) < max_steps:
        carry, aux = jf(carry)
        dts, ts, umins, iters, convs, msps = (np.asarray(a) for a in aux)
        for i in range(chunk):
            rows.append({
                "step": len(rows) + 1, "t": float(ts[i]), "dt": float(dts[i]),
                "u_min": float(umins[i]), "newton_iters": int(iters[i]),
                "converged": bool(convs[i]), "min_spacing": float(msps[i]),
            })
        print(f"step {len(rows)}: t={ts[-1]:.5f} dt={dts[-1]:.3e} "
              f"u_min={umins[-1]:.4f}", flush=True)
        assert convs.all(), "JFNK failed mid-run"
        if umins[-1] <= u_stop:
            break
    return rows, carry, time.time() - t0


def run_oracle(cfg, nsteps):
    """The reference's PMA2_nk main loop, headless, via the golden-tools
    loader (executes reference code as a test oracle — tools/make_golden.py
    convention)."""
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                           / "tools"))
    from make_golden import load_patched
    from scipy.optimize import newton_krylov

    d = load_patched("PMA2_nk.py", {"plot_bool = True": "plot_bool = False"})
    nn = d["NN_"]
    Q, U = d["Q"], d["U"]
    Q.val = np.reshape(0.5 * d["ksiksi"] ** 2 + 0.5 * d["etaeta"] ** 2, nn)
    d["make_Ibdy"]()
    d["make_M"]()
    U.new = np.zeros(nn)
    t = 0.0
    rows = []
    for s in range(nsteps):
        U.val = U.new.copy()
        d["compute_Q_spatial_ders"]()
        d["J"] = Q.d2ksi * Q.d2eta - Q.dksideta ** 2
        d["compute_u_spatial_ders"]()
        dt = d["compute_g"]() * d["k"]
        d["dt"] = dt
        d["solve_PMA"]()
        d["CN_term"] = d["compute_rhs_pde"]()
        U.new = newton_krylov(d["residual"], U.val, verbose=0)
        Q.val = Q.val + dt * Q.dt
        t += dt
        rows.append({"step": s + 1, "t": t, "dt": float(dt),
                     "u_min": float(U.new.min())})
    return rows


def main():
    o = _opts
    u_stop = float(o.get("u_stop", -0.9))
    max_steps = int(o.get("max_steps", 60000))
    chunk = int(o.get("chunk", 500))
    cfg = mems.MEMSConfig(k=float(o.get("k", 1e-4)))

    rows, carry, wall = run_ours(cfg, u_stop, max_steps, chunk)

    parity = None
    if o.get("oracle", "0") == "1":
        n_or = int(o.get("oracle_steps", 200))
        t0 = time.time()
        orows = run_oracle(cfg, n_or)
        du = max(abs(rows[i]["u_min"] - orows[i]["u_min"])
                 for i in range(n_or))
        ddt = max(abs(rows[i]["dt"] - orows[i]["dt"]) /
                  orows[i]["dt"] for i in range(n_or))
        parity = {"oracle_steps": n_or, "max_abs_du_min": du,
                  "max_rel_ddt": ddt, "oracle_wall_s": time.time() - t0}
        print(f"oracle parity over {n_or} steps: |d u_min| {du:.2e}, "
              f"rel d dt {ddt:.2e}", flush=True)

    out = BENCH / "mems_touchdown.jsonl"
    with open(out, "w") as f:
        f.write(json.dumps({
            "summary": True, "config": "PMA2_nk defaults (p=2, m=3, "
            "lambda=1, beta=0.15, N=51, k=1e-4)",
            "steps": len(rows), "t_final": rows[-1]["t"],
            "dt_first": rows[0]["dt"], "dt_final": rows[-1]["dt"],
            "u_min_final": rows[-1]["u_min"], "u_stop": u_stop,
            "reached": rows[-1]["u_min"] <= u_stop,
            "wall_s": round(wall, 1), "parity": parity,
        }) + "\n")
        for i, r in enumerate(rows):  # thin: full tail, 1-in-20 elsewhere
            if i % 20 == 0 or i >= len(rows) - 100:
                f.write(json.dumps(r) + "\n")
    with open(out) as f:
        print(f.readline().strip())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
