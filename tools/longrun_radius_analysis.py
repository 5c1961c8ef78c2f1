"""Radius-trajectory analysis of a long-run coalescence JSONL (VERDICT r4
item 1's 'tracks the asymptotic law's shape' evidence).

Augments benchmarks/longrun_droplet_{tag}.jsonl with two overlays and
prepends a summary line:

- ``r_asymptotic``: the reference's own spreading law integrated from the
  run's first radius (odeint(asympode), droplet.py:363-365 — here the
  host-side RK4 of models.droplet.asymptotic_radius_trajectory).  As in
  the reference's 91x61 experiment, r_eff exceeds the law through the
  coalescence-neck phase (the law models late-time single-drop
  spreading); the comparison is of shapes and of the late-time approach.
- ``r_91x61``: the 91x61 flagship's measured r_eff at the same physical
  time (linear interpolation of benchmarks/flagship_droplet_91x61.jsonl)
  — the cross-RESOLUTION check: the resolved fine-grid run should
  reproduce the reference experiment's radius trajectory.

Usage: python tools/longrun_radius_analysis.py [tag]
"""
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from iterative_solvers_tpu.models import droplet as dp  # noqa: E402
from iterative_solvers_tpu.io import fixtures as fx  # noqa: E402

BENCH = pathlib.Path(__file__).resolve().parent.parent / "benchmarks"


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "1024sq"
    path = BENCH / f"longrun_droplet_{tag}.jsonl"
    rows = [json.loads(l) for l in open(path)]
    rows = [r for r in rows if not r.get("summary")]
    # dedupe resume seams (a killed run may have written a chunk's rows
    # before its checkpoint; the resumed run re-computes and re-appends
    # them under the same step numbers — keep the last occurrence)
    by_step = {}
    for r in rows:
        by_step[r["step"]] = r
    rows = [by_step[k] for k in sorted(by_step)]

    cfg = fx.config_for(fx.load(
        "/root/reference/python_work/"
        "initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt"))
    ts = np.array([r["t"] for r in rows])
    reffs = np.array([r["r_eff"] for r in rows])
    r0 = float(reffs[0])
    r_asym = dp.asymptotic_radius_trajectory(
        cfg, r0, np.concatenate(([0.0], ts)))[1:]

    ref91 = [json.loads(l) for l in
             open(BENCH / "flagship_droplet_91x61.jsonl")][1:]
    t91 = np.array([r["t"] for r in ref91])
    r91 = np.array([r["r_eff"] for r in ref91])
    r91_interp = np.interp(ts, t91, r91)
    in_range = ts <= t91[-1]

    for i, r in enumerate(rows):
        r["r_asymptotic"] = float(r_asym[i])
        r["r_91x61"] = float(r91_interp[i]) if in_range[i] else None

    conv = np.array([r["converged"] for r in rows])
    dts = np.array([r["dt"] for r in rows])
    rel91 = np.abs(reffs[in_range] - r91_interp[in_range]) / r91_interp[in_range]
    summary = {
        "summary": True, "tag": tag, "steps": len(rows),
        "t_final": float(ts[-1]),
        "r_eff_first": r0, "r_eff_final": float(reffs[-1]),
        "r_eff_growth_pct": round(100 * (reffs[-1] / r0 - 1.0), 2),
        "r_asym_final": float(r_asym[-1]),
        "dt_first": float(dts[0]), "dt_final": float(dts[-1]),
        "n_converged": int(conv.sum()), "all_converged": bool(conv.all()),
        "max_rel_diff_vs_91x61_r_eff": float(rel91.max()),
        "note": "r_eff > r_asymptotic through the neck phase exactly as in "
                "the reference's own 91x61 experiment (its r_eff is ~5x the "
                "law's growth at t~1e-3); r_91x61 is the cross-resolution "
                "overlay of the measured 91x61 flagship trajectory.",
    }
    with open(path, "w") as f:
        f.write(json.dumps(summary) + "\n")
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
