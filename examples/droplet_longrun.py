"""Large-grid droplet coalescence into the physically meaningful regime.

VERDICT r4 item 1: the r4 trajectories demonstrated the 1024²/4096² solver
capability but spanned only t ~ 1e-4 / 8e-7 — the radius never moved.  The
blocker is the reference's *additive* scale law (``scale += exp(-10||dU||)``,
droplet.py:411): at the resolution-scaled base dt = 1e-9 it grows dt by at
most 1e-9 per step, so the t ~ 0.01-0.1 regime where the 91x61 flagship
shows real spreading (r 1.40 -> 2.1) is ~1e7 steps away BY CONSTRUCTION.

This driver replaces it with a multiplicative controller that generalises
the reference's intent (grow dt when Newton is comfortable, cut on
divergence — the ``compute_g``/backoff idea from PMA2_nk.py:446-450 applied
to the droplet):

    on success:  dt <- dt * growth(newton_iters)   (1.25x when iters are
                 comfortable, 1.1x when working, hold when near maxiter)
    on failure:  retry the step at dt/2 (up to 4 attempts, in-graph), and
                 start the next step from the last dt that worked

The mesh pseudo-step scales with the running dt (capped at the measured
explicit stability bound) to hold the 91x61-proven mesh-pseudo-time :
physical-time ratio (1.2e-2 * dt per step across pma_loops sub-iterations).

Runs in chunks with a sharded checkpoint + JSONL append per chunk, and
resumes from the newest checkpoint — crash/tunnel-drop-safe for multi-hour
trajectories.

Usage:
  python examples/droplet_longrun.py [n] [max_steps] [key=val ...]
    keys: chunk, dt0, dt_max, growth, f_tol, maxiter, inner_m, outer_k,
          inner_maxiter, pma_loops, t_stop, r_stop, monitor_cap (0 = off),
          dfres (1 = two-f32 outer residuals),
          fresh (1 = ignore existing checkpoint), tag,
          from_tag (A/B probes: resume from another tag's checkpoint
          without touching it — pair with save=0), save (0 = no
          checkpoint/jsonl writes)
"""
import dataclasses
import json
import pathlib
import sys
import time

import os

import numpy as np
import jax

if os.environ.get("LONGRUN_CPU"):  # CPU smoke runs (axon overrides env)
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from iterative_solvers_tpu.io import fixtures as fx  # noqa: E402
from iterative_solvers_tpu.io import checkpoint as ckpt  # noqa: E402
from iterative_solvers_tpu.models import droplet as dp  # noqa: E402
from iterative_solvers_tpu.ops import curvilinear  # noqa: E402
from iterative_solvers_tpu.solvers.newton import NewtonKrylov  # noqa: E402

DROPS = [(0.0, 0.0, 1.0, 1.0), (3.0, 0.0, 1.0, 1.0)]  # droplet.py:127
H_WET = 0.1
BENCH = pathlib.Path(__file__).resolve().parent.parent / "benchmarks"


def effective_radius(u, jac, dx, dy):
    area = jnp.sum((u > H_WET) * jnp.abs(jac)) * dx * dy
    return jnp.sqrt(area / np.pi)


def parse_opts(argv):
    opts = {}
    for a in argv:
        if "=" in a:
            k, v = a.split("=", 1)
            opts[k] = v
    return opts


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    max_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100000
    o = parse_opts(sys.argv[3:])
    tag = o.get("tag", f"{n}sq")

    base = fx.config_for(fx.load(
        "/root/reference/python_work/"
        "initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt"))
    mcap = float(o.get("monitor_cap", 15.0))
    cfg = dataclasses.replace(
        base, nx=n, ny=n, spectral_dtype="float32", mesh_dtype="float32",
        spectral_precision=("high" if n >= 2048 else "highest"),
        monitor_cap=(mcap if mcap > 0 else None))
    grid = cfg.grid

    # dt controller (see module docstring)
    dt0 = float(o.get("dt0", 1e-9 * min(1.0, 2048.0 / n)))
    dt_max = float(o.get("dt_max", 2e-3))
    growth = float(o.get("growth", 1.25))
    t_stop = float(o.get("t_stop", 0.05))
    r_stop = float(o.get("r_stop", 1.6))
    chunk = int(o.get("chunk", 25))
    pma_loops = int(o.get("pma_loops", 400 if n <= 1024 else 50))
    # mesh pseudo-time : physical-time ratio proven at 91x61 (flagship)
    pseudo_ratio = 1.2e-2
    dtmesh_cap = 1e-11 * min(1.0, (1024.0 / n) ** 2)
    dtmesh_inf = dtmesh_cap

    solver = NewtonKrylov(
        f_tol=float(o.get("f_tol", 1e-5)),
        maxiter=int(o.get("maxiter", 20)),
        inner_m=int(o.get("inner_m", 12)),
        outer_k=int(o.get("outer_k", 6)),
        inner_maxiter=int(o.get("inner_maxiter", 1)),
        inner_dtype="float32", max_backtracks=4)
    step = dp.make_step(
        cfg, dt=dt0, dtmesh=dtmesh_cap, pma_loops=pma_loops, solver=solver,
        deviation_form=True, jvp_dtype="float32", jvp_kernel=True,
        residual_mode="df64" if o.get("dfres", "0") == "1" else "f64")

    ck_dir = BENCH / f"longrun_{o.get('from_tag', tag)}_ckpt"
    side = ck_dir / "carry.json"
    out_path = BENCH / f"longrun_droplet_{tag}.jsonl"
    fresh = o.get("fresh", "0") == "1"
    save = o.get("save", "1") == "1"

    if side.exists() and not fresh:
        sh = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        loaded, meta = ckpt.load_sharded(
            ck_dir, {"u": sh, "q": sh}, config=cfg)
        u, q = loaded["u"], loaded["q"]
        sc = json.loads(side.read_text())
        t, dt, step0 = sc["t"], sc["dt"], sc["step"]
        print(f"[{tag}] resumed at step {step0}, t={t:.3e}, dt={dt:.3e}",
              flush=True)
    else:
        # quasi-static inflation (chunked at >=2048² — tunnel limits)
        t0 = time.time()
        vsteps = 1000
        q0 = jnp.zeros(grid.shape, jnp.float64)
        if n >= 2048:
            inf_chunk = 50
            q = q0
            u = jnp.full(grid.shape, cfg.epsilon, jnp.float64)
            jin = jax.jit(lambda q_, u_, s: dp.inflate(
                cfg, DROPS, vsteps=vsteps, dtmesh=dtmesh_inf, pma_loops=20,
                q0=q_, geometry_fn=curvilinear.mesh_geometry_dev, start=s,
                count=inf_chunk, u_prev=u_))
            for s0 in range(0, vsteps, inf_chunk):
                q, u = jin(q, u, jnp.int32(s0))
                float(jnp.sum(q))
        else:
            q, u = dp.inflate(cfg, DROPS, vsteps=vsteps, dtmesh=dtmesh_inf,
                              pma_loops=20, q0=q0,
                              geometry_fn=curvilinear.mesh_geometry_dev)
        geom = curvilinear.mesh_geometry_dev(q, grid)
        assert float(jnp.min(geom.jac)) > 0, "mesh tangled during inflation"
        print(f"[{tag}] inflation {vsteps} vsteps: {time.time() - t0:.1f}s "
              f"(min J = {float(jnp.min(geom.jac)):.3f})", flush=True)
        t, dt, step0 = 0.0, dt0, 0
        out_path.write_text("")  # truncate the jsonl for a fresh run

    def body(carry, _):
        uu, qq, dt_c, t_c, u_prev, dt_prev = carry

        def attempt_cond(s):
            _, _, k, ok = s
            return (~ok) & (k < 4)

        def attempt_body(s):
            _, dtk, k, _ = s
            dtk = jnp.where(k > 0, dtk * 0.5, dtk)
            dtm = jnp.minimum(pseudo_ratio * dtk / pma_loops, dtmesh_cap)
            # trajectory-extrapolation predictor: first-order continuation
            # of the converged trajectory (NOT an explicit step — no
            # high-k instability), clamped above the precursor floor;
            # dt_prev = 0 marks no history (resume/first step)
            r = jnp.where(dt_prev > 0, dtk / jnp.maximum(dt_prev, 1e-300),
                          0.0)
            x0 = jnp.maximum(uu + r * (uu - u_prev), 0.25 * cfg.epsilon)
            out = step(uu, qq, dtk, dtm, x0=x0)
            ok = (out.converged & jnp.all(jnp.isfinite(out.u))
                  & jnp.all(jnp.isfinite(out.q)))
            return (out, dtk, k + 1, ok)

        out0 = dp.DropletStepResult(
            u=uu, q=qq, newton_iters=jnp.int32(0),
            f_norm=jnp.asarray(jnp.inf, uu.dtype),
            converged=jnp.bool_(False))
        out, dt_used, attempts, ok = lax.while_loop(
            attempt_cond, attempt_body,
            (out0, dt_c, jnp.int32(0), jnp.bool_(False)))
        u_n = jnp.where(ok, out.u, uu)
        q_n = jnp.where(ok, out.q, qq)
        geom_n = curvilinear.mesh_geometry_dev(q_n, grid)
        r_eff = effective_radius(u_n, geom_n.jac, grid.dx, grid.dy)
        msp = dp.min_spacing(geom_n)
        # growth gated on Newton comfort; a failed step restarts from the
        # last dt that worked (dt_used already halved in-attempt)
        g = jnp.where(out.newton_iters <= solver.maxiter // 2, growth,
                      jnp.where(out.newton_iters <= (3 * solver.maxiter) // 4,
                                (1.0 + growth) / 2.0, 1.0))
        dt_next = jnp.clip(jnp.where(ok, dt_used * g, dt_used), 1e-12, dt_max)
        t_n = t_c + jnp.where(ok, dt_used, 0.0)
        u_prev_n = jnp.where(ok, uu, u_prev)
        dt_prev_n = jnp.where(ok, dt_used, dt_prev)
        return (u_n, q_n, dt_next, t_n, u_prev_n, dt_prev_n), (
            out.newton_iters, out.f_norm, ok, attempts, dt_used, t_n, r_eff,
            msp)

    jf = jax.jit(lambda c: lax.scan(body, c, None, length=chunk))
    carry = (u, q, jnp.asarray(dt, jnp.float64), jnp.asarray(t, jnp.float64),
             u, jnp.asarray(0.0, jnp.float64))

    t_wall = time.time()
    steps_done = step0
    while steps_done < max_steps:
        tc0 = time.time()
        carry, aux = jf(carry)
        float(jnp.sum(carry[0]))  # host sync
        tc = time.time() - tc0
        iters, fnorms, oks, atts, dts, ts, reffs, msps = (
            np.asarray(a) for a in aux)
        with open(out_path if save else "/dev/null", "a") as f:
            for i in range(chunk):
                f.write(json.dumps({
                    "step": steps_done + i + 1, "t": float(ts[i]),
                    "dt": float(dts[i]), "newton_iters": int(iters[i]),
                    "f_norm": float(fnorms[i]), "converged": bool(oks[i]),
                    "attempts": int(atts[i]), "r_eff": float(reffs[i]),
                    "min_spacing": float(msps[i]),
                }) + "\n")
        steps_done += chunk
        uu, qq, dt_c, t_c = carry[:4]
        if save:
            ckpt.save_sharded(ck_dir, {"u": uu, "q": qq}, config=cfg,
                              step=steps_done, time=float(t_c))
            side.write_text(json.dumps({
                "step": steps_done, "t": float(t_c), "dt": float(dt_c),
                "wall_s_total": time.time() - t_wall}))
        print(f"[{tag}] step {steps_done}: t={float(t_c):.4e} "
              f"dt={float(dt_c):.3e} r_eff={reffs[-1]:.5f} "
              f"iters={iters[-1]} conv={int(oks.sum())}/{chunk} "
              f"({tc:.1f}s/chunk)", flush=True)
        if float(t_c) >= t_stop or float(reffs[-1]) >= r_stop:
            print(f"[{tag}] stop condition reached", flush=True)
            break
    print(json.dumps({
        "tag": tag, "steps": steps_done, "t": float(carry[3]),
        "dt": float(carry[2]), "wall_s": round(time.time() - t_wall, 1)}))


if __name__ == "__main__":
    main()
