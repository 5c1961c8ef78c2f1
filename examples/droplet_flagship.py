"""The reference's flagship experiment, end-to-end (droplet.py main()):

1. quasi-static inflation of two coalescing droplets — 1000 volume steps
   with 20 PMA mesh sub-iterations each (initialise_coalescing_droplets,
   droplet.py:127/132-183),
2. 1000 CN/JFNK coalescence steps with the adaptive scale law
   ``scale += exp(-10 ||dU||)`` and 400 PMA sub-iterations per step
   (evolve_with_PDE, droplet.py:130/360-411),
3. per-step effective contact radius ``R_eff = sqrt(A/pi)`` (wetted area on
   the moving mesh, A = sum 1{u>0.1} |J| dksi deta) overlaid against the
   reference's own asymptotic spreading law (odeint(asympode) —
   droplet.py:363-365).

One deviation from the reference's literal globals, documented in
CLAUDE.md: the base dt is 1e-5, not 1e-4 — at dt=1e-4 the very first step
does not converge even in pure scipy on the reference's own fixture (the
line search crawls at ~2% steps); the scale law then grows dt_n from there
exactly as the reference intends.

Usage:  python examples/droplet_flagship.py [n] [steps] [vsteps]
        n=0 (default) -> the reference's own 91x61 grid; n>=256 runs the
        same experiment on an n x n grid with the fused-kernel JFNK path.
Writes benchmarks/flagship_droplet_{tag}.jsonl (one record per step) and a
summary line to stdout.
"""
import json
import pathlib
import sys
import time

import os

import numpy as np
import jax

if os.environ.get("FLAGSHIP_CPU"):  # CPU smoke runs (axon overrides env)
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from iterative_solvers_tpu.io import fixtures as fx  # noqa: E402
from iterative_solvers_tpu.models import droplet as dp  # noqa: E402
from iterative_solvers_tpu.ops import curvilinear  # noqa: E402
from iterative_solvers_tpu.solvers.newton import NewtonKrylov  # noqa: E402

DROPS = [(0.0, 0.0, 1.0, 1.0), (3.0, 0.0, 1.0, 1.0)]  # droplet.py:127
H_WET = 0.1  # wetted-area threshold: well above the precursor (eps=5e-3)


def effective_radius(u, jac, dx, dy):
    area = jnp.sum((u > H_WET) * jnp.abs(jac)) * dx * dy
    return jnp.sqrt(area / np.pi)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    vsteps = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

    if n == 0:
        cfg = fx.config_for(fx.load(
            "/root/reference/python_work/"
            "initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt"))
        tag = "91x61"
        step_kw = {}
        # inflation: the reference's exact dtmesh (bit-parity with its own
        # fixture).  evolve: the reference's 3e-9 is tuned to dt=1e-4; at
        # our convergent base dt=1e-5 that rate over-adapts 10x and tangles
        # the mesh at the coalescence neck by step ~38 (measured) — scale
        # dtmesh to preserve the reference's mesh-pseudo-time : physical-
        # time ratio (400*3e-9 per 1e-4).
        dtmesh_inf, dtmesh_ev = 5e-9, 3e-10  # droplet.py:127/130
        geometry_fn = curvilinear.mesh_geometry
        q0 = dp.initial_mesh_potential(cfg, jnp.float64)
    else:
        import dataclasses
        base = fx.config_for(fx.load(
            "/root/reference/python_work/"
            "initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt"))
        cfg = dataclasses.replace(base, nx=n, ny=n,
                                  spectral_dtype="float32",
                                  mesh_dtype="float32",
                                  # ~5e-7 relative (3 MXU passes) sits inside
                                  # the mesh velocity's ~1e-6 noise budget at
                                  # half the cost of HIGHEST; the inflation
                                  # min-J assert + per-step min-spacing rows
                                  # gate mesh health
                                  spectral_precision=("high" if n >= 2048
                                                      else "highest"))
        tag = f"{n}sq"
        step_kw = {"jvp_dtype": "float32", "jvp_kernel": True,
                   "deviation_form": True}
        # inflation: resolution-scaled explicit PMA step — the monitor
        # |lap u|^2 grows ~1e4x as the 1/a interface resolves, and the PMA
        # velocity with it; 1e-11 measured stable AND well-adapted through
        # the full 20k-iter inflation at 1024² (minJ 0.79; 1e-10 tangles).
        # evolve: preserve the 91x61 run's proven mesh-pseudo-time :
        # physical-time ratio (400 * 3e-10 per dt=1e-5 = 1.2e-2) at the
        # resolution-scaled dt — a fixed dtmesh over-adapts ~170x per unit
        # physical time and degrades the mesh until no dt converges
        # (measured at 1024²)
        s = min(1.0, (1024.0 / n) ** 2)
        dtmesh_inf = 1e-11 * s
        # evolve: what matters is the mesh pseudo-time per physical step
        # (pma_loops * dtmesh = 1.2e-2 * dt, the proven 91x61 ratio).  At
        # n > 1024 a PMA iteration costs ~18 ms (4096²) so 400 sub-iters
        # would dominate the step; spend the same pseudo-time in 50 larger
        # explicit sub-steps — the resulting dtmesh stays >=5x below the
        # measured explicit stability bound (1e-11 * (1024/n)^2).
        pma_loops_ev = 400 if n <= 1024 else 50
        dtmesh_ev = 1.2e-2 * (1e-9 * min(1.0, 2048.0 / n)) / pma_loops_ev
        # the inflation rate is measured-stable for the same explicit op
        assert dtmesh_ev < dtmesh_inf, "dtmesh stability margin"
        geometry_fn = curvilinear.mesh_geometry_dev
        q0 = jnp.zeros(cfg.grid.shape, jnp.float64)

    grid = cfg.grid
    # base dt: 1e-5 at the reference's own grid; at fine grids the resolved
    # 1/a interface stiffens the nonlinear system by orders of magnitude —
    # examples/large_scale_droplet.py measured 2e-9 (1024²) .. 5e-10 (4096²)
    # as the convergent range, and the scale law grows from there
    dt = 1e-5 if n == 0 else 1e-9 * min(1.0, 2048.0 / n)
    # the reference's scale law uses an UN-normalised ||dU||_2 (tuned to its
    # 5551-dof grid); keep it verbatim at 91x61, normalise to the same
    # per-dof scale at n².
    norm_scale = 1.0 if n == 0 else np.sqrt(5551.0 / (n * n))

    # -- phase 1: quasi-static inflation -------------------------------------
    print(f"[{tag}] compiling + running inflation ({vsteps} vsteps)...",
          flush=True)
    t0 = time.time()
    if n >= 2048:
        # chunked ramp: a single 4096² 1000-vstep dispatch runs ~10 min on
        # device and the remote-dispatch tunnel drops it (observed worker
        # crash); 50-vstep chunks keep each call ~30 s
        inf_chunk = 50
        assert vsteps % inf_chunk == 0
        q = q0
        u = jnp.full(grid.shape, cfg.epsilon, jnp.float64)
        jin = jax.jit(lambda q_, u_, s: dp.inflate(
            cfg, DROPS, vsteps=vsteps, dtmesh=dtmesh_inf, pma_loops=20,
            q0=q_, geometry_fn=geometry_fn, start=s, count=inf_chunk,
            u_prev=u_))
        for s0 in range(0, vsteps, inf_chunk):
            q, u = jin(q, u, jnp.int32(s0))
            float(jnp.sum(q))  # host sync per chunk
            if (s0 // inf_chunk) % 5 == 4:
                print(f"  inflation vstep {s0 + inf_chunk}/{vsteps}",
                      flush=True)
    else:
        q, u = dp.inflate(cfg, DROPS, vsteps=vsteps, dtmesh=dtmesh_inf,
                          pma_loops=20, q0=q0,
                          geometry_fn=geometry_fn)
    geom = geometry_fn(q, grid)
    jnp.asarray(geom.jac).block_until_ready()
    t_inflate = time.time() - t0
    assert float(jnp.min(geom.jac)) > 0, "mesh tangled during inflation"
    print(f"[{tag}] inflation {vsteps} vsteps: {t_inflate:.1f}s "
          f"(min J = {float(jnp.min(geom.jac)):.3f})", flush=True)

    # -- phase 2: coalescence evolve with the scale law ----------------------
    solver = (dp.fast_solver() if n == 0 else
              NewtonKrylov(f_tol=1e-5, maxiter=14, inner_m=12, outer_k=6,
                           inner_dtype="float32", max_backtracks=4))
    step = dp.make_step(cfg, dt=dt, dtmesh=dtmesh_ev,
                        pma_loops=400 if n == 0 else pma_loops_ev,
                        solver=solver, **step_kw)

    def body(carry, _):
        # the reference's scale law grows dt_n without bound and has no
        # recovery when newton_krylov stops converging (observed at
        # dt_n ~ 1.4e-3: iters 3 -> 20, then NaN).  Wrap each step in the
        # framework's dt backoff (solvers/adaptive.py semantics): halve the
        # scale on divergence/NaN and retry, bounded.
        uu, qq, scale, t = carry

        def attempt_cond(s):
            _, _, k, ok = s
            return (~ok) & (k < 4)

        def attempt_body(s):
            _, sc, k, _ = s
            sc = jnp.where(k > 0, sc * 0.5, sc)
            out = step(uu, qq, dt * sc)
            ok = (out.converged & jnp.all(jnp.isfinite(out.u))
                  & jnp.all(jnp.isfinite(out.q)))
            return (out, sc, k + 1, ok)

        out0 = dp.DropletStepResult(
            u=uu, q=qq, newton_iters=jnp.int32(0),
            f_norm=jnp.asarray(jnp.inf, uu.dtype),
            converged=jnp.bool_(False))
        out, scale_t, attempts, ok = lax.while_loop(
            attempt_cond, attempt_body,
            (out0, scale, jnp.int32(0), jnp.bool_(False)))
        dt_n = dt * scale_t
        # reject entirely if every retry failed (state frozen, scale cut)
        u_n = jnp.where(ok, out.u, uu)
        q_n = jnp.where(ok, out.q, qq)
        geom_n = geometry_fn(q_n, grid)
        r_eff = effective_radius(u_n, geom_n.jac, grid.dx, grid.dy)
        msp = dp.min_spacing(geom_n)
        scale_new = jnp.where(
            ok,
            scale_t + jnp.exp(
                -10.0 * norm_scale * jnp.sqrt(jnp.sum((u_n - uu) ** 2))),
            scale_t * 0.5)
        t_new = t + jnp.where(ok, dt_n, 0.0)
        return (u_n, q_n, scale_new, t_new), (
            out.newton_iters, out.f_norm, ok, dt_n, t_new, r_eff, msp)

    # chunked dispatches: one compiled 'chunk' graph reused; a single
    # 1000-step dispatch is a ~minute-long remote call that the tunnel's
    # worker can drop mid-flight (observed), and chunking costs ~30 ms/chunk
    chunk = min(steps, 100 if n == 0 else (25 if n <= 1024 else 10))
    assert steps % chunk == 0
    jf = jax.jit(lambda c: lax.scan(body, c, None, length=chunk))

    t0 = time.time()
    carry = (u, q, jnp.asarray(1.0, u.dtype), jnp.asarray(0.0, u.dtype))
    auxs = []
    nchunks_run = steps // chunk
    splice_at = nchunks_run // 2 if n >= 256 else -1
    for ci in range(nchunks_run):
        carry, aux = jf(carry)
        float(jnp.sum(carry[0]))  # host sync per chunk
        auxs.append([np.asarray(a) for a in aux])
        print(f"  chunk {ci + 1}/{steps // chunk}: t={float(carry[3]):.3e} "
              f"scale={float(carry[2]):.1f}", flush=True)
        if ci + 1 == splice_at:
            # mid-run sharded checkpoint SPLICE (SURVEY §5.4 at scale): save
            # the run state, reload it through the sharded-restart path, and
            # continue the trajectory from the loaded arrays — proving the
            # restart machinery on the large-grid state it exists for.
            from iterative_solvers_tpu.io import checkpoint as ckpt

            uu, qq, sc, tt = carry
            ck = (pathlib.Path(__file__).resolve().parent.parent
                  / "benchmarks" / f"flagship_{tag}_splice_ckpt")
            t_ck = time.time()
            ckpt.save_sharded(ck, {"u": uu, "q": qq}, config=cfg,
                              step=(ci + 1) * chunk, time=float(tt))
            loaded, meta = ckpt.load_sharded(
                ck, {"u": uu.sharding, "q": qq.sharding}, config=cfg)
            # compare on HOST: the TPU emulates f64 as (hi, lo) f32 pairs
            # and compiled outputs may carry a non-canonical pair for the
            # same f64 value, so an on-device == of reloaded (canonical)
            # vs computed (non-canonical) arrays is false-negative; the
            # host f64 view is the value the checkpoint stores.
            du = np.abs(np.asarray(loaded["u"]) - np.asarray(uu)).max()
            dq = np.abs(np.asarray(loaded["q"]) - np.asarray(qq)).max()
            assert du == 0.0 and dq == 0.0, \
                f"checkpoint splice round-trip mismatch (du={du}, dq={dq})"
            carry = (loaded["u"], loaded["q"], sc, tt)
            print(f"  [splice] sharded save+restore at step "
                  f"{(ci + 1) * chunk}: bitwise OK "
                  f"({time.time() - t_ck:.1f}s)", flush=True)
    uf, qf, scale_f, t_f = carry
    t_evolve = time.time() - t0
    iters, fnorms, conv, dts, ts, reffs, msps = (
        np.concatenate([a[k] for a in auxs]) for k in range(7))

    # -- asymptotic radius law on the same time grid (droplet.py:363-365) ----
    r0 = float(reffs[0])
    times = np.concatenate(([0.0], ts))
    r_asym = dp.asymptotic_radius_trajectory(cfg, r0, times)[1:]

    out_path = (pathlib.Path(__file__).resolve().parent.parent
                / "benchmarks" / f"flagship_droplet_{tag}.jsonl")
    with open(out_path, "w") as f:
        f.write(json.dumps({
            "summary": True, "tag": tag, "vsteps": vsteps, "steps": steps,
            "dt_base": dt, "inflate_s": round(t_inflate, 1),
            "evolve_s": round(t_evolve, 1),
            "ms_per_step": round(1000 * t_evolve / steps, 1),
            "all_converged": bool(conv.all()),
            "n_converged": int(conv.sum()),
            "final_scale": float(scale_f), "final_time": float(t_f),
            "r_eff_first": float(reffs[0]), "r_eff_final": float(reffs[-1]),
            "r_asym_final": float(r_asym[-1]),
            "max_fnorm": float(fnorms.max()),
        }) + "\n")
        for i in range(steps):
            f.write(json.dumps({
                "step": i + 1, "t": float(ts[i]), "dt": float(dts[i]),
                "newton_iters": int(iters[i]), "f_norm": float(fnorms[i]),
                "converged": bool(conv[i]), "r_eff": float(reffs[i]),
                "r_asymptotic": float(r_asym[i]),
                "min_spacing": float(msps[i]),
            }) + "\n")
    with open(out_path) as f:
        print(f.readline().strip())
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
