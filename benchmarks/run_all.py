"""Full benchmark suite vs BASELINE.md (one JSON line per metric).

Run on the TPU: ``python benchmarks/run_all.py``.  All timings use the
marginal-cost methodology of bench.py (chained work under one jit, host
fetch to synchronise, short-vs-long subtraction to cancel the harness's
fixed per-dispatch overhead).

Baselines (BASELINE.md, survey host CPU):
  sh64_step            43 ms/step        (scipy newton_krylov)
  droplet_residual     1.6 ms/eval       (91x61)
  pma_loop_iter        2.1 ms/iter       (91x61, droplet monitor chain)
  poisson_999          51.6 s            (spsolve, 999^2 unknowns)
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def marginal_ms(make_fn, k_short, k_long, reps=3, stats=False):
    """Marginal per-unit time of ``make_fn(k)`` returning a jitted callable
    whose output is reduced to a scalar for synchronisation.

    ``make_fn`` may instead be marked with ``make_fn.traced_k = True`` and
    take the chain length as a *traced* argument — then one compile serves
    both chain lengths (the remote-compile tunnel here is slow enough that
    compile count dominates suite wall time).

    ``stats=True`` returns ``(median, best)`` marginals — ``best`` pairs the
    per-length minima, the run-to-run-noise-free estimate used to pin the
    roofline fractions."""

    traced = getattr(make_fn, "traced_k", False)

    def run(k):
        f = make_fn if traced else make_fn(k)
        arg = (k,) if traced else ()
        float(f(*arg))  # warmup
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*arg))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), float(np.min(ts))

    (med_s, min_s), (med_l, min_l) = run(k_short), run(k_long)
    scale = 1000.0 / (k_long - k_short)
    if stats:
        return (med_l - med_s) * scale, (min_l - min_s) * scale
    return (med_l - med_s) * scale


def chain_fn(op, x0, *arrays):
    """Jitted traced-length chain ``k -> sum(op^k(x0))`` for marginal_ms.

    ``x0`` and any extra ``arrays`` are passed as jit *arguments* (closed-over
    jax.Arrays would be embedded in the compile request as literals — the
    remote-compile tunnel rejects multi-hundred-MB requests with HTTP 413).
    ``op(x, *arrays) -> x`` when extra arrays are given."""
    jf = jax.jit(lambda x, arrs, k: jnp.sum(
        lax.fori_loop(0, k, lambda i, v: op(v, *arrs), x)))

    def f(k):
        return jf(x0, arrays, k)

    f.traced_k = True
    return f


def token_chain_fn(op, u, *arrays):
    """Out-of-place chain for marginal_ms: ``out = op(u, *arrays)`` each
    iteration with FIXED inputs, only a small token of the output carried
    between iterations.

    This is the PRODUCTION topology for operator application (Krylov
    matvec x -> Ax: distinct buffers) and the required topology for
    PALLAS rows: the self-chained ``chain_fn`` (v = op(v)) forces XLA to
    insert a hidden full-field copy per iteration (while-loop carry slots
    have fixed buffers and an opaque pallas_call cannot alias out onto
    in), which halved the apparent bandwidth of every self-chained Pallas
    row — 330 vs 650-750 GB/s for the 8192² stencils
    (tools/chain_topology_probe.py, r5b).  Only valid for side-effecting
    ops (Pallas kernels set has_side_effects=True, so the loop-invariant
    calls are neither CSE'd nor hoisted); a pure-jnp op here would
    collapse to one call — keep XLA comparison rows on ``chain_fn``."""
    T = 1024

    jf = jax.jit(lambda x, arrs, tok, k: jnp.sum(
        lax.fori_loop(
            0, k, lambda i, t: op(x, *arrs).reshape(-1)[:T] + t * 0.0,
            tok)))

    def f(k):
        return jf(u, arrays, jnp.zeros((T,), u.dtype), k)

    f.traced_k = True
    return f


def emit(metric, value, unit, baseline=None):
    rec = {"metric": metric, "value": round(value, 4), "unit": unit}
    if baseline is not None:
        rec["vs_baseline"] = round(baseline / value, 2)
    print(json.dumps(rec), flush=True)


def bench_sh_step():
    from iterative_solvers_tpu.models.swift_hohenberg import (
        SHConfig, evolve_cn, fast_solver,
    )

    cfg = SHConfig(n=64)
    solver = fast_solver(cfg, f_tol=6e-6, inner_m=10, outer_k=5)
    u0 = jnp.array(np.random.default_rng(0).standard_normal((64, 64)))

    # convergence gate: no timing row from a diverged solve (VERDICT r3 #2)
    fns = jax.jit(lambda: evolve_cn(u0, 110, cfg, solver)[2])()
    worst = float(jnp.max(fns))
    assert worst <= 6e-6, f"sh64 chain diverged (worst f_norm {worst:.2e})"

    def make(k):
        f = jax.jit(lambda: jnp.sum(evolve_cn(u0, k, cfg, solver)[0]))
        return f

    emit("sh64_cn_nk_step", marginal_ms(make, 10, 110), "ms", baseline=43.0)


def bench_droplet_residual():
    from iterative_solvers_tpu.io import fixtures as fx
    from iterative_solvers_tpu.models import droplet as dp
    from iterative_solvers_tpu.ops import curvilinear

    fixture = fx.load(
        "/root/reference/python_work/initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt"
    )
    cfg = fx.config_for(fixture)
    grid = cfg.grid
    u = jnp.array(fixture.u)
    q = jnp.array(fixture.q)
    geom = curvilinear.mesh_geometry(q, grid)
    F = dp.pde_rhs(u, geom, cfg)

    def make(k):
        def chain():
            def body(i, acc):
                r = dp.cn_residual(u + 1e-12 * acc, u, F, 1e-5, geom, cfg)
                return acc + jnp.sum(r)

            return lax.fori_loop(0, k, body, jnp.float64(0.0))

        return jax.jit(chain)

    assert np.isfinite(float(make(220)())), "residual chain went non-finite"
    emit("droplet_residual_eval_91x61", marginal_ms(make, 20, 220), "ms",
         baseline=1.6)


def bench_pma_loop():
    from iterative_solvers_tpu.io import fixtures as fx
    from iterative_solvers_tpu.models import droplet as dp
    from iterative_solvers_tpu.meshmove.pma import loop_pma

    fixture = fx.load(
        "/root/reference/python_work/initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt"
    )
    cfg = fx.config_for(fixture)
    grid = cfg.grid
    u = jnp.array(fixture.u)
    q = jnp.array(fixture.q)
    mon = lambda uu, geom, g: dp.monitor_source(uu, geom, g)

    def make(k):
        return jax.jit(
            lambda: jnp.sum(loop_pma(q, u, 3e-9, k, grid, cfg.pma, mon))
        )

    # finiteness gate: a tangled/NaN mesh must not produce a timing row
    assert np.isfinite(float(make(120)())), "pma f64 chain went non-finite"
    emit("pma_loop_iter_91x61", marginal_ms(make, 20, 120), "ms", baseline=2.1)

    # production fast path: the whole PMA sub-iteration in f32 (mesh_dtype;
    # increment-carried so tiny dtmesh updates survive — meshmove/pma.py)
    import dataclasses as _dc
    cfg32 = _dc.replace(cfg, mesh_dtype="float32")

    def make32(k):
        return jax.jit(
            lambda: jnp.sum(loop_pma(q, u, 3e-9, k, grid, cfg32.pma, mon))
        )

    assert np.isfinite(float(make32(120)())), "pma f32 chain went non-finite"
    emit("pma_loop_iter_91x61_f32", marginal_ms(make32, 20, 120), "ms",
         baseline=2.1)


def bench_droplet_full_step():
    """Full evolve_with_PDE step at 91x61 with the production pma_loops=400.
    Reference cost composition (BASELINE.md rows 2-3): ~91 residual evals x
    1.6 ms + 400 PMA iters x 2.1 ms ≈ 0.99 s/step."""
    import dataclasses

    from iterative_solvers_tpu.io import fixtures as fx
    from iterative_solvers_tpu.models import droplet as dp

    fixture = fx.load(
        "/root/reference/python_work/initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt"
    )
    cfg = dataclasses.replace(fx.config_for(fixture),
                              spectral_dtype="float32",
                              mesh_dtype="float32")
    u = jnp.array(fixture.u)
    q = jnp.array(fixture.q)
    step = dp.make_step(cfg, dt=1e-5, dtmesh=3e-9, pma_loops=400,
                        solver=dp.fast_solver())

    def chain(k):
        def body(carry, _):
            uu, qq = carry
            out = step(uu, qq, 1e-5)
            return (out.u, out.q), (out.f_norm, out.converged)

        (uu, qq), (fns, conv) = lax.scan(body, (u, q), None, length=k)
        return jnp.sum(uu) + jnp.sum(fns), jnp.all(conv), jnp.max(fns)

    # convergence gate: every step of the LONG chain must converge on this
    # chip before any timing is emitted (VERDICT r3 #2 — the r3 artifact
    # timed a chain that NaN'd on TPU)
    _, conv, worst = jax.jit(chain, static_argnums=0)(5)
    assert bool(conv), f"droplet chain diverged (worst f_norm {float(worst):.2e})"

    def make(k):
        return jax.jit(lambda: chain(k)[0])

    emit("droplet_full_step_91x61_pma400", marginal_ms(make, 1, 5, reps=2),
         "ms", baseline=990.0)


def bench_poisson():
    from iterative_solvers_tpu.models import poisson

    n = 1000
    t0 = time.perf_counter()
    u = poisson.solve_direct(n)
    q = float(poisson.flow_rate(u, 1.0 / n))
    t_first = time.perf_counter() - t0  # includes compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        u = poisson.solve_direct(n)
        q = float(poisson.flow_rate(u, 1.0 / n))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    q_exact = poisson.flow_rate_exact()
    assert abs(q - q_exact) / q_exact < 1e-3, (q, q_exact)
    emit("poisson_999sq_direct_solve", 1000 * t, "ms", baseline=51600.0)


def bench_large_sh():
    """Large-grid SH step — the scale the reference cannot reach at all."""
    from iterative_solvers_tpu.models.swift_hohenberg import (
        SHConfig, evolve_cn, fast_solver,
    )

    n = 2048
    cfg = SHConfig(n=n, d=40.0 * n / 64)  # same h as the 64^2 case
    solver = fast_solver(cfg, f_tol=6e-6, inner_m=10, outer_k=5)
    u0 = jnp.array(np.random.default_rng(1).standard_normal((n, n)))

    # convergence gate (VERDICT r3 #2)
    fns = jax.jit(lambda: evolve_cn(u0, 10, cfg, solver)[2])()
    worst = float(jnp.max(fns))
    assert worst <= 6e-6, f"sh2048 chain diverged (worst f_norm {worst:.2e})"

    def make(k):
        return jax.jit(lambda: jnp.sum(evolve_cn(u0, k, cfg, solver)[0]))

    ms = marginal_ms(make, 2, 10)
    emit("sh2048_cn_nk_step", ms, "ms")
    # per-dof speed vs the 64^2 baseline's per-dof cost
    emit("sh2048_ns_per_dof_step", ms * 1e6 / (n * n), "ns")


def bench_pallas_stencils():
    from iterative_solvers_tpu.ops.pallas_stencil import (
        lap_periodic_pallas, sh_operator_pallas,
    )
    from iterative_solvers_tpu.ops.stencils import lap_periodic, sh_linear_operator
    from iterative_solvers_tpu.utils.roofline import (
        device_hbm_gbps, roofline_denominator_gbps,
    )

    n = 4096
    h = 40.0 / n
    u = jnp.array(
        np.random.default_rng(0).standard_normal((n, n)), dtype=jnp.float32
    )
    bytes_min = 2 * n * n * 4

    # parity gate: pallas kernels must match the XLA lowering to f32 roundoff
    ref = np.asarray(jax.jit(lambda x: lap_periodic(x, h))(u))
    got = np.asarray(jax.jit(lambda x: lap_periodic_pallas(x, h))(u))
    scale = np.abs(ref).max()
    assert np.abs(ref - got).max() / scale < 1e-5, "lap pallas parity"
    ref = np.asarray(jax.jit(lambda x: sh_linear_operator(x, h, 0.01))(u))
    got = np.asarray(jax.jit(lambda x: sh_operator_pallas(x, h, 0.01))(u))
    scale = np.abs(ref).max()
    assert np.abs(ref - got).max() / scale < 1e-5, "sh pallas parity"

    # Timing chains apply the operator to its own output, so the constants
    # are chosen to make each operator a contraction (lap eigenvalues in
    # [-8/h², 0] → h_b = √8 gives spectral radius 1; SH with r=0.5 ditto) —
    # the kernel's cost does not depend on h/r, and this keeps the chain
    # free of any extra elementwise-rescale pass that would pollute the
    # bandwidth measurement.
    h_b = float(np.sqrt(8.0))
    for name, op in [
        ("lap4096_xla", lambda x: lap_periodic(x, h_b)),
        ("lap4096_pallas", lambda x: lap_periodic_pallas(x, h_b)),
        ("sh4096_xla", lambda x: sh_linear_operator(x, h_b, 0.5)),
        ("sh4096_pallas", lambda x: sh_operator_pallas(x, h_b, 0.5)),
    ]:
        # reps=10 + a paired-minima "best" row pin down the 74-84% run-to-run
        # spread seen in r2: median tracks steady-state, best the noise floor
        ms, ms_best = marginal_ms(chain_fn(op, u), 25, 200, reps=10,
                                  stats=True)
        emit(f"{name}_apply", ms, "ms")
        emit(f"{name}_roofline_frac",
             bytes_min / ms / 1e6 / roofline_denominator_gbps(), "x")
        if "pallas" in name:
            emit(f"{name}_roofline_frac_best",
                 bytes_min / ms_best / 1e6 / roofline_denominator_gbps(), "x")

    # 8192² control: the 4096² in+out working set (128 MB) sits at the VMEM
    # boundary; this row's 512 MB provably streams from HBM, confirming the
    # 4096² fraction is not VMEM-inflated (see bench_spmv's gating).
    # Three chain topologies (r5b, tools/chain_topology_probe.py):
    #  - *_apply / *_roofline_frac: out-of-place token chain, the Krylov
    #    x -> Ax production topology (~650-750 GB/s).
    #  - *_inplace_*: self-chain v = op(v) with input_output_aliases={0:0}
    #    (race-free by the mono pipeline's construction) — true in-place
    #    time-stepping, measures the SAME ~650 GB/s.
    #  - *_carrycopy_*: the un-aliased self-chain.  XLA while-loop carries
    #    have fixed buffers and an opaque pallas_call cannot alias its
    #    output onto its input, so every iteration inserts a full-field
    #    copy; copy traffic = kernel traffic, halving apparent bandwidth
    #    (~330 GB/s).  Kept as a regression row for the trap.
    n8 = 8192
    u8 = jnp.array(
        np.random.default_rng(2).standard_normal((n8, n8)), dtype=jnp.float32
    )
    for name, op8, op8_inplace, byts in [
        ("lap8192_pallas", lambda x: lap_periodic_pallas(x, h_b),
         lambda x: lap_periodic_pallas(x, h_b, inplace=True),
         2 * n8 * n8 * 4),
        ("sh8192_pallas", lambda x: sh_operator_pallas(x, h_b, 0.5),
         lambda x: sh_operator_pallas(x, h_b, 0.5, inplace=True),
         2 * n8 * n8 * 4),
    ]:
        ms_cc = marginal_ms(chain_fn(op8, u8), 25, 100, reps=5)
        emit(f"{name}_carrycopy_apply", ms_cc, "ms")
        emit(f"{name}_carrycopy_gbps", byts / ms_cc / 1e6, "GB/s")
        ms_in = marginal_ms(chain_fn(op8_inplace, u8), 25, 100, reps=5)
        emit(f"{name}_inplace_apply", ms_in, "ms")
        emit(f"{name}_inplace_gbps", byts / ms_in / 1e6, "GB/s")
        ms = marginal_ms(token_chain_fn(op8, u8), 25, 100, reps=5)
        emit(f"{name}_apply", ms, "ms")
        emit(f"{name}_roofline_frac",
             byts / ms / 1e6 / roofline_denominator_gbps(), "x")


def bench_droplet_jvp():
    """Fused droplet JVP-matvec kernel (ops/pallas_droplet) at 4096²: the
    production inner-Krylov matvec of the large-grid moving-mesh JFNK.
    Minimal traffic: v + 8 coefficient fields read + 1 write = 10 n² x 4 B.
    The XLA row is the jnp mirror of the same chain (what jax.jvp costs)."""
    from iterative_solvers_tpu.io import fixtures as fx
    from iterative_solvers_tpu.models import droplet as dp
    from iterative_solvers_tpu.ops import curvilinear
    from iterative_solvers_tpu.ops.pallas_droplet import (
        jvp_matvec_pallas, jvp_apply_ref,
    )
    from iterative_solvers_tpu.utils.roofline import (
        device_hbm_gbps, roofline_denominator_gbps,
    )

    n = 4096
    fixture = fx.load(
        "/root/reference/python_work/initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt"
    )
    big = fx.upsample(fixture, n, n)
    cfg = fx.config_for(big)
    geom = curvilinear.mesh_geometry(jnp.array(big.q), cfg.grid)
    geom32 = curvilinear.MeshGeometry(*(a.astype(jnp.float32) for a in geom))
    x32 = dp.seeded_solution(geom32, cfg,
                             [(0.0, 0.0, 1.0, 1.0), (3.0, 0.0, 1.0, 1.0)])
    # geom32 must travel as a jit ARGUMENT (closed-over arrays are embedded
    # in the remote-compile request as literals -> HTTP 413 at 4096²)
    stack = jax.jit(lambda xx, gg: dp.jvp_field_stack(
        xx, gg, cfg, jnp.float32(5e-10)))(x32, geom32)
    v = jnp.array(np.random.default_rng(0).standard_normal((n, n)),
                  jnp.float32)

    ref = np.asarray(jax.jit(
        lambda vv, st: jvp_apply_ref(vv, st, cfg.grid))(v, stack))
    got = np.asarray(jax.jit(
        lambda vv, st: jvp_matvec_pallas(vv, st, cfg.grid))(v, stack))
    assert np.abs(ref - got).max() / np.abs(ref).max() < 2e-5, \
        "droplet jvp pallas parity"

    bytes_min = 10 * n * n * 4
    for name, op, mk in [
        # XLA row: pure jnp, must self-chain (a token chain would CSE it);
        # XLA can alias the pure-HLO carry without a copy
        ("dropjvp4096_xla", lambda vv, st: jvp_apply_ref(vv, st, cfg.grid),
         chain_fn),
        ("dropjvp4096_pallas",
         lambda vv, st: jvp_matvec_pallas(vv, st, cfg.grid),
         token_chain_fn),
    ]:
        ms = marginal_ms(mk(op, v, stack), 10, 60, reps=5)
        emit(f"{name}_matvec", ms, "ms")
        emit(f"{name}_roofline_frac",
             bytes_min / ms / 1e6 / roofline_denominator_gbps(), "x")


def bench_spmv():
    """Explicit-sparse SpMV/SpMM throughput at >=1M dof (BASELINE.json's
    metric line: nnz/s + GB/s per chip).  Operator: the assembled periodic
    SH operator L = -Lap^2 - 2Lap + (r-1)I at 1024² (13 points/row ≈ 13.6M
    nnz) — the explicit-format counterpart of the scipy matvecs inside
    newton_krylov (reference sh_scipy_nk.py:31-39) and the Eigen SpMV
    (cpp_work main.cpp:38-81)."""
    from iterative_solvers_tpu.ops.sparse import CSR, BSR, GridDIA, sh_operator
    from iterative_solvers_tpu.utils.roofline import (
        spmv_cost, roofline_denominator_gbps,
    )

    n = 1024
    h = float(np.sqrt(8.0))  # contraction: |L| <= 0.5 so chains stay finite
    m = sh_operator(n, h, 0.5)
    nnz = m.nnz
    x = jnp.array(
        np.random.default_rng(0).standard_normal(n * n), dtype=jnp.float32
    )
    # honest roofline denominator: max(spec, measured stream) — emitted so
    # the artifact records the calibration every fraction is judged against
    hbm = roofline_denominator_gbps()
    emit("hbm_roofline_denominator", hbm, "GB/s")

    def emit_dia_kernel_rows(name, nnz_row, ms, ndiags, ny, nx):
        """Throughput + an HONEST bandwidth row for a diagonal-format kernel.

        The fraction's numerator counts only bytes that PROVABLY stream
        from HBM every call.  Inputs are memory_space=ANY, so across a
        timing chain XLA may pin any buffer that fits in VMEM: the r4 runs
        measured (a) the whole 28 MB Dirichlet operator resident (5.5 TB/s
        apparent), and (b) at 240 MB working sets an apparent 1.04-1.07x
        "HBM" fraction because the 36 MB x/y pair stayed resident while
        only the 208 MB coefficient array streamed.  Hence: coefficient
        bytes count when the coefficient array alone exceeds VMEM; x/y
        bytes count only when they cannot sit in VMEM (> VMEM/2).  If
        nothing provably streams, the row reports achieved GB/s labelled
        vmem_resident (a real capability, not an HBM claim)."""
        from iterative_solvers_tpu.utils.roofline import device_vmem_bytes

        emit(f"spmv_{name}_nnz_per_s", nnz_row / ms / 1e6, "Gnnz/s")
        n_el = ny * nx
        vmem = device_vmem_bytes()
        # guaranteed-HBM bytes: ONLY buffers that individually exceed VMEM
        # (XLA pins whole buffers; anything that fits may be served from
        # VMEM across the chain — measured: a pinned 36 MB x/y pair made a
        # 240 MB working set read as 1.04-1.07x "of HBM peak" in r4's
        # first pass, and a fully-resident 28 MB operator read as 5.5 TB/s)
        bufs = [ndiags * n_el * 4, n_el * 4, n_el * 4]  # coef, x, y
        hbm_bytes = sum(b for b in bufs if b > vmem)
        if hbm_bytes > 1.5 * vmem:
            frac = hbm_bytes / ms / 1e6 / hbm
            assert frac <= 1.05, (name, frac)  # accounting must be physical
            emit(f"spmv_{name}_roofline_frac", frac, "x")
        else:
            emit(f"spmv_{name}_gbps_vmem_resident",
                 sum(bufs) / ms / 1e6, "GB/s")

    # the containers' arrays travel as jit arguments (see chain_fn); only
    # static metadata is closed over via _replace on a template instance
    csr = CSR.from_scipy(m.astype(np.float32))
    bsr = BSR.from_scipy(m.astype(np.float32), blocksize=8)
    dia = GridDIA.from_scipy(m.astype(np.float32), (n, n))
    formats = [
        ("csr", csr, (csr.data, csr.indices, csr.rows),
         lambda v, d, i, r: csr._replace(data=d, indices=i, rows=r).matvec(v),
         "csr"),
        ("bsr8", bsr, (bsr.data, bsr.indices, bsr.rows),
         lambda v, d, i, r: bsr._replace(data=d, indices=i, rows=r).matvec(v),
         "csr"),
        ("griddia", dia, (dia.data,),
         lambda v, d: dia._replace(data=d).matvec(v), "dia"),
    ]
    for name, a, arrays, apply, cost_fmt in formats:
        # slow gather formats give a large marginal signal at short chains;
        # long chains on the CSR gather path crash the TPU worker
        ks, kl = ((10, 60) if name in ("csr", "bsr8") else (50, 400))
        ms = marginal_ms(chain_fn(apply, x, *arrays), ks, kl, reps=5)
        cost = spmv_cost(nnz, n * n, n * n, 4, fmt=cost_fmt)
        emit(f"spmv_{name}_1024sq_nnz_per_s", nnz / ms / 1e6, "Gnnz/s")
        emit(f"spmv_{name}_1024sq_roofline_frac",
             cost.achieved_gbps(ms / 1e3) / hbm, "x")

    # Pallas cyclic-GridDIA kernel (double-buffered slab pipeline;
    # ops/pallas_spmv).  cyclic=True canonicalises the periodic wrap
    # residues onto the 13 interior shifts — the minimal-traffic layout —
    # and makes the kernel eligible (the non-cyclic container carries
    # |dy| ~ n wrap shifts, which would silently fall back to XLA).
    from iterative_solvers_tpu.ops.pallas_spmv import grid_dia_matvec_pallas

    for nn in (1024, 2048):
        mc = m if nn == n else sh_operator(nn, h, 0.5)
        nnzc = mc.nnz
        diac = GridDIA.from_scipy(mc.astype(np.float32), (nn, nn),
                                  cyclic=True)
        assert len(diac.shifts) == 13
        assert max(abs(dy) for dy, _ in diac.shifts) <= 8  # no fallback
        x2 = jnp.array(
            np.random.default_rng(0).standard_normal((nn, nn)),
            dtype=jnp.float32)
        ref = np.asarray(jax.jit(
            lambda d, v: diac._replace(data=d)._apply(v))(diac.data, x2))
        got = np.asarray(jax.jit(
            lambda d, v: grid_dia_matvec_pallas(diac._replace(data=d), v))(
            diac.data, x2))
        scale = np.abs(ref).max()
        assert np.abs(ref - got).max() / scale < 1e-5, "pallas spmv parity"
        ms = marginal_ms(token_chain_fn(
            lambda v, d: grid_dia_matvec_pallas(diac._replace(data=d), v),
            x2, diac.data), 50, 400, reps=5)
        emit_dia_kernel_rows(f"griddia_cyclic_pallas_{nn}sq", nnzc, ms,
                             len(diac.shifts), nn, nn)

    # flat-DIA kernel on the Dirichlet 5-pt Laplacian (lab14_p2's operator,
    # all offsets near-diagonal): one stored field per flat diagonal — the
    # minimal-traffic diagonal layout
    from iterative_solvers_tpu.ops.sparse import DIA, laplacian_5pt_dirichlet
    from iterative_solvers_tpu.ops.pallas_spmv import dia_flat_matvec_pallas

    md = (laplacian_5pt_dirichlet(n + 1, 2.0) * 0.2).astype(np.float32)
    dflat = DIA.from_scipy(md)
    nnz_d = md.nnz
    xd = jnp.array(
        np.random.default_rng(2).standard_normal(n * n), dtype=jnp.float32
    )
    ref = np.asarray(jax.jit(
        lambda d, v: dflat._replace(data=d).matvec(v))(dflat.data, xd))
    got = np.asarray(jax.jit(
        lambda d, v: dia_flat_matvec_pallas(dflat._replace(data=d), (n, n), v))(
        dflat.data, xd))
    assert np.abs(ref - got).max() / np.abs(ref).max() < 1e-5, \
        "flat dia pallas parity"
    ms = marginal_ms(token_chain_fn(
        lambda v, d: dia_flat_matvec_pallas(dflat._replace(data=d), (n, n), v),
        xd, dflat.data), 50, 400, reps=5)
    emit_dia_kernel_rows("diaflat_pallas_dirichlet_1024sq", nnz_d, ms,
                         len(dflat.offsets), n, n)

    # 4th-order (13-point) Dirichlet bilaplacian at 1024²: flat-DIA and
    # NON-cyclic GridDIA Pallas rows.  The non-cyclic row keeps the
    # clamped-halo/zero-annihilation kernel path — still live for every
    # Dirichlet-style operator — under a TPU parity + throughput gate
    # (advisor r2: it lost coverage when the cyclic rows replaced it).
    from iterative_solvers_tpu.ops.sparse import biharmonic_dirichlet

    mb = (biharmonic_dirichlet(n + 1, 2.0) * 0.2).astype(np.float32)
    nnz_b = mb.nnz
    bflat = DIA.from_scipy(mb)
    bgrid = GridDIA.from_scipy(mb, (n, n))
    assert max(abs(dy) for dy, _ in bgrid.shifts) <= 8
    xb = jnp.array(
        np.random.default_rng(3).standard_normal(n * n), dtype=jnp.float32
    )
    ref = np.asarray(jax.jit(
        lambda d, v: bflat._replace(data=d).matvec(v))(bflat.data, xb))
    got = np.asarray(jax.jit(
        lambda d, v: dia_flat_matvec_pallas(bflat._replace(data=d), (n, n), v))(
        bflat.data, xb))
    assert np.abs(ref - got).max() / np.abs(ref).max() < 1e-5, \
        "flat dia biharm pallas parity"
    got = np.asarray(jax.jit(
        lambda d, v: grid_dia_matvec_pallas(
            bgrid._replace(data=d), v.reshape(n, n)).reshape(-1))(
        bgrid.data, xb))
    assert np.abs(ref - got).max() / np.abs(ref).max() < 1e-5, \
        "griddia biharm pallas parity"
    ms = marginal_ms(token_chain_fn(
        lambda v, d: dia_flat_matvec_pallas(bflat._replace(data=d), (n, n), v),
        xb, bflat.data), 50, 400, reps=5)
    emit_dia_kernel_rows("diaflat_pallas_biharm_1024sq", nnz_b, ms,
                         len(bflat.offsets), n, n)
    xb2 = xb.reshape(n, n)
    ms = marginal_ms(token_chain_fn(
        lambda v, d: grid_dia_matvec_pallas(bgrid._replace(data=d), v),
        xb2, bgrid.data), 50, 400, reps=5)
    emit_dia_kernel_rows("griddia_pallas_biharm_1024sq", nnz_b, ms,
                         len(bgrid.shifts), n, n)

    # ... and the plain 5-pt Dirichlet Laplacian (lab14_p2's operator)
    # through the same non-cyclic GridDIA kernel — the >=80% gate for the
    # Dirichlet-Laplacian operator class specifically
    lgrid = GridDIA.from_scipy(md, (n, n))
    ref = md @ np.asarray(xb, np.float64)
    got = np.asarray(jax.jit(
        lambda d, v: grid_dia_matvec_pallas(
            lgrid._replace(data=d), v.reshape(n, n)))(lgrid.data, xb))
    assert np.abs(ref.reshape(n, n) - got).max() / np.abs(ref).max() < 1e-5, \
        "griddia dirichlet pallas parity"
    ms = marginal_ms(token_chain_fn(
        lambda v, d: grid_dia_matvec_pallas(lgrid._replace(data=d), v),
        xb2, lgrid.data), 50, 400, reps=5)
    emit_dia_kernel_rows("griddia_pallas_dirichlet_1024sq", nnz_d, ms,
                         len(lgrid.shifts), n, n)

    # -- HBM-streaming sizes for the Dirichlet operator classes ---------------
    # At 1024² these operators' working sets fit in VMEM (hence the r3 >1.0
    # "HBM" fractions); the honest >=80%-of-HBM gate runs where the set
    # provably streams: biharmonic 13-field at 2048² (240 MB), 5-pt
    # Laplacian 5-field at 4096² (448 MB).
    from iterative_solvers_tpu.ops.sparse import laplacian_5pt_dirichlet as _l5

    nb2 = 2048
    mb2 = (biharmonic_dirichlet(nb2 + 1, 2.0) * 0.2).astype(np.float32)
    bgrid2 = GridDIA.from_scipy(mb2, (nb2, nb2))
    assert max(abs(dy) for dy, _ in bgrid2.shifts) <= 8
    xbb = jnp.array(np.random.default_rng(5).standard_normal((nb2, nb2)),
                    dtype=jnp.float32)
    ref = np.asarray(jax.jit(
        lambda d, v: bgrid2._replace(data=d)._apply(v))(bgrid2.data, xbb))
    got = np.asarray(jax.jit(
        lambda d, v: grid_dia_matvec_pallas(bgrid2._replace(data=d), v))(
        bgrid2.data, xbb))
    assert np.abs(ref - got).max() / np.abs(ref).max() < 1e-5, \
        "griddia biharm 2048 parity"
    ms = marginal_ms(token_chain_fn(
        lambda v, d: grid_dia_matvec_pallas(bgrid2._replace(data=d), v),
        xbb, bgrid2.data), 25, 200, reps=5)
    emit_dia_kernel_rows("griddia_pallas_biharm_2048sq", mb2.nnz, ms,
                         len(bgrid2.shifts), nb2, nb2)

    nd4 = 4096
    md4 = (_l5(nd4 + 1, 2.0) * 0.2).astype(np.float32)
    lgrid4 = GridDIA.from_scipy(md4, (nd4, nd4))
    xd4 = jnp.array(np.random.default_rng(6).standard_normal((nd4, nd4)),
                    dtype=jnp.float32)
    ref = np.asarray(jax.jit(
        lambda d, v: lgrid4._replace(data=d)._apply(v))(lgrid4.data, xd4))
    got = np.asarray(jax.jit(
        lambda d, v: grid_dia_matvec_pallas(lgrid4._replace(data=d), v))(
        lgrid4.data, xd4))
    assert np.abs(ref - got).max() / np.abs(ref).max() < 1e-5, \
        "griddia dirichlet 4096 parity"
    ms = marginal_ms(token_chain_fn(
        lambda v, d: grid_dia_matvec_pallas(lgrid4._replace(data=d), v),
        xd4, lgrid4.data), 25, 200, reps=5)
    emit_dia_kernel_rows("griddia_pallas_dirichlet_4096sq", md4.nnz, ms,
                         len(lgrid4.shifts), nd4, nd4)

    # VERDICT r4 item 7: the 4096² row's fraction is a conservative floor
    # (only the 336 MB coefficient array provably streams; the 67 MB x/y
    # may be VMEM-served across the chain).  Measure the SAME kernel where
    # EVERY buffer individually exceeds VMEM — 8192²: coef 1.34 GB, x/y
    # 268 MB each — so the emitted fraction counts measured traffic, not a
    # floor (size-sweep method).
    nd8 = 8192
    md8 = (_l5(nd8 + 1, 2.0) * 0.2).astype(np.float32)
    lgrid8 = GridDIA.from_scipy(md8, (nd8, nd8))
    xd8 = jnp.array(np.random.default_rng(7).standard_normal((nd8, nd8)),
                    dtype=jnp.float32)
    got = np.asarray(jax.jit(
        lambda d, v: grid_dia_matvec_pallas(lgrid8._replace(data=d), v))(
        lgrid8.data, xd8))
    ref = np.asarray(jax.jit(
        lambda d, v: lgrid8._replace(data=d)._apply(v))(lgrid8.data, xd8))
    assert np.abs(ref - got).max() / np.abs(ref).max() < 1e-5, \
        "griddia dirichlet 8192 parity"
    ms = marginal_ms(token_chain_fn(
        lambda v, d: grid_dia_matvec_pallas(lgrid8._replace(data=d), v),
        xd8, lgrid8.data), 10, 60, reps=5)
    emit_dia_kernel_rows("griddia_pallas_dirichlet_8192sq", md8.nnz, ms,
                         len(lgrid8.shifts), nd8, nd8)

    # SpMM: 8 right-hand sides.  XLA matmat row (re-reads the coefficient
    # fields per rhs — kept as the comparison point) ...
    X = jnp.array(
        np.random.default_rng(1).standard_normal((n * n, 8)),
        dtype=jnp.float32,
    )
    ms = marginal_ms(
        chain_fn(lambda V, d: dia._replace(data=d).matmat(V), X, dia.data),
        25, 200, reps=5)
    emit("spmm_griddia_1024sq_x8_nnz_per_s", nnz * 8 / ms / 1e6, "Gnnz/s")

    # ... and the fused Pallas SpMM kernel: coefficient chunks stream ONCE
    # per row block against the whole rhs stack (VERDICT r3 #8)
    from iterative_solvers_tpu.ops.pallas_spmv import grid_dia_matmat_pallas

    def emit_spmm_rows(name, nnz_row, ms, ndiags, nrhs, ny, nx, bm=32):
        # same provably-streams (per-buffer > VMEM) accounting as
        # emit_dia_kernel_rows; X and Y are each ONE (nrhs, ny, nx) buffer
        from iterative_solvers_tpu.utils.roofline import device_vmem_bytes

        emit(f"spmm_{name}_nnz_per_s", nnz_row * nrhs / ms / 1e6, "Gnnz/s")
        n_el = ny * nx
        vmem = device_vmem_bytes()
        bufs = [ndiags * n_el * 4, nrhs * n_el * 4, nrhs * n_el * 4]
        hbm_bytes = sum(b for b in bufs if b > vmem)
        if hbm_bytes > 1.5 * vmem:
            frac = hbm_bytes / ms / 1e6 / hbm
            assert frac <= 1.05, (name, frac)
            emit(f"spmm_{name}_roofline_frac", frac, "x")
        else:
            emit(f"spmm_{name}_gbps_vmem_resident", sum(bufs) / ms / 1e6,
                 "GB/s")

    for nn in (1024, 2048):
        mc = m if nn == n else sh_operator(nn, h, 0.5)
        diam = GridDIA.from_scipy(mc.astype(np.float32), (nn, nn),
                                  cyclic=True)
        X3 = jnp.array(
            np.random.default_rng(4).standard_normal((8, nn, nn)),
            dtype=jnp.float32)
        ref = np.stack([
            np.asarray(jax.jit(
                lambda d, v: diam._replace(data=d)._apply(v))(diam.data,
                                                              X3[r]))
            for r in range(8)])
        got = np.asarray(jax.jit(
            lambda d, v: grid_dia_matmat_pallas(diam._replace(data=d), v))(
            diam.data, X3))
        assert np.abs(ref - got).max() / np.abs(ref).max() < 1e-5, \
            "pallas spmm parity"
        # token-chained marginals at VMEM-resident sizes need long
        # chains: at ~20 us/call the 10-vs-60 marginal sits below tunnel
        # noise (a negative value was observed)
        ms = marginal_ms(token_chain_fn(
            lambda v, d: grid_dia_matmat_pallas(diam._replace(data=d), v),
            X3, diam.data), 25, 400, reps=5)
        emit_spmm_rows(f"griddia_cyclic_pallas_{nn}sq_x8", mc.nnz, ms,
                       len(diam.shifts), 8, nn, nn)

        # row-interleaved rhs layout (ny, nrhs, nx): the slab DMAs become
        # single contiguous bursts instead of nrhs strided chunks
        # (VERDICT r4 item 3); block-Krylov callers keep this layout
        from iterative_solvers_tpu.ops.pallas_spmv import (
            grid_dia_matmat_interleaved_pallas,
        )

        Xi = jnp.moveaxis(X3, 0, 1)
        goti = np.asarray(jax.jit(
            lambda d, v: grid_dia_matmat_interleaved_pallas(
                diam._replace(data=d), v))(diam.data, Xi))
        assert np.abs(ref - np.moveaxis(goti, 1, 0)).max() \
            / np.abs(ref).max() < 1e-5, "pallas interleaved spmm parity"
        ms = marginal_ms(token_chain_fn(
            lambda v, d: grid_dia_matmat_interleaved_pallas(
                diam._replace(data=d), v),
            Xi, diam.data), 25, 400, reps=5)
        emit_spmm_rows(f"griddia_cyclic_ilv_pallas_{nn}sq_x8", mc.nnz, ms,
                       len(diam.shifts), 8, nn, nn)


if __name__ == "__main__":
    sections = sys.argv[1:] or [
        "sh_step", "droplet_residual", "pma_loop", "droplet_full_step",
        "poisson", "large_sh", "pallas_stencils", "droplet_jvp", "spmv",
    ]
    for s in sections:
        globals()[f"bench_{s}"]()
