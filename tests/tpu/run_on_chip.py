"""TPU test lane: every Pallas kernel's parity + eligibility, on the chip.

The unit suite (tests/) runs on CPU where every kernel falls back to its XLA
mirror — which is exactly how round 2 shipped a silent-fallback bug on
periodic operators (commit ed035fc) that only a bench-time assert caught.
This lane closes that hole: one command, run serially on the real TPU,

    python tests/tpu/run_on_chip.py

checks for each kernel that (a) the pallas_call is actually in the compiled
HLO — no silent XLA fallback ("eligibility"), and (b) the kernel output
matches its XLA/jnp mirror to f32 roundoff ("parity"), plus (c) the
mixed-precision droplet step converges on chip with the same Newton count
as the f64 FD path.  Budget: well under 10 min with a warm /tmp/jaxcache
(first-ever run pays the one-time tunnel warmup).

Exit code 0 + final "ALL PASS" line on success; raises on first failure.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp  # noqa: E402

PASS = []


def check(name, cond, detail=""):
    assert cond, f"FAIL {name}: {detail}"
    PASS.append(name)
    print(f"pass  {name} {detail}", flush=True)


def assert_kernel_in_hlo(name, fn, *args):
    """Eligibility: the jitted computation must contain the Mosaic custom
    call (pallas), i.e. the Python-level gate did not silently fall back."""
    txt = jax.jit(fn).lower(*args).compile().as_text()
    check(f"{name}_eligible", "custom" in txt and "tpu_custom_call" in txt,
          "(tpu_custom_call present)")


def rel_err(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.abs(a - b).max() / max(np.abs(b).max(), 1e-30))


def main():
    t_start = time.time()
    rng = np.random.default_rng(0)

    # -- stencil kernels ------------------------------------------------------
    from iterative_solvers_tpu.ops.pallas_stencil import (
        lap_periodic_pallas, sh_operator_pallas,
    )
    from iterative_solvers_tpu.ops.stencils import (
        lap_periodic, sh_linear_operator,
    )

    n = 1024
    h = 40.0 / n
    u = jnp.array(rng.standard_normal((n, n)), jnp.float32)
    assert_kernel_in_hlo("lap_pallas", lambda x: lap_periodic_pallas(x, h), u)
    got = jax.jit(lambda x: lap_periodic_pallas(x, h))(u)
    want = jax.jit(lambda x: lap_periodic(x, h))(u)
    check("lap_pallas_parity", rel_err(got, want) < 1e-5, f"{rel_err(got, want):.2e}")

    assert_kernel_in_hlo("sh_pallas", lambda x: sh_operator_pallas(x, h, 0.01), u)
    got = jax.jit(lambda x: sh_operator_pallas(x, h, 0.01))(u)
    want = jax.jit(lambda x: sh_linear_operator(x, h, 0.01))(u)
    check("sh_pallas_parity", rel_err(got, want) < 1e-5, f"{rel_err(got, want):.2e}")

    # aliased in-place self-chain (inplace=True -> input_output_aliases):
    # a 5-deep chain catches both the aliasing correctness and the mono
    # pipeline's in-place race-freedom (r5b)
    def chain5(x, op):
        for _ in range(5):
            x = op(x)
        return x

    # contraction constants (h=sqrt(8), r=0.5) keep the 5-deep chain
    # bounded in f32 (same choice as benchmarks/run_all.py)
    h_c = float(np.sqrt(8.0))
    got = jax.jit(lambda x: chain5(
        x, lambda y: lap_periodic_pallas(y, h_c, inplace=True)))(u)
    want = jax.jit(lambda x: chain5(x, lambda y: lap_periodic(y, h_c)))(u)
    check("lap_pallas_inplace_chain5", rel_err(got, want) < 1e-4,
          f"{rel_err(got, want):.2e}")
    got = jax.jit(lambda x: chain5(
        x, lambda y: sh_operator_pallas(y, h_c, 0.5, inplace=True)))(u)
    want = jax.jit(lambda x: chain5(
        x, lambda y: sh_linear_operator(y, h_c, 0.5)))(u)
    check("sh_pallas_inplace_chain5", rel_err(got, want) < 1e-4,
          f"{rel_err(got, want):.2e}")

    # -- SpMV kernels ---------------------------------------------------------
    from iterative_solvers_tpu.ops.sparse import (
        DIA, GridDIA, sh_operator, biharmonic_dirichlet,
        laplacian_5pt_dirichlet,
    )
    from iterative_solvers_tpu.ops.pallas_spmv import (
        grid_dia_matvec_pallas, dia_flat_matvec_pallas,
    )

    m = sh_operator(n, float(np.sqrt(8.0)), 0.5).astype(np.float32)
    diac = GridDIA.from_scipy(m, (n, n), cyclic=True)
    check("griddia_cyclic_minimal", len(diac.shifts) == 13
          and max(abs(dy) for dy, _ in diac.shifts) <= 8, str(len(diac.shifts)))
    x2 = jnp.array(rng.standard_normal((n, n)), jnp.float32)
    assert_kernel_in_hlo("spmv_cyclic",
                         lambda d, v: grid_dia_matvec_pallas(
                             diac._replace(data=d), v), diac.data, x2)
    got = jax.jit(lambda d, v: grid_dia_matvec_pallas(
        diac._replace(data=d), v))(diac.data, x2)
    want = jax.jit(lambda d, v: diac._replace(data=d)._apply(v))(diac.data, x2)
    check("spmv_cyclic_parity", rel_err(got, want) < 1e-5,
          f"{rel_err(got, want):.2e}")

    # SpMM: coefficient fields stream once against the 8-rhs stack
    from iterative_solvers_tpu.ops.pallas_spmv import grid_dia_matmat_pallas

    x3 = jnp.array(rng.standard_normal((8, n, n)), jnp.float32)
    assert_kernel_in_hlo("spmm_cyclic",
                         lambda d, v: grid_dia_matmat_pallas(
                             diac._replace(data=d), v), diac.data, x3)
    got = jax.jit(lambda d, v: grid_dia_matmat_pallas(
        diac._replace(data=d), v))(diac.data, x3)
    want = jnp.stack([jax.jit(lambda d, v: diac._replace(data=d)._apply(v))(
        diac.data, x3[r]) for r in range(8)])
    check("spmm_cyclic_parity", rel_err(got, want) < 1e-5,
          f"{rel_err(got, want):.2e}")

    # row-interleaved SpMM (contiguous slab DMAs — VERDICT r4 item 3)
    from iterative_solvers_tpu.ops.pallas_spmv import (
        grid_dia_matmat_interleaved_pallas,
    )

    xi = jnp.moveaxis(x3, 0, 1)
    assert_kernel_in_hlo("spmm_interleaved",
                         lambda d, v: grid_dia_matmat_interleaved_pallas(
                             diac._replace(data=d), v), diac.data, xi)
    goti = jax.jit(lambda d, v: grid_dia_matmat_interleaved_pallas(
        diac._replace(data=d), v))(diac.data, xi)
    check("spmm_interleaved_parity",
          rel_err(jnp.moveaxis(goti, 1, 0), want) < 1e-5,
          f"{rel_err(jnp.moveaxis(goti, 1, 0), want):.2e}")

    mb = (biharmonic_dirichlet(n + 1, 2.0) * 0.2).astype(np.float32)
    bgrid = GridDIA.from_scipy(mb, (n, n))
    xb = jnp.array(rng.standard_normal(n * n), jnp.float32)
    assert_kernel_in_hlo("spmv_biharm",
                         lambda d, v: grid_dia_matvec_pallas(
                             bgrid._replace(data=d), v.reshape(n, n)),
                         bgrid.data, xb)
    got = jax.jit(lambda d, v: grid_dia_matvec_pallas(
        bgrid._replace(data=d), v.reshape(n, n)))(bgrid.data, xb)
    want = mb @ np.asarray(xb, np.float64)
    check("spmv_biharm_parity",
          rel_err(got, want.reshape(n, n)) < 1e-5, f"{rel_err(got, want.reshape(n, n)):.2e}")

    md = (laplacian_5pt_dirichlet(n + 1, 2.0) * 0.2).astype(np.float32)
    dflat = DIA.from_scipy(md)
    assert_kernel_in_hlo("spmv_diaflat",
                         lambda d, v: dia_flat_matvec_pallas(
                             dflat._replace(data=d), (n, n), v),
                         dflat.data, xb)
    got = jax.jit(lambda d, v: dia_flat_matvec_pallas(
        dflat._replace(data=d), (n, n), v))(dflat.data, xb)
    want = md @ np.asarray(xb, np.float64)
    check("spmv_diaflat_parity", rel_err(got, want) < 1e-5,
          f"{rel_err(got, want):.2e}")

    # -- droplet JVP chain kernel ----------------------------------------------
    import dataclasses

    from iterative_solvers_tpu.io import fixtures as fx
    from iterative_solvers_tpu.models import droplet as dp
    from iterative_solvers_tpu.ops import curvilinear
    from iterative_solvers_tpu.ops.pallas_droplet import (
        jvp_matvec_pallas, jvp_apply_ref,
    )

    fixture = fx.load("/root/reference/python_work/"
                      "initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt")
    big = fx.upsample(fixture, 1024, 1024)
    cfg = fx.config_for(big)
    q = jnp.array(big.q)
    geom = curvilinear.mesh_geometry(q, cfg.grid)
    geom32 = curvilinear.MeshGeometry(*(a.astype(jnp.float32) for a in geom))
    x32 = dp.seeded_solution(geom32, cfg,
                             [(0.0, 0.0, 1.0, 1.0), (3.0, 0.0, 1.0, 1.0)])
    stack = jax.jit(lambda xx, gg: dp.jvp_field_stack(
        xx, gg, cfg, jnp.float32(1e-8)))(x32, geom32)
    v = jnp.array(rng.standard_normal((1024, 1024)), jnp.float32)
    assert_kernel_in_hlo("droplet_jvp",
                         lambda vv, st: jvp_matvec_pallas(vv, st, cfg.grid),
                         v, stack)
    got = jax.jit(lambda vv, st: jvp_matvec_pallas(vv, st, cfg.grid))(v, stack)
    want = jax.jit(lambda vv, st: jvp_apply_ref(vv, st, cfg.grid))(v, stack)
    check("droplet_jvp_parity", rel_err(got, want) < 2e-5,
          f"{rel_err(got, want):.2e}")

    # -- f32 DCT accuracy on chip (the bf16-pass class) ------------------------
    # The r3 headline NaN was f32 matmuls lowering to bf16 MXU passes at the
    # default precision (ops/dct.py now pins HIGHEST).  Gate the on-chip f32
    # DCT round-trip + solve against the f64 oracle at true-f32 accuracy:
    # with bf16 passes the error is ~1e-3 and this check fails.
    from iterative_solvers_tpu.ops.dct import dct2, idct2

    zf = rng.standard_normal((91, 61))
    z64 = jnp.array(zf)
    z32 = jnp.array(zf, jnp.float32)
    w64 = np.asarray(jax.jit(lambda v: idct2(dct2(v) / 3.0))(z64))
    w32 = np.asarray(jax.jit(lambda v: idct2(dct2(v) / 3.0))(z32))
    check("dct_f32_accuracy_on_chip", rel_err(w32, w64) < 2e-6,
          f"{rel_err(w32, w64):.2e}")

    # -- mixed-precision convergence gate (91x61 droplet step on chip) --------
    cfg0 = fx.config_for(fixture)
    u0 = jnp.array(fixture.u)
    q0 = jnp.array(fixture.q)
    step_fd = dp.make_step(cfg0, dt=1e-5, dtmesh=3e-9, pma_loops=5)
    step_kr = dp.make_step(cfg0, dt=1e-5, dtmesh=3e-9, pma_loops=5,
                           jvp_dtype="float32", jvp_kernel=True)
    o_fd = jax.jit(lambda a, b: step_fd(a, b, 1e-5))(u0, q0)
    o_kr = jax.jit(lambda a, b: step_kr(a, b, 1e-5))(u0, q0)
    check("droplet_step_mixed_converged",
          bool(o_fd.converged) and bool(o_kr.converged),
          f"iters fd={int(o_fd.newton_iters)} kernel={int(o_kr.newton_iters)}")
    check("droplet_step_mixed_newton_parity",
          abs(int(o_fd.newton_iters) - int(o_kr.newton_iters)) <= 1)
    du = float(jnp.abs(o_kr.u - o_fd.u).max())
    check("droplet_step_mixed_solution", du < 5e-7, f"max|du|={du:.2e}")

    # -- the PRODUCTION bench config, verbatim (bench.py) ---------------------
    # r3's lane passed while bench.py NaN'd because the lane ran pma_loops=5
    # with f64 mesh dtypes.  This gate runs the bench's exact configuration:
    # f32 mesh_dtype + spectral_dtype, pma_loops=400, a 5-step lax.scan
    # chain, every step converged and finite.
    cfg_b = dataclasses.replace(cfg0, spectral_dtype="float32",
                                mesh_dtype="float32")
    step_b = dp.make_step(cfg_b, dt=1e-5, dtmesh=3e-9, pma_loops=400,
                          solver=dp.fast_solver())

    def bench_chain(uu, qq):
        def body(carry, _):
            u_, q_ = carry
            out = step_b(u_, q_, 1e-5)
            return (out.u, out.q), (out.f_norm, out.converged)

        (uf, qf), (fns, conv) = jax.lax.scan(body, (uu, qq), None, length=5)
        return jnp.all(conv) & jnp.all(jnp.isfinite(uf)), jnp.max(fns)

    ok, worst = jax.jit(bench_chain)(u0, q0)
    check("droplet_bench_config_5step_converged", bool(ok),
          f"worst f_norm {float(worst):.2e}")

    print(f"ALL PASS ({len(PASS)} checks, {time.time()-t_start:.0f}s)",
          flush=True)


if __name__ == "__main__":
    main()
