"""TPU experiment: double-buffered periodic-Laplacian Pallas kernel.

Compares the shipped single-buffer kernel (ops/pallas_stencil.py) against a
single-invocation kernel that runs a fori_loop over row chunks with 2-slot
input slabs and 2-slot output buffers, overlapping the HBM->VMEM load of
chunk i+1 and the VMEM->HBM store of chunk i-1 with the compute of chunk i.

Run serially in the foreground on the TPU:
    python tools/pallas_db_experiment.py
"""
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from iterative_solvers_tpu.ops import stencils  # noqa: E402
from iterative_solvers_tpu.ops.pallas_stencil import (  # noqa: E402
    lap_periodic_pallas, sh_operator_pallas,
)

_H = 8  # f32 sublane tile height


def _roll_lanes(x, shift):
    return pltpu.roll(x, shift=jnp.int32(shift % x.shape[1]), axis=1)


def _lap_rows(s, inv_h2, lo, hi):
    core = s[lo:hi, :]
    left = _roll_lanes(core, 1)
    right = _roll_lanes(core, -1)
    return (s[lo - 1:hi - 1, :] + s[lo + 1:hi + 1, :] + left + right
            - 4.0 * core) * inv_h2


def _make_db_kernel(n_rows, n_cols, bm, compute, dtype, vmem_mb=None):
    """Double-buffered slab pipeline: compute(slab_value) -> (bm, n) block."""
    nchunks = n_rows // bm

    def kernel(u_hbm, out_hbm, slabs, outs, in_sems, out_sems):
        def in_copies(slot, idx):
            start = pl.multiple_of(idx * jnp.int32(bm), _H)
            mid = pltpu.make_async_copy(
                u_hbm.at[pl.ds(start, bm), :],
                slabs.at[slot, pl.ds(_H, bm), :],
                in_sems.at[slot, jnp.int32(0)],
            )
            top_src = pl.multiple_of(
                jnp.where(idx == 0, jnp.int32(n_rows - _H),
                          start - jnp.int32(_H)), _H)
            top = pltpu.make_async_copy(
                u_hbm.at[pl.ds(top_src, _H), :],
                slabs.at[slot, pl.ds(0, _H), :],
                in_sems.at[slot, jnp.int32(1)],
            )
            bot_src = pl.multiple_of(
                jnp.where(idx == nchunks - 1, jnp.int32(0),
                          start + jnp.int32(bm)), _H)
            bot = pltpu.make_async_copy(
                u_hbm.at[pl.ds(bot_src, _H), :],
                slabs.at[slot, pl.ds(_H + bm, _H), :],
                in_sems.at[slot, jnp.int32(2)],
            )
            return (mid, top, bot)

        def out_copy(slot, idx):
            return pltpu.make_async_copy(
                outs.at[slot],
                out_hbm.at[pl.ds(pl.multiple_of(idx * jnp.int32(bm), _H), bm), :],
                out_sems.at[slot],
            )

        for c in in_copies(jnp.int32(0), jnp.int32(0)):
            c.start()

        def body(idx, _):
            slot = lax.rem(idx, jnp.int32(2))
            nslot = lax.rem(idx + jnp.int32(1), jnp.int32(2))

            @pl.when(idx + 1 < nchunks)
            def _():
                for c in in_copies(nslot, idx + jnp.int32(1)):
                    c.start()

            for c in in_copies(slot, idx):
                c.wait()

            @pl.when(idx >= 2)
            def _():
                out_copy(slot, idx - jnp.int32(2)).wait()

            outs[slot] = compute(slabs[slot])
            out_copy(slot, idx).start()
            return jnp.int32(0)

        lax.fori_loop(jnp.int32(0), jnp.int32(nchunks), body, jnp.int32(0))
        # drain the last two output DMAs
        @pl.when(jnp.int32(nchunks) >= 2)
        def _():
            out_copy(jnp.int32(nchunks % 2), jnp.int32(nchunks - 2)).wait()
        out_copy(jnp.int32((nchunks - 1) % 2), jnp.int32(nchunks - 1)).wait()

    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n_rows, n_cols), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bm + 2 * _H, n_cols), dtype),
            pltpu.VMEM((2, bm, n_cols), dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=None if vmem_mb is None else vmem_mb * 1024 * 1024,
        ),
    )


def lap_periodic_db(u, h, block_rows=128):
    n_rows, n_cols = u.shape
    inv_h2 = 1.0 / (h * h)
    bm = block_rows

    def compute(s):
        return _lap_rows(s, inv_h2, _H, _H + bm)

    return _make_db_kernel(n_rows, n_cols, bm, compute, u.dtype,
                           vmem_mb=64 if bm > 128 else None)(u)


def sh_operator_db(u, h, r, block_rows=128):
    n_rows, n_cols = u.shape
    inv_h2 = 1.0 / (h * h)
    bm = block_rows

    def compute(s):
        lap1 = _lap_rows(s, inv_h2, _H - 1, _H + bm + 1)
        lap2 = _lap_rows(lap1, inv_h2, 1, bm + 1)
        core = s[_H:_H + bm, :]
        return -lap2 - 2.0 * lap1[1:-1, :] + (r - 1.0) * core

    return _make_db_kernel(n_rows, n_cols, bm, compute, u.dtype, vmem_mb=64)(u)


def marginal_ms(make_fn, k_short, k_long, reps=3):
    def run(k):
        f = make_fn(k)
        float(f())
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f())
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_s, t_l = run(k_short), run(k_long)
    return 1000.0 * (t_l - t_s) / (k_long - k_short)


def bench_op(name, op, u, bytes_min, hbm_gbps):
    def make(k):
        def chain():
            out = lax.fori_loop(0, k, lambda i, x: op(x) * 1e-4, u)
            return jnp.sum(out)

        return jax.jit(chain)

    ms = marginal_ms(make, 25, 200)
    gbps = bytes_min / ms / 1e6
    print(f"{name:28s} {ms:8.3f} ms  {gbps:7.1f} GB/s  "
          f"{gbps / hbm_gbps * 100:5.1f}% roofline", flush=True)
    return ms


def main():
    from iterative_solvers_tpu.utils.roofline import device_hbm_gbps

    n = 4096
    h = 40.0 / n
    hbm = device_hbm_gbps()
    u = jnp.array(np.random.default_rng(0).standard_normal((n, n)),
                  dtype=jnp.float32)
    bytes_min = 2 * n * n * 4

    # parity first
    ref = np.asarray(jax.jit(lambda x: stencils.lap_periodic(x, h))(u))
    bms = tuple(int(a) for a in sys.argv[1:]) or (128,)
    do_sh = bool(int(os.environ.get("DB_SH", "1")))
    ok_bms = []
    for bm in bms:
        if n % bm:
            continue
        try:
            got = np.asarray(jax.jit(lambda x: lap_periodic_db(x, h, bm))(u))
        except Exception as e:  # VMEM overflow at large bm
            print(f"lap db bm={bm} failed: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        err = np.abs(ref - got).max() / np.abs(ref).max()
        print(f"lap db bm={bm} parity rel err {err:.2e}", flush=True)
        assert err < 1e-5
        ok_bms.append(bm)

    ref = np.asarray(jax.jit(lambda x: stencils.sh_linear_operator(x, h, 0.01))(u))
    sh_ok = do_sh
    try:
        if not do_sh:
            raise RuntimeError("sh disabled")
        got = np.asarray(jax.jit(lambda x: sh_operator_db(x, h, 0.01))(u))
        err = np.abs(ref - got).max() / np.abs(ref).max()
        print(f"sh db parity rel err {err:.2e}", flush=True)
        assert err < 1e-5
    except Exception as e:
        print(f"sh db failed: {type(e).__name__}: {str(e)[:200]}", flush=True)
        sh_ok = False

    bench_op("lap_single_buffer(shipped)", lambda x: lap_periodic_pallas(x, h),
             u, bytes_min, hbm)
    for bm in ok_bms:
        bench_op(f"lap_double_buffer bm={bm}",
                 lambda x, bm=bm: lap_periodic_db(x, h, bm), u, bytes_min, hbm)
    bench_op("sh_single_buffer(shipped)",
             lambda x: sh_operator_pallas(x, h, 0.01), u, bytes_min, hbm)
    if sh_ok:
        bench_op("sh_double_buffer bm=128",
                 lambda x: sh_operator_db(x, h, 0.01), u, bytes_min, hbm)


if __name__ == "__main__":
    main()
