"""Scratch experiment: find the DMA pipeline shape that saturates HBM.

Parameterised slab pipeline (slots, prefetch depth, block rows, halos
on/off) with identity compute, measured at 8192^2 f32 where the working
set cannot be VMEM-resident.  Practical ceiling measured via XLA
elementwise: ~670 GB/s (82% of the 819 GB/s nominal roofline).
"""
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = 8


def make_pipeline(n_rows, n_cols, bm, dtype, slots=2, depth=1, halos=True,
                  vmem_mb=96):
    nchunks = n_rows // bm

    def kernel(u_hbm, out_hbm, slabs, outs, in_sems, out_sems):
        def in_copies(slot, idx):
            start = pl.multiple_of(idx * jnp.int32(bm), H)
            cs = [pltpu.make_async_copy(
                u_hbm.at[pl.ds(start, bm), :],
                slabs.at[slot, pl.ds(H, bm), :],
                in_sems.at[slot, jnp.int32(0)])]
            if halos:
                top_src = pl.multiple_of(
                    jnp.where(idx == 0, jnp.int32(n_rows - H),
                              start - jnp.int32(H)), H)
                cs.append(pltpu.make_async_copy(
                    u_hbm.at[pl.ds(top_src, H), :],
                    slabs.at[slot, pl.ds(0, H), :],
                    in_sems.at[slot, jnp.int32(1)]))
                bot_src = pl.multiple_of(
                    jnp.where(idx == nchunks - 1, jnp.int32(0),
                              start + jnp.int32(bm)), H)
                cs.append(pltpu.make_async_copy(
                    u_hbm.at[pl.ds(bot_src, H), :],
                    slabs.at[slot, pl.ds(H + bm, H), :],
                    in_sems.at[slot, jnp.int32(2)]))
            return cs

        def out_copy(slot, idx):
            dst = pl.multiple_of(idx * jnp.int32(bm), H)
            return pltpu.make_async_copy(
                outs.at[slot], out_hbm.at[pl.ds(dst, bm), :],
                out_sems.at[slot])

        for d in range(depth):  # warm-up: start chunks 0..depth-1
            if d < nchunks:
                for c in in_copies(jnp.int32(d % slots), jnp.int32(d)):
                    c.start()

        def body(idx, _):
            slot = lax.rem(idx, jnp.int32(slots))
            pslot = lax.rem(idx + jnp.int32(depth), jnp.int32(slots))

            @pl.when(idx + depth < nchunks)
            def _():
                for c in in_copies(pslot, idx + jnp.int32(depth)):
                    c.start()

            for c in in_copies(slot, idx):
                c.wait()

            @pl.when(idx >= slots)
            def _():
                out_copy(slot, idx - jnp.int32(slots)).wait()

            outs[slot] = slabs[slot][H:H + bm, :]
            out_copy(slot, idx).start()
            return jnp.int32(0)

        lax.fori_loop(jnp.int32(0), jnp.int32(nchunks), body, jnp.int32(0))
        for d in range(slots):
            i = nchunks - slots + d
            if i >= 0:
                out_copy(jnp.int32(i % slots), jnp.int32(i)).wait()

    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n_rows, n_cols), dtype),
        scratch_shapes=[
            pltpu.VMEM((slots, bm + 2 * H, n_cols), dtype),
            pltpu.VMEM((slots, bm, n_cols), dtype),
            pltpu.SemaphoreType.DMA((slots, 3)),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
        ),
    )


def main():
    n = 8192
    u = jax.device_put(jnp.array(
        np.random.default_rng(0).standard_normal((n, n)), dtype=jnp.float32))
    bytes_min = 2 * n * n * 4

    def bench(op, label):
        def make(k):
            return jax.jit(lambda x: jnp.sum(
                lax.fori_loop(0, k, lambda i, y: op(y), x)))

        def run(k):
            f = make(k)
            float(f(u))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(u))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        t_s, t_l = run(25), run(200)
        ms = 1000.0 * (t_l - t_s) / 175
        print("%-40s %.4f ms  %.1f GB/s  %.3f roofline"
              % (label, ms, bytes_min / ms / 1e6, bytes_min / ms / 1e6 / 819.0))

    for slots, depth, bm, halos in [
        (2, 1, 128, True),   # current kernel shape
        (2, 1, 128, False),  # halo cost
        (2, 1, 256, True),
        (2, 1, 512, True),
        (3, 2, 128, True),
        (4, 3, 128, True),
        (4, 3, 256, True),
        (4, 2, 256, True),
        (6, 4, 128, True),
    ]:
        try:
            op = make_pipeline(n, n, bm, u.dtype, slots, depth, halos)
            bench(op, f"slots={slots} depth={depth} bm={bm} halos={halos}")
        except Exception as e:  # noqa: BLE001
            print(f"slots={slots} depth={depth} bm={bm} halos={halos}: "
                  f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
