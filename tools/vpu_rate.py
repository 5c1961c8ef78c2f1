"""Pure-VPU rate of the slab-pipeline compute bodies, no DMA.

The r5 mono-pipeline negative result (tools/test_fused_halo.py) leaves one
suspect for the ~330 GB/s plateau: the VPU/VMEM round-trip of the compute
itself (identity compute measured the same as lap; the DMA-only copy
kernel reaches 400-470).  This times `outs[slot] = f(slabs[slot])` in a
fori_loop over resident VMEM scratch with zero DMA traffic, for
f = identity / lap / lap-mono (roll+where form), at the production chunk
shape.  If the per-chunk time ~= the pipeline's 24 us chunk period, the
pipeline is VPU-bound and the plateau is explained.

Usage: python tools/vpu_rate.py [n_cols] [bm]
"""
import functools
import json
import pathlib
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

_HALO = 8


def make_kernel(body_name, n_cols, bm, nslabs=4, iters=64):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    inv_h2 = 0.125  # python literal: jnp scalars become captured constants

    def roll_l(x, shift):
        return pltpu.roll(x, shift=jnp.int32(shift % x.shape[-1]), axis=1)

    def f_identity(s):
        return s

    def f_lap_slice(s):  # halo-style: slice a (bm+2H) slab
        core = s[_HALO:_HALO + bm - 16, :]  # static slices, like _lap_rows
        return (s[_HALO - 1:_HALO + bm - 17, :]
                + s[_HALO + 1:_HALO + bm - 15, :]
                + roll_l(core, 1) + roll_l(core, -1)
                - 4.0 * core) * inv_h2

    def f_lap_mono(s):
        rows = lax.broadcasted_iota(jnp.int32, (bm, n_cols), 0)
        up = jnp.where(rows == jnp.int32(0), s,
                       pltpu.roll(s, shift=jnp.int32(1), axis=0))
        down = jnp.where(rows == jnp.int32(bm - 1), s,
                         pltpu.roll(s, shift=jnp.int32(bm - 1), axis=0))
        return (up + down + roll_l(s, 1) + roll_l(s, -1) - 4.0 * s) * inv_h2

    def f_lap_noroll(s):  # adds only, no lane rolls: roll-cost probe
        return (s + s * 0.5 + s * 0.25 + s * 0.125 - 4.0 * s) * inv_h2

    bodies = {"identity": f_identity, "lap_slice": f_lap_slice,
              "lap_mono": f_lap_mono, "noroll": f_lap_noroll}
    f = bodies[body_name]
    rows_in = bm + 2 * _HALO if body_name == "lap_slice" else bm
    rows_out = bm - 16 if body_name == "lap_slice" else bm

    def kernel(seed_hbm, out_hbm, slabs, outs, io_sem):
        cp = pltpu.make_async_copy(seed_hbm, slabs.at[0, :_HALO, :], io_sem)
        cp.start()
        cp.wait()

        def body(i, _):
            slot = lax.rem(i, jnp.int32(nslabs))
            outs[slot, :rows_out, :] = f(slabs[slot])
            return jnp.int32(0)

        lax.fori_loop(jnp.int32(0), jnp.int32(iters), body, jnp.int32(0),
                      unroll=False)
        cp2 = pltpu.make_async_copy(outs.at[0, :_HALO, :], out_hbm, io_sem)
        cp2.start()
        cp2.wait()

    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((_HALO, n_cols), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nslabs, rows_in, n_cols), jnp.float32),
            pltpu.VMEM((nslabs, rows_out, n_cols), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=int(
                1.3 * nslabs * (rows_in + rows_out) * n_cols * 4)
            + (16 << 20),
        ),
    )


def time_tok(fn, tok0, ks=(2, 8), reps=5):
    @functools.partial(jax.jit, static_argnums=1)
    def chain(tok, k):
        return lax.fori_loop(0, k, lambda i, t: fn(t), tok)

    def run(k):
        float(jnp.sum(chain(tok0, k)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(chain(tok0, k)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return 1000.0 * (run(ks[1]) - run(ks[0])) / (ks[1] - ks[0])


def main():
    n_cols = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    bm = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    iters = 64
    tok0 = jnp.zeros((_HALO, n_cols), jnp.float32)
    blk_bytes = bm * n_cols * 4
    for name in ("identity", "noroll", "lap_slice", "lap_mono"):
        k = make_kernel(name, n_cols, bm, iters=iters)
        ms = time_tok(lambda t: k(t), tok0)
        us_per_chunk = 1000.0 * ms / iters
        print(json.dumps({
            "body": name, "bm": bm, "us_per_chunk": round(us_per_chunk, 2),
            "vpu_rw_gbps": round(2 * blk_bytes / (us_per_chunk * 1e-6) / 1e9,
                                 1),
        }), flush=True)


if __name__ == "__main__":
    main()
