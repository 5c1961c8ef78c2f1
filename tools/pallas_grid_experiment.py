"""Scratch experiment: grid-based pallas pipeline (Mosaic auto double
buffering) with halo rows delivered as separate 8-row BlockSpec inputs
whose index maps wrap periodically.  Compare against the manual-DMA slab
pipeline (~330 GB/s) and the XLA elementwise ceiling (~670 GB/s)."""
import functools
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = 8


def grid_lap(n, bm, inv_h2):
    nb = n // H
    r = bm // H

    def kernel(core, top, bot, out):
        s = jnp.concatenate([top[H - 1:, :], core[...], bot[:1, :]], axis=0)
        left = pltpu.roll(s, shift=jnp.int32(1), axis=1)
        right = pltpu.roll(s, shift=jnp.int32(n - 1), axis=1)
        mid = s[1:-1, :]
        out[...] = (s[:-2, :] + s[2:, :] + left[1:-1, :] + right[1:-1, :]
                    - 4.0 * mid) * inv_h2

    call = pl.pallas_call(
        kernel,
        grid=(n // bm,),
        in_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
            pl.BlockSpec((H, n), lambda i: ((i * r - 1) % nb, 0)),
            pl.BlockSpec((H, n), lambda i: ((i * r + r) % nb, 0)),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )
    # three in_specs are three *views* of the same field (core + wrapped
    # halo strips) — pass u for all of them
    return lambda x: call(x, x, x)


def grid_copy(n, bm):
    def kernel(core, out):
        out[...] = core[...]

    return pl.pallas_call(
        kernel,
        grid=(n // bm,),
        in_specs=[pl.BlockSpec((bm, n), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )


def main():
    n = 8192
    h = float(np.sqrt(8.0))
    inv_h2 = 1.0 / (h * h)
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
        print("%-30s %.4f ms  %.1f GB/s  %.3f roofline"
              % (label, ms, bytes_min / ms / 1e6, bytes_min / ms / 1e6 / 819.0))

    for bm in (128, 256, 512):
        try:
            bench(grid_copy(n, bm), f"grid copy bm={bm}")
        except Exception as e:  # noqa: BLE001
            print(f"grid copy bm={bm}: {type(e).__name__}: {str(e)[:150]}")
    for bm in (128, 256, 512):
        try:
            bench(grid_lap(n, bm, inv_h2), f"grid lap bm={bm}")
        except Exception as e:  # noqa: BLE001
            print(f"grid lap bm={bm}: {type(e).__name__}: {str(e)[:150]}")

    # parity check vs jnp stencil
    from iterative_solvers_tpu.ops.stencils import lap_periodic
    ref = np.asarray(jax.jit(lambda x: lap_periodic(x, h))(u))
    got = np.asarray(jax.jit(grid_lap(n, 128, inv_h2))(u))
    err = np.abs(ref - got).max() / np.abs(ref).max()
    print("parity rel err:", err)


if __name__ == "__main__":
    main()
