"""Scratch experiment: in-place (input_output_aliased) periodic Laplacian.

Race-freedom argument: with out block i aliasing in block i, the only
backward reads a halo stencil needs (rows of block i-1, already
overwritten) are replaced by reads of a pre-sweep snapshot of the 8-row
block-edge strips; every read of `u` itself targets block >= i, whose
aliased write has not been issued yet.  The wrap halos (block 0 reading
the last strip, block nb-1 reading the first) come from the snapshots
too, so sweep order never matters.
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


def lap_inplace(n, bm, inv_h2):
    nc = n // bm

    def kernel(core, top, bot, out):
        s = jnp.concatenate([top[0, H - 1:, :], core[...], bot[0, :1, :]],
                            axis=0)
        left = pltpu.roll(s, shift=jnp.int32(1), axis=1)
        right = pltpu.roll(s, shift=jnp.int32(n - 1), axis=1)
        out[...] = (s[:-2, :] + s[2:, :] + left[1:-1, :] + right[1:-1, :]
                    - 4.0 * s[1:-1, :]) * inv_h2

    call = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
            pl.BlockSpec((1, H, n), lambda i: (i, 0, 0)),       # last rows of block i-1
            pl.BlockSpec((1, H, n), lambda i: ((i + 1) % nc, 0, 0)),  # first rows of block i+1
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )

    def op(u):
        blocks = u.reshape(nc, bm, n)
        top = jnp.roll(blocks[:, bm - H:, :], 1, axis=0)  # top[i] = tail of block i-1
        bot = blocks[:, :H, :]                            # bot[j] read as (i+1)%nc
        return call(u, top, bot)

    return op


def main():
    n = 8192
    h = float(np.sqrt(8.0))
    inv_h2 = 1.0 / (h * h)
    rng = np.random.default_rng(0)
    u = jax.device_put(jnp.array(rng.standard_normal((n, n)),
                                 dtype=jnp.float32))
    bytes_min = 2 * n * n * 4

    def bench(op, label, bm):
        def make(k):
            return jax.jit(lambda x: jnp.sum(
                lax.fori_loop(0, k, lambda i, y: op(y), x)))

        # honesty checks (advisor round-1): (a) the timed loop includes the
        # host-graph halo-snapshot construction — account its traffic when
        # quoting GB/s; (b) XLA may insert a defensive copy for the aliased
        # buffer inside the loop carry — count full-array copies in the HLO.
        nc = n // bm
        snapshot_bytes = 2 * 2 * nc * H * n * 4   # read+write of both strips
        hlo = make(4).lower(u).compile().as_text()
        big_copies = sum(
            1 for line in hlo.splitlines()
            if " copy(" in line and f"f32[{n},{n}]" in line
        )

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
        print("%-30s %.4f ms  %.1f GB/s min-bytes (%.1f incl snapshots)  "
              "%.3f roofline  full-array copies in HLO: %d"
              % (label, ms, bytes_min / ms / 1e6,
                 (bytes_min + snapshot_bytes) / ms / 1e6,
                 bytes_min / ms / 1e6 / 819.0, big_copies))

    # parity first (two sizes, repeated runs to catch racy behaviour)
    import sys
    sys.path.insert(0, "/root/repo")
    from iterative_solvers_tpu.ops.stencils import lap_periodic
    for nn, bmm in ((1024, 128), (8192, 128), (8192, 256)):
        v = jax.device_put(jnp.array(rng.standard_normal((nn, nn)),
                                     dtype=jnp.float32))
        ref = np.asarray(jax.jit(lambda x: lap_periodic(x, h))(v))
        op = jax.jit(lap_inplace(nn, bmm, inv_h2))
        errs = []
        for _ in range(5):
            got = np.asarray(op(v))
            errs.append(np.abs(ref - got).max() / np.abs(ref).max())
        print(f"parity n={nn} bm={bmm}: max rel err over 5 runs "
              f"{max(errs):.3e}")

    for bm in (128, 256, 512):
        bench(lap_inplace(n, bm, inv_h2), f"inplace lap bm={bm}", bm)


if __name__ == "__main__":
    main()
