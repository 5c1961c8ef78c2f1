"""On-chip check of the r5 fused-halo slab-pipeline load (pallas_stencil).

Parity: lap + SH kernels vs the XLA stencils at 1024² (covers chunk-0
top wrap + last-chunk bottom wrap + interior fused loads), plus a
streams=2 lap variant.  Timing: lap at 8192² (genuinely streaming)
across bm/slots, reported as chained marginals with GB/s.
"""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.run_all import marginal_ms, chain_fn
from iterative_solvers_tpu.ops.pallas_stencil import (
    lap_periodic_pallas, sh_operator_pallas,
)
from iterative_solvers_tpu.ops.stencils import lap_periodic, sh_linear_operator

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")


def main():
    print("devices:", jax.devices(), flush=True)
    n = 1024
    h = 40.0 / n
    u = jnp.array(np.random.default_rng(0).standard_normal((n, n)),
                  dtype=jnp.float32)

    ref = np.asarray(jax.jit(lambda x: lap_periodic(x, h))(u))
    scale = np.abs(ref).max()
    for bm, slots, streams, mode in [
            (128, 2, 1, "halo"), (128, 3, 1, "mono"), (256, 3, 1, "mono"),
            (128, 4, 1, "mono"), (128, 3, 2, "mono"), (64, 3, 4, "mono")]:
        got = np.asarray(jax.jit(
            lambda x: lap_periodic_pallas(x, h, bm, slots, streams,
                                          mode))(u))
        err = np.abs(ref - got).max() / scale
        print(f"lap parity bm={bm} slots={slots} streams={streams} "
              f"{mode}: rel err {err:.2e}", flush=True)
        assert err < 1e-5, "PARITY FAIL"

    ref = np.asarray(jax.jit(lambda x: sh_linear_operator(x, h, 0.01))(u))
    got = np.asarray(jax.jit(lambda x: sh_operator_pallas(x, h, 0.01))(u))
    err = np.abs(ref - got).max() / np.abs(ref).max()
    print(f"sh parity: rel err {err:.2e}", flush=True)
    assert err < 1e-5, "PARITY FAIL"

    n8 = 8192
    h_b = float(np.sqrt(8.0))
    u8 = jnp.array(np.random.default_rng(2).standard_normal((n8, n8)),
                   dtype=jnp.float32)
    byts = 2 * n8 * n8 * 4
    for bm, slots, streams, mode in [
            (128, 3, 1, "mono"), (256, 3, 1, "mono"), (512, 3, 1, "mono"),
            (128, 4, 1, "mono"), (256, 4, 1, "mono"), (256, 6, 1, "mono"),
            (128, 3, 2, "mono"), (256, 3, 2, "mono"), (256, 2, 1, "halo")]:
        ms = marginal_ms(
            chain_fn(lambda x: lap_periodic_pallas(x, h_b, bm, slots,
                                                   streams, mode), u8),
            25, 100, reps=5)
        print(f"lap8192 bm={bm} slots={slots} streams={streams} {mode}: "
              f"{ms:.3f} ms  {byts / ms / 1e6:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
