"""Parity + both-topology timings for the mono SH kernel (r5).

Usage: python tools/sh_mono_probe.py
"""
import pathlib
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from benchmarks.run_all import marginal_ms, chain_fn
from tools.chain_topology_probe import token_chain
from iterative_solvers_tpu.ops.pallas_stencil import sh_operator_pallas
from iterative_solvers_tpu.ops.stencils import sh_linear_operator


def main():
    n = 1024
    h = 40.0 / n
    u = jnp.array(np.random.default_rng(0).standard_normal((n, n)),
                  dtype=jnp.float32)
    ref = np.asarray(jax.jit(lambda x: sh_linear_operator(x, h, 0.01))(u))
    scale = np.abs(ref).max()
    for bm in (128, 256):
        for mode in ("mono", "halo"):
            got = np.asarray(jax.jit(
                lambda x: sh_operator_pallas(x, h, 0.01, bm, mode))(u))
            err = np.abs(ref - got).max() / scale
            print(f"sh parity bm={bm} {mode}: rel err {err:.2e}", flush=True)
            assert err < 1e-5, "PARITY FAIL"

    # r=0.5, h=sqrt(8) keeps the chain contraction-free of rescale passes
    h_b = float(np.sqrt(8.0))
    for nn in (4096, 8192):
        ub = jnp.array(
            np.random.default_rng(2).standard_normal((nn, nn)),
            dtype=jnp.float32)
        byts = 2 * nn * nn * 4
        for bm in (128, 256):
            for mode in ("mono", "halo"):
                op = lambda x: sh_operator_pallas(x, h_b, 0.5, bm, mode)
                ms_s = marginal_ms(chain_fn(op, ub), 25, 100, reps=5)
                ms_t = marginal_ms(token_chain(op, ub), 25, 100, reps=5)
                print(f"sh{nn} bm={bm} {mode}: self {ms_s:.3f} ms "
                      f"({byts / ms_s / 1e6:.0f} GB/s)  token {ms_t:.3f} ms "
                      f"({byts / ms_t / 1e6:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
