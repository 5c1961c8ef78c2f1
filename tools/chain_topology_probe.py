"""Does the benchmark chain topology (self-chain v=op(v) vs fixed-input
token chain) explain the lap kernels' ~330 GB/s vs the copy kernel's
400-470?

Self-chaining lets XLA alias the loop carry in-place, so the kernel's HBM
load and store streams hit the SAME buffer (in-place streaming update —
read/write turnaround on the same banks); the ladder's copy kernel reads a
fixed input and writes a separate output.  This times lap (mono + halo)
both ways at 8192^2 f32.

Usage: python tools/chain_topology_probe.py
"""
import json
import pathlib
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from benchmarks.run_all import marginal_ms, chain_fn, token_chain_fn
from iterative_solvers_tpu.ops.pallas_stencil import lap_periodic_pallas

token_chain = token_chain_fn  # canonical implementation lives in run_all


def main():
    n = 8192
    h_b = float(np.sqrt(8.0))
    u = jnp.array(np.random.default_rng(2).standard_normal((n, n)),
                  dtype=jnp.float32)
    byts = 2 * n * n * 4
    for mode, bm, slots in [("mono", 128, 3), ("mono", 256, 3),
                            ("halo", 256, 2)]:
        op = lambda x: lap_periodic_pallas(x, h_b, bm, slots, 1, mode)
        ms_self = marginal_ms(chain_fn(op, u), 25, 100, reps=5)
        ms_tok = marginal_ms(token_chain(op, u), 25, 100, reps=5)
        print(json.dumps({
            "mode": mode, "bm": bm, "slots": slots,
            "self_ms": round(ms_self, 3),
            "self_gbps": round(byts / ms_self / 1e6, 1),
            "token_ms": round(ms_tok, 3),
            "token_gbps": round(byts / ms_tok / 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
