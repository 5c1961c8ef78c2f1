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


def pingpong_chain(op, u):
    """Self-chain through a two-buffer ping-pong carry: body
    ``(prev, cur) -> (cur, op(cur))``.  ``prev``'s buffer is dead at the
    return, so XLA can write ``op(cur)`` into it — every iteration reads
    one buffer and writes a DIFFERENT one, avoiding the in-place
    turnaround while still chaining the real output (unlike the token
    chain, this is a faithful time-stepping loop)."""
    import functools
    from jax import lax

    @functools.partial(jax.jit, static_argnums=1)
    def chain(x, k):
        def body(i, c):
            prev, cur = c
            return (cur, op(cur))

        _, out = lax.fori_loop(0, k, body, (x, x))
        return jnp.sum(out)

    def f(k):
        return chain(u, k)

    f.traced_k = True
    return f


def main():
    n = 8192
    h_b = float(np.sqrt(8.0))
    u = jnp.array(np.random.default_rng(2).standard_normal((n, n)),
                  dtype=jnp.float32)
    byts = 2 * n * n * 4
    # correctness of the aliased in-place self-chain: 5 applications vs
    # the XLA stencil chain (true in-place: the carry dies each iteration)
    from iterative_solvers_tpu.ops.stencils import lap_periodic
    k5 = jax.jit(lambda x: jnp.asarray(
        [x := lap_periodic_pallas(x, h_b, 128, 3, 1, "mono", True)
         for _ in range(5)][-1]))
    r5 = jax.jit(lambda x: jnp.asarray(
        [x := lap_periodic(x, h_b) for _ in range(5)][-1]))
    small = u[:2048, :2048]
    got, ref = np.asarray(k5(small)), np.asarray(r5(small))
    err = float(np.abs(got - ref).max() / np.abs(ref).max())
    print(json.dumps({"check": "inplace_chain5_parity", "rel_err": err}),
          flush=True)
    assert err < 1e-4, "INPLACE PARITY FAIL"

    for mode, bm, slots in [("mono", 128, 3), ("mono", 256, 3),
                            ("halo", 256, 2)]:
        op = lambda x: lap_periodic_pallas(x, h_b, bm, slots, 1, mode)
        ms_self = marginal_ms(chain_fn(op, u), 25, 100, reps=5)
        ms_tok = marginal_ms(token_chain(op, u), 25, 100, reps=5)
        rec = {
            "mode": mode, "bm": bm, "slots": slots,
            "self_ms": round(ms_self, 3),
            "self_gbps": round(byts / ms_self / 1e6, 1),
            "token_ms": round(ms_tok, 3),
            "token_gbps": round(byts / ms_tok / 1e6, 1),
        }
        if mode == "mono":
            opa = lambda x: lap_periodic_pallas(x, h_b, bm, slots, 1,
                                                "mono", True)
            ms_al = marginal_ms(chain_fn(opa, u), 25, 100, reps=5)
            rec["aliased_ms"] = round(ms_al, 3)
            rec["aliased_gbps"] = round(byts / ms_al / 1e6, 1)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
