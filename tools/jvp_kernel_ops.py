"""Static VPU-op census of the fused droplet JVP kernel body.

Traces ops.pallas_droplet._chain_block (both chunk specialisations) with
jax.make_jaxpr and tallies elementwise work, giving the compute-roofline
side of the kernel's performance decomposition (PARITY.md; VERDICT r3 #6):

    T_compute ~= (ops per point) * n^2 / VPU_throughput
    VPU (v5e) ~= 8 sublanes x 128 lanes x 4 ALUs x 0.94 GHz ~= 3.85 Top/s

Runs on CPU (pure tracing — no TPU needed):
    python tools/jvp_kernel_ops.py
"""
import pathlib
import sys
from collections import Counter

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from iterative_solvers_tpu.ops.pallas_droplet import _chain_block, _HALO  # noqa: E402

# elementwise primitives that occupy a VPU ALU slot per element
_EW = {"add", "sub", "mul", "div", "neg", "max", "min", "select_n", "eq",
       "lt", "le", "gt", "ge", "ne", "and", "or", "not", "xor"}
# lane rolls: one pass per element through the cross-lane permute network
_ROLL = {"roll", "rotate", "dynamic_slice", "concatenate", "iota",
         "broadcast_in_dim", "rev"}


def census(bm=64, ny=4096, nx=4096, row_edges=True):
    S = bm + 2 * _HALO
    roll = lambda x, k: jnp.roll(x, -k, axis=1)
    jaxpr = jax.make_jaxpr(
        lambda v, c: _chain_block(v, c, jnp.int32(1), bm, ny, nx,
                                  9.0 / nx, 6.0 / ny, roll,
                                  row_edges=row_edges))(
        jnp.zeros((S, nx), jnp.float32), jnp.zeros((8, S, nx), jnp.float32))

    ew = other = 0
    by_prim = Counter()
    for eqn in jaxpr.jaxpr.eqns:
        out_elems = sum(int(np.prod(v.aval.shape)) for v in eqn.outvars
                        if hasattr(v.aval, "shape"))
        name = eqn.primitive.name
        by_prim[name] += out_elems
        if name in _EW:
            ew += out_elems
        else:
            other += out_elems
    per_pt_ew = ew / (bm * nx)
    per_pt_other = other / (bm * nx)
    return per_pt_ew, per_pt_other, by_prim


def main():
    vpu_tops = 8 * 128 * 4 * 0.94e9  # ~3.85e12 op/s (v5e, f32)
    n = 4096
    for tag, re_ in [("edge_chunk", True), ("interior_chunk", False)]:
        ew, other, prims = census(row_edges=re_)
        t_ms = (ew * n * n) / vpu_tops * 1e3
        print(f"{tag}: {ew:.0f} elementwise ops/pt (+{other:.0f} "
              f"shape/roll elems/pt) -> >= {t_ms:.2f} ms at 4096^2 "
              f"on a {vpu_tops/1e12:.2f} Top/s VPU")
        top = ", ".join(f"{k}:{v/(64*4096):.0f}"
                        for k, v in prims.most_common(8))
        print(f"  top primitives/pt: {top}")


if __name__ == "__main__":
    main()
