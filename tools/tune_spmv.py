"""Tune the Pallas SpMV kernels on the TPU (block_rows sweep).

- cyclic GridDIA on the periodic SH operator at 1024² (13 fields — the
  minimal-traffic layout; this is the kernel the BASELINE "SpMV >=80% of
  HBM roofline" line targets)
- flat-DIA on the Dirichlet 5-pt Laplacian

Prints one JSON line per configuration.
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp  # noqa: E402

from benchmarks.run_all import marginal_ms, chain_fn  # noqa: E402
from iterative_solvers_tpu.ops.sparse import (  # noqa: E402
    DIA, GridDIA, sh_operator, laplacian_5pt_dirichlet,
)
from iterative_solvers_tpu.ops.pallas_spmv import (  # noqa: E402
    grid_dia_matvec_pallas, dia_flat_matvec_pallas,
)
from iterative_solvers_tpu.utils.roofline import (  # noqa: E402
    spmv_cost, device_hbm_gbps,
)


def main():
    n = 1024
    hbm = device_hbm_gbps()
    rng = np.random.default_rng(0)

    # -- cyclic GridDIA, periodic SH operator ------------------------------
    m = sh_operator(n, float(np.sqrt(8.0)), 0.5)
    nnz = m.nnz
    dia = GridDIA.from_scipy(m.astype(np.float32), (n, n), cyclic=True)
    assert len(dia.shifts) == 13, dia.shifts
    x2 = jnp.array(rng.standard_normal((n, n)), dtype=jnp.float32)
    ref = np.asarray(jax.jit(
        lambda d, v: dia._replace(data=d)._apply(v))(dia.data, x2))
    scale = np.abs(ref).max()
    cost = spmv_cost(nnz, n * n, n * n, 4, fmt="dia")

    ms = marginal_ms(chain_fn(
        lambda v, d: dia._replace(data=d)._apply(v), x2, dia.data),
        50, 400, reps=5)
    print(json.dumps({"kernel": "griddia_cyclic_xla", "ms": round(ms, 4),
                      "gnnz_s": round(nnz / ms / 1e6, 2),
                      "roofline": round(cost.achieved_gbps(ms / 1e3) / hbm,
                                        4)}), flush=True)

    for bm in (64, 128, 256):
        got = np.asarray(jax.jit(
            lambda d, v: grid_dia_matvec_pallas(
                dia._replace(data=d), v, block_rows=bm))(dia.data, x2))
        err = np.abs(ref - got).max() / scale
        assert err < 1e-5, (bm, err)
        ms = marginal_ms(chain_fn(
            lambda v, d: grid_dia_matvec_pallas(
                dia._replace(data=d), v, block_rows=bm),
            x2, dia.data), 50, 400, reps=5)
        print(json.dumps({
            "kernel": f"griddia_cyclic_pallas_bm{bm}", "ms": round(ms, 4),
            "gnnz_s": round(nnz / ms / 1e6, 2),
            "roofline": round(cost.achieved_gbps(ms / 1e3) / hbm, 4),
            "parity": float(err)}), flush=True)

    # -- flat DIA, Dirichlet 5-pt ------------------------------------------
    md = (laplacian_5pt_dirichlet(n + 1, 2.0) * 0.2).astype(np.float32)
    dflat = DIA.from_scipy(md)
    nnz_d = md.nnz
    xd = jnp.array(rng.standard_normal(n * n), dtype=jnp.float32)
    refd = np.asarray(jax.jit(
        lambda d, v: dflat._replace(data=d).matvec(v))(dflat.data, xd))
    costd = spmv_cost(nnz_d, n * n, n * n, 4, fmt="dia")
    for bm in (64, 128, 256, 512):
        got = np.asarray(jax.jit(
            lambda d, v: dia_flat_matvec_pallas(
                dflat._replace(data=d), (n, n), v, block_rows=bm))(
            dflat.data, xd))
        err = np.abs(refd - got).max() / np.abs(refd).max()
        assert err < 1e-5, (bm, err)
        ms = marginal_ms(chain_fn(
            lambda v, d: dia_flat_matvec_pallas(
                dflat._replace(data=d), (n, n), v, block_rows=bm),
            xd, dflat.data), 50, 400, reps=5)
        print(json.dumps({
            "kernel": f"diaflat_pallas_bm{bm}", "ms": round(ms, 4),
            "gnnz_s": round(nnz_d / ms / 1e6, 2),
            "roofline": round(costd.achieved_gbps(ms / 1e3) / hbm, 4),
            "parity": float(err)}), flush=True)


if __name__ == "__main__":
    main()
