"""TPU block-size sweep for the fused droplet JVP-matvec kernel.

Measures ops.pallas_droplet.jvp_matvec_pallas at 4096² f32 for several
block_rows in minimal-traffic roofline terms (10 n² x 4 bytes: v + 8
coefficient fields + 1 write).  Run on the TPU, foreground:
``python tools/tune_droplet_jvp.py [n]``.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from iterative_solvers_tpu.io import fixtures as fx  # noqa: E402
from iterative_solvers_tpu.models import droplet as dp  # noqa: E402
from iterative_solvers_tpu.ops import curvilinear  # noqa: E402
from iterative_solvers_tpu.ops.pallas_droplet import (  # noqa: E402
    jvp_matvec_pallas, jvp_apply_ref,
)
from iterative_solvers_tpu.utils.roofline import device_hbm_gbps  # noqa: E402


def marginal_ms(f, args, k_short, k_long, reps=5):
    def run(k):
        float(f(*args, k))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args, k))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_s, t_l = run(k_short), run(k_long)
    return 1000.0 * (t_l - t_s) / (k_long - k_short)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    fixture = fx.load(
        "/root/reference/python_work/"
        "initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt")
    big = fx.upsample(fixture, n, n)
    cfg = fx.config_for(big)
    geom = curvilinear.mesh_geometry(jnp.array(big.q), cfg.grid)
    geom32 = curvilinear.MeshGeometry(*(a.astype(jnp.float32) for a in geom))
    x32 = dp.seeded_solution(geom32, cfg,
                             [(0.0, 0.0, 1.0, 1.0), (3.0, 0.0, 1.0, 1.0)])
    stack = jax.jit(lambda xx, gg: dp.jvp_field_stack(
        xx, gg, cfg, jnp.float32(5e-10)))(x32, geom32)
    v = jnp.array(np.random.default_rng(0).standard_normal((n, n)),
                  jnp.float32)
    bytes_min = 10 * n * n * 4
    hbm = device_hbm_gbps()

    ref = np.asarray(jax.jit(
        lambda vv, st: jvp_apply_ref(vv, st, cfg.grid))(v, stack))
    scale = np.abs(ref).max()

    for bm in (8, 16, 24, 32, 48, 64):
        if n % bm:
            continue
        try:
            op = lambda vv, st: jvp_matvec_pallas(vv, st, cfg.grid,
                                                  block_rows=bm)
            got = np.asarray(jax.jit(op)(v, stack))
            err = np.abs(ref - got).max() / scale
            assert err < 2e-5, err
            chain = jax.jit(lambda vv, st, k: jnp.sum(
                lax.fori_loop(0, k, lambda i, x: op(x, st), vv)))
            ms = marginal_ms(chain, (v, stack), 10, 60)
            print(f"bm={bm:3d}  {ms:8.4f} ms  roofline "
                  f"{bytes_min / ms / 1e6 / hbm:6.3f}  parity {err:.1e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue sweep
            print(f"bm={bm:3d}  FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
