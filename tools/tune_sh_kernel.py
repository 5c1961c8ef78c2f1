"""TPU block-size sweep for the fused SH Pallas kernel (VERDICT round-1 #10).

Measures lap_periodic_pallas / sh_operator_pallas marginal cost at 4096^2 f32
for several block_rows, in useful-bytes roofline terms (2 * n^2 * 4 bytes).
Run on the TPU, foreground: ``python tools/tune_sh_kernel.py``.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import jax.numpy as jnp
from jax import lax

from iterative_solvers_tpu.ops.pallas_stencil import (
    lap_periodic_pallas, sh_operator_pallas,
)
from iterative_solvers_tpu.ops.stencils import lap_periodic, sh_linear_operator
from iterative_solvers_tpu.utils.roofline import device_hbm_gbps


def marginal_ms(f, k_short, k_long, reps=3):
    """``f`` is one jitted callable taking the (traced) chain length — one
    compile serves both lengths (the remote-compile tunnel is slow)."""

    def run(k):
        float(f(k))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(k))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_s, t_l = run(k_short), run(k_long)
    return 1000.0 * (t_l - t_s) / (k_long - k_short)


def bench(name, op, u, bytes_min):
    @jax.jit
    def chain(k):
        return jnp.sum(lax.fori_loop(0, k, lambda i, x: op(x), u))

    t0 = time.time()
    ms = marginal_ms(chain, 25, 200)
    frac = bytes_min / ms / 1e6 / device_hbm_gbps()
    print(f"{name:28s} {ms:8.4f} ms  roofline {frac:6.3f}"
          f"   (wall {time.time()-t0:.0f}s)", flush=True)
    return ms


def main():
    n = 4096
    h = float(np.sqrt(8.0))
    u = jnp.array(np.random.default_rng(0).standard_normal((n, n)),
                  dtype=jnp.float32)
    bytes_min = 2 * n * n * 4

    # parity gates first
    t0 = time.time()
    ref = np.asarray(jax.jit(lambda x: sh_linear_operator(x, h, 0.5))(u))
    print(f"xla ref done ({time.time()-t0:.0f}s)", flush=True)
    for bm in (128, 256, 512):
        t0 = time.time()
        got = np.asarray(
            jax.jit(lambda x, bm=bm: sh_operator_pallas(x, h, 0.5, bm))(u))
        err = np.abs(ref - got).max() / np.abs(ref).max()
        assert err < 1e-5, (bm, err)
        print(f"parity sh bm={bm}: {err:.2e} ({time.time()-t0:.0f}s)",
              flush=True)

    bench("lap_xla", lambda x: lap_periodic(x, h), u, bytes_min)
    bench("sh_xla", lambda x: sh_linear_operator(x, h, 0.5), u, bytes_min)
    for bm in (128, 256, 512):
        bench(f"lap_pallas bm={bm}",
              lambda x, bm=bm: lap_periodic_pallas(x, h, bm), u, bytes_min)
    for bm in (128, 256, 512):
        bench(f"sh_pallas bm={bm}",
              lambda x, bm=bm: sh_operator_pallas(x, h, 0.5, bm), u, bytes_min)


if __name__ == "__main__":
    main()
