"""Double-float (two-f32) feasibility experiment — VERDICT r4 item 4.

The 4096² droplet step spends ~40% of its wall time in f64 outer residual
evaluations (132 ms/eval, 10x their f32 cost = TPU f64-emulation floor,
PARITY.md).  The measured f32 failure is interior rounding amplified ~h^-5
by the double differentiation (tools/f32_residual_diag.py) — exactly the
cancellation class that double-float (Dekker/TwoSum compensated f32)
arithmetic addresses.  Whether df64 can beat the f64 emulation depends on:

1. **FMA**: does XLA on TPU lower ``a*b - p`` with a single rounding?
   If yes, TwoProd costs 2 flops; if not, Veltkamp splitting costs ~17.
2. **Throughput**: measured cost of a df64 stencil chain vs f32 vs
   emulated-f64 at 4096².
3. **Accuracy**: df64 residual error vs the f64 oracle at 1024²/2048².

Run on the TPU: ``python tools/df64_experiment.py``.  Prints JSON lines.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def emit(**kw):
    print(json.dumps(kw), flush=True)


# -- 1. FMA probe -------------------------------------------------------------

def fma_probe():
    """If XLA emits fma for a*b - p, the result is the exact low part of the
    product (nonzero for almost all inputs); plain f32 mul+sub gives 0."""
    def f(a, b):
        p = a * b
        return a * b - p   # fma(a, b, -p) == exact product error if fused

    a = jnp.array(np.float32(1.0) + np.float32(2.0) ** -12, jnp.float32)
    b = jnp.array(np.float32(1.0) + np.float32(2.0) ** -14, jnp.float32)
    err = float(jax.jit(f)(a, b))
    # exact error of this product in f64
    exact = float(np.float64(a) * np.float64(b)
                  - np.float64(np.float32(np.float64(a) * np.float64(b))))
    has_fma = err != 0.0 and abs(err - exact) < 1e-12
    emit(metric="fma_fused_mul_sub", value=err, exact=exact,
         has_fma=bool(has_fma))
    return has_fma


# -- df64 primitives (Veltkamp split; no fma assumption) ----------------------

SPLIT = np.float32(4097.0)  # 2^12 + 1 for f32 (24-bit mantissa)


def two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def vsplit(a):
    c = SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    p = a * b
    ah, al = vsplit(a)
    bh, bl = vsplit(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def df_add(xh, xl, yh, yl):
    sh, sl = two_sum(xh, yh)
    sl = sl + (xl + yl)
    return two_sum(sh, sl)


def df_mul(xh, xl, yh, yl):
    ph, pl = two_prod(xh, yh)
    pl = pl + (xh * yl + xl * yh)
    return two_sum(ph, pl)


def df_scale_f(xh, xl, c):
    """df64 times a plain f32 scalar."""
    ph, pl = two_prod(xh, c)
    pl = pl + xl * c
    return two_sum(ph, pl)


def from64(x):
    hi = x.astype(jnp.float32)
    return hi, (x - hi.astype(jnp.float64)).astype(jnp.float32)


def to64(h, l):
    return h.astype(jnp.float64) + l.astype(jnp.float64)


# -- 2/3. stencil-chain cost + accuracy ---------------------------------------

def d2_f(u, inv_h2):
    """4th-order interior second derivative along lanes (plain dtype)."""
    c = u.dtype.type
    out = (-u[:, :-4] + 16.0 * u[:, 1:-3] - 30.0 * u[:, 2:-2]
           + 16.0 * u[:, 3:-1] - u[:, 4:]) * c(inv_h2 / 12.0)
    return jnp.pad(out, ((0, 0), (2, 2)))


def d2_df(uh, ul, inv_h2):
    """Same stencil in df64 (dot2-style compensated linear combination)."""
    coefs = [-1.0, 16.0, -30.0, 16.0, -1.0]
    sh = jnp.zeros_like(uh[:, :-4])
    sl = jnp.zeros_like(sh)
    for k, c in enumerate(coefs):
        end = uh.shape[1] - 4 + k
        th, tl = df_scale_f(uh[:, k:end], ul[:, k:end], jnp.float32(c))
        sh, sl = df_add(sh, sl, th, tl)
    s = np.float64(inv_h2 / 12.0)
    s_hi = np.float32(s)
    s_lo = np.float32(s - np.float64(s_hi))
    ph, pl = df_mul(sh, sl, jnp.float32(s_hi), jnp.float32(s_lo))
    return jnp.pad(ph, ((0, 0), (2, 2))), jnp.pad(pl, ((0, 0), (2, 2)))


def bench_chain(n=4096, k_short=5, k_long=25):
    """Marginal cost of a double-differentiation chain (d2 of d2 — the
    residual's amplification structure) in f32 / df64 / emulated f64."""
    rng = np.random.default_rng(0)
    u64 = jnp.array(rng.standard_normal((n, n)))
    h2 = (9.0 / n) ** 2

    def chain_f(dtype):
        u = u64.astype(dtype)

        def f(k):
            def body(i, v):
                w = d2_f(v, 1.0 / h2)
                return w / (1.0 + jnp.float32(i + 1) if dtype == jnp.float32
                            else (1.0 + (i + 1)))
            return jnp.sum(lax.fori_loop(0, k, body, u))

        return jax.jit(f, static_argnums=0)

    def chain_df():
        uh, ul = from64(u64)

        def f(k):
            def body(i, carry):
                vh, vl = carry
                wh, wl = d2_df(vh, vl, 1.0 / h2)
                sc = 1.0 / (1.0 + jnp.float32(i + 1))
                return df_scale_f(wh, wl, sc)
            h, l = lax.fori_loop(0, k, body, (uh, ul))
            return jnp.sum(h) + jnp.sum(l)

        return jax.jit(f, static_argnums=0)

    def timed(f, *args, reps=3):
        float(f(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    for name, fn in [("f32", chain_f(jnp.float32)),
                     ("df64", chain_df()),
                     ("f64", chain_f(jnp.float64))]:
        ms = 1000.0 * (timed(fn, k_long) - timed(fn, k_short)) / (k_long - k_short)
        emit(metric=f"d2chain_{n}_{name}_ms_per_iter", value=round(ms, 4))


def accuracy(n=1024):
    """df64 vs f64 vs f32 for d2(d2(u)) — the amplification structure."""
    rng = np.random.default_rng(1)
    u64 = jnp.array(rng.standard_normal((n, n)))
    h2 = (9.0 / n) ** 2

    ref = jax.jit(lambda u: d2_f(d2_f(u, 1.0 / h2), 1.0 / h2))(u64)
    f32 = jax.jit(lambda u: d2_f(d2_f(u, 1.0 / h2), 1.0 / h2))(
        u64.astype(jnp.float32))

    def dfrun(u):
        uh, ul = from64(u)
        vh, vl = d2_df(uh, ul, 1.0 / h2)
        wh, wl = d2_df(vh, vl, 1.0 / h2)
        return to64(wh, wl)

    df = jax.jit(dfrun)(u64)
    scale = float(jnp.abs(ref).max())
    emit(metric=f"d2d2_{n}_f32_rel_err",
         value=float(jnp.abs(f32.astype(jnp.float64) - ref).max()) / scale)
    emit(metric=f"d2d2_{n}_df64_rel_err",
         value=float(jnp.abs(df - ref).max()) / scale)


if __name__ == "__main__":
    fma_probe()
    accuracy(1024)
    accuracy(2048)
    bench_chain()
