"""Double-float (two-f32) compensated arithmetic — the TPU fast path for
f64-accuracy residuals.

TPU v5e has no f64 hardware; XLA emulates f64 at ~10x the f32 elementwise
cost (measured: the 4096² droplet CN residual is 132 ms/eval f64 vs 13 ms
f32, PARITY.md).  The f32 residual is unusable at fine grids — interior
rounding of the state is amplified ~h^-5 by the double differentiation
(tools/f32_residual_diag.py) — but that is an *input-rounding* problem:
carrying the state as an (hi, lo) pair of f32 with error-free transforms
(Knuth TwoSum, Dekker/Veltkamp TwoProd — no FMA on TPU, verified by
tools/df64_experiment.py's probe) keeps ~2^-48 relative accuracy through
the whole linear chain at a measured **1.84x less cost than emulated f64**
(d2-stencil chain at 4096²: f32 0.39 ms, df64 1.29 ms, f64 2.36 ms/iter).

A df64 value is a plain ``(hi, lo)`` tuple of equal-shape f32 arrays with
``hi + lo`` the represented value and ``|lo| <= ulp(hi)/2``.  All functions
are shape-polymorphic and jit-friendly (no Python branching on values).

Reference residual this feeds: droplet.py:435-450 via 601-681.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_SPLIT = np.float32(4097.0)  # 2^12 + 1 (f32 has a 24-bit mantissa)


# -- error-free transforms -----------------------------------------------------

def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _fast_two_sum(a, b):
    """Requires |a| >= |b| (use after a renormalising _two_sum)."""
    s = a + b
    return s, b - (s - a)


def _split(a):
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    """Exact product a*b = p + err without FMA (Veltkamp/Dekker)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


# -- conversions ---------------------------------------------------------------

def from64(x):
    """Split an f64 array into a df64 pair (exact: f32 hi + f32 lo carries
    49 of the 53 mantissa bits — beyond the 2^-48 working precision)."""
    hi = x.astype(jnp.float32)
    return hi, (x - hi.astype(jnp.float64)).astype(jnp.float32)


def to64(x):
    return x[0].astype(jnp.float64) + x[1].astype(jnp.float64)


def from32(h):
    return h, jnp.zeros_like(h)


def const(c: float):
    """A Python/f64 scalar as an (hi, lo) pair of np.float32."""
    hi = np.float32(c)
    return hi, np.float32(np.float64(c) - np.float64(hi))


# -- arithmetic ----------------------------------------------------------------

def add(x, y):
    sh, sl = _two_sum(x[0], y[0])
    sl = sl + (x[1] + y[1])
    return _fast_two_sum(sh, sl)


def sub(x, y):
    return add(x, neg(y))


def neg(x):
    return -x[0], -x[1]


def add_f(x, b):
    """df64 + plain f32 array/scalar."""
    sh, sl = _two_sum(x[0], b)
    return _fast_two_sum(sh, sl + x[1])


def mul(x, y):
    ph, pl = _two_prod(x[0], y[0])
    pl = pl + (x[0] * y[1] + x[1] * y[0])
    return _fast_two_sum(ph, pl)


def mul_f(x, b):
    """df64 x plain f32 array/scalar."""
    ph, pl = _two_prod(x[0], b)
    return _fast_two_sum(ph, pl + x[1] * b)


def mul_pow2(x, c: float):
    """Exact scaling by a (possibly negative) power of two."""
    c = np.float32(c)
    return x[0] * c, x[1] * c


def scale(x, c: float):
    """df64 x compile-time float (carried to df64 precision)."""
    ch, cl = const(c)
    ph, pl = _two_prod(x[0], ch)
    pl = pl + (x[0] * cl + x[1] * ch)
    return _fast_two_sum(ph, pl)


def recip(x):
    """1/x by one df64 Newton step from the f32 seed: rel err ~ eps32^2."""
    r0 = 1.0 / x[0]
    # r1 = r0 * (2 - x r0): the correction term is computed in df64
    e = sub(from32(jnp.full_like(r0, np.float32(2.0))), mul_f(x, r0))
    return mul_f(e, r0)


def div(x, y):
    return mul(x, recip(y))


def sq(x):
    return mul(x, x)


# -- linear stencils (mirrors of ops.stencils, pairs in/out) -------------------

def _edge_rows_df(u, strip_w: int, coefs: np.ndarray, side: str):
    """One-sided boundary rows along the last axis with compensated
    accumulation (mirror of stencils._edge_rows; the coefficient tables are
    small integers, exact in f32)."""
    uh, ul = u
    sh_str = uh[..., :strip_w] if side == "lo" else uh[..., -strip_w:]
    sl_str = ul[..., :strip_w] if side == "lo" else ul[..., -strip_w:]
    rows = []
    for r in range(coefs.shape[0]):
        acc = None
        for i in range(strip_w):
            c = np.float32(coefs[r, i])
            if c == 0.0:
                continue
            t = mul_f((sh_str[..., i], sl_str[..., i]), c)
            acc = t if acc is None else add(acc, t)
        rows.append(acc)
    h = jnp.stack([r[0] for r in rows], axis=-1)
    l = jnp.stack([r[1] for r in rows], axis=-1)
    return h, l


def _lc(*terms):
    """Compensated linear combination of (coef, pair-slice) terms; integer
    coefficients are exact in f32."""
    acc = None
    for c, t in terms:
        c = np.float32(c)
        tt = (t[0] * c, t[1] * c) if float(c) in (1.0, -1.0, 2.0, -2.0, 4.0,
                                                  -4.0, 8.0, -8.0, 16.0,
                                                  -16.0, 32.0, -32.0) \
            else mul_f(t, c)
        acc = tt if acc is None else add(acc, tt)
    return acc


def _sl(u, sl_):
    """Slice both components along the last axis."""
    return u[0][..., sl_], u[1][..., sl_]


def _slc(u, j):
    """Single column j of both components."""
    return u[0][..., j], u[1][..., j]


def d1_x_df(u, dx: float):
    """4th-order first derivative along the last axis (stencils.d1_x)."""
    from .stencils import _D1_LO, _D1_HI

    interior = _lc((1.0, _sl(u, np.s_[:-4])), (-8.0, _sl(u, np.s_[1:-3])),
                   (8.0, _sl(u, np.s_[3:-1])), (-1.0, _sl(u, np.s_[4:])))
    lo = _edge_rows_df(u, 5, _D1_LO, "lo")
    hi = _edge_rows_df(u, 5, _D1_HI, "hi")
    h = jnp.concatenate([lo[0], interior[0], hi[0]], axis=-1)
    l = jnp.concatenate([lo[1], interior[1], hi[1]], axis=-1)
    return scale((h, l), 1.0 / (12.0 * dx))


def tT(u):
    return jnp.swapaxes(u[0], -1, -2), jnp.swapaxes(u[1], -1, -2)


def d1_y_df(u, dy: float):
    return tT(d1_x_df(tT(u), dy))


def flux_div_x_df(a, v, inv_h2: float):
    """Conservative 4th-order ``(a v_ksi)_ksi`` along the last axis —
    compensated mirror of ops.curvilinear._flux_div_x (the droplet
    residual's cancellation hot spot)."""
    A = lambda s: _sl(a, s)
    V = lambda s: _sl(v, s)
    t1 = mul(_lc((4.0, A(np.s_[2:-4]))),
             _lc((1.0, V(np.s_[:-6])), (-8.0, V(np.s_[1:-5])),
                 (8.0, V(np.s_[3:-3])), (-1.0, V(np.s_[4:-2]))))
    t2 = mul(_lc((-1.0, A(np.s_[1:-5])), (9.0, A(np.s_[2:-4])),
                 (9.0, A(np.s_[3:-3])), (-1.0, A(np.s_[4:-2]))),
             _lc((1.0, V(np.s_[1:-5])), (-27.0, V(np.s_[2:-4])),
                 (27.0, V(np.s_[3:-3])), (-1.0, V(np.s_[4:-2]))))
    t3 = mul(_lc((-1.0, A(np.s_[2:-4])), (9.0, A(np.s_[3:-3])),
                 (9.0, A(np.s_[4:-2])), (-1.0, A(np.s_[5:-1]))),
             _lc((1.0, V(np.s_[2:-4])), (-27.0, V(np.s_[3:-3])),
                 (27.0, V(np.s_[4:-2])), (-1.0, V(np.s_[5:-1]))))
    t4 = mul(_lc((4.0, A(np.s_[4:-2]))),
             _lc((1.0, V(np.s_[2:-4])), (-8.0, V(np.s_[3:-3])),
                 (8.0, V(np.s_[5:-1])), (-1.0, V(np.s_[6:]))))
    interior = scale(add(sub(t1, t2), sub(t3, t4)), inv_h2 / 288.0)

    Ac = lambda j: _slc(a, j)
    Vc = lambda j: _slc(v, j)
    c1 = add(
        scale(mul(Ac(1), _lc((10.0, Vc(0)), (-15.0, Vc(1)), (-4.0, Vc(2)),
                             (14.0, Vc(3)), (-6.0, Vc(4)), (1.0, Vc(5)))),
              1.0 / 12.0),
        scale(mul(_lc((-3.0, Vc(0)), (-10.0, Vc(1)), (18.0, Vc(2)),
                      (-6.0, Vc(3)), (1.0, Vc(4))),
                  _lc((-3.0, Ac(0)), (-10.0, Ac(1)), (18.0, Ac(2)),
                      (-6.0, Ac(3)), (1.0, Ac(4)))),
              1.0 / 144.0))
    c1 = scale(c1, inv_h2)
    cm2 = add(
        scale(mul(Ac(-2), _lc((10.0, Vc(-1)), (-15.0, Vc(-2)), (-4.0, Vc(-3)),
                              (14.0, Vc(-4)), (-6.0, Vc(-5)), (1.0, Vc(-6)))),
              1.0 / 12.0),
        scale(mul(_lc((3.0, Vc(-1)), (10.0, Vc(-2)), (-18.0, Vc(-3)),
                      (6.0, Vc(-4)), (-1.0, Vc(-5))),
                  _lc((3.0, Ac(-1)), (10.0, Ac(-2)), (-18.0, Ac(-3)),
                      (6.0, Ac(-4)), (-1.0, Ac(-5)))),
              1.0 / 144.0))
    cm2 = scale(cm2, inv_h2)
    c2 = add(
        scale(mul(Ac(2), _lc((-1.0, Vc(0)), (16.0, Vc(1)), (-30.0, Vc(2)),
                             (16.0, Vc(3)), (-1.0, Vc(4)))),
              1.0 / 12.0),
        scale(mul(_lc((1.0, Vc(0)), (-8.0, Vc(1)), (8.0, Vc(3)),
                      (-1.0, Vc(4))),
                  _lc((1.0, Ac(0)), (-8.0, Ac(1)), (8.0, Ac(3)),
                      (-1.0, Ac(4)))),
              1.0 / 144.0))
    c2 = scale(c2, inv_h2)
    cm3 = add(
        scale(mul(Ac(-3), _lc((-1.0, Vc(-1)), (16.0, Vc(-2)), (-30.0, Vc(-3)),
                              (16.0, Vc(-4)), (-1.0, Vc(-5)))),
              1.0 / 12.0),
        scale(mul(_lc((1.0, Vc(-5)), (-8.0, Vc(-4)), (8.0, Vc(-2)),
                      (-1.0, Vc(-1))),
                  _lc((1.0, Ac(-5)), (-8.0, Ac(-4)), (8.0, Ac(-2)),
                      (-1.0, Ac(-1)))),
              1.0 / 144.0))
    cm3 = scale(cm3, inv_h2)

    zero = jnp.zeros_like(c1[0])

    def cat(parts):
        return jnp.concatenate(
            [p[..., None] if p.ndim == interior[0].ndim - 1 else p
             for p in parts], axis=-1)

    h = cat([zero, c1[0], c2[0], interior[0], cm3[0], cm2[0], zero])
    l = cat([zero, c1[1], c2[1], interior[1], cm3[1], cm2[1], zero])
    return h, l


def set_col(u, j, val: float = 0.0):
    return (u[0].at[:, j].set(val), u[1].at[:, j].set(val))


def set_row(u, i, val: float = 0.0):
    return (u[0].at[i, :].set(val), u[1].at[i, :].set(val))
