"""Fused Pallas TPU kernel for the droplet inner-Krylov JVP matvec.

The hottest chain of the whole framework is the curvilinear Crank–Nicolson
residual of the thin-film droplet model (reference droplet.py:435-450 via
601-681 — SURVEY.md §2.3/§2.7): each JFNK inner-Krylov matvec linearises

    F(u) = (u - u_old) - dt/2 (F2(u) + F_old),
    F2(u) = div( u^3/3 (grad p(u) - drive) ),
    p(u)  = -lap_c(u) + Pi(u) + Bo cos(a) u

around the Newton iterate ``x``.  The directional derivative is analytic —
for frozen coefficient fields it is the linear chain

    dp  = -(lap_c v) + c0 v
    (dpx, dpy) = grad_xy(dp)            [with dp/dn = 0 edges]
    dA  = dpx c1 + c2 v ,  dB = dpy c1 + c3 v
    dF2 = (yy d1x(dA) - xy d1y(dA) - xy d1x(dB) + xx d1y(dB)) / J
    J v = v - dF2                        [dt/2 folded into c1..c3]

with per-Newton-iteration fields  c0 = Pi'(x) + Bo cos(a),
c1 = (dt/2) x^3/3, c2 = (dt/2)(p_dx - drive) x^2, c3 = (dt/2) p_dy x^2
(see models.droplet.jvp_field_stack).  XLA evaluates this chain (jax.jvp)
as ~25 separate stencil passes, each materialising an (ny, nx) intermediate
in HBM; this kernel computes the whole chain from ONE pass over 9 input
fields (v + the 8-field coefficient stack) using the double-buffered slab
pipeline of ops.pallas_stencil — the minimal HBM traffic is
10 n^2 x 4 bytes per matvec.

Structure:
- :func:`jvp_apply_ref` — independent jnp mirror of the chain (built on the
  tested ops.stencils/ops.curvilinear primitives); the CPU fallback and the
  parity oracle for the kernel.
- :func:`_chain_block` — the kernel's compute body as a *pure function* of
  the loaded slabs, parameterised over the lane-roll primitive so the exact
  same code is unit-testable on CPU with jnp.roll (tests/test_pallas_droplet
  simulates the DMA slab loads and stitches chunk outputs).
- :func:`jvp_matvec_pallas` — the pallas_call wrapper (double-buffered DMA
  pipeline, 8-row sublane-aligned halos, clamped at the domain edges).

Boundary treatment matches the reference discretisation exactly: the
one-sided 4th-order d1 rows/cols (droplet.py:785-809), the 3 one-sided
boundary rings of the conservative flux divergence (droplet.py:618-668),
and the zeroed cross-term / pressure-gradient edges (droplet.py:670-694).
Global-edge formulas are applied with ``jnp.where`` on a global row/column
iota, so interior chunks pay only the (cheap, annihilated) selects.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..core.grid import Grid2D
from . import stencils
from .pallas_stencil import _on_tpu

_HALO = 8  # f32 sublane tile height; total chain stencil depth is 7


# -- jnp mirror (CPU fallback + oracle) ---------------------------------------

def jvp_apply_ref(v, stack, grid: Grid2D):
    """The linearised droplet CN chain in plain jnp (stack semantics as in
    models.droplet.jvp_field_stack: [inv_j, xx, yy, xy, c0, c1, c2, c3]
    with dt/2 folded into c1..c3)."""
    inv_j, xx, yy, xy, c0, c1, c2, c3 = stack
    dx, dy = grid.dx, grid.dy
    a11 = (xy * xy + yy * yy) * inv_j
    a22 = (xy * xy + xx * xx) * inv_j
    a12 = -(xy * (xx + yy)) * inv_j

    v_ksi = stencils.d1_x(v, dx)
    v_eta = stencils.d1_y(v, dy)
    from .curvilinear import _flux_div_x
    fx = _flux_div_x(a11, v, 1.0 / (dx * dx))
    fy = _flux_div_x(a22.T, v.T, 1.0 / (dy * dy)).T
    tx = stencils.d1_x(a12 * v_eta, dx)
    tx = tx.at[:, 0].set(0.0).at[:, -1].set(0.0)
    ty = stencils.d1_y(a12 * v_ksi, dy)
    ty = ty.at[0, :].set(0.0).at[-1, :].set(0.0)
    v_xx = (fx + tx) * inv_j
    v_yy = (fy + ty) * inv_j

    dp = -(v_xx + v_yy) + c0 * v
    dpk = stencils.d1_x(dp, dx)
    dpk = dpk.at[:, 0].set(0.0).at[:, -1].set(0.0)
    dpe = stencils.d1_y(dp, dy)
    dpe = dpe.at[0, :].set(0.0).at[-1, :].set(0.0)
    dpx = (yy * dpk - xy * dpe) * inv_j
    dpy = (-xy * dpk + xx * dpe) * inv_j

    dA = dpx * c1 + c2 * v
    dB = dpy * c1 + c3 * v
    dF2 = (yy * stencils.d1_x(dA, dx) - xy * stencils.d1_y(dA, dy)
           - xy * stencils.d1_x(dB, dx) + xx * stencils.d1_y(dB, dy)) * inv_j
    return v - dF2


# -- kernel compute body (pure; lane-roll injected) ----------------------------

def _lane_d1(y, s, nx, roll):
    """4th-order first derivative along lanes with the reference's one-sided
    boundary columns (stencils._D1_LO/_D1_HI)."""
    out = (roll(y, -2) - 8.0 * roll(y, -1) + 8.0 * roll(y, 1) - roll(y, 2)) * s
    col = lax.broadcasted_iota(jnp.int32, y.shape, 1)
    C = lambda j: y[:, j:j + 1]
    e0 = (-25.0 * C(0) + 48.0 * C(1) - 36.0 * C(2) + 16.0 * C(3) - 3.0 * C(4)) * s
    e1 = (-3.0 * C(0) - 10.0 * C(1) + 18.0 * C(2) - 6.0 * C(3) + C(4)) * s
    em2 = (-C(nx - 5) + 6.0 * C(nx - 4) - 18.0 * C(nx - 3)
           + 10.0 * C(nx - 2) + 3.0 * C(nx - 1)) * s
    em1 = (3.0 * C(nx - 5) - 16.0 * C(nx - 4) + 36.0 * C(nx - 3)
           - 48.0 * C(nx - 2) + 25.0 * C(nx - 1)) * s
    out = jnp.where(col == 0, e0, out)
    out = jnp.where(col == 1, e1, out)
    out = jnp.where(col == nx - 2, em2, out)
    out = jnp.where(col == nx - 1, em1, out)
    return out


def _lane_flux(a, y, inv_h2, nx, roll):
    """Conservative 4th-order (a v_ksi)_ksi along lanes: interior form +
    the reference's one-sided product-rule rings at columns 1, 2, nx-3,
    nx-2; columns 0 and nx-1 are zero (ops.curvilinear._flux_div_x)."""
    A = lambda k: roll(a, k)
    V = lambda k: roll(y, k)
    interior = (
        4.0 * A(-1) * (V(-3) - 8.0 * V(-2) + 8.0 * V(0) - V(1))
        - (-A(-2) + 9.0 * A(-1) + 9.0 * A(0) - A(1))
        * (V(-2) - 27.0 * V(-1) + 27.0 * V(0) - V(1))
        + (-A(-1) + 9.0 * A(0) + 9.0 * A(1) - A(2))
        * (V(-1) - 27.0 * V(0) + 27.0 * V(1) - V(2))
        - 4.0 * A(1) * (V(-1) - 8.0 * V(0) + 8.0 * V(2) - V(3))
    ) * (inv_h2 / 288.0)
    col = lax.broadcasted_iota(jnp.int32, y.shape, 1)
    Cv = lambda j: y[:, j:j + 1]
    Ca = lambda j: a[:, j:j + 1]
    c1 = (
        Ca(1) * (10.0 * Cv(0) - 15.0 * Cv(1) - 4.0 * Cv(2)
                 + 14.0 * Cv(3) - 6.0 * Cv(4) + Cv(5)) / 12.0
        + (-3.0 * Cv(0) - 10.0 * Cv(1) + 18.0 * Cv(2) - 6.0 * Cv(3) + Cv(4))
        * (-3.0 * Ca(0) - 10.0 * Ca(1) + 18.0 * Ca(2) - 6.0 * Ca(3) + Ca(4))
        / 144.0
    ) * inv_h2
    c2 = (
        Ca(2) * (-Cv(0) + 16.0 * Cv(1) - 30.0 * Cv(2)
                 + 16.0 * Cv(3) - Cv(4)) / 12.0
        + (Cv(0) - 8.0 * Cv(1) + 8.0 * Cv(3) - Cv(4))
        * (Ca(0) - 8.0 * Ca(1) + 8.0 * Ca(3) - Ca(4)) / 144.0
    ) * inv_h2
    m = nx
    cm2 = (
        Ca(m - 2) * (10.0 * Cv(m - 1) - 15.0 * Cv(m - 2) - 4.0 * Cv(m - 3)
                     + 14.0 * Cv(m - 4) - 6.0 * Cv(m - 5) + Cv(m - 6)) / 12.0
        + (3.0 * Cv(m - 1) + 10.0 * Cv(m - 2) - 18.0 * Cv(m - 3)
           + 6.0 * Cv(m - 4) - Cv(m - 5))
        * (3.0 * Ca(m - 1) + 10.0 * Ca(m - 2) - 18.0 * Ca(m - 3)
           + 6.0 * Ca(m - 4) - Ca(m - 5)) / 144.0
    ) * inv_h2
    cm3 = (
        Ca(m - 3) * (-Cv(m - 1) + 16.0 * Cv(m - 2) - 30.0 * Cv(m - 3)
                     + 16.0 * Cv(m - 4) - Cv(m - 5)) / 12.0
        + (Cv(m - 5) - 8.0 * Cv(m - 4) + 8.0 * Cv(m - 2) - Cv(m - 1))
        * (Ca(m - 5) - 8.0 * Ca(m - 4) + 8.0 * Ca(m - 2) - Ca(m - 1)) / 144.0
    ) * inv_h2
    out = jnp.where(col == 1, c1, interior)
    out = jnp.where(col == 2, c2, out)
    out = jnp.where(col == nx - 3, cm3, out)
    out = jnp.where(col == nx - 2, cm2, out)
    zero = jnp.zeros_like(out[:, :1])
    out = jnp.where(col == 0, zero, out)
    out = jnp.where(col == nx - 1, zero, out)
    return out


def _row_d1(y, yb, b, L, gi, tb, te, s, ny, row_edges=True):
    """4th-order d1 along rows on window [b, b+L) (slab coords) of array
    ``y`` spanning slab rows [yb, ...).  ``gi`` is the (L, 1) global-row
    iota of the window; ``tb``/``te`` the y-array rows anchoring global row
    0 / one-past-last (valid in the first/last chunk, where the edge selects
    fire).  ``row_edges=False`` (interior chunks, where no global edge row
    can appear in the window) skips the one-sided formulas and selects —
    the chunk-specialised fast path."""
    o = b - yb
    out = (y[o - 2:o - 2 + L] - 8.0 * y[o - 1:o - 1 + L]
           + 8.0 * y[o + 1:o + 1 + L] - y[o + 2:o + 2 + L]) * s
    if not row_edges:
        return out
    R = lambda j: y[j:j + 1]
    e0 = (-25.0 * R(tb) + 48.0 * R(tb + 1) - 36.0 * R(tb + 2)
          + 16.0 * R(tb + 3) - 3.0 * R(tb + 4)) * s
    e1 = (-3.0 * R(tb) - 10.0 * R(tb + 1) + 18.0 * R(tb + 2)
          - 6.0 * R(tb + 3) + R(tb + 4)) * s
    em2 = (-R(te - 5) + 6.0 * R(te - 4) - 18.0 * R(te - 3)
           + 10.0 * R(te - 2) + 3.0 * R(te - 1)) * s
    em1 = (3.0 * R(te - 5) - 16.0 * R(te - 4) + 36.0 * R(te - 3)
           - 48.0 * R(te - 2) + 25.0 * R(te - 1)) * s
    out = jnp.where(gi == 0, e0, out)
    out = jnp.where(gi == 1, e1, out)
    out = jnp.where(gi == ny - 2, em2, out)
    out = jnp.where(gi == ny - 1, em1, out)
    return out


def _row_flux(a, ab, y, yb, b, L, gi, inv_h2, ny):
    """Conservative 4th-order (a v_eta)_eta along rows on window [b, b+L);
    one-sided rings at global rows 1, 2, ny-3, ny-2; rows 0/ny-1 zero.
    ``a``/``y`` span slab rows [ab, ...)/[yb, ...); the edge anchors are the
    array rows of global rows 0 and ny (tb = _HALO - base, te = tb + ny-ish
    expressed through the caller's bm)."""
    oa = b - ab
    ov = b - yb
    A = lambda k: a[oa + k:oa + k + L]
    V = lambda k: y[ov + k:ov + k + L]
    interior = (
        4.0 * A(-1) * (V(-3) - 8.0 * V(-2) + 8.0 * V(0) - V(1))
        - (-A(-2) + 9.0 * A(-1) + 9.0 * A(0) - A(1))
        * (V(-2) - 27.0 * V(-1) + 27.0 * V(0) - V(1))
        + (-A(-1) + 9.0 * A(0) + 9.0 * A(1) - A(2))
        * (V(-1) - 27.0 * V(0) + 27.0 * V(1) - V(2))
        - 4.0 * A(1) * (V(-1) - 8.0 * V(0) + 8.0 * V(2) - V(3))
    ) * (inv_h2 / 288.0)
    # edge anchors in each array's own coordinates
    ta, tv = _HALO - ab, _HALO - yb
    Ra = lambda j: a[ta + j:ta + j + 1]
    Rv = lambda j: y[tv + j:tv + j + 1]
    r1 = (
        Ra(1) * (10.0 * Rv(0) - 15.0 * Rv(1) - 4.0 * Rv(2)
                 + 14.0 * Rv(3) - 6.0 * Rv(4) + Rv(5)) / 12.0
        + (-3.0 * Rv(0) - 10.0 * Rv(1) + 18.0 * Rv(2) - 6.0 * Rv(3) + Rv(4))
        * (-3.0 * Ra(0) - 10.0 * Ra(1) + 18.0 * Ra(2) - 6.0 * Ra(3) + Ra(4))
        / 144.0
    ) * inv_h2
    r2 = (
        Ra(2) * (-Rv(0) + 16.0 * Rv(1) - 30.0 * Rv(2)
                 + 16.0 * Rv(3) - Rv(4)) / 12.0
        + (Rv(0) - 8.0 * Rv(1) + 8.0 * Rv(3) - Rv(4))
        * (Ra(0) - 8.0 * Ra(1) + 8.0 * Ra(3) - Ra(4)) / 144.0
    ) * inv_h2
    # bottom anchors: global row ny-1 sits at array row (ta + bm - 1) only in
    # the last chunk; express taps relative to the *end* anchor eb = ta + bm
    return interior, r1, r2, ta, tv


def _row_flux_interior(a, ab, y, yb, b, L, inv_h2):
    """Interior-chunk form of :func:`_row_flux_full`: the conservative
    4th-order stencil only — no ring formulas, no selects (valid whenever
    the window contains no global rows 0..2 or ny-3..ny-1)."""
    oa = b - ab
    ov = b - yb
    A = lambda k: a[oa + k:oa + k + L]
    V = lambda k: y[ov + k:ov + k + L]
    return (
        4.0 * A(-1) * (V(-3) - 8.0 * V(-2) + 8.0 * V(0) - V(1))
        - (-A(-2) + 9.0 * A(-1) + 9.0 * A(0) - A(1))
        * (V(-2) - 27.0 * V(-1) + 27.0 * V(0) - V(1))
        + (-A(-1) + 9.0 * A(0) + 9.0 * A(1) - A(2))
        * (V(-1) - 27.0 * V(0) + 27.0 * V(1) - V(2))
        - 4.0 * A(1) * (V(-1) - 8.0 * V(0) + 8.0 * V(2) - V(3))
    ) * (inv_h2 / 288.0)


def _row_flux_full(a, ab, y, yb, b, L, gi, inv_h2, ny, bm):
    interior, r1, r2, ta, tv = _row_flux(a, ab, y, yb, b, L, gi, inv_h2, ny)
    ea, ev = ta + bm, tv + bm  # array rows one past global row ny-1 (last chunk)
    Ra = lambda j: a[ea + j:ea + j + 1]
    Rv = lambda j: y[ev + j:ev + j + 1]
    rm2 = (
        Ra(-2) * (10.0 * Rv(-1) - 15.0 * Rv(-2) - 4.0 * Rv(-3)
                  + 14.0 * Rv(-4) - 6.0 * Rv(-5) + Rv(-6)) / 12.0
        + (3.0 * Rv(-1) + 10.0 * Rv(-2) - 18.0 * Rv(-3)
           + 6.0 * Rv(-4) - Rv(-5))
        * (3.0 * Ra(-1) + 10.0 * Ra(-2) - 18.0 * Ra(-3)
           + 6.0 * Ra(-4) - Ra(-5)) / 144.0
    ) * inv_h2
    rm3 = (
        Ra(-3) * (-Rv(-1) + 16.0 * Rv(-2) - 30.0 * Rv(-3)
                  + 16.0 * Rv(-4) - Rv(-5)) / 12.0
        + (Rv(-5) - 8.0 * Rv(-4) + 8.0 * Rv(-2) - Rv(-1))
        * (Ra(-5) - 8.0 * Ra(-4) + 8.0 * Ra(-2) - Ra(-1)) / 144.0
    ) * inv_h2
    out = jnp.where(gi == 1, r1, interior)
    out = jnp.where(gi == 2, r2, out)
    out = jnp.where(gi == ny - 3, rm3, out)
    out = jnp.where(gi == ny - 2, rm2, out)
    zero = jnp.zeros_like(out[:1])
    out = jnp.where(gi == 0, zero, out)
    out = jnp.where(gi == ny - 1, zero, out)
    return out


def _chain_block(vsl, csl, idx, bm, ny, nx, dx, dy, roll, row_edges=True):
    """The full linearised droplet chain for one row chunk.

    ``vsl``: (bm + 2*_HALO, nx) slab of v (8-row halo, clamped at edges);
    ``csl``: (8, bm + 2*_HALO, nx) coefficient slab stack
    [inv_j, xx, yy, xy, c0, c1, c2, c3]; ``idx`` the chunk index (traced).
    ``roll(x, k)[r, c] = x[r, c + k]`` (cyclic) — pltpu.roll in-kernel,
    jnp.roll in the CPU unit tests.  Returns the (bm, nx) output block of
    ``v - dF2`` (dt/2 pre-folded into c1..c3).

    ``row_edges=False`` is the interior-chunk specialisation: with the
    window guaranteed to contain no global top/bottom edge rows (bm >= 2
    chunks away, window overhang <= 6 < bm), every row-direction one-sided
    formula and its select is dropped — only the column (left/right edge)
    selects remain, which every chunk needs.  The kernel dispatches on the
    chunk index (first/last chunk take the full path).
    """
    H = _HALO
    sdx = 1.0 / (12.0 * dx)
    sdy = 1.0 / (12.0 * dy)
    inv_dx2 = 1.0 / (dx * dx)
    inv_dy2 = 1.0 / (dy * dy)

    inv_j, xxg, yyg, xyg = csl[0], csl[1], csl[2], csl[3]
    c0, c1, c2, c3 = csl[4], csl[5], csl[6], csl[7]
    a11 = (xyg * xyg + yyg * yyg) * inv_j
    a22 = (xyg * xyg + xxg * xxg) * inv_j
    a12 = -(xyg * (xxg + yyg)) * inv_j

    def gi(b, L):
        g0 = idx * jnp.int32(bm) - jnp.int32(H) + jnp.int32(b)
        return g0 + lax.broadcasted_iota(jnp.int32, (L, 1), 0)

    # window bases (slab coords): dp needs [H-4, H+bm+4)
    b_dp, L_dp = H - 4, bm + 8
    b_w2, L_w2 = H - 2, bm + 4
    b_w6, L_w6 = H - 6, bm + 12

    gi_dp = gi(b_dp, L_dp)
    gi_w2 = gi(b_w2, L_w2)
    gi_w0 = gi(H, bm)

    # -- curvilinear laplacian of v on the dp window -------------------------
    vk6 = _lane_d1(vsl[b_w6:b_w6 + L_w6], sdx, nx, roll)       # v_ksi on W6
    ve = _row_d1(vsl, 0, b_dp, L_dp, gi_dp, H, H + bm, sdy, ny, row_edges)
    fx = _lane_flux(a11[b_dp:b_dp + L_dp], vsl[b_dp:b_dp + L_dp],
                    inv_dx2, nx, roll)
    tx = _lane_d1(a12[b_dp:b_dp + L_dp] * ve, sdx, nx, roll)
    colw = lax.broadcasted_iota(jnp.int32, (L_dp, nx), 1)
    tx = jnp.where((colw == 0) | (colw == nx - 1), 0.0, tx)
    v_xx = (fx + tx) * inv_j[b_dp:b_dp + L_dp]

    if row_edges:
        fy = _row_flux_full(a22, 0, vsl, 0, b_dp, L_dp, gi_dp, inv_dy2,
                            ny, bm)
    else:
        fy = _row_flux_interior(a22, 0, vsl, 0, b_dp, L_dp, inv_dy2)
    ty = _row_d1(a12[b_w6:b_w6 + L_w6] * vk6, b_w6, b_dp, L_dp, gi_dp,
                 H - b_w6, H - b_w6 + bm, sdy, ny, row_edges)
    if row_edges:
        ty = jnp.where((gi_dp == 0) | (gi_dp == ny - 1), 0.0, ty)
    v_yy = (fy + ty) * inv_j[b_dp:b_dp + L_dp]

    dp = -(v_xx + v_yy) + c0[b_dp:b_dp + L_dp] * vsl[b_dp:b_dp + L_dp]

    # -- pressure-JVP gradient on W2 ------------------------------------------
    dpk = _lane_d1(dp[2:2 + L_w2], sdx, nx, roll)
    colw2 = lax.broadcasted_iota(jnp.int32, (L_w2, nx), 1)
    dpk = jnp.where((colw2 == 0) | (colw2 == nx - 1), 0.0, dpk)
    dpe = _row_d1(dp, b_dp, b_w2, L_w2, gi_w2, H - b_dp, H - b_dp + bm,
                  sdy, ny, row_edges)
    if row_edges:
        dpe = jnp.where((gi_w2 == 0) | (gi_w2 == ny - 1), 0.0, dpe)
    g = lambda f: f[b_w2:b_w2 + L_w2]
    dpx = (g(yyg) * dpk - g(xyg) * dpe) * g(inv_j)
    dpy = (-g(xyg) * dpk + g(xxg) * dpe) * g(inv_j)
    dA = dpx * g(c1) + g(c2) * vsl[b_w2:b_w2 + L_w2]
    dB = dpy * g(c1) + g(c3) * vsl[b_w2:b_w2 + L_w2]

    # -- flux divergence on the output block ----------------------------------
    dak = _lane_d1(dA[2:2 + bm], sdx, nx, roll)
    dbk = _lane_d1(dB[2:2 + bm], sdx, nx, roll)
    dae = _row_d1(dA, b_w2, H, bm, gi_w0, H - b_w2, H - b_w2 + bm, sdy, ny,
                  row_edges)
    dbe = _row_d1(dB, b_w2, H, bm, gi_w0, H - b_w2, H - b_w2 + bm, sdy, ny,
                  row_edges)
    h = lambda f: f[H:H + bm]
    dF2 = (h(yyg) * dak - h(xyg) * dae - h(xyg) * dbk + h(xxg) * dbe) \
        * h(inv_j)
    return vsl[H:H + bm] - dF2


# -- pallas pipeline -----------------------------------------------------------

def _pallas_roll(x, k):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll(x, shift=jnp.int32((-k) % x.shape[1]), axis=1)


def jvp_matvec_pallas(v2, stack, grid: Grid2D, block_rows: int = 32):
    """``v - dF2[v]`` on the (ny, nx) grid; falls back to the jnp mirror
    off-TPU, for non-f32 dtypes, or for kernel-unfriendly shapes.

    block_rows=32 measured fastest at 4096² with the chunk-specialised
    body (tools/tune_droplet_jvp.py r4: 3.39/2.53/2.13/3.51 ms at
    bm=8/16/32/64 — the two compiled chunk bodies double the code's VMEM
    temporaries, so bm=64 now spills where the r3 single-body kernel ran
    2.15 ms).  The kernel is VPU-compute-bound: ~250 arithmetic + ~200
    permute/slice element-ops per point (tools/jvp_kernel_ops.py) put its
    compute floor at ~1.1-1.9 ms at 4096² — the 0.38 min-bytes fraction is
    a memory-model number that compute, not HBM, prevents reaching."""
    ny, nx = v2.shape
    bm = block_rows
    if (not _on_tpu() or v2.dtype != jnp.float32
            or stack.dtype != jnp.float32
            or ny % bm or ny < 2 * bm or nx % 128 or bm < 8):
        return jvp_apply_ref(v2, stack, grid)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nchunks = ny // bm
    S = bm + 2 * _HALO
    dx, dy = grid.dx, grid.dy

    def kernel(v_hbm, c_hbm, out_hbm, vs, cs, outs, v_sems, c_sems, out_sems):
        def v_copies(slot, idx):
            start = pl.multiple_of(idx * jnp.int32(bm), _HALO)
            mid = pltpu.make_async_copy(
                v_hbm.at[pl.ds(start, bm), :],
                vs.at[slot, pl.ds(_HALO, bm), :],
                v_sems.at[slot, jnp.int32(0)],
            )
            top_src = pl.multiple_of(
                jnp.where(idx == 0, jnp.int32(0), start - jnp.int32(_HALO)),
                _HALO)
            top = pltpu.make_async_copy(
                v_hbm.at[pl.ds(top_src, _HALO), :],
                vs.at[slot, pl.ds(0, _HALO), :],
                v_sems.at[slot, jnp.int32(1)],
            )
            bot_src = pl.multiple_of(
                jnp.where(idx == nchunks - 1, jnp.int32(ny - _HALO),
                          start + jnp.int32(bm)), _HALO)
            bot = pltpu.make_async_copy(
                v_hbm.at[pl.ds(bot_src, _HALO), :],
                vs.at[slot, pl.ds(_HALO + bm, _HALO), :],
                v_sems.at[slot, jnp.int32(2)],
            )
            return (mid, top, bot)

        def c_copies(slot, idx):
            start = pl.multiple_of(idx * jnp.int32(bm), _HALO)
            mid = pltpu.make_async_copy(
                c_hbm.at[:, pl.ds(start, bm), :],
                cs.at[slot, :, pl.ds(_HALO, bm), :],
                c_sems.at[slot, jnp.int32(0)],
            )
            top_src = pl.multiple_of(
                jnp.where(idx == 0, jnp.int32(0), start - jnp.int32(_HALO)),
                _HALO)
            top = pltpu.make_async_copy(
                c_hbm.at[:, pl.ds(top_src, _HALO), :],
                cs.at[slot, :, pl.ds(0, _HALO), :],
                c_sems.at[slot, jnp.int32(1)],
            )
            bot_src = pl.multiple_of(
                jnp.where(idx == nchunks - 1, jnp.int32(ny - _HALO),
                          start + jnp.int32(bm)), _HALO)
            bot = pltpu.make_async_copy(
                c_hbm.at[:, pl.ds(bot_src, _HALO), :],
                cs.at[slot, :, pl.ds(_HALO + bm, _HALO), :],
                c_sems.at[slot, jnp.int32(2)],
            )
            return (mid, top, bot)

        def out_copy(slot, idx):
            dst = pl.multiple_of(idx * jnp.int32(bm), _HALO)
            return pltpu.make_async_copy(
                outs.at[slot], out_hbm.at[pl.ds(dst, bm), :],
                out_sems.at[slot],
            )

        for c in v_copies(jnp.int32(0), jnp.int32(0)):
            c.start()
        for c in c_copies(jnp.int32(0), jnp.int32(0)):
            c.start()

        def body(idx, _):
            slot = lax.rem(idx, jnp.int32(2))
            nslot = lax.rem(idx + jnp.int32(1), jnp.int32(2))

            @pl.when(idx + 1 < nchunks)
            def _():
                for c in v_copies(nslot, idx + jnp.int32(1)):
                    c.start()
                for c in c_copies(nslot, idx + jnp.int32(1)):
                    c.start()

            for c in v_copies(slot, idx):
                c.wait()
            for c in c_copies(slot, idx):
                c.wait()

            @pl.when(idx >= 2)
            def _():
                out_copy(slot, idx - jnp.int32(2)).wait()

            # chunk specialisation: only the first/last chunks can contain
            # global top/bottom edge rows — interior chunks run the body
            # with every row-direction one-sided formula and select removed
            is_edge = (idx == 0) | (idx == jnp.int32(nchunks - 1))

            @pl.when(is_edge)
            def _():
                outs[slot] = _chain_block(vs[slot], cs[slot], idx, bm, ny,
                                          nx, dx, dy, _pallas_roll,
                                          row_edges=True)

            @pl.when(jnp.logical_not(is_edge))
            def _():
                outs[slot] = _chain_block(vs[slot], cs[slot], idx, bm, ny,
                                          nx, dx, dy, _pallas_roll,
                                          row_edges=False)

            out_copy(slot, idx).start()
            return jnp.int32(0)

        lax.fori_loop(jnp.int32(0), jnp.int32(nchunks), body, jnp.int32(0))

        @pl.when(jnp.int32(nchunks) >= 2)
        def _():
            out_copy(jnp.int32(nchunks % 2), jnp.int32(nchunks - 2)).wait()
        out_copy(jnp.int32((nchunks - 1) % 2), jnp.int32(nchunks - 1)).wait()

    itemsize = 4
    scratch_bytes = (2 * 9 * S + 2 * bm) * nx * itemsize
    # the chain body holds ~20 window-height live temps on top of the slabs
    vmem_limit = int(2.2 * scratch_bytes) + 16 * 1024 * 1024

    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((ny, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, S, nx), jnp.float32),
            pltpu.VMEM((2, 8, S, nx), jnp.float32),
            pltpu.VMEM((2, bm, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=vmem_limit,
        ),
    )(v2, stack)


# -- CPU slab simulation (test harness) ----------------------------------------

def chain_block_reference_sim(v2, stack, grid: Grid2D, block_rows: int = 16):
    """Run _chain_block chunk-by-chunk with numpy-built slabs exactly as the
    DMA pipeline would load them (clamped 8-row halos) and stitch the
    outputs — validates every window/edge-select in the kernel body on CPU
    (tests/test_pallas_droplet.py)."""
    ny, nx = v2.shape
    bm = block_rows
    assert ny % bm == 0 and ny >= 2 * bm
    H = _HALO
    roll = lambda x, k: jnp.roll(x, -k, axis=1)
    outs = []
    nchunks = ny // bm
    for idx in range(nchunks):
        start = idx * bm
        top = 0 if idx == 0 else start - H
        bot = ny - H if idx == nchunks - 1 else start + bm
        vsl = jnp.concatenate([v2[top:top + H], v2[start:start + bm],
                               v2[bot:bot + H]], axis=0)
        csl = jnp.concatenate([stack[:, top:top + H], stack[:, start:start + bm],
                               stack[:, bot:bot + H]], axis=1)
        outs.append(_chain_block(vsl, csl, jnp.int32(idx), bm, ny, nx,
                                 grid.dx, grid.dy, roll,
                                 row_edges=(idx in (0, nchunks - 1))))
    return jnp.concatenate(outs, axis=0)
