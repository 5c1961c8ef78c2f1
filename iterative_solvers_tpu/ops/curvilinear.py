"""Curvilinear (moving-mesh) differential operators.

TPU-native form of the reference's mesh-potential machinery
(SURVEY.md §2.3-2.4):

- :func:`mesh_geometry` — derivatives of the mesh potential ``Q`` with the
  PMA Neumann boundary treatment (``dQ/dn = boundary coordinate``) and the
  Hessian determinant ``J`` (droplet.py:696-711, PMA2_nk.py:235-248).
- :func:`grad_xy` — physical-space gradient of a field via the inverse
  metric (droplet.py:713-727).
- :func:`laplace` — the conservative 4th-order curvilinear Laplacian
  ``L(v) = J^{-1} div_ksi { J^{-1} A grad_ksi v }`` with its three rings of
  one-sided boundary formulas (droplet.py:601-681, PMA2_nk.py:263-343) —
  the hottest routine of the whole framework.

Everything operates on 2-D ``(Ny, Nx)`` fields; the flux-divergence core is a
single direction-agnostic helper applied along x and then (via transpose)
along y, so the 80-line reference routine collapses to one vectorised
pipeline that XLA fuses into a handful of passes over the field.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.grid import Grid2D
from . import stencils


class MeshGeometry(NamedTuple):
    """Derivatives of the mesh potential Q on the computational grid.

    ``x = Q_ksi`` and ``y = Q_eta`` are the physical node coordinates;
    ``xx/yy/xy`` the second derivatives; ``jac`` the Hessian determinant.
    """

    x: jax.Array      # Q_ksi    (physical x coordinates)
    y: jax.Array      # Q_eta    (physical y coordinates)
    xx: jax.Array     # Q_ksiksi
    yy: jax.Array     # Q_etaeta
    xy: jax.Array     # Q_ksieta
    jac: jax.Array    # Q_ksiksi * Q_etaeta - Q_ksieta^2


def _set_col(u, j, val):
    return u.at[:, j].set(val)


def _set_row(u, i, val):
    return u.at[i, :].set(val)


def mesh_geometry(q, grid: Grid2D) -> MeshGeometry:
    """Compute Q derivatives with the PMA boundary conditions.

    BCs (droplet.py:704-711): ``Q_ksi`` pinned to the domain x-limits on the
    left/right edges, ``Q_eta`` to the y-limits on bottom/top; second
    derivatives get the one-sided Neumann correction ``25/(6h) |edge coord|``;
    the cross derivative vanishes on the whole boundary.
    """
    dx, dy = grid.dx, grid.dy

    qx = stencils.d1_x(q, dx)
    qx = qx.at[:, 0].set(grid.xl).at[:, -1].set(grid.xr)
    qy = stencils.d1_y(q, dy)
    qy = qy.at[0, :].set(grid.yb).at[-1, :].set(grid.yt)

    qxx = stencils.d2_x(q, dx)
    cx = 25.0 / (6.0 * dx)
    qxx = qxx.at[:, 0].add(cx * abs(grid.xl)).at[:, -1].add(cx * abs(grid.xr))
    qyy = stencils.d2_y(q, dy)
    cy = 25.0 / (6.0 * dy)
    qyy = qyy.at[0, :].add(cy * abs(grid.yb)).at[-1, :].add(cy * abs(grid.yt))

    qxy = stencils.dxy(q, dx, dy)
    qxy = qxy.at[:, 0].set(0.0).at[:, -1].set(0.0)
    qxy = qxy.at[0, :].set(0.0).at[-1, :].set(0.0)

    jac = qxx * qyy - qxy * qxy
    return MeshGeometry(x=qx, y=qy, xx=qxx, yy=qyy, xy=qxy, jac=jac)


def mesh_geometry_dev(phi, grid: Grid2D, coords=None) -> MeshGeometry:
    """Mesh geometry from the *deviation* potential: ``Q = (x^2+y^2)/2 + phi``.

    Numerically-robust reformulation for large grids: the finite-difference
    stencils of the full potential Q (values ~ |domain|^2/2) cancel terms of
    magnitude ``Q/h^2`` down to O(1) — at 4096^2 that is a 1e9 -> 1 f64-only
    cancellation.  Differentiating only the O(1) deviation (the identity
    part's derivatives are analytic: x, y, 1, 1, 0) keeps every stencil's
    terms O(phi/h^2) and makes f32 mesh geometry accurate to ~1e-3 relative,
    unlocking the fully-f32 large-grid path.

    ``phi`` has homogeneous Neumann BCs (dQ/dn = boundary coordinate holds
    exactly for the identity part), so the one-sided second-derivative
    corrections vanish and the cross-derivative is zero on the boundary as
    in :func:`mesh_geometry`.

    ``coords=(xx, yy)`` overrides the grid's full coordinate fields — used by
    the explicit-halo distributed path (dist.droplet), where ``phi`` is a
    halo-extended row block and the coordinate blocks must match its rows.
    """
    dx, dy = grid.dx, grid.dy

    px = stencils.d1_x(phi, dx)
    px = px.at[:, 0].set(0.0).at[:, -1].set(0.0)
    py = stencils.d1_y(phi, dy)
    py = py.at[0, :].set(0.0).at[-1, :].set(0.0)

    pxx = stencils.d2_x(phi, dx)
    pyy = stencils.d2_y(phi, dy)
    pxy = stencils.dxy(phi, dx, dy)
    pxy = pxy.at[:, 0].set(0.0).at[:, -1].set(0.0)
    pxy = pxy.at[0, :].set(0.0).at[-1, :].set(0.0)

    if coords is None:
        xx_id = grid.xx_op(phi.dtype)
        yy_id = grid.yy_op(phi.dtype)
    else:
        xx_id = coords[0].astype(phi.dtype)
        yy_id = coords[1].astype(phi.dtype)
    qxx = 1.0 + pxx
    qyy = 1.0 + pyy
    jac = qxx * qyy - pxy * pxy
    return MeshGeometry(x=xx_id + px, y=yy_id + py, xx=qxx, yy=qyy, xy=pxy,
                        jac=jac)


def to_deviation(q, grid: Grid2D):
    """Split a full mesh potential into its identity part and deviation."""
    q_id = 0.5 * (grid.xx_op(q.dtype) ** 2 + grid.yy_op(q.dtype) ** 2)
    return q - q_id


def grad_ksi_neumann(v, grid: Grid2D, quirk: bool = False):
    """Computational-space gradient with homogeneous Neumann edges zeroed.

    Mirrors droplet.py:718-722.  With ``quirk=True`` it reproduces the
    reference bit-for-bit, including its slip: droplet.py:722 zeroes
    ``U_dksi`` (not ``U_deta``) on the *bottom* edge (``U_dksi[Ibdy.Bottom]
    = 0`` where ``U_deta`` was clearly intended).  ``quirk=False`` applies
    the intended maths (zero normal derivative on each edge pair).
    """
    vx = stencils.d1_x(v, grid.dx)
    vy = stencils.d1_y(v, grid.dy)
    vx = vx.at[:, 0].set(0.0).at[:, -1].set(0.0)
    if quirk:
        vx = vx.at[0, :].set(0.0)   # reference zeroes dksi on the bottom row
        vy = vy.at[-1, :].set(0.0)  # ... and deta only on the top row
    else:
        vy = vy.at[0, :].set(0.0).at[-1, :].set(0.0)
    return vx, vy


def grad_xy(v_ksi, v_eta, geom: MeshGeometry):
    """Physical-space gradient from computational-space derivatives:

    ``v_x = (Q_etaeta v_ksi - Q_ksieta v_eta)/J``,
    ``v_y = (-Q_ksieta v_ksi + Q_ksiksi v_eta)/J``  (droplet.py:724-725).
    """
    vx = (geom.yy * v_ksi - geom.xy * v_eta) / geom.jac
    vy = (-geom.xy * v_ksi + geom.xx * v_eta) / geom.jac
    return vx, vy


def _flux_div_x(a, v, inv_h2, edge_dtype=None):
    """Conservative 4th-order ``( a v_ksi )_ksi`` along the last axis.

    The discretisation of the reference's "appendix B" (droplet.py:618-668):
    interior columns 3..n-4 use the 4th-order conservative form; columns
    1, 2, n-3, n-2 use one-sided product rules; columns 0 and n-1 are zero
    (the cross-term/boundary handling lives in :func:`laplace`).

    ``edge_dtype`` (e.g. ``jnp.float64``) evaluates the four one-sided
    boundary columns in a wider dtype and casts back: their product rules
    cancel ~``v/h^2``-scale terms that the conservative interior form avoids,
    so at fine grids they are the f32 accuracy bottleneck.  The widened work
    is O(Ny) — negligible even with f64 emulation on TPU.
    """
    if edge_dtype is not None and jnp.dtype(edge_dtype) != v.dtype:
        strip = 6  # widest one-sided formula reads 6 edge columns
        lo = _flux_div_x(a[:, :strip].astype(edge_dtype),
                         v[:, :strip].astype(edge_dtype), inv_h2)
        hi = _flux_div_x(a[:, -strip:].astype(edge_dtype),
                         v[:, -strip:].astype(edge_dtype), inv_h2)
        out = _flux_div_x(a, v, inv_h2)
        return jnp.concatenate(
            [lo[:, :3].astype(v.dtype), out[:, 3:-3],
             hi[:, -3:].astype(v.dtype)], axis=1)
    # interior columns 3..n-4
    interior = (
        4.0 * a[:, 2:-4] * (v[:, :-6] - 8.0 * v[:, 1:-5] + 8.0 * v[:, 3:-3] - v[:, 4:-2])
        - (-a[:, 1:-5] + 9.0 * a[:, 2:-4] + 9.0 * a[:, 3:-3] - a[:, 4:-2])
        * (v[:, 1:-5] - 27.0 * v[:, 2:-4] + 27.0 * v[:, 3:-3] - v[:, 4:-2])
        + (-a[:, 2:-4] + 9.0 * a[:, 3:-3] + 9.0 * a[:, 4:-2] - a[:, 5:-1])
        * (v[:, 2:-4] - 27.0 * v[:, 3:-3] + 27.0 * v[:, 4:-2] - v[:, 5:-1])
        - 4.0 * a[:, 4:-2] * (v[:, 2:-4] - 8.0 * v[:, 3:-3] + 8.0 * v[:, 5:-1] - v[:, 6:])
    ) * (inv_h2 / 288.0)

    # next-to-boundary columns (product rule with one-sided stencils)
    c1 = (
        a[:, 1]
        * (10.0 * v[:, 0] - 15.0 * v[:, 1] - 4.0 * v[:, 2] + 14.0 * v[:, 3] - 6.0 * v[:, 4] + v[:, 5])
        / 12.0
        + (-3.0 * v[:, 0] - 10.0 * v[:, 1] + 18.0 * v[:, 2] - 6.0 * v[:, 3] + v[:, 4])
        * (-3.0 * a[:, 0] - 10.0 * a[:, 1] + 18.0 * a[:, 2] - 6.0 * a[:, 3] + a[:, 4])
        / 144.0
    ) * inv_h2
    cm2 = (
        a[:, -2]
        * (10.0 * v[:, -1] - 15.0 * v[:, -2] - 4.0 * v[:, -3] + 14.0 * v[:, -4] - 6.0 * v[:, -5] + v[:, -6])
        / 12.0
        + (3.0 * v[:, -1] + 10.0 * v[:, -2] - 18.0 * v[:, -3] + 6.0 * v[:, -4] - v[:, -5])
        * (3.0 * a[:, -1] + 10.0 * a[:, -2] - 18.0 * a[:, -3] + 6.0 * a[:, -4] - a[:, -5])
        / 144.0
    ) * inv_h2

    # next-to-next-to-boundary columns (centred 2nd-derivative + product term)
    c2 = (
        a[:, 2] * (-v[:, 0] + 16.0 * v[:, 1] - 30.0 * v[:, 2] + 16.0 * v[:, 3] - v[:, 4]) / 12.0
        + (v[:, 0] - 8.0 * v[:, 1] + 8.0 * v[:, 3] - v[:, 4])
        * (a[:, 0] - 8.0 * a[:, 1] + 8.0 * a[:, 3] - a[:, 4])
        / 144.0
    ) * inv_h2
    cm3 = (
        a[:, -3] * (-v[:, -1] + 16.0 * v[:, -2] - 30.0 * v[:, -3] + 16.0 * v[:, -4] - v[:, -5]) / 12.0
        + (v[:, -5] - 8.0 * v[:, -4] + 8.0 * v[:, -2] - v[:, -1])
        * (a[:, -5] - 8.0 * a[:, -4] + 8.0 * a[:, -2] - a[:, -1])
        / 144.0
    ) * inv_h2

    zero = jnp.zeros_like(c1)
    return jnp.concatenate(
        [
            zero[:, None],
            c1[:, None],
            c2[:, None],
            interior,
            cm3[:, None],
            cm2[:, None],
            zero[:, None],
        ],
        axis=1,
    )


def laplace(v, v_ksi, v_eta, geom: MeshGeometry, grid: Grid2D,
            edge_dtype=None):
    """Curvilinear Laplacian: returns ``(v_xx, v_yy)`` on the moving mesh.

    ``v_ksi``/``v_eta`` are the computational-space first derivatives of
    ``v`` (the reference passes ``M.dksiCentre @ v`` etc. — droplet.py:437).
    ``edge_dtype`` widens the one-sided boundary-column evaluation (see
    :func:`_flux_div_x`) — the f32 large-grid path.
    """
    j = geom.jac
    a11 = (geom.xy * geom.xy + geom.yy * geom.yy) / j
    a22 = (geom.xy * geom.xy + geom.xx * geom.xx) / j
    a12 = -(geom.xy * (geom.xx + geom.yy)) / j

    v_xx = _flux_div_x(a11, v, 1.0 / (grid.dx * grid.dx), edge_dtype)
    v_yy = _flux_div_x(a22.T, v.T, 1.0 / (grid.dy * grid.dy), edge_dtype).T

    # cross terms: (A12 v_eta)_ksi with left/right edges zeroed, and
    # (A12 v_ksi)_eta with top/bottom edges zeroed (droplet.py:670-679)
    tx = stencils.d1_x(a12 * v_eta, grid.dx)
    tx = tx.at[:, 0].set(0.0).at[:, -1].set(0.0)
    ty = stencils.d1_y(a12 * v_ksi, grid.dy)
    ty = ty.at[0, :].set(0.0).at[-1, :].set(0.0)

    return (v_xx + tx) / j, (v_yy + ty) / j


def laplacian_xy(v, geom: MeshGeometry, grid: Grid2D):
    """Convenience: full physical Laplacian v_xx + v_yy with Neumann edges."""
    v_ksi, v_eta = grad_ksi_neumann(v, grid)
    v_xx, v_yy = laplace(v, v_ksi, v_eta, geom, grid)
    return v_xx + v_yy
