"""Matrix-free finite-difference stencil operators.

TPU-first replacement for the reference's sparse derivative-matrix factory
``make_M`` (reference: python_work/droplet.py:778-833, PMA2_nk.py:181-233),
which assembles 4th-order 1-D stencils as ``scipy.sparse`` matrices and lifts
them to 2-D with ``kron``.  On TPU an SpMV with a kron'd stencil matrix wastes
HBM bandwidth on indices; the same operator expressed as a pipeline of shifted
slices + small edge ``einsum``s is pure VPU work that XLA fuses into one pass
over the field.

All operators act on 2-D fields of shape ``(Ny, Nx)``; ``*_x`` differentiates
along the last axis (ksi), ``*_y`` along the first axis (eta).  Coefficients
are the reference's exact ones so numerical parity holds to rounding:

- interior d1 (4th order centred):  ``[1, -8, 0, 8, -1] / 12h``
- interior d2 (4th order centred):  ``[-1, 16, -30, 16, -1] / 12h^2``
- one-sided boundary rows as in droplet.py:785-809.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _edge_rows(u, strip_w: int, coefs: np.ndarray, side: str):
    """Apply one-sided boundary rows along the last axis.

    ``coefs`` has shape (n_rows, strip_w); returns (..., n_rows) — the values
    of the first (side='lo') or last (side='hi') ``n_rows`` entries along the
    last axis, each a fixed linear combination of the ``strip_w`` edge values.
    """
    c = jnp.asarray(coefs, dtype=u.dtype)
    strip = u[..., :strip_w] if side == "lo" else u[..., -strip_w:]
    # HIGHEST: TPU default would run f32 contractions through bf16 passes —
    # these boundary rows feed the mesh geometry, where bf16 noise in
    # O(Q/h^2) terms is amplified by later differencing (cost: edge-only).
    return jnp.einsum("...i,ri->...r", strip, c,
                      precision=jax.lax.Precision.HIGHEST)


# -- first derivative --------------------------------------------------------

# one-sided rows of the 4th-order first-derivative operator, /(12h)
_D1_LO = np.array(
    [
        [-25.0, 48.0, -36.0, 16.0, -3.0],
        [-3.0, -10.0, 18.0, -6.0, 1.0],
    ]
)
_D1_HI = np.array(
    [
        [-1.0, 6.0, -18.0, 10.0, 3.0],
        [3.0, -16.0, 36.0, -48.0, 25.0],
    ]
)


def d1_x(u, dx: float):
    """4th-order first derivative along the last axis (ksi direction)."""
    s = 1.0 / (12.0 * dx)
    interior = u[..., :-4] - 8.0 * u[..., 1:-3] + 8.0 * u[..., 3:-1] - u[..., 4:]
    lo = _edge_rows(u, 5, _D1_LO, "lo")
    hi = _edge_rows(u, 5, _D1_HI, "hi")
    return jnp.concatenate([lo, interior, hi], axis=-1) * s


def d1_y(u, dy: float):
    """4th-order first derivative along the first axis (eta direction)."""
    return jnp.swapaxes(d1_x(jnp.swapaxes(u, -1, -2), dy), -1, -2)


# -- second derivative -------------------------------------------------------

# one-sided rows of the 4th-order second-derivative operator, /(12h^2).
# Row 0/-1 assume a known Neumann value at the wall (the 25/(6h)*g correction
# is the caller's responsibility — see ops.curvilinear.mesh_geometry).
_D2_LO = np.array(
    [
        [-415.0 / 6.0, 96.0, -36.0, 32.0 / 3.0, -1.5, 0.0],
        [10.0, -15.0, -4.0, 14.0, -6.0, 1.0],
    ]
)
_D2_HI = np.array(
    [
        [1.0, -6.0, 14.0, -4.0, -15.0, 10.0],
        [0.0, -1.5, 32.0 / 3.0, -36.0, 96.0, -415.0 / 6.0],
    ]
)


def d2_x(u, dx: float):
    """4th-order second derivative along the last axis (ksi direction)."""
    s = 1.0 / (12.0 * dx * dx)
    interior = (
        -u[..., :-4]
        + 16.0 * u[..., 1:-3]
        - 30.0 * u[..., 2:-2]
        + 16.0 * u[..., 3:-1]
        - u[..., 4:]
    )
    lo = _edge_rows(u, 6, _D2_LO, "lo")
    hi = _edge_rows(u, 6, _D2_HI, "hi")
    return jnp.concatenate([lo, interior, hi], axis=-1) * s


def d2_y(u, dy: float):
    """4th-order second derivative along the first axis (eta direction)."""
    return jnp.swapaxes(d2_x(jnp.swapaxes(u, -1, -2), dy), -1, -2)


def dxy(u, dx: float, dy: float):
    """Mixed second derivative d^2 u / (dksi deta).

    The reference builds ``M.dksideta = kron(d1_eta, d1_ksi)`` (droplet.py:811)
    which is exactly "apply d1 along x, then d1 along y".
    """
    return d1_y(d1_x(u, dx), dy)


# -- upwind (one-sided) first derivatives ------------------------------------

# 2nd-order forward/backward differences (reference PMA2_nk.py:205-220).
# NOTE: the reference has a latent bug — it writes ``temp - csc_matrix(...)``
# (subtraction, not assignment) so its upwind matrices are never divided by 2h.
# They are only consumed by ``lagrangian_term`` which is never called, so the
# bug is inert there.  Here the scaling is implemented correctly.
_D1F_LO = np.array([[-3.0, 4.0, -1.0]])  # interior pattern reused at row 0
_D1F_HI = np.array(
    [
        [0.0, -2.0, 2.0],
        [1.0, -4.0, 3.0],
    ]
)
_D1B_LO = np.array(
    [
        [-3.0, 4.0, -1.0],
        [-2.0, 2.0, 0.0],
    ]
)
_D1B_HI = np.array([[1.0, -4.0, 3.0]])  # interior pattern reused at row -1


def d1_x_forward(u, dx: float):
    """2nd-order forward difference along x: [-3,4,-1]/2h at j..j+2."""
    s = 1.0 / (2.0 * dx)
    interior = -3.0 * u[..., :-2] + 4.0 * u[..., 1:-1] - u[..., 2:]
    hi = _edge_rows(u, 3, _D1F_HI, "hi")
    return jnp.concatenate([interior, hi], axis=-1) * s


def d1_x_backward(u, dx: float):
    """2nd-order backward difference along x: [1,-4,3]/2h at j-2..j."""
    s = 1.0 / (2.0 * dx)
    interior = u[..., :-2] - 4.0 * u[..., 1:-1] + 3.0 * u[..., 2:]
    lo = _edge_rows(u, 3, _D1B_LO, "lo")
    return jnp.concatenate([lo, interior], axis=-1) * s


def d1_y_forward(u, dy: float):
    return jnp.swapaxes(d1_x_forward(jnp.swapaxes(u, -1, -2), dy), -1, -2)


def d1_y_backward(u, dy: float):
    return jnp.swapaxes(d1_x_backward(jnp.swapaxes(u, -1, -2), dy), -1, -2)


# -- periodic operators ------------------------------------------------------

def lap_periodic(u, h: float):
    """5-point periodic Laplacian on a 2-D field (both axes periodic).

    Matrix-free equivalent of the reference's wrapped sparse assembly
    (sh_scipy_nk.py:31-35, cpp main.cpp:38-71).
    """
    inv_h2 = 1.0 / (h * h)
    return (
        jnp.roll(u, 1, axis=-1)
        + jnp.roll(u, -1, axis=-1)
        + jnp.roll(u, 1, axis=-2)
        + jnp.roll(u, -1, axis=-2)
        - 4.0 * u
    ) * inv_h2


def lap_dirichlet_5pt(u, h: float):
    """5-point Laplacian with homogeneous Dirichlet values outside the grid.

    ``u`` holds interior unknowns only (the lab14_p2.py:26-34 convention).
    """
    inv_h2 = 1.0 / (h * h)
    up = jnp.pad(u, ((1, 1), (1, 1)))
    return (
        up[..., :-2, 1:-1]
        + up[..., 2:, 1:-1]
        + up[..., 1:-1, :-2]
        + up[..., 1:-1, 2:]
        - 4.0 * u
    ) * inv_h2


def sh_linear_operator(u, h: float, r: float):
    """Swift–Hohenberg linear operator L = -Lap^2 - 2 Lap + (r-1) I, periodic.

    Reference: sh_scipy_nk.py:39 / main.cpp:78-81.
    """
    lap_u = lap_periodic(u, h)
    return -lap_periodic(lap_u, h) - 2.0 * lap_u + (r - 1.0) * u
