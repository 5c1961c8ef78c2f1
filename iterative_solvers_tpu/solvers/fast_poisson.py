"""Direct spectral solvers for constant-coefficient elliptic problems.

The reference's only "large" solve is a 999²-unknown Poisson ``spsolve``
taking 51.6 s (lab14_p2.py:40, BASELINE.md row 4).  Sparse direct LU has no
TPU equivalent; the TPU-native *direct* method for separable
constant-coefficient operators is diagonalisation by fast transforms:

- homogeneous Dirichlet 5-point Laplacian  -> DST-I along both axes
- homogeneous Neumann (I - gamma lap)      -> DCT (see meshmove.pma)

The DST is a dense orthogonal matmul (MXU) — two ``(n, n) @ (n, n)`` products
per transform, exact to rounding, O(n^3) flops which at n=999 is ~4 GFLOP ≈
milliseconds on a v5e vs 51.6 s for the sparse LU.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from ..ops.dct import _dst1_basis, _PRECISION


def _mm(a, b):
    # HIGHEST precision: the TPU default runs f32 matmuls via bf16 passes,
    # which would put ~1e-3 relative noise in a *direct* solver's answer.
    return jnp.matmul(a, b, precision=_PRECISION)


@lru_cache(maxsize=16)
def _dirichlet_eigs(m: int, h: float, dtype_str: str) -> np.ndarray:
    """Eigenvalues of the 1-D Dirichlet 5-point second difference /h^2:
    ``(2 cos(pi k/(m+1)) - 2)/h^2``, k = 1..m."""
    k = np.arange(1, m + 1)
    return ((2.0 * np.cos(np.pi * k / (m + 1)) - 2.0) / (h * h)).astype(dtype_str)


def poisson_dirichlet_solve(f, hx: float, hy: float | None = None):
    """Solve ``lap u = f`` (5-point, homogeneous Dirichlet) on the interior
    nodes; ``f`` has shape (my, mx) of interior unknowns."""
    if hy is None:
        hy = hx
    my, mx = f.shape
    dt = str(f.dtype)
    sy = jnp.asarray(_dst1_basis(my, dt))
    sx = jnp.asarray(_dst1_basis(mx, dt))
    lam = (
        jnp.asarray(_dirichlet_eigs(my, hy, dt))[:, None]
        + jnp.asarray(_dirichlet_eigs(mx, hx, dt))[None, :]
    )
    fhat = _mm(_mm(sy, f), sx.T)
    return _mm(_mm(sy.T, fhat / lam), sx)


def helmholtz_dirichlet_solve(f, shift: float, hx: float, hy: float | None = None):
    """Solve ``(shift*I - lap) u = f`` with homogeneous Dirichlet BCs."""
    if hy is None:
        hy = hx
    my, mx = f.shape
    dt = str(f.dtype)
    sy = jnp.asarray(_dst1_basis(my, dt))
    sx = jnp.asarray(_dst1_basis(mx, dt))
    lam = (
        jnp.asarray(_dirichlet_eigs(my, hy, dt))[:, None]
        + jnp.asarray(_dirichlet_eigs(mx, hx, dt))[None, :]
    )
    fhat = _mm(_mm(sy, f), sx.T)
    return _mm(_mm(sy.T, fhat / (shift - lam)), sx)
