"""Orthonormal DCT-II/DCT-III as MXU matmuls.

The reference solves the PMA mesh equation spectrally with scipy's
``dct``/``idct`` (droplet.py:586-587).  TPU has no native FFT for f64 (and
complex f64 is unsupported), but an N-point DCT is a dense ``(N, N)`` cosine
matrix — applying it along both axes of an ``(Ny, Nx)`` field is two dense
matmuls, which is exactly what the MXU is built for (for the reference's
91x61 grids this is microseconds; even at 4096² it is ~1.4e11 flops ≈ ms).

``dct2`` is orthonormal, so the inverse transform is the transpose —
``idct2`` reuses the same basis matrices.

All matmuls run at ``lax.Precision.HIGHEST``.  This is load-bearing on
TPU: the default precision runs f32 matmuls through bf16 passes (~1e-2
relative error), which on chip injected mesh-velocity noise large enough
to tangle the moving mesh and NaN the production mixed-precision droplet
step within 5 steps — while the identical f32 configuration on CPU
(true-f32 matmuls) converged.  HIGHEST restores full f32 accuracy at
~6x the matmul flops, which is still microseconds at reference grids and
a few ms at 4096² (the transforms are a small fraction of a PMA iter).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp
from jax import lax

_PRECISION = lax.Precision.HIGHEST


@lru_cache(maxsize=32)
def _dct2_basis(n: int, dtype_str: str) -> np.ndarray:
    """Orthonormal DCT-II matrix C with X = C @ x (scipy dct(norm='ortho'))."""
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    c = np.cos(np.pi * (2 * m + 1) * k / (2 * n))
    c *= np.sqrt(2.0 / n)
    c[0] *= np.sqrt(0.5)
    return c.astype(dtype_str)


def dct2(u, precision=None):
    """Orthonormal DCT-II along both axes of a 2-D field.

    ``precision=None`` uses HIGHEST (full f32: 6 bf16 passes).  Callers
    whose accuracy budget tolerates ~5e-7 relative (e.g. the PMA mesh
    velocity, tolerance ~1e-6) may pass ``lax.Precision.HIGH`` (3 passes)
    to halve the MXU cost at large grids; never DEFAULT (bf16, ~1e-3 —
    the r3 NaN class).
    """
    p = _PRECISION if precision is None else precision
    cy = jnp.asarray(_dct2_basis(u.shape[0], str(u.dtype)))
    cx = jnp.asarray(_dct2_basis(u.shape[1], str(u.dtype)))
    return jnp.matmul(jnp.matmul(cy, u, precision=p), cx.T, precision=p)


def idct2(u, precision=None):
    """Inverse (orthonormal DCT-III) along both axes."""
    p = _PRECISION if precision is None else precision
    cy = jnp.asarray(_dct2_basis(u.shape[0], str(u.dtype)))
    cx = jnp.asarray(_dct2_basis(u.shape[1], str(u.dtype)))
    return jnp.matmul(jnp.matmul(cy.T, u, precision=p), cx, precision=p)


def dct1d(u, axis: int = -1):
    c = jnp.asarray(_dct2_basis(u.shape[axis], str(u.dtype)))
    return jnp.moveaxis(jnp.tensordot(c, jnp.moveaxis(u, axis, 0), axes=1,
                                      precision=_PRECISION), 0, axis)


def idct1d(u, axis: int = -1):
    c = jnp.asarray(_dct2_basis(u.shape[axis], str(u.dtype)))
    return jnp.moveaxis(jnp.tensordot(c.T, jnp.moveaxis(u, axis, 0), axes=1,
                                      precision=_PRECISION), 0, axis)


@lru_cache(maxsize=32)
def _dst1_basis(n: int, dtype_str: str) -> np.ndarray:
    """Orthonormal DST-I matrix (its own inverse): S[k,m] = sqrt(2/(n+1)) sin(...)"""
    k = np.arange(1, n + 1)[:, None]
    m = np.arange(1, n + 1)[None, :]
    s = np.sin(np.pi * k * m / (n + 1)) * np.sqrt(2.0 / (n + 1))
    return s.astype(dtype_str)


def dst2(u):
    """Orthonormal DST-I along both axes (diagonalises the homogeneous-
    Dirichlet 5-point Laplacian — used by the fast Poisson solver)."""
    sy = jnp.asarray(_dst1_basis(u.shape[0], str(u.dtype)))
    sx = jnp.asarray(_dst1_basis(u.shape[1], str(u.dtype)))
    return jnp.matmul(jnp.matmul(sy, u, precision=_PRECISION), sx.T,
                      precision=_PRECISION)
