"""Structured-grid descriptors and boundary classification.

TPU-first re-design of the reference's ``make_Ibdy`` index sets
(reference: python_work/droplet.py:762-776, PMA.py:94-108, PMA2_nk.py:165-179).

The reference classifies *flattened* grid indices into Boundary / Interior /
Top / Bottom / Left / Right sets and imposes boundary conditions by scattered
assignment into 1-D vectors.  On TPU, gathers/scatters over index lists defeat
XLA fusion; instead all fields here are 2-D ``(Ny, Nx)`` arrays and boundary
conditions are imposed with static *masks* (``jnp.where``) or by overwriting
edge strips with ``concatenate`` — both fuse into the surrounding elementwise
pipeline.

Convention (same as the reference): row index ``i`` runs along ``eta``/``y``
(``Ny`` rows), column index ``j`` runs along ``ksi``/``x`` (``Nx`` columns).
"""
from __future__ import annotations

import dataclasses
from functools import cached_property

import numpy as np


@dataclasses.dataclass(frozen=True)
class Grid2D:
    """A static 2-D tensor-product grid on ``[xl, xr] x [yb, yt]``.

    Purely host-side metadata (numpy, hashable) so it can be closed over by
    jitted functions without becoming a traced value.
    """

    nx: int
    ny: int
    xl: float = 0.0
    xr: float = 1.0
    yb: float = 0.0
    yt: float = 1.0

    # -- spacings ---------------------------------------------------------
    @property
    def lx(self) -> float:
        return self.xr - self.xl

    @property
    def ly(self) -> float:
        return self.yt - self.yb

    @property
    def dx(self) -> float:
        return self.lx / (self.nx - 1)

    @property
    def dy(self) -> float:
        return self.ly / (self.ny - 1)

    @property
    def shape(self) -> tuple[int, int]:
        return (self.ny, self.nx)

    @property
    def n(self) -> int:
        return self.nx * self.ny

    # -- coordinates ------------------------------------------------------
    @cached_property
    def x(self) -> np.ndarray:
        return np.linspace(self.xl, self.xr, self.nx)

    @cached_property
    def y(self) -> np.ndarray:
        return np.linspace(self.yb, self.yt, self.ny)

    @cached_property
    def xx(self) -> np.ndarray:
        """x coordinate at every node, shape (Ny, Nx)."""
        return np.broadcast_to(self.x[None, :], self.shape).copy()

    @cached_property
    def yy(self) -> np.ndarray:
        """y coordinate at every node, shape (Ny, Nx)."""
        return np.broadcast_to(self.y[:, None], self.shape).copy()

    def xx_op(self, dtype=np.float64):
        """In-graph ``(Ny, Nx)`` x-coordinate field.

        Same values as :attr:`xx` (a cast of the f64 linspace row), but the
        graph constant is the *1-D row* broadcast lazily under jit — a
        materialised 4096² f64 ``xx`` is a 134 MB literal in every jitted
        graph, which inflates compile time and overflows the remote-compile
        request limit (HTTP 413).  Use this inside traced code.

        The cast happens in numpy (no jnp astype round-trip in the graph;
        note jnp.asarray still downcasts f64 to f32 when x64 is disabled).
        """
        import jax.numpy as jnp

        row = jnp.asarray(np.asarray(self.x, dtype=dtype))
        return jnp.broadcast_to(row[None, :], self.shape)

    def yy_op(self, dtype=np.float64):
        """In-graph ``(Ny, Nx)`` y-coordinate field (see :meth:`xx_op`)."""
        import jax.numpy as jnp

        col = jnp.asarray(np.asarray(self.y, dtype=dtype))
        return jnp.broadcast_to(col[:, None], self.shape)

    # -- boundary masks (static numpy bool arrays) ------------------------
    @cached_property
    def mask_left(self) -> np.ndarray:
        m = np.zeros(self.shape, dtype=bool)
        m[:, 0] = True
        return m

    @cached_property
    def mask_right(self) -> np.ndarray:
        m = np.zeros(self.shape, dtype=bool)
        m[:, -1] = True
        return m

    @cached_property
    def mask_bottom(self) -> np.ndarray:
        m = np.zeros(self.shape, dtype=bool)
        m[0, :] = True
        return m

    @cached_property
    def mask_top(self) -> np.ndarray:
        m = np.zeros(self.shape, dtype=bool)
        m[-1, :] = True
        return m

    @cached_property
    def mask_boundary(self) -> np.ndarray:
        return self.mask_left | self.mask_right | self.mask_top | self.mask_bottom

    @cached_property
    def mask_interior(self) -> np.ndarray:
        return ~self.mask_boundary

    def __hash__(self):
        return hash((self.nx, self.ny, self.xl, self.xr, self.yb, self.yt))


def square(n: int, lo: float = -1.0, hi: float = 1.0) -> Grid2D:
    """Square grid helper (reference PMA workloads use [-1,1]^2, N=51)."""
    return Grid2D(nx=n, ny=n, xl=lo, xr=hi, yb=lo, yt=hi)
