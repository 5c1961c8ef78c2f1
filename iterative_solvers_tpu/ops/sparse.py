"""Sparse-matrix containers and SpMV for TPU.

BASELINE.json requires an explicit sparse layer (CSR/COO/BSR assembly of the
2-D Laplacian and fourth-order stencil operators + SpMV kernels) alongside
the matrix-free stencil path.  Formats, chosen TPU-first:

- :class:`DIA` (banded/diagonal): the natural container for structured-grid
  stencils.  SpMV is a fused pipeline of shifted multiplies — pure VPU,
  sequential HBM reads, no index traffic at all; this is the speed-of-light
  format on TPU and the default target of the assembly helpers.
- :class:`CSR`: general unstructured sparsity.  SpMV gathers ``x[indices]``
  and reduces per row via segment-sum; on TPU the gather dominates, so CSR is
  kept for generality/interop rather than the hot path.
- :class:`BSR` (block CSR): dense ``(bs, bs)`` blocks turn the gather into
  batched small matmuls (MXU-friendly for bs >= 8).

Assembly is host-side numpy/scipy (structure is static); solves run on
device.  Reference counterpart: the ``scipy.sparse`` assembly throughout
(sh_scipy_nk.py:31-39, lab14_p2.py:26-34) and Eigen's ``SparseMatrix`` in the
C++ layer (main.cpp:38-81).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


# -- DIA (diagonal/banded) ---------------------------------------------------

class DIA(NamedTuple):
    """Diagonal-format sparse matrix: ``data[k]`` holds the k-th diagonal
    (offset ``offsets[k]``), aligned so that ``A[i, i + off] = data[k][i]``.

    ``offsets`` is a static tuple; ``n`` the (square) dimension.
    """

    data: jax.Array          # (ndiags, n)
    offsets: tuple[int, ...]
    n: int

    def matvec(self, x):
        """y[i] = sum_k data[k][i] * x[i + off_k] (zero outside [0, n))."""
        xf = x.reshape(-1)
        y = jnp.zeros_like(xf)
        for k, off in enumerate(self.offsets):
            d = self.data[k]
            if off >= 0:
                # y[:n-off] += d[:n-off] * x[off:]
                y = y.at[: self.n - off].add(d[: self.n - off] * xf[off:])
            else:
                y = y.at[-off:].add(d[-off:] * xf[: self.n + off])
        return y.reshape(x.shape)

    @staticmethod
    def from_scipy(m) -> "DIA":
        md = m.todia()
        n = md.shape[0]
        data = np.zeros((len(md.offsets), n), dtype=md.data.dtype)
        # scipy DIA aligns data[k][j] = A[j - off, j]; re-align to row index
        for k, off in enumerate(md.offsets):
            if off >= 0:
                data[k, : n - off] = md.data[k, off:]
            else:
                data[k, -off:] = md.data[k, : n + off]
        return DIA(data=jnp.asarray(data), offsets=tuple(int(o) for o in md.offsets), n=n)


# -- CSR ---------------------------------------------------------------------

class CSR(NamedTuple):
    data: jax.Array       # (nnz,)
    indices: jax.Array    # (nnz,) column index per entry
    rows: jax.Array       # (nnz,) row index per entry (expanded indptr)
    shape: tuple[int, int]

    def matvec(self, x):
        xf = x.reshape(-1)
        prod = self.data * xf[self.indices]
        y = jax.ops.segment_sum(prod, self.rows, num_segments=self.shape[0])
        return y.reshape(x.shape if self.shape[0] == xf.size else (self.shape[0],))

    @staticmethod
    def from_scipy(m) -> "CSR":
        mc = m.tocsr()
        rows = np.repeat(np.arange(mc.shape[0]), np.diff(mc.indptr))
        return CSR(
            data=jnp.asarray(mc.data),
            indices=jnp.asarray(mc.indices),
            rows=jnp.asarray(rows),
            shape=tuple(mc.shape),
        )

    @property
    def nnz(self) -> int:
        return int(self.data.shape[0])


class COO(NamedTuple):
    data: jax.Array
    row: jax.Array
    col: jax.Array
    shape: tuple[int, int]

    def matvec(self, x):
        xf = x.reshape(-1)
        prod = self.data * xf[self.col]
        return jax.ops.segment_sum(prod, self.row, num_segments=self.shape[0])

    def to_csr(self) -> CSR:
        order = jnp.argsort(self.row, stable=True)
        return CSR(data=self.data[order], indices=self.col[order],
                   rows=self.row[order], shape=self.shape)

    @staticmethod
    def from_scipy(m) -> "COO":
        mc = m.tocoo()
        return COO(data=jnp.asarray(mc.data), row=jnp.asarray(mc.row),
                   col=jnp.asarray(mc.col), shape=tuple(mc.shape))


# -- BSR (block CSR) ---------------------------------------------------------

class BSR(NamedTuple):
    data: jax.Array       # (nblocks, bs, bs)
    indices: jax.Array    # (nblocks,) block-column per block
    rows: jax.Array       # (nblocks,) block-row per block
    shape: tuple[int, int]
    blocksize: int

    def matvec(self, x):
        bs = self.blocksize
        xb = x.reshape(-1, bs)                       # (nbcols, bs)
        gathered = xb[self.indices]                  # (nblocks, bs)
        # dense (bs, bs) x (bs,) per block — batched matmul on the MXU
        prod = jnp.einsum("nij,nj->ni", self.data, gathered)
        y = jax.ops.segment_sum(prod, self.rows,
                                num_segments=self.shape[0] // bs)
        return y.reshape(x.shape if self.shape[0] == x.size else (self.shape[0],))

    @staticmethod
    def from_scipy(m, blocksize: int) -> "BSR":
        mb = m.tobsr(blocksize=(blocksize, blocksize))
        rows = np.repeat(np.arange(mb.shape[0] // blocksize),
                         np.diff(mb.indptr))
        return BSR(
            data=jnp.asarray(mb.data),
            indices=jnp.asarray(mb.indices),
            rows=jnp.asarray(rows),
            shape=tuple(mb.shape),
            blocksize=blocksize,
        )


# -- assembly helpers --------------------------------------------------------

def laplacian_5pt_periodic(n: int, h: float):
    """scipy CSR of the periodic 5-point Laplacian on an n x n grid (built
    independently from first principles; cf. sh_scipy_nk.py:31-35)."""
    import scipy.sparse as sp

    e = 1.0 / (h * h)
    idx = np.arange(n * n).reshape(n, n)
    rows, cols, vals = [], [], []
    for shift, axis in (((1, 0), 0), ((-1, 0), 0), ((0, 1), 1), ((0, -1), 1)):
        nb = np.roll(idx, shift, axis=(0, 1))
        rows.append(idx.reshape(-1))
        cols.append(nb.reshape(-1))
        vals.append(np.full(n * n, e))
    rows.append(idx.reshape(-1))
    cols.append(idx.reshape(-1))
    vals.append(np.full(n * n, -4 * e))
    return sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n * n, n * n),
    )


def sh_operator(n: int, h: float, r: float):
    """scipy CSR of L = -Lap^2 - 2 Lap + (r-1) I (periodic)."""
    import scipy.sparse as sp

    lap = laplacian_5pt_periodic(n, h)
    return (-(lap @ lap) - 2.0 * lap + (r - 1.0) * sp.identity(n * n)).tocsr()


def laplacian_5pt_dirichlet(n: int, h: float):
    """scipy CSR of the interior-node homogeneous-Dirichlet Laplacian
    (lab14_p2.py:26-34 convention: (n-1)^2 unknowns for n intervals)."""
    import scipy.sparse as sp

    m = n - 1
    main = np.full(m * m, -4.0)
    off = np.ones(m * m - 1)
    off[m - 1 :: m] = 0
    far = np.ones(m * (m - 1))
    return (
        sp.diags([main, off, off, far, far], [0, 1, -1, m, -m], format="csr")
        / (h * h)
    )
