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

    def _terms(self, xf):
        """Padded per-diagonal products — expressed as full-length arrays so
        XLA fuses the whole SpMV into one streaming pass (no serialized
        in-place updates)."""
        for k, off in enumerate(self.offsets):
            d = self.data[k]
            if off >= 0:
                prod = d[: self.n - off] * xf[..., off:]
                yield jnp.pad(prod, [(0, 0)] * (prod.ndim - 1) + [(0, off)])
            else:
                prod = d[-off:] * xf[..., : self.n + off]
                yield jnp.pad(prod, [(0, 0)] * (prod.ndim - 1) + [(-off, 0)])

    def matvec(self, x):
        """y[i] = sum_k data[k][i] * x[i + off_k] (zero outside [0, n))."""
        xf = x.reshape(-1)
        y = sum(self._terms(xf))
        return y.reshape(x.shape)

    def matmat(self, X):
        """SpMM: ``(n, nrhs)`` dense right-hand side, one fused pass."""
        return sum(self._terms(X.T)).T

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

    def matmat(self, X):
        """SpMM: gather rhs rows per nonzero, scale, segment-reduce."""
        prod = self.data[:, None] * X[self.indices, :]
        return jax.ops.segment_sum(prod, self.rows,
                                   num_segments=self.shape[0])

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
        prod = jnp.einsum("nij,nj->ni", self.data, gathered,
                          precision=jax.lax.Precision.HIGHEST)
        y = jax.ops.segment_sum(prod, self.rows,
                                num_segments=self.shape[0] // bs)
        return y.reshape(x.shape if self.shape[0] == x.size else (self.shape[0],))

    def matmat(self, X):
        """SpMM: per-block (bs, bs) x (bs, nrhs) batched matmuls (MXU)."""
        bs = self.blocksize
        Xb = X.reshape(-1, bs, X.shape[-1])            # (nbcols, bs, nrhs)
        gathered = Xb[self.indices]                    # (nblocks, bs, nrhs)
        prod = jnp.einsum("nij,njk->nik", self.data, gathered,
                          precision=jax.lax.Precision.HIGHEST)
        y = jax.ops.segment_sum(prod, self.rows,
                                num_segments=self.shape[0] // bs)
        return y.reshape(self.shape[0], X.shape[-1])

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


# -- structured-grid DIA (2-D shift form) -------------------------------------

class GridDIA(NamedTuple):
    """Diagonal sparse matrix over a structured ``(ny, nx)`` grid, stored as
    2-D coefficient *fields* per stencil offset: ``y[r, c] = sum_k
    data[k][r, c] * x[r + dy_k, c + dx_k]`` (zero outside the grid).

    This is the speed-of-light sparse layout on TPU: the SpMV is a fused
    pipeline of statically-shifted multiplies — sequential HBM streams of
    the coefficient fields plus one pass over ``x``, zero index traffic, all
    VPU.  Any flat DIA matrix maps onto it exactly: a flat offset
    ``off = dy*nx + dx`` whose column index wraps at a row boundary splits
    into two 2-D shift terms with complementary masks (see
    :meth:`from_scipy`), so periodic wrap diagonals are representable too.

    With ``cyclic=True`` the shifts are interpreted modulo the grid
    (``x[(r + dy) % ny, (c + dx) % nx]``) and :meth:`from_scipy` merges every
    entry onto its minimal-residue shift — exact for *any* matrix (each entry
    ``(i, j)`` has a unique canonical shift for its row), and for periodic
    stencil operators it collapses the wrap-residue fields: the 13-point SH
    operator stores 13 fields instead of ~21, the minimal-traffic layout.
    """

    data: jax.Array                      # (nterms, ny, nx)
    shifts: tuple[tuple[int, int], ...]  # (dy, dx) per term
    grid: tuple[int, int]                # (ny, nx)
    cyclic: bool = False                 # shifts wrap modulo the grid

    def _apply(self, x2):
        """Fused shift-multiply pipeline on a (..., ny, nx) field.

        Near shifts (the stencil body) read same-shape slices of a once-
        zero-padded copy of ``x`` — the layout XLA fuses into a single
        streaming pass, like the matrix-free stencils.  Far shifts (the
        flat-diagonal wrap residues, |dx| ~ nx) touch only a ``|dx'|``-wide
        column band, so they are evaluated on that band alone instead of
        forcing a 3x-wide pad.
        """
        ny, nx = self.grid
        if self.cyclic:
            near = [(k, dy, dx) for k, (dy, dx) in enumerate(self.shifts)
                    if abs(dy) <= 8 and abs(dx) <= 8]
            farc = [(k, dy, dx) for k, (dy, dx) in enumerate(self.shifts)
                    if abs(dy) > 8 or abs(dx) > 8]
            my = max([abs(d) for _, d, _ in near], default=0)
            mx = max([abs(d) for _, _, d in near], default=0)
            pad = [(0, 0)] * (x2.ndim - 2) + [(my, my), (mx, mx)]
            xp = jnp.pad(x2, pad, mode="wrap")
            out = jnp.zeros_like(x2)
            for k, dy, dx in near:
                out = out + self.data[k] * xp[..., my + dy:my + dy + ny,
                                              mx + dx:mx + dx + nx]
            for k, dy, dx in farc:
                out = out + self.data[k] * jnp.roll(x2, (-dy, -dx),
                                                    axis=(-2, -1))
            return out
        near = [(k, dy, dx) for k, (dy, dx) in enumerate(self.shifts)
                if abs(dx) <= 8]
        far = [(k, dy, dx) for k, (dy, dx) in enumerate(self.shifts)
               if abs(dx) > 8]
        my = max([abs(d) for _, d, _ in near], default=0)
        mx = max([abs(d) for _, _, d in near], default=0)
        pad = [(0, 0)] * (x2.ndim - 2) + [(my, my), (mx, mx)]
        xp = jnp.pad(x2, pad)
        out = jnp.zeros_like(x2)
        for k, dy, dx in near:
            out = out + self.data[k] * xp[..., my + dy:my + dy + ny,
                                          mx + dx:mx + dx + nx]
        for k, dy, dx in far:
            # columns with 0 <= c + dx < nx form one contiguous band
            xlo, xhi = max(0, -dx), min(nx, nx - dx)
            ylo, yhi = max(0, -dy), min(ny, ny - dy)
            if ylo >= yhi or xlo >= xhi:
                continue
            band = (self.data[k][ylo:yhi, xlo:xhi]
                    * x2[..., ylo + dy:yhi + dy, xlo + dx:xhi + dx])
            out = out.at[..., ylo:yhi, xlo:xhi].add(band)
        return out

    def matvec(self, x):
        return self._apply(x.reshape(self.grid)).reshape(x.shape)

    def matmat(self, X):
        """SpMM on an ``(n, nrhs)`` dense block (batched shift pipeline)."""
        ny, nx = self.grid
        Xg = X.T.reshape(X.shape[-1], ny, nx)
        return self._apply(Xg).reshape(X.shape[-1], ny * nx).T

    @property
    def nnz(self) -> int:
        return int(sum(np.count_nonzero(np.asarray(d)) for d in self.data))

    @staticmethod
    def from_scipy(m, grid: tuple[int, int], cyclic: bool = False) -> "GridDIA":
        """Build from any scipy sparse matrix whose row/col spaces are the
        flattened ``(ny, nx)`` grid.  Each flat diagonal ``off`` becomes the
        2-D shift ``(dy, dx)`` with ``dx`` the minimal-magnitude residue of
        ``off mod nx`` — plus, where the column index would wrap past a row
        edge, the complementary shift ``(dy +- 1, dx -+ nx)``; entries land
        in whichever term keeps ``0 <= c + dx < nx``.

        With ``cyclic=True``, every entry ``(i, j)`` instead lands on the
        minimal residue of ``(row_j - row_i, col_j - col_i)`` modulo the
        grid — exact for any matrix, and the minimal-field layout for
        periodic operators (wrap diagonals merge onto the interior shift)."""
        ny, nx = grid
        if cyclic:
            coo = m.tocoo()
            n = ny * nx
            assert coo.shape == (n, n)
            ri, ci = np.divmod(coo.row.astype(np.int64), nx)
            rj, cj = np.divmod(coo.col.astype(np.int64), nx)
            dy = (rj - ri) % ny
            dy = np.where(dy > ny // 2, dy - ny, dy)
            dx = (cj - ci) % nx
            dx = np.where(dx > nx // 2, dx - nx, dx)
            # unique integer code per shift, ordered like sorted (dy, dx)
            code = dy * np.int64(2 * nx + 2) + dx
            uniq, inv = np.unique(code, return_inverse=True)
            data = np.zeros((len(uniq), ny, nx), dtype=coo.data.dtype)
            np.add.at(data, (inv, ri, ci), coo.data)
            k = np.int64(2 * nx + 2)
            shifts = tuple(
                (int((c + nx) // k), int((c + nx) % k - nx)) for c in uniq
            )
            return GridDIA(data=jnp.asarray(data), shifts=shifts,
                           grid=(ny, nx), cyclic=True)
        md = m.todia()
        n = ny * nx
        assert md.shape == (n, n)
        fields: dict[tuple[int, int], np.ndarray] = {}
        cols = np.arange(nx)
        for k, off in enumerate(md.offsets):
            off = int(off)
            # row-aligned diagonal values: diag[i] = A[i, i + off]
            diag = np.zeros(n, dtype=md.data.dtype)
            if off >= 0:
                diag[: n - off] = md.data[k, off:]
            else:
                diag[-off:] = md.data[k, : n + off]
            diag2 = diag.reshape(ny, nx)
            dy0, dx0 = divmod(off, nx)
            if dx0 > nx // 2:
                dy0, dx0 = dy0 + 1, dx0 - nx
            in_row = (cols + dx0 >= 0) & (cols + dx0 < nx)
            # column underflow wraps to the previous row, overflow to the next
            wrap = ((dy0 - 1, dx0 + nx) if dx0 < 0 else (dy0 + 1, dx0 - nx))
            for (dy, dx), mask in (((dy0, dx0), in_row), (wrap, ~in_row)):
                vals = diag2 * mask[None, :]
                if not np.any(vals):
                    continue
                f = fields.setdefault((dy, dx),
                                      np.zeros((ny, nx), dtype=md.data.dtype))
                f += vals
        shifts = tuple(sorted(fields))
        if not shifts:  # empty matrix
            return GridDIA(data=jnp.zeros((0, ny, nx), dtype=md.data.dtype),
                           shifts=(), grid=(ny, nx))
        data = np.stack([fields[s] for s in shifts])
        return GridDIA(data=jnp.asarray(data), shifts=shifts, grid=(ny, nx))


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


def biharmonic_dirichlet(n: int, h: float):
    """scipy CSR of the 13-point Dirichlet bilaplacian ``Lap_5pt @ Lap_5pt``
    — the 4th-order operator class of the reference's biharmonic MEMS path
    (PMA.py:335-349 applies Laplace_operator twice for p=2)."""
    lap = laplacian_5pt_dirichlet(n, h)
    return (lap @ lap).tocsr()


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
