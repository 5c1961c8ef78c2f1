"""scipy-based oracles mirroring the reference's operator assembly.

These re-create the reference's sparse derivative matrices (droplet.py:778-833
/ PMA2_nk.py:181-233) and periodic SH Laplacian (sh_scipy_nk.py:31-39) with
scipy so the matrix-free TPU ops can be checked for exact numerical parity.
They are test-only code and intentionally use the reference's formulation
(sparse diags + kron).
"""
import numpy as np
from scipy.sparse import diags, kron, csc_matrix, block_diag, identity


def d2_matrix_1d(n: int, h: float):
    """4th-order second-derivative matrix with one-sided boundary rows."""
    m = diags([-1, 16, -30, 16, -1], [-2, -1, 0, 1, 2], shape=(n, n), format="lil")
    m[0, :5] = [-415 / 6, 96, -36, 32 / 3, -1.5]
    m[1, :6] = [10, -15, -4, 14, -6, 1]
    m[-1, -5:] = [-1.5, 32 / 3, -36, 96, -415 / 6]
    m[-2, -6:] = [1, -6, 14, -4, -15, 10]
    return csc_matrix(m / (12 * h * h))


def d1_matrix_1d(n: int, h: float):
    """4th-order first-derivative matrix with one-sided boundary rows."""
    m = diags([1, -8, 8, -1], [-2, -1, 1, 2], shape=(n, n), format="lil")
    m[:2, :5] = [[-25, 48, -36, 16, -3], [-3, -10, 18, -6, 1]]
    m[-2:, -5:] = [[-1, 6, -18, 10, 3], [3, -16, 36, -48, 25]]
    return csc_matrix(m / (12 * h))


def d1_forward_1d(n: int, h: float):
    """2nd-order forward difference (with correct 1/2h scaling, see
    stencils.py note about the reference's inert scaling bug)."""
    m = diags([-3, 4, -1], [0, 1, 2], shape=(n, n), format="lil")
    m[-1, -3:] = [1, -4, 3]
    m[-2, -3:] = [0, -2, 2]
    return csc_matrix(m / (2 * h))


def d1_backward_1d(n: int, h: float):
    m = diags([1, -4, 3], [-2, -1, 0], shape=(n, n), format="lil")
    m[0, :3] = [-3, 4, -1]
    m[1, :3] = [-2, 2, 0]
    return csc_matrix(m / (2 * h))


def make_reference_matrices(nx: int, ny: int, dx: float, dy: float):
    """2-D operators via kron, row-major flattening (y outer, x inner)."""
    ix = identity(nx, format="csc")
    iy = identity(ny, format="csc")
    d2x = kron(iy, d2_matrix_1d(nx, dx)).tocsr()
    d2y = kron(d2_matrix_1d(ny, dy), ix).tocsr()
    d1x = kron(iy, d1_matrix_1d(nx, dx)).tocsr()
    d1y = kron(d1_matrix_1d(ny, dy), ix).tocsr()
    dxy = kron(d1_matrix_1d(ny, dy), d1_matrix_1d(nx, dx)).tocsr()
    return {"d2x": d2x, "d2y": d2y, "d1x": d1x, "d1y": d1y, "dxy": dxy}


def periodic_laplacian(n: int, h: float):
    """Periodic 5-point Laplacian, reference sh_scipy_nk.py:31-35 assembly."""
    e = 1 / h**2
    nn = n * n
    a = np.tile(
        diags([e, e, -4 * e, e, e], [1 - n, -1, 0, 1, n - 1], shape=(n, n), format="csc"),
        n,
    )
    lap = block_diag(a[:]) + diags(
        [e, e, e, e], [n - nn, -n, n, nn - n], shape=(nn, nn), format="csc"
    )
    return lap.tocsr()


def sh_L(n: int, h: float, r: float):
    lap = periodic_laplacian(n, h)
    i = identity(n * n, format="csr")
    return (-lap @ lap - 2 * lap + (r - 1) * i).tocsr()
