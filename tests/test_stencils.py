"""Parity tests: matrix-free stencil ops vs the reference's sparse assembly."""
import numpy as np
import pytest
import jax.numpy as jnp

from iterative_solvers_tpu.ops import stencils
from tests.reference_oracles import (
    make_reference_matrices,
    d1_forward_1d,
    d1_backward_1d,
    periodic_laplacian,
    sh_L,
)

RNG = np.random.default_rng(42)


@pytest.fixture(scope="module")
def field():
    ny, nx = 13, 17
    dx, dy = 9 / (nx - 1), 6 / (ny - 1)
    u = RNG.standard_normal((ny, nx))
    mats = make_reference_matrices(nx, ny, dx, dy)
    return u, dx, dy, mats


def _flat(u):
    return u.reshape(-1)


def test_d1_x(field):
    u, dx, dy, mats = field
    got = np.asarray(stencils.d1_x(jnp.array(u), dx))
    want = (mats["d1x"] @ _flat(u)).reshape(u.shape)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_d1_y(field):
    u, dx, dy, mats = field
    got = np.asarray(stencils.d1_y(jnp.array(u), dy))
    want = (mats["d1y"] @ _flat(u)).reshape(u.shape)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_d2_x(field):
    u, dx, dy, mats = field
    got = np.asarray(stencils.d2_x(jnp.array(u), dx))
    want = (mats["d2x"] @ _flat(u)).reshape(u.shape)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-10)


def test_d2_y(field):
    u, dx, dy, mats = field
    got = np.asarray(stencils.d2_y(jnp.array(u), dy))
    want = (mats["d2y"] @ _flat(u)).reshape(u.shape)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-10)


def test_dxy(field):
    u, dx, dy, mats = field
    got = np.asarray(stencils.dxy(jnp.array(u), dx, dy))
    want = (mats["dxy"] @ _flat(u)).reshape(u.shape)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-11)


def test_upwind_1d():
    n, h = 23, 0.37
    u = RNG.standard_normal((1, n))
    fwd = np.asarray(stencils.d1_x_forward(jnp.array(u), h))[0]
    bwd = np.asarray(stencils.d1_x_backward(jnp.array(u), h))[0]
    np.testing.assert_allclose(fwd, d1_forward_1d(n, h) @ u[0], atol=1e-13)
    np.testing.assert_allclose(bwd, d1_backward_1d(n, h) @ u[0], atol=1e-13)


def test_upwind_y():
    n, h = 19, 0.21
    u = RNG.standard_normal((n, 4))
    fwd = np.asarray(stencils.d1_y_forward(jnp.array(u), h))
    bwd = np.asarray(stencils.d1_y_backward(jnp.array(u), h))
    np.testing.assert_allclose(fwd, d1_forward_1d(n, h) @ u, atol=1e-13)
    np.testing.assert_allclose(bwd, d1_backward_1d(n, h) @ u, atol=1e-13)


def test_lap_periodic():
    n, d = 16, 40.0
    h = d / n
    u = RNG.standard_normal((n, n))
    got = np.asarray(stencils.lap_periodic(jnp.array(u), h))
    want = (periodic_laplacian(n, h) @ _flat(u)).reshape(n, n)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_sh_linear_operator():
    n, d, r = 16, 40.0, 0.01
    h = d / n
    u = RNG.standard_normal((n, n))
    got = np.asarray(stencils.sh_linear_operator(jnp.array(u), h, r))
    want = (sh_L(n, h, r) @ _flat(u)).reshape(n, n)
    np.testing.assert_allclose(got, want, atol=1e-11)


def test_convergence_order_d1():
    """4th-order accuracy on a smooth function (interior)."""
    errs = []
    for n in (33, 65):
        x = np.linspace(0, 1, n)
        h = x[1] - x[0]
        u = np.sin(2 * np.pi * x)[None, :]
        du = np.asarray(stencils.d1_x(jnp.array(u), h))[0]
        errs.append(np.abs(du - 2 * np.pi * np.cos(2 * np.pi * x)).max())
    order = np.log2(errs[0] / errs[1])
    assert order > 3.5, (errs, order)


def test_dirichlet_lap():
    n, h = 12, 1 / 13
    u = RNG.standard_normal((n, n))
    got = np.asarray(stencils.lap_dirichlet_5pt(jnp.array(u), h))
    from scipy.sparse import diags

    main = np.full(n * n, -4.0)
    off = np.ones(n * n - 1)
    off[n - 1 :: n] = 0
    a = diags([main, off, off, np.ones(n * n - n), np.ones(n * n - n)],
              [0, 1, -1, n, -n], format="csr") / h**2
    want = (a @ _flat(u)).reshape(n, n)
    np.testing.assert_allclose(got, want, atol=1e-11)
