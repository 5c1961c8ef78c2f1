"""GMRES / LGMRES correctness and scipy-parity tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from iterative_solvers_tpu.solvers.gmres import gmres
from iterative_solvers_tpu.solvers.lgmres import lgmres, init_recycle

RNG = np.random.default_rng(7)


def _spd_system(n=64, density=0.2):
    a = sp.random(n, n, density=density, random_state=np.random.RandomState(3))
    A = (a @ a.T + 10 * sp.identity(n)).tocsr()
    b = RNG.standard_normal(n)
    return A, b


def _nonsym_system(n=80):
    A = (sp.diags([np.full(n, 4.0), np.full(n - 1, -1.0), np.full(n - 1, -2.0)],
                  [0, 1, -1])).tocsr()
    b = RNG.standard_normal(n)
    return A, b


@pytest.mark.parametrize("system", [_spd_system, _nonsym_system])
def test_gmres_solves(system):
    A, b = system()
    dense = jnp.array(A.toarray())
    mv = lambda v: dense @ v
    res = gmres(mv, jnp.array(b), tol=1e-10, restart=40, maxiter=400)
    x = np.asarray(res.x)
    assert res.converged
    np.testing.assert_allclose(A @ x, b, atol=1e-8)


def test_gmres_2d_field_shape():
    """GMRES on a (ny, nx) field with a stencil matvec keeps shapes intact."""
    from iterative_solvers_tpu.ops.stencils import lap_periodic

    n, h, shift = 16, 0.5, 5.0
    mv = lambda u: shift * u - lap_periodic(u, h)
    b = jnp.array(RNG.standard_normal((n, n)))
    res = gmres(mv, b, tol=1e-10, restart=30, maxiter=300)
    assert res.x.shape == (n, n)
    np.testing.assert_allclose(np.asarray(mv(res.x)), np.asarray(b), atol=1e-8)


def test_gmres_restart_path():
    """Force multiple restart cycles."""
    A, b = _nonsym_system(120)
    dense = jnp.array(A.toarray())
    res = gmres(lambda v: dense @ v, jnp.array(b), tol=1e-9, restart=8,
                maxiter=500)
    assert res.converged
    np.testing.assert_allclose(A @ np.asarray(res.x), b, atol=1e-7)


def test_gmres_iters_close_to_scipy():
    """Iterations-to-tolerance should be in the same ballpark as scipy."""
    A, b = _nonsym_system(100)
    iters = {"n": 0}

    def cb(xk):
        iters["n"] += 1

    x_sp, info = spla.gmres(A, b, rtol=1e-8, atol=0.0, restart=30,
                            callback=cb, callback_type="pr_norm", maxiter=50)
    assert info == 0
    dense = jnp.array(A.toarray())
    res = gmres(lambda v: dense @ v, jnp.array(b), tol=1e-8, restart=30)
    assert res.converged
    # allow generous slack; both should be far below the 10*restart cap
    assert int(res.iters) <= 2 * max(iters["n"], 1) + 10


def test_gmres_preconditioned():
    A, b = _spd_system()
    dense = jnp.array(A.toarray())
    dinv = jnp.array(1.0 / A.diagonal())
    res_plain = gmres(lambda v: dense @ v, jnp.array(b), tol=1e-10, restart=40)
    res_prec = gmres(lambda v: dense @ v, jnp.array(b), tol=1e-10, restart=40,
                     M=lambda v: dinv * v)
    assert res_prec.converged
    assert int(res_prec.iters) <= int(res_plain.iters)
    np.testing.assert_allclose(A @ np.asarray(res_prec.x), b, atol=1e-8)


def test_lgmres_solves():
    A, b = _nonsym_system(90)
    dense = jnp.array(A.toarray())
    res, rec = lgmres(lambda v: dense @ v, jnp.array(b), tol=1e-10,
                      inner_m=15, outer_k=4, maxiter=50)
    assert res.converged
    np.testing.assert_allclose(A @ np.asarray(res.x), b, atol=1e-8)
    assert int(rec.count) >= 1


def test_lgmres_recycling_accelerates():
    """Re-solving a nearby system with a warm recycle buffer takes fewer
    iterations — the property scipy's KrylovJacobian exploits across Newton
    steps."""
    A, b = _nonsym_system(100)
    dense = jnp.array(A.toarray())
    mv = lambda v: dense @ v
    res1, rec = lgmres(mv, jnp.array(b), tol=1e-8, inner_m=10, outer_k=5,
                       maxiter=100)
    b2 = jnp.array(b + 0.01 * RNG.standard_normal(b.size))
    res_cold, _ = lgmres(mv, b2, tol=1e-8, inner_m=10, outer_k=5, maxiter=100)
    res_warm, _ = lgmres(mv, b2, tol=1e-8, inner_m=10, outer_k=5, maxiter=100,
                         recycle=rec)
    assert res_warm.converged
    assert int(res_warm.iters) <= int(res_cold.iters)


def test_lgmres_single_cycle_mirrors_jfnk_usage():
    """maxiter=1 runs one augmented cycle and still reduces the residual."""
    A, b = _nonsym_system(60)
    dense = jnp.array(A.toarray())
    mv = lambda v: dense @ v
    bj = jnp.array(b)
    rec = init_recycle(bj.shape, 5, bj.dtype)
    res, rec = lgmres(mv, bj, tol=1e-12, inner_m=12, outer_k=5, maxiter=1,
                      recycle=rec, store_av=False)
    r0 = np.linalg.norm(b)
    assert float(res.resnorm) < 0.1 * r0


def test_cgs2_chunked_matches_whole_buffer(monkeypatch):
    """The chunked active-row CGS2 (large-field path, gated by
    _CGS2_CHUNK_MIN_BYTES) must reproduce the whole-buffer orthogonalisation:
    same GMRES/LGMRES solutions and iteration counts on the same system."""
    import numpy as np
    import jax.numpy as jnp
    import sys

    from iterative_solvers_tpu.solvers.gmres import gmres
    from iterative_solvers_tpu.solvers.lgmres import lgmres
    # the solvers package re-exports the gmres *function*; grab the module
    gm = sys.modules["iterative_solvers_tpu.solvers.gmres"]

    rng = np.random.default_rng(3)
    n = 40
    A = np.eye(n) * 4.0 + rng.standard_normal((n, n)) * 0.3
    b = rng.standard_normal(n)
    Aj = jnp.asarray(A)
    mv = lambda v: Aj @ v

    base_g = gmres(mv, jnp.asarray(b), restart=15, tol=1e-10)
    base_l, _ = lgmres(mv, jnp.asarray(b), inner_m=10, outer_k=3, tol=1e-10)

    monkeypatch.setattr(gm, "_CGS2_CHUNK_MIN_BYTES", 0)
    chg = gmres(mv, jnp.asarray(b), restart=15, tol=1e-10)
    chl, _ = lgmres(mv, jnp.asarray(b), inner_m=10, outer_k=3, tol=1e-10)

    assert chg.converged and chl.converged
    assert int(chg.iters) == int(base_g.iters)
    assert int(chl.iters) == int(base_l.iters)
    np.testing.assert_allclose(np.asarray(chg.x), np.asarray(base_g.x),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(chl.x), np.asarray(base_l.x),
                               rtol=0, atol=1e-9)
