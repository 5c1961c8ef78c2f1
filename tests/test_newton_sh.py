"""JFNK solver tests + Swift–Hohenberg end-to-end parity vs scipy oracles."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.optimize import newton_krylov as scipy_nk

from iterative_solvers_tpu.solvers.newton import newton_krylov
from iterative_solvers_tpu.models.swift_hohenberg import (
    SHConfig,
    make_cn_step,
    evolve_cn,
    semi_implicit_step,
)
from tests.reference_oracles import sh_L

RNG = np.random.default_rng(11)


# -- basic nonlinear systems -------------------------------------------------

def test_newton_simple_poly():
    """Solve x^3 + x - target = 0 elementwise-coupled via a rotation."""
    n = 32
    Qm = np.linalg.qr(RNG.standard_normal((n, n)))[0]
    Qj = jnp.array(Qm)
    target = jnp.array(RNG.standard_normal(n))

    def F(x):
        y = Qj @ x
        return Qj.T @ (y ** 3 + y) - target

    res = newton_krylov(F, jnp.zeros(n), f_tol=1e-10, maxiter=60)
    assert res.converged
    np.testing.assert_allclose(np.asarray(F(res.x)), 0, atol=1e-9)


@pytest.mark.parametrize("jvp_mode", ["fd", "exact"])
def test_newton_jvp_modes(jvp_mode):
    def F(x):
        return jnp.tanh(x) + 0.3 * jnp.roll(x, 1) - 0.1

    res = newton_krylov(F, jnp.zeros(50), f_tol=1e-11, jvp_mode=jvp_mode)
    assert res.converged
    np.testing.assert_allclose(np.asarray(F(res.x)), 0, atol=1e-10)


def test_newton_matches_scipy_solution():
    """Same nonlinear system, same tolerance: solutions agree to 1e-6."""
    n = 24

    def F_np(x):
        return np.tanh(x) + 0.4 * np.roll(x, 3) ** 2 - 0.2

    def F_jax(x):
        return jnp.tanh(x) + 0.4 * jnp.roll(x, 3) ** 2 - 0.2

    x_scipy = scipy_nk(F_np, np.zeros(n), f_tol=1e-10)
    res = newton_krylov(F_jax, jnp.zeros(n), f_tol=1e-10)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_scipy, atol=1e-6)


# -- Swift–Hohenberg end-to-end ---------------------------------------------

def _sh_scipy_step(U, cfg, L_sp):
    """One reference CN/NK step (sh_scipy_nk.py:53-61) via scipy."""
    Uo = U.copy()
    UoUo = Uo * Uo
    UoUoUo = Uo * UoUo

    def residual(u):
        uu = u * u
        return (u - Uo) / cfg.k - (
            L_sp @ u + cfg.g * uu - u * uu + L_sp @ Uo + cfg.g * UoUo - UoUoUo
        ) / 2

    return scipy_nk(residual, Uo, f_tol=6e-6)


@pytest.fixture(scope="module")
def sh_small():
    cfg = SHConfig(d=40.0, n=24, k=0.2)
    L_sp = sh_L(cfg.n, cfg.h, cfg.r)
    u0 = RNG.standard_normal((cfg.n, cfg.n))
    return cfg, L_sp, u0


def test_sh_cn_step_parity(sh_small):
    """One JFNK CN step matches scipy newton_krylov to 1e-6 (BASELINE gate)."""
    cfg, L_sp, u0 = sh_small
    u_scipy = _sh_scipy_step(u0.reshape(-1), cfg, L_sp).reshape(cfg.n, cfg.n)

    step = make_cn_step(cfg)
    u_jax, res = step(jnp.array(u0))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(u_jax), u_scipy, atol=1e-6)


def test_sh_trajectory_parity(sh_small):
    """Five CN steps stay within 1e-5 of the scipy trajectory."""
    cfg, L_sp, u0 = sh_small
    u_sp = u0.reshape(-1)
    for _ in range(5):
        u_sp = _sh_scipy_step(u_sp, cfg, L_sp)

    u_jax, iters, f_norms = evolve_cn(jnp.array(u0), 5, cfg)
    np.testing.assert_allclose(
        np.asarray(u_jax), u_sp.reshape(cfg.n, cfg.n), atol=1e-5
    )
    assert np.all(np.asarray(f_norms) <= 6.1e-6)


def test_sh_semi_implicit_vs_spsolve(sh_small):
    """Linearised step: GMRES solve matches the reference spsolve to 1e-8."""
    from scipy.sparse import identity, diags
    from scipy.sparse.linalg import spsolve

    cfg, _, u0 = sh_small
    # reference uses r=0.2, g=0 for the linearised variant
    cfg = SHConfig(d=cfg.d, n=cfg.n, k=cfg.k, r=0.2, g=0.0)
    L_sp = sh_L(cfg.n, cfg.h, cfg.r)
    nn = cfg.n * cfg.n
    U = u0.reshape(-1)
    Uo = U + 0.1 * RNG.standard_normal(nn)
    I = identity(nn, format="csc")
    D = diags((5 * U - Uo) ** 2 * cfg.k / 16 - cfg.g * cfg.k * U)
    want = spsolve((I + D - L_sp * cfg.k / 2).tocsc(), (I + L_sp * cfg.k / 2) @ U)

    got, res = semi_implicit_step(
        jnp.array(U.reshape(cfg.n, cfg.n)),
        jnp.array(Uo.reshape(cfg.n, cfg.n)),
        cfg,
        tol=1e-12,
    )
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(got).reshape(-1), want, atol=1e-8
    )


# -- r5 solver features: psolve_factory + inner_maxiter ----------------------

def _stiff_linear_residual(n=48, cond=1e6):
    """F(x) = A x - b with A = I + c*diag(lam), lam the DCT-squared spectrum
    — a proxy for the 4th-order CN operators whose inner solves need
    preconditioning at large dt."""
    lam = jnp.asarray(np.linspace(0.0, 1.0, n) ** 2 * (cond - 1.0) + 1.0)
    b = jnp.asarray(RNG.standard_normal(n))
    return lambda x: lam * x - b, lam, b


def test_newton_psolve_factory_accelerates_stiff_inner():
    """With the exact inverse as psolve, a single tiny lgmres cycle solves
    the kappa=1e6 system; unpreconditioned the same budget stalls."""
    F, lam, b = _stiff_linear_residual()
    kw = dict(f_tol=1e-8, maxiter=4, inner_m=5, outer_k=1, line_search=False)
    plain = newton_krylov(F, jnp.zeros_like(b), **kw)
    pre = newton_krylov(F, jnp.zeros_like(b),
                        psolve_factory=lambda x, fx: (lambda v: v / lam), **kw)
    assert bool(pre.converged)
    assert not bool(plain.converged)
    np.testing.assert_allclose(np.asarray(F(pre.x)), 0, atol=1e-7)


def test_newton_inner_maxiter_deepens_inner_solve():
    """inner_maxiter=k restarts the cycle on the true linear residual —
    same semantics, strictly more inner progress on a hard system."""
    F, lam, b = _stiff_linear_residual(cond=1e4)
    kw = dict(f_tol=1e-8, maxiter=3, inner_m=8, outer_k=2,
              line_search=False)
    one = newton_krylov(F, jnp.zeros_like(b), inner_maxiter=1, **kw)
    deep = newton_krylov(F, jnp.zeros_like(b), inner_maxiter=40, **kw)
    assert float(deep.f_norm) < float(one.f_norm)
    assert bool(deep.converged)
