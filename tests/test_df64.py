"""Double-float (two-f32) arithmetic and the df64 droplet residual.

Gates ops.df64 primitives against f64, the compensated CN residual against
the f64 oracle, and the full droplet step with ``residual_mode="df64"``
against the f64-residual step (same Newton count, matching solution).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iterative_solvers_tpu.io import fixtures as fx
from iterative_solvers_tpu.models import droplet as dp
from iterative_solvers_tpu.ops import curvilinear
from iterative_solvers_tpu.ops import df64 as df

RNG = np.random.default_rng(7)
FIXTURE = ("/root/reference/python_work/"
           "initdrop_coal_1_91-61_100_0.005_0.01_0.1_0.15.txt")


def test_df64_primitives_match_f64():
    a64 = jnp.array(RNG.standard_normal(1000) * 10.0 ** RNG.integers(-3, 3, 1000))
    b64 = jnp.array(RNG.standard_normal(1000) * 10.0 ** RNG.integers(-3, 3, 1000))
    a, b = df.from64(a64), df.from64(b64)

    # add/sub normalise by the operand magnitudes: the (standard) sloppy
    # df64 add loses relative accuracy exactly on near-cancellation, but its
    # absolute error stays ~eps^2 of the inputs — which is what the
    # compensated stencils rely on
    for name, got, want, den in [
        ("add", df.to64(df.add(a, b)), a64 + b64, jnp.abs(a64) + jnp.abs(b64)),
        ("sub", df.to64(df.sub(a, b)), a64 - b64, jnp.abs(a64) + jnp.abs(b64)),
        ("mul", df.to64(df.mul(a, b)), a64 * b64, None),
        ("recip", df.to64(df.recip(a)), 1.0 / a64, None),
        ("div", df.to64(df.div(a, b)), a64 / b64, None),
        ("scale", df.to64(df.scale(a, 1.0 / 3.0)), a64 / 3.0, None),
        ("mul_pow2", df.to64(df.mul_pow2(a, 0.5)), a64 * 0.5, None),
    ]:
        d = jnp.abs(want) if den is None else den
        rel = float(jnp.max(jnp.abs(got - want) / d))
        assert rel < 1e-13, (name, rel)


def test_df64_roundtrip_exactness():
    x = jnp.array(RNG.standard_normal(100))
    # hi+lo carries ~49 bits: round-trip error far below f64 eps scale loss
    err = float(jnp.max(jnp.abs(df.to64(df.from64(x)) - x)))
    assert err < 1e-14


def test_df64_stencils_match_f64():
    u64 = jnp.array(RNG.standard_normal((40, 56)))
    a64 = jnp.array(1.0 + 0.1 * RNG.standard_normal((40, 56)))
    from iterative_solvers_tpu.ops import stencils
    from iterative_solvers_tpu.ops.curvilinear import _flux_div_x

    got = df.to64(df.d1_x_df(df.from64(u64), 0.01))
    want = stencils.d1_x(u64, 0.01)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-10 * float(
        jnp.max(jnp.abs(want)))

    got = df.to64(df.d1_y_df(df.from64(u64), 0.02))
    want = stencils.d1_y(u64, 0.02)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-10 * float(
        jnp.max(jnp.abs(want)))

    got = df.to64(df.flux_div_x_df(df.from64(a64), df.from64(u64), 123.4))
    want = _flux_div_x(a64, u64, 123.4)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-10 * float(
        jnp.max(jnp.abs(want)))


def test_df64_residual_matches_f64_oracle():
    fixture = fx.load(FIXTURE)
    cfg = fx.config_for(fixture)
    u = jnp.array(fixture.u)
    q = jnp.array(fixture.q)
    geom = curvilinear.mesh_geometry(q, cfg.grid)
    F = dp.pde_rhs(u, geom, cfg)
    x = u * (1.0 + 1e-5 * jnp.cos(0.13 * jnp.arange(u.size)).reshape(u.shape))

    want = np.asarray(jax.jit(
        lambda v: dp.cn_residual(v, u, F, 1e-5, geom, cfg))(x))
    rdf = dp.make_cn_residual_df(u, F, geom, cfg)
    got = np.asarray(jax.jit(lambda v: rdf(v, 1e-5))(x))
    # absolute gate: the Newton f_tol for this workload is 1e-7 maxnorm
    assert np.abs(got - want).max() < 1e-10


def test_df64_step_convergence_parity():
    fixture = fx.load(FIXTURE)
    cfg = fx.config_for(fixture)
    u = jnp.array(fixture.u)
    q = jnp.array(fixture.q)
    step64 = dp.make_step(cfg, dt=1e-5, dtmesh=3e-9, pma_loops=5,
                          jvp_dtype="float32")
    stepdf = dp.make_step(cfg, dt=1e-5, dtmesh=3e-9, pma_loops=5,
                          jvp_dtype="float32", residual_mode="df64")
    o64 = jax.jit(lambda a, b: step64(a, b, 1e-5))(u, q)
    odf = jax.jit(lambda a, b: stepdf(a, b, 1e-5))(u, q)
    assert bool(o64.converged) and bool(odf.converged)
    assert int(o64.newton_iters) == int(odf.newton_iters)
    # both paths converge below f_tol=1e-7; the iterates may differ by the
    # (well-sub-tolerance) inexact-Newton stopping slack
    assert float(jnp.abs(odf.u - o64.u).max()) < 2e-8
