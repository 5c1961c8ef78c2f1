"""Physical validation of the Swift–Hohenberg solver: pattern formation.

Above onset (r > 0) the SH equation amplifies modes near |k| = 1 and
saturates into stripe/hexagon patterns — the spectral peak of the evolved
field must sit near wavenumber 1 and far from 0.  This is the scientific
check the reference does by eye with live plots (sh_scipy_nk.py:63-69).
"""
import numpy as np
import jax
import jax.numpy as jnp

from iterative_solvers_tpu.models.swift_hohenberg import (
    SHConfig, evolve_cn, evolve_semi_implicit,
)
from iterative_solvers_tpu.solvers.newton import NewtonKrylov


def _radial_spectrum_peak(u, d):
    """Wavenumber of the maximum of the radially binned power spectrum."""
    n = u.shape[0]
    f = np.fft.fftshift(np.abs(np.fft.fft2(np.asarray(u))) ** 2)
    k1 = np.fft.fftshift(np.fft.fftfreq(n, d / n)) * 2 * np.pi
    kx, ky = np.meshgrid(k1, k1)
    kr = np.sqrt(kx ** 2 + ky ** 2)
    bins = np.linspace(0, kr.max(), 40)
    power = np.array([
        f[(kr >= lo) & (kr < hi)].mean() if ((kr >= lo) & (kr < hi)).any() else 0.0
        for lo, hi in zip(bins[:-1], bins[1:])
    ])
    centers = 0.5 * (bins[:-1] + bins[1:])
    power[centers < 0.2] = 0.0  # exclude the mean mode
    return centers[np.argmax(power)]


def test_sh_cn_pattern_wavelength():
    cfg = SHConfig(d=20.0, n=32, k=0.5, r=0.2, g=0.0)
    u0 = jnp.array(
        0.1 * np.random.default_rng(2).standard_normal((cfg.n, cfg.n))
    )
    solver = NewtonKrylov(f_tol=1e-8, maxiter=40, inner_m=15, outer_k=5)
    u, iters, f_norms = jax.jit(
        lambda u: evolve_cn(u, 80, cfg, solver)
    )(u0)
    u_np = np.asarray(u)
    assert np.abs(u_np).max() > 0.2          # pattern grew from noise
    assert np.isfinite(u_np).all()
    k_peak = _radial_spectrum_peak(u, cfg.d)
    assert 0.6 < k_peak < 1.4, k_peak        # SH selects |k| ~ 1


def test_sh_semi_implicit_pattern():
    cfg = SHConfig(d=20.0, n=32, k=0.2, r=0.2, g=0.0)
    u0 = jnp.array(
        0.1 * np.random.default_rng(3).standard_normal((cfg.n, cfg.n))
    )
    u = jax.jit(lambda u: evolve_semi_implicit(u, 150, cfg))(u0)
    u_np = np.asarray(u)
    assert np.isfinite(u_np).all()
    assert np.abs(u_np).max() > 0.2
    k_peak = _radial_spectrum_peak(u, cfg.d)
    assert 0.6 < k_peak < 1.4, k_peak


def test_sh_amplitude_saturation():
    """The cubic term saturates growth: amplitude stays O(sqrt(r))."""
    cfg = SHConfig(d=20.0, n=32, k=0.5, r=0.2, g=0.0)
    u0 = jnp.array(
        0.1 * np.random.default_rng(4).standard_normal((cfg.n, cfg.n))
    )
    solver = NewtonKrylov(f_tol=1e-8, maxiter=40, inner_m=15, outer_k=5)
    u, _, _ = jax.jit(lambda u: evolve_cn(u, 120, cfg, solver))(u0)
    assert float(jnp.max(jnp.abs(u))) < 1.5   # bounded well below blowup
