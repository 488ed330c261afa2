"""FFTLog continuum Hankel transforms (ops/fftlog.py).

Gates: analytic transform pairs (Gaussian), direct quadrature for
ell=2, a P -> xi -> P round trip, Mellin-strip and grid validation,
and a cross-module check against the gridded predicted_correlation."""

import numpy as np
import pytest

from randomfield_tpu.ops import fftlog


def j2(x):
    return (3.0 / x**3 - 1.0 / x) * np.sin(x) - 3.0 * np.cos(x) / x**2


def test_gaussian_pair_ell0():
    # P(k) = exp(-k^2/2)  ->  xi(r) = (2 pi)^{-3/2} exp(-r^2/2)
    k = fftlog.log_grid(1e-4, 1e2, 2048)
    pk = np.exp(-(k**2) / 2)
    r, g = fftlog.fftlog_bessel(k, k**3 * pk / (2 * np.pi**2), ell=0, q=1.5)
    expect = (2 * np.pi) ** -1.5 * np.exp(-(r**2) / 2)
    m = (r > 1e-2) & (r < 6)
    assert np.max(np.abs(g[m] - expect[m])) < 3e-4 * expect.max()


def test_ell2_matches_quadrature():
    # no simple closed form: pin against direct trapezoid quadrature
    k = fftlog.log_grid(1e-4, 1e2, 2048)
    fk = k**3 * (k**2 * np.exp(-(k**2) / 2)) / (2 * np.pi**2)
    r, g = fftlog.fftlog_bessel(k, fk, ell=2, q=1.0)
    kq = np.linspace(1e-6, 40, 200001)
    sel = np.where((r > 0.5) & (r < 5))[0][::100]
    for i in sel:
        direct = np.trapezoid(
            kq**4 * np.exp(-(kq**2) / 2) * j2(kq * r[i]), kq
        ) / (2 * np.pi**2)
        assert abs(g[i] - direct) <= 1e-8 * abs(direct) + 1e-12


def test_power_xi_roundtrip():
    r = fftlog.log_grid(1e-3, 30.0, 2048)
    xi = (2 * np.pi) ** -1.5 * np.exp(-(r**2) / 2)
    k, p = fftlog.power_from_xi(r, xi, ell=0)
    pexp = np.exp(-(k**2) / 2)
    m = (k > 1e-2) & (k < 5)
    assert m.sum() > 100
    assert np.max(np.abs(p[m] - pexp[m])) < 1e-4


def test_xi_from_power_table_extension():
    # finite table + power-law extension still nails the analytic pair
    k = fftlog.log_grid(1e-3, 10.0, 400)
    tab = np.stack([k, np.exp(-(k**2) / 2)], axis=1)
    r, xi = fftlog.xi_from_power(tab, ell=0)
    expect = (2 * np.pi) ** -1.5 * np.exp(-(r**2) / 2)
    m = (r > 0.2) & (r < 5)
    assert np.max(np.abs(xi[m] - expect[m])) < 5e-4 * expect.max()


def test_angular_gaussian_pair():
    # C(l) = exp(-l^2 s^2) -> w(th) = exp(-th^2/(4 s^2)) / (4 pi s^2)
    s = 0.01
    ell = fftlog.log_grid(1e-2, 1e5, 2048)
    cl = np.exp(-((ell * s) ** 2))
    th, w = fftlog.angular_correlation(ell, cl)
    wexp = np.exp(-(th**2) / (4 * s**2)) / (4 * np.pi * s**2)
    m = (th > 1e-3) & (th < 0.05)
    assert m.sum() > 50
    assert np.max(np.abs(w[m] - wexp[m])) < 5e-4 * wexp.max()


def test_validation():
    k = fftlog.log_grid(1e-2, 1e2, 64)
    fk = np.ones_like(k)
    with pytest.raises(ValueError, match="Mellin strip"):
        fftlog.fftlog_bessel(k, fk, ell=0, q=-1.5)
    with pytest.raises(ValueError, match="Mellin strip"):
        fftlog.fftlog_bessel_2d(k, fk, mu=0, q=1.6)
    with pytest.raises(ValueError, match="log-uniform"):
        fftlog.fftlog_bessel(np.linspace(1.0, 2.0, 64), fk, ell=0)
    with pytest.raises(ValueError, match="even"):
        fftlog.xi_from_power(np.stack([k, fk], 1), ell=1)
    with pytest.raises(ValueError, match="increasing"):
        fftlog.xi_from_power(np.stack([k[::-1], fk], 1))


def test_resample_loglog_powerlaw():
    # exact for pure power laws, including the extrapolated tails
    x = fftlog.log_grid(1.0, 100.0, 32)
    f = 5.0 * x**-1.7
    xn = fftlog.log_grid(0.1, 1000.0, 128)
    out = fftlog.resample_loglog(x, f, xn)
    np.testing.assert_allclose(out, 5.0 * xn**-1.7, rtol=1e-10)
    # taper drives the far tails toward zero
    out_t = fftlog.resample_loglog(x, f, xn, extrap_decades=0.5)
    assert out_t[0] < 1e-6 * (5.0 * xn[0] ** -1.7)


def test_fftlog_and_filon_quadrature_agree():
    # two INDEPENDENT continuum xi(r) paths — the FFTLog transform and
    # the hybrid trapezoid+Filon quadrature (ops/power.py) — must agree
    # through the BAO scale.  Regression gate for the pre-Filon
    # log-trapezoid, which silently lost 20% at r ~ 105 once the j0
    # oscillation outran the 8192-point sampling.
    from randomfield_tpu import load_default_power
    from randomfield_tpu.ops.power import (power_to_correlation,
                                           power_to_correlation_multipoles)

    power = load_default_power()
    r_test = np.array([2.0, 5.0, 20.0, 50.0, 105.0])
    xi_q = power_to_correlation(power, r_test)
    r_c, xi_c = fftlog.xi_from_power(power)
    xi_f = np.interp(r_test, r_c, xi_c)
    np.testing.assert_allclose(xi_f, xi_q, rtol=2e-3)
    # multipoles: f=0 quadrupole/hexadecapole vanish, monopole matches
    xis = power_to_correlation_multipoles(power, r_test, f=0.0)
    np.testing.assert_allclose(xis[0], xi_q, rtol=1e-10)
    assert np.all(xis[1] == 0) and np.all(xis[2] == 0)
    # Kaiser ell=2 via fftlog on the P_2 table equals the Filon path
    f = 0.7
    coeff2 = 4 * f / 3 + 4 * f**2 / 7
    tab2 = np.stack([np.asarray(power.k),
                     coeff2 * np.asarray(power.Pk)], 1)
    r2, xi2 = fftlog.xi_from_power(tab2, ell=2)
    xis_f = power_to_correlation_multipoles(power, r_test, f=f,
                                            ells=(2,))
    np.testing.assert_allclose(
        np.interp(r_test, r2, xi2), xis_f[0], rtol=5e-3,
        atol=1e-5 * np.max(np.abs(xis_f[0])))


def test_matches_gridded_prediction_default_power():
    # continuum xi(r) tracks the gridded estimator expectation in the
    # discreteness-free regime (r well above the cell, well inside the
    # box); the gridded one is the fidelity anchor
    from randomfield_tpu import load_default_power
    from randomfield_tpu.validate import stats

    power = load_default_power()
    n, spacing = 64, 4.0
    r_g, xi_g, cnt = stats.predicted_correlation(power, (n, n, n), spacing,
                                                 nbins=24)
    r_c, xi_c = fftlog.xi_from_power(power)
    good = (r_g > 4 * spacing) & (r_g < n * spacing / 5) & (cnt > 0)
    xi_i = np.interp(r_g[good], r_c, xi_c)
    scale = np.max(np.abs(xi_g[good]))
    assert np.max(np.abs(xi_i - xi_g[good])) < 0.12 * scale
