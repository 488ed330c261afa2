"""Halo-model nonlinear P(k) (models/halomodel.py): NFW profile
invariants, matter-consistency limit, physical asymptotics."""

import numpy as np
import pytest

from randomfield_tpu.models.halomodel import (
    concentration,
    halo_model_power,
    nfw_profile_fourier,
)
from randomfield_tpu.ops import power as rf_power


def test_concentration_relation():
    # Duffy08 pivot and slopes
    assert concentration(2e12) == pytest.approx(10.14)
    c = concentration(np.array([1e12, 1e14, 1e16]))
    assert np.all(np.diff(c) < 0)  # massive halos are less concentrated
    assert concentration(2e12, z=1.0) == pytest.approx(
        10.14 * 2.0**-1.01, rel=1e-12
    )
    with pytest.raises(ValueError, match="concentration"):
        concentration(1e13, relation="bogus")


def test_nfw_fourier_mass_normalization_and_real_space():
    # u(k -> 0) = 1 exactly; u equals the direct FT of the truncated
    # NFW profile (numerical radial quadrature)
    m = np.array([1e13])
    u0 = nfw_profile_fourier(np.array([1e-8]), m)
    np.testing.assert_allclose(u0, 1.0, rtol=1e-10)

    from randomfield_tpu.models.cosmology import create_cosmology

    cosmo = create_cosmology("Planck13")
    rho_m = cosmo.Om0 * cosmo.critical_density0 / cosmo.h**2
    c = float(concentration(m[0]))
    r200 = (3 * m[0] / (4 * np.pi * 200.0 * rho_m)) ** (1 / 3)
    rs = r200 / c
    r = np.linspace(1e-5, r200, 200001)
    rho = 1.0 / ((r / rs) * (1 + r / rs) ** 2)  # unnormalized NFW
    mass_w = 4 * np.pi * r**2 * rho
    for k in (0.5, 2.0, 10.0):
        direct = np.trapezoid(mass_w * np.sinc(k * r / np.pi), r) \
            / np.trapezoid(mass_w, r)
        u = float(nfw_profile_fourier(np.array([k]), m)[0, 0])
        assert u == pytest.approx(direct, abs=2e-6)


def test_two_halo_matter_consistency():
    # PS pair integrates all mass with mean bias one, so with the
    # counter-term P_2h(k -> 0) = P_lin to integration accuracy
    p = rf_power.load_default_power()
    k, pt, p1, p2 = halo_model_power(p, fit="ps")
    plin = np.interp(np.log10(k[:4]), np.log10(np.asarray(p.k)),
                     np.asarray(p.Pk))
    np.testing.assert_allclose(p2[:4], plin, rtol=5e-3)
    # ST undershoots only by its own all-mass deficit (few percent)
    k, pt, p1, p2 = halo_model_power(p, fit="st")
    assert 0.93 < p2[0] / plin[0] < 1.02


def test_halo_model_asymptotics():
    p = rf_power.load_default_power()
    k, pt, p1, p2 = halo_model_power(p, fit="st")
    plin = np.interp(np.log10(k), np.log10(np.asarray(p.k)),
                     np.asarray(p.Pk))
    # 1-halo: flat shot-noise-like plateau at large scales ...
    assert abs(p1[1] / p1[0] - 1.0) < 1e-3
    # ... that falls off once k resolves the halos
    assert p1[-1] < 0.05 * p1[0]
    # nonlinear boost grows monotonically into the small scales
    ratio = pt / plin
    i = np.searchsorted(k, 0.5)
    assert ratio[i] > 1.2 and ratio[-1] > ratio[i] > ratio[0]
    # redshift: less nonlinear earlier
    k2, pt2, _, _ = halo_model_power(p, fit="st", z=1.0)
    assert np.interp(1.0, k2, pt2) < np.interp(1.0, k, pt)


def test_halo_model_mock_crosscheck():
    # the 2-halo term with the HaloGenerator's own bias reproduces the
    # large-scale amplitude of the mock's expected tracer spectrum
    from randomfield_tpu.models.halos import HaloGenerator

    hg = HaloGenerator(32, 32, 32, grid_spacing=8.0, mmin=1e13, mmax=1e14,
                       nbins_mass=1, fit="st")
    k_e, p_exp, cnt = hg.predicted_halo_power(0, nbins=10, shot_noise=False)
    p = rf_power.load_default_power()
    good = np.where(cnt > 0)[0][:2]  # largest scales
    plin = np.interp(np.log10(k_e[good]), np.log10(np.asarray(p.k)),
                     np.asarray(p.Pk))
    np.testing.assert_allclose(
        p_exp[good], hg.bias[0] ** 2 * plin, rtol=0.25
    )
