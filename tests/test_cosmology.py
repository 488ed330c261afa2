"""Cosmology tests (ref: test_cosmotools.py)."""

import numpy as np
import pytest

from randomfield_tpu.models import cosmology as cosmo


def test_factory():
    assert cosmo.create_cosmology(None) is cosmo.Planck13
    assert cosmo.create_cosmology("planck15") is cosmo.Planck15
    c = cosmo.Cosmology(H0=70.0, Om0=0.3, name="custom")
    assert cosmo.create_cosmology(c) is c
    with pytest.raises(ValueError):
        cosmo.create_cosmology("not-a-cosmology")


def test_flatness_and_densities():
    c = cosmo.Planck13
    total = c.Om0 + c.Ode0 + c.Or0
    assert np.isclose(total, 1.0, atol=1e-12)
    assert 4e-5 < c.Ogamma0 < 7e-5
    assert np.isclose(c.efunc(0.0), 1.0, atol=1e-12)


def test_comoving_distance_low_z_limit():
    c = cosmo.Planck13
    z = 1e-3
    # D_c -> (c/H0) z as z -> 0
    assert np.isclose(c.comoving_distance(z), c.hubble_distance * z, rtol=1e-3)


def test_comoving_distance_monotone_and_inverse():
    c = cosmo.Planck13
    z = np.linspace(0, 10, 100)
    d = c.comoving_distance(z)
    assert np.all(np.diff(d) > 0)
    z_back = c.redshift_at_comoving_distance(d)
    np.testing.assert_allclose(z_back, z, atol=2e-4)


def test_comoving_distance_matter_dominated_value():
    # Einstein-de Sitter (Om=1, no radiation): Dc(z) = 2 c/H0 (1 - 1/sqrt(1+z))
    eds = cosmo.Cosmology(H0=70.0, Om0=1.0, Ob0=0.05, Tcmb0=0.0, Neff=0.0, name="EdS")
    z = np.array([0.5, 1.0, 3.0])
    expected = 2 * eds.hubble_distance * (1 - 1 / np.sqrt(1 + z))
    np.testing.assert_allclose(eds.comoving_distance(z), expected, rtol=1e-4)


def test_growth_normalization_and_monotonicity():
    c = cosmo.Planck13
    z = np.linspace(0, 20, 50)
    d = c.growth_function(z)
    assert np.isclose(d[0], 1.0, atol=1e-8)
    assert np.all(np.diff(d) < 0)  # growth decreases with redshift


def test_growth_matter_domination_limit():
    # At high z (matter domination), D(z) ~ 1/(1+z) up to normalization
    c = cosmo.Planck13
    z = np.array([5.0, 10.0, 20.0])
    d = c.growth_function(z)
    ratio = d * (1 + z)
    # ratios should be nearly constant (few-tenths-% level)
    assert np.max(ratio) / np.min(ratio) < 1.005


def test_growth_eds_exact():
    eds = cosmo.Cosmology(H0=70.0, Om0=1.0, Ob0=0.05, Tcmb0=0.0, Neff=0.0, name="EdS")
    z = np.array([0.0, 1.0, 4.0, 9.0])
    np.testing.assert_allclose(eds.growth_function(z), 1 / (1 + z), rtol=1e-4)


def test_get_redshifts_planes():
    zs = cosmo.get_redshifts("Planck13", nz=64, spacing=25.0)
    assert zs[0] == 0.0
    assert np.all(np.diff(zs) > 0)
    # plane 1 is at 25 Mpc/h = 36.9 Mpc => z ~ d H0 / c
    expected_z1 = 25.0 / cosmo.Planck13.h / cosmo.Planck13.hubble_distance
    # first-order relation only: allow the O(z^2) deceleration correction
    assert np.isclose(zs[1], expected_z1, rtol=5e-3)


def test_get_redshifts_with_offset():
    zs = cosmo.get_redshifts("Planck13", nz=8, spacing=10.0, z0=0.5)
    assert np.isclose(zs[0], 0.5, atol=1e-6)
    assert np.all(np.diff(zs) > 0)


def test_get_growth_function_api():
    zs = cosmo.get_redshifts("Planck13", nz=16, spacing=50.0)
    d = cosmo.get_growth_function("Planck13", zs)
    assert d.shape == (16,)
    assert np.isclose(d[0], 1.0, atol=1e-8)


def test_mean_matter_density():
    c = cosmo.Planck13
    # rho_crit0 = 2.775e11 h^2 Msun/Mpc^3; Planck13 h = 0.6777
    rho_c = c.critical_density0
    np.testing.assert_allclose(rho_c, 2.77536627e11 * 0.6777**2, rtol=1e-6)
    rho0 = c.mean_matter_density(0.0)
    np.testing.assert_allclose(rho0, c.Om0 * rho_c, rtol=1e-12)
    # physical density scales as (1+z)^3
    np.testing.assert_allclose(
        c.mean_matter_density(1.0) / rho0, 8.0, rtol=1e-12
    )
    # astropy Planck13 cross-check: rho_m(0) ~ 3.9e10 Msun/Mpc^3
    assert 3.5e10 < rho0 < 4.3e10
