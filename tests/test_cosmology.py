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


# ---- generalized background: curvature + CPL dark energy -------------------


def test_growth_ode_matches_closed_form_on_flat_lcdm():
    c = cosmo.Planck13
    lna, d_closed = c._growth_table
    d_ode = c._growth_ode(lna)
    # both unnormalized with the same D ~ a seed; compare normalized
    ratio = (d_ode / d_ode[-1]) / (d_closed / d_closed[-1])
    assert np.max(np.abs(ratio[lna > np.log(1e-3)] - 1.0)) < 1e-4


def test_eds_growth_is_scale_factor():
    # Om0 = 1, Ode0 = 0: D proportional to a exactly; w0 != -1 forces the
    # ODE path (the DE term has zero density, so the physics is pure EdS)
    c = cosmo.Cosmology(Om0=1.0, Ob0=0.05, w0=-0.9, name="eds")
    assert not c._is_flat_lcdm
    z = np.array([0.0, 0.5, 1.0, 3.0, 9.0])
    d = c.growth_function(z)
    assert np.allclose(d * (1.0 + z), 1.0, atol=2e-3)


def test_wcdm_growth_direction():
    # w0 > -1: dark energy denser in the past, growth suppressed earlier,
    # so D(z=1)/D(0) sits ABOVE the LCDM value
    lcdm = cosmo.Planck13
    wcdm = cosmo.Cosmology(w0=-0.8, name="wcdm")
    assert float(wcdm.growth_function(1.0)) > float(lcdm.growth_function(1.0))
    # and wa pulls it further in the same direction for w(a) > -1 at high z
    w0wa = cosmo.Cosmology(w0=-0.9, wa=0.3, name="w0wa")
    assert float(w0wa.growth_function(1.0)) > float(
        cosmo.Cosmology(w0=-0.9, name="w0").growth_function(1.0)
    )


def test_curvature_budget_and_efunc():
    c = cosmo.Cosmology(Om0=0.25, Ok0=0.1, name="open")
    assert np.isclose(c.Om0 + c.Ok0 + c.Or0 + c.Ode0, 1.0, atol=1e-12)
    assert np.isclose(c.efunc(0.0), 1.0, atol=1e-12)
    # open universes expand faster at modest z than flat same-Om
    f = cosmo.Cosmology(Om0=0.25, name="flat")
    assert c.efunc(1.0) > 0.9 * f.efunc(1.0)


def test_transverse_comoving_distance_curvature():
    z = 2.0
    flat = cosmo.Planck13
    assert np.isclose(
        flat.transverse_comoving_distance(z), flat.comoving_distance(z)
    )
    opn = cosmo.Cosmology(Om0=0.25, Ok0=0.1, name="open")
    cls = cosmo.Cosmology(Om0=0.35, Ok0=-0.1, name="closed")
    assert opn.transverse_comoving_distance(z) > opn.comoving_distance(z)
    assert cls.transverse_comoving_distance(z) < cls.comoving_distance(z)


def test_factory_accepts_dict_overrides():
    c = cosmo.create_cosmology({"H0": 70.0, "Om0": 0.3, "w0": -0.9})
    assert c.H0 == 70.0 and c.w0 == -0.9 and c.name == "custom"
    # hashable (jit-static Scene embeds it)
    hash(c)


def test_generalized_cosmology_through_generator():
    # end-to-end: a w0waCDM open scene renders and its lightcone weights
    # are finite, decreasing with plane redshift
    from randomfield_tpu import Generator

    g = Generator(
        8, 8, 8, grid_spacing=32.0,
        cosmology={"Om0": 0.29, "Ok0": 0.02, "w0": -0.95, "wa": 0.1},
    )
    d = np.asarray(g.generate_delta_field(seed=1))
    assert np.all(np.isfinite(d))
    w = np.asarray(g.growth_function)
    assert w[0] == pytest.approx(1.0, abs=1e-6) or w[0] <= 1.0
    assert np.all(np.diff(w) <= 0)
