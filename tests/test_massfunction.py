"""Halo mass functions: exact invariants and physical behavior."""

import math

import numpy as np
import pytest

import randomfield_tpu as rf
from randomfield_tpu.models import massfunction as mf
from randomfield_tpu.ops import power as _power


def _default_power():
    return rf.load_default_power()


def test_sigma_m_anchors_to_sigma8():
    """M(R_L = 8 Mpc/h) has sigma(M) == sigma8 exactly (same integral)."""
    p = _default_power()
    rho = mf._rho_m_comoving("Planck13")
    m8 = 4.0 * np.pi / 3.0 * rho * 8.0**3
    np.testing.assert_allclose(
        mf.sigma_m(p, m8)[0], _power.sigma8(p), rtol=1e-10
    )
    np.testing.assert_allclose(mf.lagrangian_radius(m8), 8.0, rtol=1e-12)
    # sigma falls monotonically with mass
    s = mf.sigma_m(p, np.logspace(10, 15, 12))
    assert np.all(np.diff(s) < 0)


def test_press_schechter_mass_conservation():
    """The finite-range PS identity: integral of (M/rho) dn/dM dlnM
    over [M1, M2] equals erf(nu2/sqrt2) - erf(nu1/sqrt2) computed from
    the SAME sigma(M) — the factor-2 normalization plus the
    finite-difference log-derivative, checked end to end."""
    p = _default_power()
    rho = mf._rho_m_comoving("Planck13")
    lnm = np.linspace(np.log(1e9), np.log(3e15), 400)
    m = np.exp(lnm)
    s, dn = mf.mass_function(p, m, fit="ps")
    lhs = np.trapezoid(m * dn / rho, lnm)
    nu = mf.DELTA_C / s
    rhs = math.erf(nu[-1] / np.sqrt(2)) - math.erf(nu[0] / np.sqrt(2))
    np.testing.assert_allclose(lhs, rhs, rtol=2e-3)


def test_fits_behavior():
    """ST exceeds PS in the high-mass exponential tail (ellipsoidal
    collapse), all fits agree within a factor ~2 near M* (sigma =
    delta_c), and Tinker08 is positive and decreasing at cluster
    masses."""
    p = _default_power()
    m = np.logspace(12, 15.5, 30)
    s, dn_ps = mf.mass_function(p, m, fit="ps")
    _, dn_st = mf.mass_function(p, m, fit="st")
    _, dn_tk = mf.mass_function(p, m, fit="tinker08")
    assert np.all(dn_ps > 0) and np.all(dn_st > 0) and np.all(dn_tk > 0)
    # ST crosses above PS around nu ~ 2 (ellipsoidal collapse boosts
    # only the rarest peaks; below that it SUPPRESSES abundance)
    hi = s < 0.45 * mf.DELTA_C
    assert np.all(dn_st[hi] > dn_ps[hi])
    lo = s > 1.5 * mf.DELTA_C
    assert np.all(dn_st[lo] < dn_ps[lo])
    istar = int(np.argmin(np.abs(s - mf.DELTA_C)))
    for dn in (dn_st, dn_tk):
        assert 0.5 < dn[istar] / dn_ps[istar] < 2.0
    assert np.all(np.diff(dn_tk[hi]) < 0)


def test_growth_scaling_and_redshift():
    """sigma(M, z) = D(z) sigma(M, 0), so high-mass abundance collapses
    with redshift much faster than D^2."""
    p = _default_power()
    c = rf.create_cosmology("Planck13")
    m = np.array([1e15])
    s0 = mf.sigma_m(p, m, c, z=0.0)[0]
    s1 = mf.sigma_m(p, m, c, z=1.0)[0]
    np.testing.assert_allclose(s1 / s0, c.growth_function(1.0), rtol=1e-8)
    _, dn0 = mf.mass_function(p, m, c, z=0.0, fit="ps")
    _, dn1 = mf.mass_function(p, m, c, z=1.0, fit="ps")
    d = float(c.growth_function(1.0))
    assert dn1[0] < dn0[0] * d**2


def test_validation_errors():
    p = _default_power()
    with pytest.raises(ValueError):
        mf.mass_function(p, [1e12], fit="bogus")
    with pytest.raises(ValueError):
        mf.mass_function(p, [-1.0])
