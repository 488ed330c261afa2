"""Gaussian streaming model gates.

Exact identities: the streaming integral against analytic ingredients
(Gaussian xi + constant dispersion -> closed-form LOS convolution;
Hubble-flow v12 -> exact LOS rescaling), the velocity correlation
quadratures against direct dense integration, machine-exact multipole
extraction, and the Fisher (1995) theorem that the model linearizes to
the Kaiser multipoles at first order in P.
"""

import numpy as np
import pytest

from randomfield_tpu.models import streaming as st
from randomfield_tpu.ops.power import load_default_power, validate_power


@pytest.fixture(scope="module")
def table():
    return validate_power(load_default_power())


# ----------------------------------------------------------------- #
# velocity correlation quadratures
# ----------------------------------------------------------------- #

def _direct_psi(k, p, r, f):
    """Dense-trapezoid Psi_par, Psi_perp at one r (independent arbiter)."""
    x = k * r
    j0 = np.sinc(x / np.pi)
    with np.errstate(invalid="ignore", divide="ignore"):
        j1 = np.where(x > 1e-6, np.sin(x) / x**2 - np.cos(x) / x, x / 3.0)
        j2 = np.where(x > 1e-6, (3.0 / x**2 - 1.0) * j0 - 3.0 * np.cos(x) / x**2,
                      x**2 / 15.0)
    pref = f**2 / (6.0 * np.pi**2)
    par = pref * np.trapezoid(k * p * (j0 - 2.0 * j2), np.log(k))
    perp = pref * np.trapezoid(k * p * (j0 + j2), np.log(k))
    return par, perp


def test_velocity_correlations_match_direct_quadrature(table):
    from randomfield_tpu.ops.fftlog import _prep_power

    f = 0.73
    rs = np.array([5.0, 20.0, 60.0, 110.0])
    par, perp, sv2 = st.velocity_correlations(table, rs, f=f, n=4096)
    kg, pg = _prep_power(table, 200_000, 3.0)
    for i, r in enumerate(rs):
        dpar, dperp = _direct_psi(kg, pg, r, f)
        assert abs(par[i] - dpar) <= 2e-4 * sv2
        assert abs(perp[i] - dperp) <= 2e-4 * sv2
    # sigma_v^2 against the same dense grid
    sv2_direct = f**2 / (6.0 * np.pi**2) * np.trapezoid(kg * pg, np.log(kg))
    assert abs(sv2 - sv2_direct) <= 1e-6 * sv2_direct


def test_dispersion_limits(table):
    f = 0.52
    r = np.array([0.05, 2000.0])
    sp2, st2 = st.pairwise_dispersions(table, r, f=f, n=4096)
    _, _, sv2 = st.velocity_correlations(table, r, f=f, n=4096)
    # r -> 0: perfectly correlated pair members, zero pairwise dispersion
    assert sp2[0] <= 0.02 * sv2 and st2[0] <= 0.02 * sv2
    # r -> inf: independent members, 2 sigma_v^2 each component
    assert abs(sp2[1] - 2.0 * sv2) <= 0.01 * sv2
    assert abs(st2[1] - 2.0 * sv2) <= 0.01 * sv2
    assert np.all(sp2 >= 0.0) and np.all(st2 >= 0.0)


def test_v12_consistent_with_velocity_module(table):
    """Displacement-unit v12 x (aH/h) == validate.velocity's km/s v12."""
    from randomfield_tpu.validate.velocity import (
        _velocity_prefactor, continuum_pairwise_velocity)

    from randomfield_tpu.models.cosmology import create_cosmology

    z = 0.3
    c = cos = create_cosmology(None)  # explicit default cosmology
    ing = st.streaming_ingredients(table, cosmology=cos, z=z)
    f = float(c.growth_rate(z))
    d2 = float(c.growth_function(z)) ** 2
    r = np.array([10.0, 30.0, 80.0])
    k_t, p_t = table
    _, v12_kms = continuum_pairwise_velocity((k_t, d2 * p_t), r,
                                             cosmology=cos, z=z)
    pref_per_f = _velocity_prefactor(cos, z) / f   # aH/h [km/s per Mpc/h]
    got = ing.v12(r) * pref_per_f
    assert np.allclose(got, v12_kms, rtol=2e-3)


# ----------------------------------------------------------------- #
# exact streaming-integral gates (analytic ingredients)
# ----------------------------------------------------------------- #

def _gaussian_ing(amp, a, c, hubble=0.0):
    return st.StreamingIngredients(
        xi=lambda r: amp * np.exp(-0.5 * (r / a) ** 2),
        v12=lambda r: hubble * np.asarray(r, np.float64),
        sigma_par2=lambda r: np.full_like(np.asarray(r, np.float64), c * c),
        sigma_perp2=lambda r: np.full_like(np.asarray(r, np.float64), c * c),
        rmax=1e4)


def test_gaussian_convolution_exact():
    amp, a, c = 0.5, 8.0, 3.0
    ing = _gaussian_ing(amp, a, c)
    s = np.array([6.0, 15.0, 30.0])[:, None]
    mu = np.array([0.0, 0.3, 0.8, 1.0])[None, :]
    got = st.streaming_xi_smu(ing, s, mu, n_y=1601)
    s_par, s_perp = s * mu, s * np.sqrt(1.0 - mu**2)
    want = (amp * np.exp(-0.5 * (s_perp / a) ** 2)
            * a / np.sqrt(a * a + c * c)
            * np.exp(-0.5 * s_par**2 / (a * a + c * c)))
    assert np.max(np.abs(got - want)) < 1e-8


def test_hubble_flow_rescaling_exact():
    """v12(r) = H r makes mu_r v12 = H y: the streaming integral is an
    exact LOS rescaling, closed-form for a Gaussian xi."""
    amp, a, c, H = 0.5, 8.0, 3.0, 0.12
    ing = _gaussian_ing(amp, a, c, hubble=H)
    s = np.array([5.0, 12.0, 25.0, 40.0])[:, None]
    mu = np.array([0.0, 0.45, 0.9, 1.0])[None, :]
    got = st.streaming_xi_smu(ing, s, mu, n_y=2401)
    s_par, s_perp = s * mu, s * np.sqrt(1.0 - mu**2)
    at = a * (1.0 + H)
    one_plus = (1.0 + amp * np.exp(-0.5 * (s_perp / a) ** 2)
                * at / np.sqrt(at * at + c * c)
                * np.exp(-0.5 * s_par**2 / (at * at + c * c))) / (1.0 + H)
    assert np.max(np.abs(got - (one_plus - 1.0))) < 1e-8


def test_multipole_extraction_exact():
    """L0/L2/L4-built xi(s, mu) comes back with machine-exact multipoles."""
    s = np.array([10.0, 20.0])
    g = {0: np.array([1.5, -0.2]), 2: np.array([0.4, 0.1]),
         4: np.array([-0.3, 0.05])}

    def fn(ss, mm):
        out = 0.0
        for ell, amp in g.items():
            leg = np.polynomial.legendre.Legendre.basis(ell)(mm)
            out = out + np.interp(ss, s, amp) * leg
        return out

    got = st.multipoles_from_xi_smu(fn, s, ells=(0, 2, 4), n_mu=8)
    for ell in (0, 2, 4):
        assert np.allclose(got[ell], g[ell], rtol=0, atol=1e-12)


# ----------------------------------------------------------------- #
# Fisher (1995): the model linearizes to Kaiser
# ----------------------------------------------------------------- #

def test_kaiser_limit_first_order(table):
    f, bias = 0.52, 1.3
    s = np.array([40.0, 60.0, 80.0])
    k_t, p_t = table
    kais = st.kaiser_correlation_multipoles(table, s, f=f, bias=bias,
                                            ells=(0, 2))

    def gsm_over_eps(eps):
        ing = st.streaming_ingredients((k_t, eps * p_t), bias=bias, f=f)
        out = st.streaming_multipoles(ing, s, ells=(0, 2), n_mu=24,
                                      n_y=4001)
        return {ell: v / eps for ell, v in out.items()}

    # eps in the regime where the O(eps) second-order term dominates the
    # ~1e-4 quadrature/FFTLog floor (measured: quad error 6.7e-4 ->
    # 3.5e-4 -> 1.8e-4 over eps = 0.4 -> 0.2 -> 0.1, cleanly linear)
    g1 = gsm_over_eps(0.4)
    g2 = gsm_over_eps(0.1)
    for ell in (0, 2):
        scale = np.max(np.abs(kais[ell]))
        e1 = np.max(np.abs(g1[ell] - kais[ell]))
        e2 = np.max(np.abs(g2[ell] - kais[ell]))
        # converges to Kaiser linearly in eps (first-order exactness)
        assert e2 <= 0.30 * e1 + 3e-5
        assert e2 <= 0.05 * scale


def test_full_strength_sanity(table):
    """Physical check at realistic amplitude: on BAO scales the GSM
    monopole tracks Kaiser closely and the quadrupole keeps its sign."""
    f = 0.52
    s = np.array([50.0, 70.0, 90.0])
    kais = st.kaiser_correlation_multipoles(table, s, f=f, ells=(0, 2))
    got = st.streaming_multipoles(table, s, f=f, ells=(0, 2), n_mu=24)
    assert np.allclose(got[0], kais[0], rtol=0.12, atol=2e-5)
    assert np.all(np.sign(got[2]) == np.sign(kais[2]))


def test_sigma_fog_and_validation(table):
    ing0 = st.streaming_ingredients(table, f=0.5)
    ing = st.streaming_ingredients(table, f=0.5, sigma_fog=3.0)
    r = np.array([10.0, 50.0])
    assert np.allclose(ing.sigma_par2(r), ing0.sigma_par2(r) + 9.0)
    assert np.allclose(ing.sigma_perp2(r), ing0.sigma_perp2(r) + 9.0)
    with pytest.raises(ValueError):
        st.streaming_xi_smu(ing, -5.0, 0.5)
    with pytest.raises(ValueError):
        st.streaming_xi_smu(ing, 5.0, 1.5)
    with pytest.raises(ValueError):
        st.streaming_ingredients(table, z=0.5, cosmology=None, f=0.5)
    with pytest.raises(ValueError):
        st.kaiser_correlation_multipoles(table, np.array([20.0]), f=0.5,
                                         ells=(0, 1))
    with pytest.raises(ValueError):
        st.multipoles_from_xi_smu(lambda s, m: s * m, np.array([10.0]),
                                  ells=(1,))
