"""Halofit (Takahashi 2012) gates.

Exact anchors: for a pure power law P = A k^n the Gaussian-filtered
variance is analytic,

    sigma^2(R) = A / (4 pi^2) * Gamma((3+n)/2) * R^-(3+n),

so the nonlinear scale k_sigma, the effective slope n_eff = n and the
curvature C = 0 are known in closed form.  Limit gates: P_NL -> P_lin
as k -> 0, nonlinear enhancement at k >> k_sigma, and the z-evolution
of k_sigma.
"""

import math

import numpy as np
import pytest

from randomfield_tpu.models.cosmology import create_cosmology
from randomfield_tpu.models.halofit import halofit_power, halofit_terms
from randomfield_tpu.ops.power import load_default_power, validate_power


def _power_law(amp, n, kmin=1e-3, kmax=1e2, npts=512):
    k = np.geomspace(kmin, kmax, npts)
    return k, amp * k**n


def test_power_law_nonlinear_scale_exact():
    # n = -2: sigma^2(R) = A sqrt(pi) / (4 pi^2 R); choose A so R_sigma = 3.
    r_sigma = 3.0
    amp = r_sigma * 4.0 * math.pi**2 / math.sqrt(math.pi)
    res = halofit_terms(_power_law(amp, -2.0))
    assert res.k_sigma == pytest.approx(1.0 / r_sigma, rel=2e-4)
    assert res.n_eff == pytest.approx(-2.0, abs=2e-4)
    assert res.curvature == pytest.approx(0.0, abs=2e-3)


def test_power_law_n_eff_exact_other_slope():
    # n = -1.5: sigma^2(R) = A Gamma(0.75) / (4 pi^2) R^-1.5.
    amp = 7.0
    r_sigma = (amp * math.gamma(0.75) / (4.0 * math.pi**2)) ** (1.0 / 1.5)
    res = halofit_terms(_power_law(amp, -1.5))
    assert res.k_sigma == pytest.approx(1.0 / r_sigma, rel=2e-4)
    assert res.n_eff == pytest.approx(-1.5, abs=2e-4)
    assert res.curvature == pytest.approx(0.0, abs=2e-3)


def test_low_k_limit_is_linear():
    # The quasi-linear exp(-y/4 - y^2/8) damping decays only linearly in
    # k, so the residual at k is ~ k / (4 k_sigma) ~ 7e-4 at k=1e-3.
    res = halofit_terms(load_default_power(), k=np.array([1e-3, 3e-3]))
    np.testing.assert_allclose(res.p_nl, res.p_lin, rtol=5e-3)
    expected_damping = np.exp(-res.k / (4.0 * res.k_sigma))
    np.testing.assert_allclose(res.p_nl / res.p_lin, expected_damping,
                               rtol=5e-4)


def test_terms_sum_and_enhancement():
    res = halofit_terms(load_default_power())
    np.testing.assert_allclose(res.p_nl, res.p_q + res.p_h, rtol=1e-12)
    # Planck-like z=0 spectrum: k_sigma ~ 0.2-0.5 h/Mpc; Delta^2_NL at
    # k=1 is ~20 (ratio ~6) and the k=2 boost lands ~8-25x (one-halo
    # regime), the Takahashi-class magnitudes.
    assert 0.1 < res.k_sigma < 1.0
    ratio1 = np.interp(1.0, res.k, res.p_nl / res.p_lin)
    ratio2 = np.interp(2.0, res.k, res.p_nl / res.p_lin)
    assert 3.0 < ratio1 < 10.0
    assert 8.0 < ratio2 < 25.0
    assert np.all(res.p_h >= 0) and np.all(res.p_q >= 0)


def test_redshift_evolution():
    cosmo = create_cosmology()
    p = load_default_power()
    r0 = halofit_terms(p, z=0.0, cosmology=cosmo)
    r2 = halofit_terms(p, z=2.0, cosmology=cosmo)
    # Higher z: more linear -> nonlinear scale moves to higher k and the
    # boost at fixed k shrinks; the linear input scales by D(z)^2.
    assert r2.k_sigma > 2.0 * r0.k_sigma
    boost0 = np.interp(1.0, r0.k, r0.p_nl / r0.p_lin)
    boost2 = np.interp(1.0, r2.k, r2.p_nl / r2.p_lin)
    assert boost2 < boost0
    d2 = float(cosmo.growth_function(2.0)) ** 2
    np.testing.assert_allclose(r2.p_lin, r0.p_lin * d2, rtol=1e-10)


def test_halofit_power_table_roundtrip():
    table = halofit_power(load_default_power())
    k, pk = validate_power(table)  # positive, increasing, finite
    assert k.size > 10 and np.all(pk > 0)


def test_z_without_cosmology_raises():
    with pytest.raises(ValueError):
        halofit_terms(load_default_power(), z=1.0)


# ---------------------------------------------------------------- P(k, z)


def test_power_of_z_matches_terms_at_nodes():
    from randomfield_tpu.models.halofit import halofit_power_of_z

    cosmo = create_cosmology()
    p = load_default_power()
    kq = np.array([0.01, 0.1, 0.5, 2.0])
    kcol = np.geomspace(1e-3, 10.0, 128)
    p_of = halofit_power_of_z(p, cosmo, z_max=4.0, nz=17, k=kcol)
    sel = np.searchsorted(kcol, kq)  # nearest table nodes: exact there
    for z in [0.0, 1.0, 4.0]:  # exact (z, k) nodes of the table
        direct = halofit_terms(p, k=kcol[sel], z=z, cosmology=cosmo).p_nl
        np.testing.assert_allclose(p_of(kcol[sel], z), direct, rtol=1e-10)


def test_power_of_z_interpolation_accuracy_between_nodes():
    from randomfield_tpu.models.halofit import halofit_power_of_z

    cosmo = create_cosmology()
    p = load_default_power()
    p_of = halofit_power_of_z(p, cosmo, z_max=4.0, nz=33)
    kq = np.geomspace(0.01, 2.0, 12)
    for z in [0.31, 1.77]:  # off-node
        direct = halofit_terms(p, k=kq, z=z, cosmology=cosmo).p_nl
        np.testing.assert_allclose(p_of(kq, z), direct, rtol=1e-2)


def test_nonlinear_limber_lensing():
    from randomfield_tpu.models import limber as ml
    from randomfield_tpu.models.halofit import halofit_power_of_z

    cosmo = create_cosmology()
    p = load_default_power()
    kern, rng = ml.source_plane_kernel(cosmo, 1.0)
    ells = np.array([10.0, 100.0, 2000.0])
    c_lin = ml.limber_cl(ells, p, cosmo, kernel1=kern, chi_range=rng,
                         nchi=512)
    p_of = halofit_power_of_z(p, cosmo, z_max=1.05, nz=22)
    c_nl = ml.limber_cl(ells, p, cosmo, kernel1=kern, chi_range=rng,
                        nchi=512, power_of_z=p_of)
    # Low ell probes linear scales -> agree; high ell picks up the
    # one-halo boost.
    assert abs(c_nl[0] / c_lin[0] - 1.0) < 0.05
    assert c_nl[2] > 2.0 * c_lin[2]
    assert np.all(np.diff(c_nl / c_lin) > 0)  # boost grows with ell


def test_named_halofit_power_renders():
    # Generator(power='halofit') resolves to the Takahashi spectrum of
    # the scene cosmology and renders with a nonlinear variance boost.
    from randomfield_tpu import Generator

    g_lin = Generator(16, 16, 16, grid_spacing=8.0, power="eh98")
    g_nl = Generator(16, 16, 16, grid_spacing=8.0, power="halofit")
    v_lin = float(g_lin.predicted_variance())
    v_nl = float(g_nl.predicted_variance())
    assert v_nl > 1.05 * v_lin
    d = np.asarray(g_nl.generate_delta_field(0, apply_lightcone=False))
    assert np.isfinite(d).all()
    assert abs(d.var() / v_nl - 1.0) < 0.3  # single-seed sample scatter
