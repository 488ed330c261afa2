"""Limber C_ell gates: analytic power-law quadrature, kernel consistency
with the discrete lensing weights, growth wiring, and analytic shear
xi_plus/minus targets."""

import math

import numpy as np
import pytest

from randomfield_tpu.models import limber as ml
from randomfield_tpu.models.cosmology import create_cosmology
from randomfield_tpu.models.lensing import lensing_efficiency
from randomfield_tpu.ops.power import PowerTable


def test_power_law_analytic():
    # W = 1 on [chi1, chi2], P = A k^n (loglog exact), evolve off:
    # C_ell = A (ell+1/2)^n Integral chi^(-n-2) dchi  (flat, f_K = chi)
    cosmo = create_cosmology("Planck13")
    A, n = 250.0, -1.5
    chi1, chi2 = 800.0, 2000.0
    ells = np.array([10.0, 30.0, 100.0, 300.0, 900.0])
    k = np.logspace(np.log10(0.5 * (ells[0] + 0.5) / chi2),
                    np.log10(2.0 * (ells[-1] + 0.5) / chi1), 256)
    table = PowerTable(k, A * k**n)
    kern = lambda chi: np.ones_like(chi)
    cl = ml.limber_cl(ells, table, cosmo, kernel1=kern,
                      chi_range=(chi1, chi2), nchi=4096, evolve=False,
                      interpolation="loglog")
    a = -n - 2
    integral = (chi2 ** (a + 1) - chi1 ** (a + 1)) / (a + 1)
    expect = A * (ells + 0.5) ** n * integral
    np.testing.assert_allclose(cl, expect, rtol=2e-4)


def test_source_plane_kernel_matches_lensing_efficiency():
    # the continuum kernel evaluated at the box's plane distances must
    # equal the discrete lensing_efficiency weights / dchi — the same
    # physics through two independent code paths.
    cosmo = create_cosmology("Planck13")
    nz, spacing, z0, z_source = 48, 25.0, 0.05, 0.9
    w = lensing_efficiency(cosmo, nz, spacing, z_source, z0=z0)
    kern, (lo, hi) = ml.source_plane_kernel(cosmo, z_source)
    chi0_h = float(cosmo.comoving_distance(z0)) * cosmo.h
    chi_h = chi0_h + spacing * np.arange(nz)
    w_cont = kern(chi_h) * spacing
    inside = (chi_h > lo) & (chi_h < hi)
    np.testing.assert_allclose(w_cont[inside], w[inside], rtol=2e-5)
    assert np.all(w_cont[~inside] == 0.0)
    assert np.all(w[~inside] == 0.0)


def test_growth_evolution_delta_kernel():
    # a kernel concentrated at chi* must scale C_ell by exactly
    # (D(z*)/D(0))^2 when evolve is on.
    cosmo = create_cosmology("Planck13")
    chi_star = 1500.0
    half = 1.0
    kern = lambda chi: np.where(np.abs(chi - chi_star) <= half, 1.0, 0.0)
    k = np.logspace(-4, 1, 128)
    table = PowerTable(k, 1e4 * k**-1.2)
    ells = np.array([50.0, 200.0])
    kw = dict(kernel1=kern, chi_range=(chi_star - half, chi_star + half),
              nchi=64, interpolation="loglog")
    c_on = ml.limber_cl(ells, table, cosmo, evolve=True, **kw)
    c_off = ml.limber_cl(ells, table, cosmo, evolve=False, **kw)
    z_star = cosmo.redshift_at_comoving_distance(chi_star / cosmo.h)
    d = cosmo.growth_function(z_star)
    np.testing.assert_allclose(c_on / c_off, d * d, rtol=1e-4)


def test_nz_lensing_reduces_to_source_plane():
    cosmo = create_cosmology("Planck13")
    z_s = 1.0
    zg = np.linspace(z_s - 0.004, z_s + 0.004, 41)
    ng = np.exp(-0.5 * ((zg - z_s) / 0.001) ** 2)
    k_nz, _ = ml.nz_lensing_kernel(cosmo, (zg, ng), nsamp=512)
    k_sp, (_, chi_s) = ml.source_plane_kernel(cosmo, z_s)
    chi = np.linspace(100.0, chi_s * 0.95, 25)
    np.testing.assert_allclose(k_nz(chi), k_sp(chi), rtol=2e-3)


def test_galaxy_kernel_normalization_and_bias():
    cosmo = create_cosmology("Planck13")
    zg = np.linspace(0.2, 1.2, 101)
    ng = np.exp(-0.5 * ((zg - 0.7) / 0.15) ** 2) * 7.0  # arbitrary norm
    kern, (lo, hi) = ml.galaxy_kernel(cosmo, (zg, ng), bias=1.7)
    chi = np.linspace(lo, hi, 20001)
    total = np.trapezoid(kern(chi), chi)
    np.testing.assert_allclose(total, 1.7, rtol=1e-3)
    # callable bias: b(z) = 1 + z at the kernel's chi positions
    kern_bz, _ = ml.galaxy_kernel(cosmo, (zg, ng), bias=lambda z: 1.0 + z)
    chi_mid = np.array([0.5 * (lo + hi)])
    z_mid = cosmo.redshift_at_comoving_distance(chi_mid / cosmo.h)
    base, _ = ml.galaxy_kernel(cosmo, (zg, ng), bias=1.0)
    np.testing.assert_allclose(kern_bz(chi_mid),
                               base(chi_mid) * (1.0 + z_mid), rtol=1e-12)


def test_shear_correlation_power_law_analytic():
    # C_ell = A ell^s  =>  xi_pm(theta) = A/(2 pi) theta^(-s-2)
    #   * 2^(s+1) Gamma((mu+s+2)/2) / Gamma((mu-s)/2),  mu = 0 / 4
    A, s = 3.0e-7, -1.2
    ells = np.logspace(-2, 7, 128)
    cl = A * ells**s
    th, xp, xm = ml.shear_correlation(ells, cl, n=4096, pad_decades=3.0)
    keep = (th > 3e-4) & (th < 3e-2)
    th = th[keep]

    def target(mu):
        g = (2.0 ** (s + 1) * math.gamma((mu + s + 2) / 2.0)
             / math.gamma((mu - s) / 2.0))
        return A / (2.0 * np.pi) * th ** (-s - 2) * g

    np.testing.assert_allclose(xp[keep], target(0), rtol=5e-3)
    np.testing.assert_allclose(xm[keep], target(4), rtol=5e-3)
    # xi_minus < xi_plus everywhere for a falling spectrum
    assert np.all(xm[keep] < xp[keep])


def test_limber_gg_cross_consistency():
    # C^{g kappa}^2 <= C^gg C^{kappa kappa} (Cauchy-Schwarz, same field)
    cosmo = create_cosmology("Planck13")
    zg = np.linspace(0.3, 0.9, 61)
    ng = np.exp(-0.5 * ((zg - 0.6) / 0.1) ** 2)
    kg, (glo, ghi) = ml.galaxy_kernel(cosmo, (zg, ng), bias=1.5)
    kk, (klo, khi) = ml.source_plane_kernel(cosmo, 1.2)
    k = np.logspace(-4, 1.7, 256)
    table = PowerTable(k, 2e4 * k / (1.0 + (k / 0.02) ** 2.9))
    ells = np.array([30.0, 100.0, 300.0])
    rng_g = (glo, ghi)
    rng_x = (max(glo, klo), min(ghi, khi))
    rng_k = (1.0, khi)
    cgg = ml.limber_cl(ells, table, cosmo, kernel1=kg, chi_range=rng_g)
    ckk = ml.limber_cl(ells, table, cosmo, kernel1=kk, chi_range=rng_k)
    cgk = ml.limber_cl(ells, table, cosmo, kernel1=kg, kernel2=kk,
                       chi_range=rng_x)
    assert np.all(cgg > 0) and np.all(ckk > 0) and np.all(cgk > 0)
    assert np.all(cgk**2 <= cgg * ckk * (1 + 1e-12))


def test_isw_galaxy_cl():
    zg = np.linspace(0.2, 1.4, 121)
    ng = np.exp(-0.5 * ((zg - 0.7) / 0.2) ** 2)
    k = np.logspace(-4.5, 1.0, 256)
    table = PowerTable(k, 2e4 * k / (1.0 + (k / 0.02) ** 2.9))
    ells = np.array([10.0, 30.0, 100.0])

    # LCDM: decaying potentials => positive cross, falling with ell
    cl = ml.isw_galaxy_cl(ells, table, "Planck13", (zg, ng), bias=1.8)
    assert np.all(cl > 0)
    assert cl[0] > cl[1] > cl[2]
    # exact bias linearity and n(z)-normalization invariance
    cl2 = ml.isw_galaxy_cl(ells, table, "Planck13", (zg, ng), bias=3.6)
    np.testing.assert_allclose(cl2, 2.0 * cl, rtol=1e-12)
    cl3 = ml.isw_galaxy_cl(ells, table, "Planck13", (zg, 13.0 * ng),
                           bias=1.8)
    np.testing.assert_allclose(cl3, cl, rtol=1e-12)

    # Einstein-de Sitter null: f = 1 makes (1+z)D constant, so the ISW
    # source vanishes identically (up to the growth table's quadrature)
    eds = {"Om0": 1.0, "Tcmb0": 0.0, "H0": 70.0}
    cl_eds = ml.isw_galaxy_cl(ells, table, eds, (zg, ng), bias=1.8)
    assert np.all(np.abs(cl_eds) < 1e-4 * np.abs(cl))

    # independent derivative path: finite-difference d[(1+z)D]/dchi
    # through the public kernel pieces reproduces the analytic G'
    cosmo = create_cosmology("Planck13")
    kern_g, (lo, hi) = ml.galaxy_kernel(cosmo, (zg, ng), bias=1.8)
    chi = np.linspace(max(lo, 1e-6), hi, 1025)
    z = cosmo.redshift_at_comoving_distance(chi / cosmo.h)
    d = cosmo.growth_function(z)
    G = (1.0 + z) * d
    gprime_fd = np.gradient(G, chi)
    fk = ml._fk_h(cosmo, chi)
    from randomfield_tpu.ops.power import interpolate_power, validate_power
    tab = validate_power(table)
    cl_fd = []
    for ell in ells:
        kq = (ell + 0.5) / fk
        pk = np.asarray(interpolate_power(tab, kq.astype(np.float32)),
                        np.float64)
        integ = gprime_fd * kern_g(chi) * d * pk
        pref = (3.0 * cosmo.Om0 * (100.0 / 299792.458) ** 2
                / (ell + 0.5) ** 2)
        cl_fd.append(pref * np.trapezoid(integ, chi))
    np.testing.assert_allclose(cl, cl_fd, rtol=2e-3)


def test_input_validation():
    cosmo = create_cosmology("Planck13")
    with pytest.raises(ValueError):
        ml.galaxy_kernel(cosmo, (np.array([0.5, 0.4]), np.array([1.0, 1.0])))
    with pytest.raises(ValueError):
        ml.galaxy_kernel(cosmo, (np.array([0.1, 0.5]), np.array([0.0, 0.0])))
    with pytest.raises(ValueError):
        ml.source_plane_kernel(cosmo, 0.0)
    kern = lambda chi: np.ones_like(chi)
    k = np.logspace(-3, 0, 32)
    with pytest.raises(ValueError):
        ml.limber_cl([10.0], PowerTable(k, k), cosmo, kernel1=kern)
