"""Halo bias + halo mock catalogs (models/massfunction.py bias,
models/halos.py): exact peak-background-split constraints, abundance
and clustering statistical gates, catalog compaction invariants."""

import numpy as np
import pytest

from randomfield_tpu.models import massfunction as mf
from randomfield_tpu.models.halos import HaloGenerator, counts_to_catalog
from randomfield_tpu.ops import power as rf_power
from randomfield_tpu.validate import stats


def test_ps_bias_all_mass_constraints():
    # exact analytic invariants of the PS pair: Int f dln nu = 1 (all
    # mass in halos) and Int f b dln nu = 1 (matter unbiased)
    lnnu = np.linspace(np.log(1e-4), np.log(40.0), 400001)
    nu = np.exp(lnnu)
    f = mf.multiplicity(mf.DELTA_C / nu, fit="ps")
    b = mf.bias_nu(nu, fit="ps")
    assert np.trapezoid(f, lnnu) == pytest.approx(1.0, abs=2e-4)
    assert np.trapezoid(f * b, lnnu) == pytest.approx(1.0, abs=2e-4)
    # PBS derivation check: b_PS(nu=1) = 1 exactly
    assert mf.bias_nu(1.0, fit="ps") == pytest.approx(1.0)


def test_st_bias_is_pbs_of_st_multiplicity():
    # b_ST must equal 1 - (1/delta_c) dln f_ST / dln nu * ... the PBS
    # relation b = 1 + (a nu^2 - 1)/dc + 2p/(dc(1+(a nu^2)^p)) is
    # equivalent to b = 1 - (dln f/d delta_c); check via the explicit
    # derivative of f_ST wrt delta_c at fixed sigma
    nu = np.array([0.5, 1.0, 2.0, 4.0])
    sigma = mf.DELTA_C / nu
    eps = 1e-6

    def f_of_dc(dc):
        a_st, big_a, p = 0.707, 0.3222, 0.3
        v = dc / sigma
        anu2 = a_st * v * v
        return (big_a * np.sqrt(2 * a_st / np.pi) * v
                * (1 + anu2 ** (-p)) * np.exp(-anu2 / 2))

    dlnf = (np.log(f_of_dc(mf.DELTA_C + eps))
            - np.log(f_of_dc(mf.DELTA_C - eps))) / (2 * eps)
    expect = 1.0 - dlnf
    np.testing.assert_allclose(mf.bias_nu(nu, fit="st"), expect, rtol=1e-5)


def test_bias_monotonic_and_tinker_sane():
    power = rf_power.load_default_power()
    m = np.geomspace(1e12, 1e15, 16)
    for fit in ("ps", "st", "tinker10"):
        _, b = mf.halo_bias(power, m, fit=fit)
        assert np.all(np.diff(b) > 0)  # more massive -> more biased
    # high-mass halos are strongly biased, low-mass slightly anti-biased
    _, b_t = mf.halo_bias(power, np.array([1e12, 1e15]), fit="tinker10")
    assert b_t[0] < 1.0 < b_t[1]
    with pytest.raises(ValueError, match="bias fit"):
        mf.bias_nu(1.0, fit="bogus")


def test_halo_generator_setup_and_validation():
    hg = HaloGenerator(16, 16, 16, grid_spacing=8.0, mmin=1e13, mmax=1e15,
                       nbins_mass=3)
    assert np.all(np.diff(hg.bias) > 0)
    assert np.all(np.diff(hg.nbar) < 0)
    assert hg.mass_centers[0] > hg.mass_edges[0]
    np.testing.assert_allclose(
        hg.expected_counts(), hg.nbar * (16 * 8.0) ** 3, rtol=1e-12
    )
    with pytest.raises(ValueError, match="mmin"):
        HaloGenerator(16, 16, 16, grid_spacing=8.0, mmin=1e15, mmax=1e13)
    with pytest.raises(ValueError, match="fit"):
        HaloGenerator(16, 16, 16, grid_spacing=8.0, fit="bogus")


def test_halo_counts_deterministic_and_abundance():
    hg = HaloGenerator(32, 32, 32, grid_spacing=8.0, mmin=1e13, mmax=1e15,
                       nbins_mass=2, fit="st")
    c1 = np.asarray(hg.generate_halo_counts(seed=3))
    c2 = np.asarray(hg.generate_halo_counts(seed=3))
    np.testing.assert_array_equal(c1, c2)
    assert c1.dtype == np.int32 and c1.min() >= 0

    # ensemble-mean total count per bin matches nbar * V within noise
    nseeds = 6
    totals = np.stack([
        np.asarray(hg.generate_halo_counts(seed=s)).sum(axis=(1, 2, 3))
        for s in range(nseeds)
    ])
    expect = hg.expected_counts()
    mean = totals.mean(axis=0)
    # noise: Poisson + cosmic variance of the box mean; generous 5 sigma
    sig = totals.std(axis=0, ddof=1) / np.sqrt(nseeds)
    assert np.all(np.abs(mean - expect) < 5 * sig + 0.05 * expect)


def test_halo_power_matches_prediction():
    # one mass bin; measured count-overdensity P(k) ~ lognormal b^2
    # expectation + 1/nbar shot noise
    n, spacing, nseeds, nbins = 32, 8.0, 8, 10
    hg = HaloGenerator(n, n, n, grid_spacing=spacing, mmin=1e13, mmax=1e14,
                       nbins_mass=1, fit="st")
    nbar_cell = hg.nbar[0] * spacing**3
    acc = []
    for s in range(nseeds):
        counts = np.asarray(hg.generate_halo_counts(seed=s))[0]
        delta_h = counts.astype(np.float64) / nbar_cell - 1.0
        k, p, c = stats.calculate_power(delta_h.astype(np.float32), spacing,
                                        nbins=nbins)
        acc.append(p)
    p_hat = np.mean(acc, axis=0)
    k_e, p_exp, cnt = hg.predicted_halo_power(0, nbins=nbins)
    good = cnt > 8
    # per-bin sample noise ~ P * sqrt(2/(nseeds*modes))
    sig = p_exp * np.sqrt(2.0 / (nseeds * np.maximum(cnt, 1)))
    resid = np.abs(p_hat[good] - p_exp[good])
    assert np.all(resid < 5 * sig[good] + 0.1 * p_exp[good])
    # shot noise is a real part of the signal: the prediction without
    # it must be visibly worse at the noisiest (smallest) scales
    assert p_exp[good][-1] > 1.0 / hg.nbar[0] * 0.5


@pytest.mark.slow
def test_cross_bin_power_tracks_b1_b2():
    # two mass bins of the SAME seed: cross-power has no shot noise and
    # expectation b1 b2 P_LN
    n, spacing, nseeds, nbins = 32, 8.0, 8, 8
    hg = HaloGenerator(n, n, n, grid_spacing=spacing, mmin=1e13, mmax=5e14,
                       nbins_mass=2, fit="st")
    nb = hg.nbar * spacing**3
    acc = []
    for s in range(nseeds):
        counts = np.asarray(hg.generate_halo_counts(seed=s))
        d0 = (counts[0] / nb[0] - 1.0).astype(np.float32)
        d1 = (counts[1] / nb[1] - 1.0).astype(np.float32)
        k, p, c = stats.calculate_cross_power(d0, d1, spacing, nbins=nbins)
        acc.append(p)
    p_hat = np.mean(acc, axis=0)
    _, p_exp, cnt = hg.predicted_halo_power(0, bin_index2=1, nbins=nbins)
    good = cnt > 8
    # allowance from the EMPIRICAL per-seed scatter: the b ~ 2 tracer is
    # exp(2 g) — far too heavy-tailed for the Gaussian mode-count sigma
    # (which underestimates the estimator std several-fold and made this
    # gate stream-draw roulette), and shot noise in each auto channel
    # leaks into the cross estimator's variance too
    sem = np.std(acc, axis=0, ddof=1) / np.sqrt(nseeds)
    resid = np.abs(p_hat[good] - p_exp[good])
    assert np.all(resid < 5 * sem[good] + 0.05 * np.abs(p_exp[good])), (
        resid / (5 * sem[good] + 0.05 * np.abs(p_exp[good]))
    )


@pytest.mark.slow
def test_combined_catalog_power_matches_prediction():
    # pooled multi-bin catalog: expectation is the bin-pair lognormal
    # mixture (convex in b), measured with the catalog estimator
    from randomfield_tpu.models.zeldovich import catalog_power

    n, spacing, nseeds, nbins = 32, 8.0, 8, 8
    hg = HaloGenerator(n, n, n, grid_spacing=spacing, mmin=1e13, mmax=5e14,
                       nbins_mass=2, fit="st")
    acc = []
    for s in range(nseeds):
        pos, _ = hg.generate_halo_catalog(seed=s)
        k, p, c = catalog_power(pos.astype(np.float32).T, spacing,
                                shape=(n, n, n), nbins=nbins)
        acc.append(p)
    p_hat = np.mean(acc, axis=0)
    k_e, p_exp, cnt = hg.predicted_combined_power(nbins=nbins,
                                                  shot_noise=False)
    good = np.where(cnt > 8)[0][:5]  # window/alias-free scales
    sig = p_exp[good] * np.sqrt(2.0 / (nseeds * cnt[good]))
    resid = np.abs(p_hat[good] - p_exp[good])
    assert np.all(resid < 5 * sig + 0.15 * p_exp[good])
    # the naive effective-bias square UNDERestimates at the smallest
    # scale retained (convexity) — the mixture is the better model
    b_eff = (hg.nbar * hg.bias).sum() / hg.nbar.sum()
    _, p_naive, _ = hg.lognormal.predicted_biased_power(bias=b_eff,
                                                        nbins=nbins)
    assert p_exp[good][-1] > p_naive[good][-1]


def test_catalog_compaction_invariants():
    hg = HaloGenerator(24, 24, 24, grid_spacing=8.0, mmin=1e13, mmax=1e15,
                       nbins_mass=3, fit="st")
    counts = np.asarray(hg.generate_halo_counts(seed=7))
    pos, mass = hg.generate_halo_catalog(seed=7)
    assert pos.shape == (counts.sum(), 3)
    assert mass.shape == (counts.sum(),)
    box = 24 * 8.0
    assert pos.min() >= 0.0 and pos.max() <= box
    assert mass.min() >= hg.mass_edges[0] and mass.max() <= hg.mass_edges[-1]
    # compaction is deterministic given the seed
    pos2, mass2 = hg.generate_halo_catalog(seed=7)
    np.testing.assert_array_equal(pos, pos2)
    np.testing.assert_array_equal(mass, mass2)
    # per-bin mass containment + NGP painting recovers the count cube
    for i in range(3):
        lo, hi = hg.mass_edges[i], hg.mass_edges[i + 1]
        sel = (mass >= lo) & (mass <= hi)
        assert sel.sum() == counts[i].sum()
        cells = np.floor(pos[sel] / 8.0).astype(int)
        rebuilt = np.zeros((24, 24, 24), int)
        np.add.at(rebuilt, tuple(cells.T), 1)
        np.testing.assert_array_equal(rebuilt, counts[i])
    with pytest.raises(ValueError, match="counts"):
        counts_to_catalog(counts[0], hg.mass_edges, 8.0)


def test_halo_counts_mesh_native():
    # engine kwargs pass through: counts on a ('data','space') mesh are
    # bit-identical to single-device (partitionable Threefry + the
    # elementwise intensity/Poisson stage shard freely)
    from randomfield_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=2, space=4)
    kw = dict(grid_spacing=8.0, mmin=1e13, mmax=1e15, nbins_mass=2)
    hg0 = HaloGenerator(32, 32, 32, **kw)
    hg1 = HaloGenerator(32, 32, 32, mesh=mesh, **kw)
    c0 = np.asarray(hg0.generate_halo_counts(seed=3))
    c1 = np.asarray(hg1.generate_halo_counts(seed=3))
    np.testing.assert_array_equal(c0, c1)


def test_catalog_mass_distribution_follows_hmf():
    # inverse-CDF masses: the catalog's mass histogram tracks dn/dlnM
    hg = HaloGenerator(32, 32, 32, grid_spacing=8.0, mmin=1e13, mmax=1e15,
                       nbins_mass=1, fit="st")
    _, mass = hg.generate_halo_catalog(seed=11)
    assert mass.size > 3000
    edges = np.geomspace(1e13, 1e15, 7)
    hist, _ = np.histogram(mass, bins=edges)
    msub = np.sqrt(edges[:-1] * edges[1:])
    _, dn = mf.mass_function(rf_power.load_default_power(), msub, fit="st")
    expect = dn * np.diff(np.log(edges))
    expect = expect / expect.sum() * mass.size
    sig = np.sqrt(np.maximum(expect, 1.0))
    assert np.all(np.abs(hist - expect) < 6 * sig + 0.08 * expect)
