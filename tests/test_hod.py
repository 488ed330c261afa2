"""HOD galaxy mocks (models/hod.py): occupation shapes, NFW satellite
placement exactness, abundance and clustering statistical gates."""

import numpy as np
import pytest

from randomfield_tpu.models.hod import (
    HODGenerator,
    sample_nfw_radii,
    zheng05_occupation,
)
from randomfield_tpu.validate import stats


def test_zheng05_occupation_shapes():
    m = np.geomspace(1e11, 1e16, 64)
    ncen, nsat = zheng05_occupation(m)
    assert np.all((ncen >= 0) & (ncen <= 1)) and np.all(np.diff(ncen) >= 0)
    assert ncen[0] < 1e-6 and ncen[-1] > 0.999
    # transition midpoint: N_cen(logmmin) = 1/2 exactly
    assert zheng05_occupation(np.array([1e13]))[0][0] == pytest.approx(0.5)
    # satellites: zero below M0, power law alpha above
    assert np.all(nsat[m <= 1e13] == 0)
    hi = m > 1e15
    slope = np.diff(np.log(nsat[hi])) / np.diff(np.log(m[hi]))
    np.testing.assert_allclose(slope, 1.0, atol=0.02)
    _, nsat2 = zheng05_occupation(m, alpha=1.6)
    slope2 = np.diff(np.log(nsat2[hi])) / np.diff(np.log(m[hi]))
    np.testing.assert_allclose(slope2, 1.6, atol=0.05)


@pytest.mark.slow
def test_nfw_radii_distribution_exact():
    # the sampled radii histogram matches the analytic truncated NFW
    # enclosed-mass CDF
    rng = np.random.default_rng(3)
    n, c = 400000, 7.0
    r = sample_nfw_radii(np.full(n, c), np.ones(n), rng)
    assert r.min() >= 0.0 and r.max() <= 1.0
    x = np.linspace(0, 1, 21)
    cx = c * x
    cdf = np.log1p(cx) - cx / (1 + cx)
    cdf /= cdf[-1]
    hist, _ = np.histogram(r, bins=x)
    expect = np.diff(cdf) * n
    sig = np.sqrt(expect)
    assert np.all(np.abs(hist - expect) < 5 * sig + 0.01 * expect)


def test_galaxy_abundance_and_determinism():
    hg = HODGenerator(32, 32, 32, grid_spacing=8.0)
    p1, c1 = hg.generate_galaxy_catalog(seed=5)
    p2, c2 = hg.generate_galaxy_catalog(seed=5)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(c1, c2)
    box = 32 * 8.0
    assert p1.min() >= 0.0 and p1.max() <= box
    assert c1.sum() > 0 and (~c1).sum() > 0  # both kinds exist

    totals = [
        hg.generate_galaxy_catalog(seed=s)[0].shape[0] for s in range(5)
    ]
    mean = np.mean(totals)
    expect = hg.expected_galaxies()
    sig = np.std(totals, ddof=1) / np.sqrt(len(totals))
    assert abs(mean - expect) < 5 * sig + 0.05 * expect


def test_galaxy_power_matches_effective_bias():
    # painted galaxy overdensity P(k) tracks b_g^2 P_LN + 1/n_g shot
    # noise on large scales (2-halo regime)
    from randomfield_tpu.models.zeldovich import paint

    n, spacing, nseeds, nbins = 32, 8.0, 6, 8
    hg = HODGenerator(n, n, n, grid_spacing=spacing)
    acc = []
    for s in range(nseeds):
        pos, _ = hg.generate_galaxy_catalog(seed=s)
        delta, _ = paint(pos.astype(np.float32).T, (n, n, n), spacing,
                         window="ngp")
        k, p, c = stats.calculate_power(np.asarray(delta), spacing,
                                        nbins=nbins)
        acc.append(p)
    p_hat = np.mean(acc, axis=0)
    k_e, p_exp, cnt = hg.predicted_galaxy_power(nbins=nbins)
    # 2-halo regime: the largest populated scales only
    good = np.where(cnt > 8)[0][:3]
    sig = p_exp[good] * np.sqrt(2.0 / (nseeds * cnt[good]))
    resid = np.abs(p_hat[good] - p_exp[good])
    assert np.all(resid < 5 * sig + 0.2 * p_exp[good])


def test_rsd_catalog_geometry():
    # rsd moves ONLY the LOS coordinate; centrals by exactly their
    # halo's Kaiser displacement (no FOG), and the transverse
    # coordinates are bit-identical to the real-space catalog
    hg = HODGenerator(24, 24, 24, grid_spacing=8.0)
    for los in (0, 2):
        p_r, c_r = hg.generate_galaxy_catalog(seed=4)
        p_s, c_s = hg.generate_galaxy_catalog(seed=4, rsd=True,
                                              los_axis=los)
        np.testing.assert_array_equal(c_r, c_s)
        keep = [i for i in range(3) if i != los]
        np.testing.assert_array_equal(p_r[:, keep], p_s[:, keep])
        assert not np.array_equal(p_r[:, los], p_s[:, los])
        box = 24 * 8.0
        assert p_s.min() >= 0.0 and p_s.max() <= box
        # shifts are comoving-small (linear displacements + FOG)
        d = np.abs(p_s[:, los] - p_r[:, los])
        d = np.minimum(d, box - d)  # periodic distance
        assert np.percentile(d, 99) < 30.0


@pytest.mark.slow
def test_rsd_kaiser_monopole_boost():
    # redshift-space monopole exceeds the real-space one by roughly
    # the Kaiser factor (1 + 2 beta/3 + beta^2/5), beta = f/b_g
    from randomfield_tpu.models.zeldovich import catalog_power_multipoles

    n, spacing, nseeds = 32, 8.0, 6
    hg = HODGenerator(n, n, n, grid_spacing=spacing)
    acc_r, acc_s = [], []
    for s in range(nseeds):
        p_r, _ = hg.generate_galaxy_catalog(seed=s)
        p_s, _ = hg.generate_galaxy_catalog(seed=s, rsd=True)
        k, pl_r, c = catalog_power_multipoles(
            np.asarray(p_r, np.float32).T, spacing, shape=(n, n, n),
            nbins=8, ells=(0, 2))
        _, pl_s, _ = catalog_power_multipoles(
            np.asarray(p_s, np.float32).T, spacing, shape=(n, n, n),
            nbins=8, ells=(0, 2))
        acc_r.append(pl_r[0])
        acc_s.append(pl_s[0])
    p0_r = np.mean(acc_r, axis=0)
    p0_s = np.mean(acc_s, axis=0)
    good = np.where(c > 8)[0][:3]
    f = float(hg.cosmology.growth_rate(0.0))
    beta = f / hg.galaxy_bias
    kaiser = 1.0 + 2.0 * beta / 3.0 + beta**2 / 5.0
    ratio = p0_s[good].sum() / p0_r[good].sum()
    assert 1.0 + 0.25 * (kaiser - 1.0) < ratio < 1.0 + 2.5 * (kaiser - 1.0)


def test_virial_dispersion_scaling():
    from randomfield_tpu.models.hod import virial_dispersion

    s = virial_dispersion(np.array([1e13, 1e14, 1e15]))
    # sigma_v ~ M^{1/3}: one decade in mass ~ 10^{1/3} in dispersion
    np.testing.assert_allclose(s[1] / s[0], 10 ** (1 / 3), rtol=1e-6)
    # cluster-scale halos ~ hundreds of km/s (sanity of G/units)
    assert 300.0 < s[2] < 2000.0


def test_hod_validation():
    with pytest.raises(ValueError, match="occupies no halos"):
        HODGenerator(16, 16, 16, grid_spacing=8.0,
                     hod=dict(logmmin=18.0), mmin=1e10, mmax=1e11)
    # effective bias exceeds the lowest halo-bin bias for a steep HOD
    hg = HODGenerator(16, 16, 16, grid_spacing=8.0)
    assert hg.galaxy_bias > hg.halos.bias[0]
