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


def test_hod_validation():
    with pytest.raises(ValueError, match="occupies no halos"):
        HODGenerator(16, 16, 16, grid_spacing=8.0,
                     hod=dict(logmmin=18.0), mmin=1e10, mmax=1e11)
    # effective bias exceeds the lowest halo-bin bias for a steep HOD
    hg = HODGenerator(16, 16, 16, grid_spacing=8.0)
    assert hg.galaxy_bias > hg.halos.bias[0]
