"""Super-sample covariance (models/ssc.py).

Gates: the power-law response is EXACT (central/one-sided differences
of log-log samples reproduce a pure power law's slope to machine
precision), sigma_b matches the sigma(R) machinery, and the covariance
block is the advertised rank-one PSD outer product.
"""

import numpy as np

from randomfield_tpu.models import ssc
from randomfield_tpu.ops.power import load_default_power, sigma_r


def _powerlaw(n, amp=100.0):
    k = np.logspace(-3, 1, 200)
    return k, amp * k**n


def test_power_response_powerlaw_exact():
    for n in (-2.0, -1.0, 0.5):
        k, p = _powerlaw(n)
        kk, resp = ssc.power_response((k, p))
        expected = (68.0 / 21.0 - (3.0 + n) / 3.0) * p
        np.testing.assert_allclose(resp, expected, rtol=1e-12)
        np.testing.assert_allclose(kk, k)


def test_power_response_off_knot_interpolation():
    k, p = _powerlaw(-1.5)
    kq = np.array([3e-3, 0.07, 2.1])
    _, resp = ssc.power_response((k, p), k=kq)
    pq = 100.0 * kq**-1.5
    expected = (68.0 / 21.0 - 1.5 / 3.0) * pq
    np.testing.assert_allclose(resp, expected, rtol=1e-10)


def test_power_response_default_table_sane():
    table = load_default_power()
    kk, resp = ssc.power_response(table)
    assert np.all(np.isfinite(resp))
    # on large scales P ~ k (n=1): R/P -> 68/21 - 4/3 ~ 1.9; the
    # response stays within the physically expected O(1)..O(3) band of
    # the low-k limit through the BAO range
    ratio = resp / np.asarray(table.Pk, np.float64)
    band = (kk > 1e-3) & (kk < 1.0)
    assert ratio[band].min() > 0.5 and ratio[band].max() < 3.5


def test_sigma_b_matches_sigma_r():
    table = load_default_power()
    got = ssc.sigma_b_tophat(table, 150.0)
    ref = float(sigma_r(table, 150.0))
    np.testing.assert_allclose(got, ref, rtol=1e-12)
    assert 0 < got < 1  # a 150 Mpc/h footprint is linear


def test_ssc_covariance_rank_one_psd():
    k, p = _powerlaw(-1.0)
    kb = np.array([0.01, 0.1, 1.0, np.nan])
    cov = ssc.ssc_covariance((k, p), kb, sigma_b=0.02)
    assert cov.shape == (4, 4)
    assert np.isnan(cov[3]).all() and np.isnan(cov[:, 3]).all()
    sub = cov[:3, :3]
    _, resp = ssc.power_response((k, p), k=kb[:3])
    np.testing.assert_allclose(sub, 0.02**2 * np.outer(resp, resp),
                               rtol=1e-12)
    w = np.linalg.eigvalsh(sub)
    assert w.min() > -1e-9 * w.max()  # PSD
    assert np.sum(w > 1e-12 * w.max()) == 1  # rank one


def test_ssc_adds_to_gaussian_covariance_shapes():
    from randomfield_tpu.validate.ensemble import predicted_power_covariance

    table = load_default_power()
    shape, spacing, nbins = (16, 16, 16), 8.0, 8
    gauss = predicted_power_covariance(table, shape, spacing, nbins=nbins)
    from randomfield_tpu.ops import grid as _grid

    kmin, kmax = _grid.get_k_bounds(shape, spacing)
    edges = np.logspace(np.log10(kmin * 0.999), np.log10(kmax * 1.001),
                        nbins + 1)
    kb = np.sqrt(edges[:-1] * edges[1:])
    total = gauss + ssc.ssc_covariance(table, kb,
                                       ssc.sigma_b_tophat(table, 512.0))
    assert total.shape == gauss.shape
    d = np.diag(total) - np.diag(gauss)
    good = np.isfinite(d)
    assert good.any() and (d[good] >= 0).all()


def test_sigma_b_from_mask_unit_mask_null():
    table = load_default_power()
    m = np.ones((8, 8, 8))
    assert ssc.sigma_b_from_mask(m, 16.0, table) == 0.0


def test_sigma_b_from_mask_rejects_bad_masks():
    import pytest

    table = load_default_power()
    with pytest.raises(ValueError):
        ssc.sigma_b_from_mask(np.ones((4, 4)), 16.0, table)
    with pytest.raises(ValueError):
        ssc.sigma_b_from_mask(np.zeros((4, 4, 4)), 16.0, table)


def test_sigma_b_from_mask_matches_mock_ensemble():
    """The exact mode sum predicts the across-seed variance of the
    window-averaged density of float64 oracle renders."""
    from randomfield_tpu.validate import oracle

    table = load_default_power()
    shape, spacing = (16, 16, 16), 16.0
    m = np.zeros(shape)
    m[:8, :, :] = 1.0  # half-box slab footprint
    pred = ssc.sigma_b_from_mask(m, spacing, table)
    nseeds = 600
    vals = np.empty(nseeds)
    msum = m.sum()
    for s in range(nseeds):
        f = oracle.oracle_render(s, shape, spacing, (table.k, table.Pk))
        vals[s] = (m * f).sum() / msum
    got = vals.std()
    # relative sampling error of a std over N Gaussians ~ 1/sqrt(2N) ~ 2.9%
    np.testing.assert_allclose(got, pred, rtol=0.12)
