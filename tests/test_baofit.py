"""BAO template fit: exact-recovery, binned-expectation and mock gates."""

import numpy as np
import pytest

from randomfield_tpu import Generator
from randomfield_tpu.models import baofit
from randomfield_tpu.ops import power as _power
from randomfield_tpu.validate import stats


def test_exact_template_recovery():
    # data manufactured as B^2 P_t(k/alpha0) + broadband: the linear
    # solve + grid must recover every parameter
    table = _power.load_default_power()
    k = np.geomspace(0.02, 0.35, 40)
    alpha0, b2 = 1.047, 1.8
    data = b2 * np.interp(np.log10(k / alpha0), np.log10(table.k),
                          table.Pk)
    data = data + 120.0 / k - 300.0 + 40.0 * k
    fit = baofit.fit_bao_scale(k, data, template=table)
    assert abs(fit["alpha"] - alpha0) < 2e-3, fit["alpha"]
    assert abs(fit["b2"] - b2) < 0.02 * b2
    np.testing.assert_allclose(
        fit["broadband"], [120.0, -300.0, 40.0], rtol=0.05, atol=2.0
    )
    assert fit["chi2_min"] < 1e-3 * fit["chi2"].max()


def test_alpha_one_on_binned_expectation():
    # the exactly binned expectation of a render IS the template seen
    # through the estimator's bins: the fit must lock alpha to 1, with
    # the broadband absorbing the smooth binning distortion
    n, spacing, nbins = 64, 4.0, 24
    g = Generator(n, n, n, grid_spacing=spacing)
    kmag = np.asarray(
        __import__("randomfield_tpu.ops.grid", fromlist=["kmag"]).kmag(
            (n, n, n), spacing, np.float32
        ),
        np.float64,
    )
    pgrid = np.interp(
        np.log10(np.maximum(kmag, 1e-12)), np.log10(g.power.k), g.power.Pk
    )
    pgrid[kmag == 0] = 0.0
    k, p, cnt = stats.bin_power_grid(pgrid, (n, n, n), spacing,
                                     nbins=nbins)
    fit = baofit.fit_bao_scale(
        k, p, template=g.power, kmax=np.pi / spacing
    )
    assert abs(fit["alpha"] - 1.0) < 5e-3, fit["alpha"]


def test_mock_ensemble_recovers_unit_alpha():
    # seed-averaged measured spectra of default-power renders: alpha
    # consistent with 1 within the quoted error, and the error is
    # honest (not wildly small)
    n, spacing, nbins, nseeds = 64, 4.0, 24, 6
    g = Generator(n, n, n, grid_spacing=spacing)
    acc = []
    for s in range(nseeds):
        d = g.generate_delta_field(s, apply_lightcone=False)
        k, p, cnt = stats.calculate_power(d, spacing, nbins=nbins)
        acc.append(p)
    p_mean = np.mean(acc, axis=0)
    fit = baofit.fit_bao_scale(
        k, p_mean, template=g.power, n_modes=cnt * nseeds,
        kmax=np.pi / spacing,
    )
    assert np.isfinite(fit["alpha_err"]) and fit["alpha_err"] < 0.05
    assert abs(fit["alpha"] - 1.0) < 5 * fit["alpha_err"] + 5e-3
    # chi^2 per dof sane for a correct model + Gaussian errors
    assert fit["chi2_min"] / fit["dof"] < 3.0


def test_fit_validation_and_edge_cases():
    table = _power.load_default_power()
    k = np.geomspace(0.02, 0.3, 30)
    p = np.interp(np.log10(k), np.log10(table.k), table.Pk)
    with pytest.raises(ValueError, match="not both"):
        baofit.fit_bao_scale(k, p, sigma=p, n_modes=np.ones_like(p))
    with pytest.raises(ValueError, match="usable bins"):
        baofit.fit_bao_scale(k[:4], p[:4])
    with pytest.raises(ValueError, match="alpha_range"):
        baofit.fit_bao_scale(k, p, alpha_range=(1.2, 0.8))
    # NaN bins (empty estimator shells) are dropped silently
    p2 = p.copy()
    p2[3] = np.nan
    fit = baofit.fit_bao_scale(k, p2, template=table)
    assert fit["n_bins"] == len(k) - 1
    assert abs(fit["alpha"] - 1.0) < 2e-3
