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


def test_ap_exact_recovery():
    # data manufactured from the AP model itself (Kaiser template,
    # Ballinger+96 remap, per-ell broadband): the 2-D grid + paraboloid
    # refinement must recover every parameter
    table = _power.load_default_power()
    k = np.geomspace(0.02, 0.35, 40)
    apar0, aperp0, b2, beta = 1.06, 0.95, 2.2, 0.35
    nodes, wts = np.polynomial.legendre.leggauss(40)
    nodes, wts = 0.5 * (nodes + 1.0), 0.5 * wts
    model = b2 * baofit._ap_model_multipoles(
        table, k, apar0, aperp0, beta, (0, 2), nodes, wts
    )
    model[0] += 150.0 / k - 200.0 + 30.0 * k
    model[1] += -80.0 / k + 90.0 - 10.0 * k
    fit = baofit.fit_bao_scale_ap(
        k, model, ells=(0, 2), template=table, beta=beta,
        alpha_par_range=(0.9, 1.2), alpha_perp_range=(0.85, 1.1),
        n_alpha=41,
    )
    assert abs(fit["alpha_par"] - apar0) < 3e-3, fit["alpha_par"]
    assert abs(fit["alpha_perp"] - aperp0) < 3e-3, fit["alpha_perp"]
    assert abs(fit["b2"] - b2) < 0.03 * b2
    assert fit["chi2_min"] < 1e-3 * fit["chi2"].max()
    np.testing.assert_allclose(
        fit["broadband"][0], [150.0, -200.0, 30.0], rtol=0.08, atol=3.0
    )
    assert np.isfinite(fit["alpha_par_err"])
    assert np.isfinite(fit["alpha_corr"]) and abs(fit["alpha_corr"]) < 1


def test_ap_isotropic_reduction_matches_1d_fit():
    # apar = aperp = alpha0 with beta = 0 is an exactly isotropic
    # dilation: P_0 = b2 P(k/alpha0)/alpha0^3 — the 2-D fit and the 1-D
    # fit must find the same scale on the same data
    table = _power.load_default_power()
    k = np.geomspace(0.02, 0.35, 40)
    alpha0 = 1.035
    data = 1.7 * np.interp(np.log10(k / alpha0), np.log10(table.k),
                           table.Pk) / alpha0**3
    data = data + 60.0 / k - 100.0 + 25.0 * k
    fit1 = baofit.fit_bao_scale(k, data, template=table)
    fit2 = baofit.fit_bao_scale_ap(
        k, data[None, :], ells=(0,), template=table, beta=0.0,
        alpha_par_range=(0.9, 1.15), alpha_perp_range=(0.9, 1.15),
        n_alpha=41,
    )
    assert abs(fit1["alpha"] - alpha0) < 2e-3
    assert abs(fit2["alpha_iso"] - alpha0) < 4e-3, fit2["alpha_iso"]
    # alpha_par/alpha_perp individually are degenerate for an isotropic
    # monopole-only fit; only the D_V combination is constrained


def test_ap_unit_alpha_on_kaiser_expectation():
    # the exactly binned Kaiser multipole expectation of this grid IS
    # the undilated template through the estimator: alphas lock to 1.
    # The residual offset is the discrete mu-coverage distortion of the
    # binned quadrupole — it shrinks with grid size (0.94 at 64^3, 0.99
    # at 128^3 for alpha_par), so the gate runs at 128^3
    n, spacing, nbins, f = 128, 4.0, 24, 0.6
    g = Generator(n, n, n, grid_spacing=spacing)
    k, p_ell, cnt = g.predicted_kaiser_multipoles(
        f=f, nbins=nbins, ells=(0, 2)
    )
    fit = baofit.fit_bao_scale_ap(
        k, p_ell, ells=(0, 2), template=g.power, beta=f,
        n_modes=cnt, kmin=0.04, kmax=0.5, n_alpha=41,
    )
    assert abs(fit["alpha_par"] - 1.0) < 0.015, fit["alpha_par"]
    assert abs(fit["alpha_perp"] - 1.0) < 0.01, fit["alpha_perp"]
    assert abs(fit["alpha_iso"] - 1.0) < 0.008, fit["alpha_iso"]


def test_ap_validation_errors():
    table = _power.load_default_power()
    k = np.geomspace(0.02, 0.3, 20)
    p2 = np.zeros((2, 20))
    with pytest.raises(ValueError):
        baofit.fit_bao_scale_ap(k, p2[0], ells=(0, 2), template=table)
    with pytest.raises(ValueError):
        baofit.fit_bao_scale_ap(k, p2, ells=(0, 3), template=table)
    with pytest.raises(ValueError):
        baofit.fit_bao_scale_ap(
            k, p2, ells=(0, 2), template=table,
            sigma=np.ones_like(p2), n_modes=np.ones(20),
        )


def test_ap_cov_diagonal_reduces_to_sigma_path():
    # block-diagonal covariance == diag(sigma^2) must reproduce the
    # sigma path to rounding in every returned quantity
    table = _power.load_default_power()
    k = np.geomspace(0.02, 0.35, 30)
    nodes, wts = np.polynomial.legendre.leggauss(40)
    nodes, wts = 0.5 * (nodes + 1.0), 0.5 * wts
    model = 1.9 * baofit._ap_model_multipoles(
        table, k, 1.03, 0.98, 0.4, (0, 2), nodes, wts)
    rng = np.random.default_rng(7)
    sigma = 0.03 * np.abs(model) + 10.0
    data = model + sigma * rng.normal(size=model.shape)
    cov = np.zeros((k.size, 2, 2))
    cov[:, 0, 0] = sigma[0] ** 2
    cov[:, 1, 1] = sigma[1] ** 2
    kw = dict(ells=(0, 2), template=table, beta=0.4, n_alpha=31,
              alpha_par_range=(0.95, 1.12), alpha_perp_range=(0.9, 1.06))
    f1 = baofit.fit_bao_scale_ap(k, data, sigma=sigma, **kw)
    f2 = baofit.fit_bao_scale_ap(k, data, cov=cov, **kw)
    for key in ("alpha_par", "alpha_perp", "alpha_par_err",
                "alpha_perp_err", "chi2_min", "b2"):
        np.testing.assert_allclose(f2[key], f1[key], rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(f2["chi2"], f1["chi2"], rtol=1e-8)


def test_ap_cov_matches_dense_gls():
    # correlated blocks: the whitened chi^2 surface equals an
    # independent dense block-GLS solve at every grid node
    table = _power.load_default_power()
    k = np.geomspace(0.03, 0.3, 18)
    nodes, wts = np.polynomial.legendre.leggauss(40)
    nodes, wts = 0.5 * (nodes + 1.0), 0.5 * wts
    model = 2.4 * baofit._ap_model_multipoles(
        table, k, 1.0, 1.0, 0.5, (0, 2), nodes, wts)
    rng = np.random.default_rng(3)
    data = model * (1.0 + 0.02 * rng.normal(size=model.shape))
    cov = np.zeros((k.size, 2, 2))
    s0 = 0.04 * np.abs(model[0]) + 5.0
    s2 = 0.08 * np.abs(model[0]) + 5.0
    rho = 0.55
    cov[:, 0, 0] = s0**2
    cov[:, 1, 1] = s2**2
    cov[:, 0, 1] = cov[:, 1, 0] = rho * s0 * s2
    kw = dict(ells=(0, 2), template=table, beta=0.5, n_alpha=7,
              alpha_par_range=(0.97, 1.03), alpha_perp_range=(0.97, 1.03),
              broadband=(0,))
    fit = baofit.fit_bao_scale_ap(k, data, cov=cov, **kw)

    # dense reference: chi2(alpha) minimized over (b2, a_0, a_2)
    cinv = np.linalg.inv(cov)  # (nk, 2, 2)
    def dense_chi2(ap, at):
        tmpl = baofit._ap_model_multipoles(
            table, k, ap, at, 0.5, (0, 2), nodes, wts)
        cols = [tmpl]
        for i_e in range(2):
            bb = np.zeros((2, k.size))
            bb[i_e] = 1.0
            cols.append(bb)
        X = np.stack(cols, -1)  # (2, nk, npar)
        A = np.einsum("ian,aij,jam->nm", X, cinv, X)
        b = np.einsum("ian,aij,ja->n", X, cinv, data)
        coef = np.linalg.solve(A, b)
        r = data - np.einsum("ian,n->ia", X, coef)
        return float(np.einsum("ia,aij,ja->", r, cinv, r))

    for i, ap in enumerate(fit["alpha_par_grid"]):
        for j, at in enumerate(fit["alpha_perp_grid"]):
            np.testing.assert_allclose(
                fit["chi2"][i, j], dense_chi2(ap, at), rtol=1e-8)


def test_ap_cov_error_calibration():
    # Delta chi^2 = 1 errors from the block-GLS surface are calibrated:
    # 60 synthetic data vectors = continuum model + correlated noise
    # drawn from the cov blocks -> standardized alpha pulls have unit
    # variance within the chi-square scatter of a 60-sample std.
    table = _power.load_default_power()
    k = np.geomspace(0.03, 0.32, 26)
    beta = 0.5
    nodes, wts = np.polynomial.legendre.leggauss(40)
    nodes, wts = 0.5 * (nodes + 1.0), 0.5 * wts
    model = 2.0 * baofit._ap_model_multipoles(
        table, k, 1.0, 1.0, beta, (0, 2), nodes, wts)
    cov = np.zeros((k.size, 2, 2))
    s0 = 0.015 * np.abs(model[0])
    s2 = 0.030 * np.abs(model[0])
    cov[:, 0, 0] = s0**2
    cov[:, 1, 1] = s2**2
    cov[:, 0, 1] = cov[:, 1, 0] = 0.45 * s0 * s2
    chol = np.linalg.cholesky(cov)
    rng = np.random.default_rng(11)
    pulls_par, pulls_perp = [], []
    for _ in range(60):
        noise = np.einsum("aij,ja->ia", chol,
                          rng.normal(size=(2, k.size)))
        fit = baofit.fit_bao_scale_ap(
            k, model + noise, ells=(0, 2), template=table, beta=beta,
            cov=cov, n_alpha=25, alpha_par_range=(0.93, 1.07),
            alpha_perp_range=(0.95, 1.05))
        if np.isfinite(fit["alpha_par_err"]):
            pulls_par.append((fit["alpha_par"] - 1.0)
                             / fit["alpha_par_err"])
            pulls_perp.append((fit["alpha_perp"] - 1.0)
                              / fit["alpha_perp_err"])
    assert len(pulls_par) >= 50
    for pulls in (pulls_par, pulls_perp):
        p = np.asarray(pulls)
        assert abs(p.mean()) < 4.0 / np.sqrt(p.size), p.mean()
        assert 0.7 < p.std(ddof=1) < 1.4, p.std(ddof=1)
