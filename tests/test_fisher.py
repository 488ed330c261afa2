"""Fisher forecasting gates: exact mode counts, autodiff correctness,
binned information inequality, and a forecast-vs-measured-scatter
statistical gate tying the Fisher error to real ensembles."""

import numpy as np
import pytest

import jax.numpy as jnp

from randomfield_tpu.engine.generator import Generator
from randomfield_tpu.models import fisher as mf
from randomfield_tpu.ops import grid as _grid
from randomfield_tpu.ops import power as _power
from randomfield_tpu.validate import ensemble as _ens


def _white_table(shape, spacing, amp=123.0):
    kmin, kmax = _grid.get_k_bounds(shape, spacing)
    k = np.logspace(np.log10(kmin / 4), np.log10(kmax * 4), 64)
    return _power.PowerTable(k, np.full_like(k, amp))


def test_amplitude_fisher_exact_mode_count():
    # F_lnA = sum mult/2 = (N^3 - 1)/2 exactly: every non-DC mode carries
    # dlnP/dlnA = 1, pairs weight 1, self-conjugate reals weight 1/2.
    shape = (16, 18, 14)  # mixed even sizes exercise the Nyquist planes
    spacing = 6.0
    table = _white_table(shape, spacing)
    model, theta0 = mf.make_kaiser_model(table, shape, spacing,
                                         params=("ln_amp",))
    F = mf.fisher_matrix(model, theta0, shape)
    n_total = shape[0] * shape[1] * shape[2]
    assert F.shape == (1, 1)
    np.testing.assert_allclose(F[0, 0], (n_total - 1) / 2.0, rtol=1e-12)


def test_autodiff_matches_finite_differences():
    shape = (16, 16, 16)
    spacing = 8.0
    table = _power.load_default_power()
    params = ("ln_amp", "bias", "f", "alpha", "sigma_s", "sigma_fog")
    fixed = {"f": 0.5, "sigma_s": 4.0, "sigma_fog": 6.0}
    model, theta0 = mf.make_kaiser_model(table, shape, spacing,
                                         params=params, fixed=fixed)
    F_ad = mf.fisher_matrix(model, theta0, shape)

    # finite-difference Fisher from central-difference dlnP
    p0 = np.asarray(model(theta0), np.float64)
    good = p0 > 0
    w = (mf._mode_weights(shape) / 2.0)[good]
    steps = [1e-2, 1e-2, 1e-2, 1e-3, 1e-2, 1e-2]
    dlnp = []
    for i, h in enumerate(steps):
        tp = np.asarray(theta0).copy()
        tm = tp.copy()
        tp[i] += h
        tm[i] -= h
        pp = np.asarray(model(jnp.asarray(tp)), np.float64)
        pm = np.asarray(model(jnp.asarray(tm)), np.float64)
        dlnp.append((pp[good] - pm[good]) / (2 * h) / p0[good])
    dlnp = np.stack(dlnp, axis=-1)
    F_fd = np.einsum("ki,kj->ij", w[:, None] * dlnp, dlnp)
    scale = np.sqrt(np.outer(np.diag(F_ad), np.diag(F_ad)))
    np.testing.assert_allclose(F_ad / scale, F_fd / scale, atol=2e-2)


def test_power_law_alpha_derivative_exact():
    # loglog interpolation is exact for P = A k^n, so dlnP/dalpha at
    # alpha=1 is exactly (n - 3) per mode (slope n from the dilation,
    # -3 from the AP volume factor) => the 2x2 (ln_amp, alpha) Fisher is
    # rank-1 with F = [[S, (n-3)S], [(n-3)S, (n-3)^2 S]], S = sum mult/2.
    shape = (12, 12, 12)
    spacing = 10.0
    n = -1.5
    kmin, kmax = _grid.get_k_bounds(shape, spacing)
    k = np.logspace(np.log10(kmin / 4), np.log10(kmax * 4), 128)
    table = _power.PowerTable(k, 500.0 * k**n)
    model, theta0 = mf.make_kaiser_model(
        table, shape, spacing, params=("ln_amp", "alpha"),
        interpolation="loglog")
    F = mf.fisher_matrix(model, theta0, shape)
    S = (shape[0] * shape[1] * shape[2] - 1) / 2.0
    expect = S * np.array([[1.0, n - 3], [n - 3, (n - 3) ** 2]])
    np.testing.assert_allclose(F, expect, rtol=5e-4)
    # perfectly degenerate pair -> forecast_errors must refuse
    with pytest.raises(np.linalg.LinAlgError):
        mf.forecast_errors(F, names=("ln_amp", "alpha"))


def test_binned_covariance_matches_ensemble_prediction():
    # binned_covariance_from_pgrid on the plain interpolated pgrid must
    # reproduce validate.ensemble.predicted_power_covariance exactly.
    shape = (16, 16, 16)
    spacing = 8.0
    table = _power.load_default_power()
    model, theta0 = mf.make_kaiser_model(table, shape, spacing,
                                         params=("ln_amp",))
    pgrid = np.asarray(model(theta0), np.float64)
    _, _, cov = mf.binned_covariance_from_pgrid(pgrid, shape, spacing,
                                                nbins=16)
    cov_ref = _ens.predicted_power_covariance(table, shape, spacing,
                                              nbins=16)
    np.testing.assert_allclose(np.diag(cov), np.diag(cov_ref),
                               rtol=1e-5, equal_nan=True)


def test_binned_amplitude_fisher_lossless_for_white_spectrum():
    # with P constant, dlnP is bin-constant so binning loses nothing:
    # F_binned == F_modes exactly (both = (N^3-1)/2).
    shape = (16, 16, 16)
    spacing = 8.0
    table = _white_table(shape, spacing)
    model, theta0 = mf.make_kaiser_model(table, shape, spacing,
                                         params=("ln_amp",))
    Fm = mf.fisher_matrix(model, theta0, shape)
    Fb = mf.fisher_matrix_binned(model, theta0, shape, spacing, nbins=12)
    np.testing.assert_allclose(Fb, Fm, rtol=1e-9)


def test_binned_information_inequality():
    # binned Fisher can never exceed the per-mode Fisher (data
    # processing): F_modes - F_binned is PSD.
    shape = (16, 16, 16)
    spacing = 8.0
    table = _power.load_default_power()
    model, theta0 = mf.make_kaiser_model(
        table, shape, spacing, params=("bias", "f"), fixed={"f": 0.5})
    Fm = mf.fisher_matrix(model, theta0, shape)
    Fb = mf.fisher_matrix_binned(model, theta0, shape, spacing, nbins=16)
    evals = np.linalg.eigvalsh(Fm - Fb)
    assert evals.min() >= -1e-6 * np.abs(evals).max()
    # marginalized errors from fewer numbers can only be weaker, and
    # marginalized >= conditional always
    err_m = mf.forecast_errors(Fm, ("bias", "f"))
    err_b = mf.forecast_errors(Fb, ("bias", "f"))
    for name in ("bias", "f"):
        assert err_b[name][0] >= err_m[name][0] * (1 - 1e-9)
        assert err_m[name][0] >= err_m[name][1] * (1 - 1e-12)
    # (ln_amp, bias, f) is EXACTLY degenerate by construction — the
    # amplitude is a (b, f) rescaling: 2 dlnP/dln_amp = b dlnP/db +
    # f dlnP/df per mode — so forecast_errors must refuse the triple.
    model3, theta3 = mf.make_kaiser_model(
        table, shape, spacing, params=("ln_amp", "bias", "f"),
        fixed={"f": 0.5})
    F3 = mf.fisher_matrix(model3, theta3, shape)
    with pytest.raises(np.linalg.LinAlgError):
        mf.forecast_errors(F3, ("ln_amp", "bias", "f"))


def test_forecast_matches_measured_amplitude_scatter():
    # the end-to-end gate: the Fisher forecast for a pure amplitude must
    # match the scatter of the GLS amplitude estimate over a real seeded
    # ensemble of sampled spectra.
    shape = (24, 24, 24)
    spacing = 8.0
    nbins = 12
    g = Generator(*shape, spacing, power="eh98")
    model, theta0 = mf.make_kaiser_model(g.power, shape, spacing,
                                         params=("ln_amp",))
    pgrid = np.asarray(model(theta0), np.float64)
    _, counts, cov = mf.binned_covariance_from_pgrid(pgrid, shape, spacing,
                                                     nbins=nbins)
    F = mf.fisher_matrix_binned(model, theta0, shape, spacing, nbins=nbins)
    sigma_forecast = 1.0 / np.sqrt(F[0, 0])

    # exact per-bin expectation via the generalized covariance helper's
    # binning (mult-weighted bin means of pgrid)
    km = np.asarray(_grid.kmag(shape, spacing, jnp.float32), np.float64)
    edges = np.logspace(
        np.log10(_grid.get_k_bounds(shape, spacing)[0] * 0.999),
        np.log10(_grid.get_k_bounds(shape, spacing)[1] * 1.001), nbins + 1)
    idx = np.searchsorted(edges, km) - 1
    valid = (idx >= 0) & (idx < nbins) & (km > 0)
    mult = mf._mode_weights(shape)
    pbar = np.bincount(idx[valid], weights=(mult * pgrid)[valid],
                       minlength=nbins)
    pbar = np.where(counts > 0, pbar / np.maximum(counts, 1), 0.0)

    var = np.diag(cov)
    use = (counts > 0) & np.isfinite(var) & (var > 0)
    w = pbar[use] / var[use]
    norm = float(w @ pbar[use])

    nseeds = 160
    amps = []
    for seed in range(nseeds):
        _, p_hat, _ = g.sample_power(seed, nbins=nbins)
        amps.append(float(w @ np.asarray(p_hat, np.float64)[use]) / norm)
    amps = np.asarray(amps)
    # unbiased: mean A = 1 within sample error of the forecast sigma
    np.testing.assert_allclose(amps.mean(), 1.0,
                               atol=5 * sigma_forecast / np.sqrt(nseeds))
    # scatter matches the forecast: std/forecast in [0.8, 1.25]
    # (std-of-std ~ 1/sqrt(2(n-1)) ~ 5.6%; 4-sigma gate)
    ratio = amps.std(ddof=1) / sigma_forecast
    assert 0.78 < ratio < 1.28, ratio


def test_multipole_fisher_monopole_parity():
    # ells=(0,) is exactly fisher_matrix_binned: same bins, weights,
    # covariance and jacobian reduction.
    shape, spacing = (16, 16, 16), 8.0
    table = _power.load_default_power()
    model, theta0 = mf.make_kaiser_model(
        table, shape, spacing, params=("ln_amp", "f"), fixed={"f": 0.6})
    F_mono = mf.fisher_matrix_binned(model, theta0, shape, spacing, nbins=8)
    F_m0 = mf.fisher_matrix_multipoles(model, theta0, shape, spacing,
                                       nbins=8, ells=(0,))
    np.testing.assert_allclose(F_m0, F_mono, rtol=1e-9)


def test_multipole_fisher_information_chain():
    # per-mode >= multipoles(0,2,4) >= monopole, as PSD ordering, and
    # the multipoles recover most of the per-mode (bias, f) information
    # the monopole destroys.
    shape, spacing = (16, 16, 16), 8.0
    table = _power.load_default_power()
    model, theta0 = mf.make_kaiser_model(
        table, shape, spacing, params=("bias", "f"),
        fixed={"bias": 1.4, "f": 0.7})
    F_mode = mf.fisher_matrix(model, theta0, shape)
    F_mult = mf.fisher_matrix_multipoles(model, theta0, shape, spacing,
                                         nbins=8, ells=(0, 2, 4))
    F_mono = mf.fisher_matrix_binned(model, theta0, shape, spacing, nbins=8)
    for hi, lo in [(F_mode, F_mult), (F_mult, F_mono)]:
        evals = np.linalg.eigvalsh(hi - lo)
        assert evals.min() > -1e-7 * np.abs(evals).max(), evals
    # marginalized errors: multipoles close to per-mode, monopole far off
    # (monopole alone cannot split bias from f — near-degenerate)
    err_mode = mf.forecast_errors(F_mode, names=("bias", "f"))
    err_mult = mf.forecast_errors(F_mult, names=("bias", "f"))
    assert err_mult["f"][0] < 1.3 * err_mode["f"][0]
    with np.errstate(all="ignore"):
        try:
            err_mono = mf.forecast_errors(F_mono, names=("bias", "f"))
            assert err_mono["f"][0] > 3.0 * err_mult["f"][0]
        except np.linalg.LinAlgError:
            pass  # fully degenerate monopole Fisher is equally a pass


def test_multipole_fisher_forecast_matches_measured_scatter():
    # The chain end-to-end: maximum-likelihood amplitude refits on
    # measured P_0/P_2 vectors over an ensemble scatter like the
    # forecast says.
    from randomfield_tpu.validate.ensemble import (
        predicted_multipole_covariance,
    )
    from randomfield_tpu.validate.stats import calculate_power_multipoles

    n, spacing, nbins, nseeds = 16, 8.0, 5, 160
    b, f = 1.3, 0.6
    shape = (n, n, n)
    table = _power.load_default_power()
    g = Generator(n, n, n, grid_spacing=spacing)
    model, theta0 = mf.make_kaiser_model(
        table, shape, spacing, params=("ln_amp",),
        fixed={"bias": b, "f": f})
    F = mf.fisher_matrix_multipoles(model, theta0, shape, spacing,
                                    nbins=nbins, ells=(0, 2))
    sigma_fore = mf.forecast_errors(F, names=("ln_amp",))["ln_amp"][0]

    # GLS amplitude estimate per seed: A_hat = argmin (d - A t)^T C^-1
    # (d - A t) over the stacked (P0, P2) bins
    pgrid = np.asarray(model(theta0), np.float64)
    cov = predicted_multipole_covariance(
        pgrid, shape, spacing, nbins=nbins, ells=(0, 2))
    from randomfield_tpu.validate.stats import bin_power_multipoles_grid
    _, t_ell, _ = bin_power_multipoles_grid(
        pgrid, shape, spacing, nbins=nbins, ells=(0, 2))
    t_ell = np.asarray(t_ell, np.float64)  # (2, nbins)
    a_hats = []
    for s in range(nseeds):
        d = np.asarray(calculate_power_multipoles(
            g.generate_kaiser_field(s, bias=b, f=f), spacing,
            nbins=nbins, ells=(0, 2))[1], np.float64)
        num = den = 0.0
        for a in range(nbins):
            c = cov[a]
            if not np.all(np.isfinite(c)) or not np.all(
                    np.isfinite(d[:, a])):
                continue
            ci = np.linalg.inv(c)
            num += t_ell[:, a] @ ci @ d[:, a]
            den += t_ell[:, a] @ ci @ t_ell[:, a]
        a_hats.append(num / den)
    # d lnP/d ln_amp = 1 -> scatter of ln A_hat ~ sigma_fore
    scatter = np.std(np.log(np.asarray(a_hats)), ddof=1)
    # ... up to binning-loss: GLS on binned data has variance 1/den =
    # binned Fisher, which IS F here. 5 sigma gate on the variance ratio
    assert abs(scatter / sigma_fore - 1.0) < 5.0 * np.sqrt(
        0.5 / (nseeds - 1)) + 0.05, (scatter, sigma_fore)
