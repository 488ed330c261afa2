"""Projected correlation function w_p(r_p): theory transform + estimator.

Gates:
* ``power_to_projected_correlation`` against the closed form for a
  Gaussian P(k) (w_p(r_p) = A exp(-r_p^2/4R^2) / (4 pi R^2));
* ``calculate_projected_correlation`` of a deterministic single-cosine
  field against a direct numpy reimplementation (exact parity);
* measured w_p of rendered fields against its exact expectation
  ``predicted_projected_correlation`` (residual = pure sample noise);
* the same under linear Kaiser distortion (f > 0), where w_p is the
  classic RSD-insensitive statistic — its pi_max-truncated expectation
  still shifts, and the exact prediction tracks it;
* continuum theory vs the grid-exact prediction at matched band limit.
"""

import numpy as np
import jax.numpy as jnp

from randomfield_tpu import Generator
from randomfield_tpu.ops import power as rf_power
from randomfield_tpu.validate import stats


def _gaussian_table(amp=2500.0, R=8.0):
    k = np.logspace(-4, 2, 1500)
    return k, amp * np.exp(-(k * R) ** 2)


def test_power_to_projected_correlation_gaussian_closed_form():
    # P = A exp(-k^2 R^2) => xi(r) = A exp(-r^2/4R^2)/(8 pi^1.5 R^3)
    # => w_p(rp) = 2 int_0^inf xi dpi = A exp(-rp^2/4R^2)/(4 pi R^2)
    amp, R = 2500.0, 8.0
    table = _gaussian_table(amp, R)
    rp = np.array([1.0, 5.0, 12.0, 20.0, 32.0])
    wp = rf_power.power_to_projected_correlation(
        table, rp, pi_max=10.0 * R, npi=513
    )
    expected = amp * np.exp(-(rp**2) / (4 * R**2)) / (4 * np.pi * R**2)
    np.testing.assert_allclose(wp, expected, rtol=3e-3)


def test_power_to_projected_correlation_scalar_and_kaiser_monopole():
    table = _gaussian_table()
    wp = rf_power.power_to_projected_correlation(table, 10.0, pi_max=60.0)
    assert isinstance(wp, float)
    # f -> 0 through the multipole path reproduces the isotropic path
    wp_f0 = rf_power.power_to_projected_correlation(
        table, [10.0], pi_max=60.0, f=1e-12
    )
    np.testing.assert_allclose(wp_f0[0], wp, rtol=1e-6)


def test_calculate_projected_correlation_single_cosine():
    # delta = A cos(k0 x), LOS = z: xi(r) = A^2/2 cos(k0 rx), so the
    # masked LOS sum gives W(rx, ry) = A^2/2 cos(k0 rx) * spacing * n_pi
    n, spacing, amp, m = 32, 2.0, 0.7, 3
    x = np.arange(n) * spacing
    k0 = 2 * np.pi / (n * spacing) * m
    delta = np.broadcast_to(amp * np.cos(k0 * x)[:, None, None], (n, n, n))
    nbins, pi_max = 12, 10.0
    rp_mean, wp, cnt = stats.calculate_projected_correlation(
        jnp.asarray(delta, jnp.float32), spacing, nbins=nbins,
        pi_max=pi_max,
    )
    ax = np.minimum(np.arange(n), n - np.arange(n)) * spacing
    n_pi = int((ax <= pi_max).sum())
    w_map = amp**2 / 2 * np.cos(k0 * ax)[:, None] * np.ones((n, n))
    w_map = w_map * spacing * n_pi
    rp = np.sqrt((ax**2)[:, None] + (ax**2)[None, :])
    edges = np.linspace(0.0, 0.5 * n * spacing, nbins + 1)
    idx = np.searchsorted(edges, rp) - 1
    valid = (idx >= 0) & (idx < nbins) & (rp > 0)
    for b in range(nbins):
        sel = valid & (idx == b)
        if not sel.any():
            assert np.isnan(wp[b])
            continue
        np.testing.assert_allclose(wp[b], w_map[sel].mean(), rtol=2e-4,
                                   atol=1e-6)
        np.testing.assert_allclose(cnt[b], sel.sum(), rtol=1e-6)


def test_measured_wp_matches_prediction():
    n, spacing, nbins, nseeds = 32, 4.0, 10, 6
    g = Generator(n, n, n, grid_spacing=spacing)
    rp_pred, wp_pred, cnt = stats.predicted_projected_correlation(
        g.power, (n, n, n), spacing, nbins=nbins
    )
    acc = []
    for s in range(nseeds):
        rp, wp, _ = stats.calculate_projected_correlation(
            g.generate_delta_field(s, apply_lightcone=False), spacing,
            nbins=nbins,
        )
        acc.append(wp)
        np.testing.assert_allclose(rp, rp_pred, rtol=1e-5)
    wp_mean = np.mean(acc, axis=0)
    wp_sd = np.std(acc, axis=0, ddof=1) / np.sqrt(nseeds)
    mask = cnt > 0
    resid = np.abs(wp_mean - wp_pred)[mask]
    budget = 5.0 * wp_sd[mask] + 1e-4 * np.nanmax(np.abs(wp_pred))
    assert (resid < budget).all(), (resid / budget).max()


def test_measured_wp_kaiser_matches_prediction():
    n, spacing, nbins, nseeds, f = 32, 4.0, 10, 6, 0.7
    g = Generator(n, n, n, grid_spacing=spacing)
    rp_pred, wp_pred, cnt = stats.predicted_projected_correlation(
        g.power, (n, n, n), spacing, f=f, nbins=nbins, pi_max=40.0
    )
    acc = []
    for s in range(nseeds):
        delta_s = g.generate_kaiser_field(seed=s, bias=1.0, f=f)
        _, wp, _ = stats.calculate_projected_correlation(
            delta_s, spacing, nbins=nbins, pi_max=40.0
        )
        acc.append(wp)
    wp_mean = np.mean(acc, axis=0)
    wp_sd = np.std(acc, axis=0, ddof=1) / np.sqrt(nseeds)
    mask = cnt > 0
    resid = np.abs(wp_mean - wp_pred)[mask]
    budget = 5.0 * wp_sd[mask] + 1e-4 * np.nanmax(np.abs(wp_pred))
    assert (resid < budget).all(), (resid / budget).max()
    # the Kaiser prediction differs measurably from isotropic at finite
    # pi_max (the truncation keeps RSD sensitivity)
    _, wp_iso, _ = stats.predicted_projected_correlation(
        g.power, (n, n, n), spacing, f=0.0, nbins=nbins, pi_max=40.0
    )
    assert np.nanmax(np.abs(wp_pred - wp_iso)) > 0.01 * np.nanmax(
        np.abs(wp_iso)
    )


def test_wp_default_pi_max_is_half_box():
    n, spacing = 16, 3.0
    g = Generator(n, n, n, grid_spacing=spacing)
    delta = g.generate_delta_field(3, apply_lightcone=False)
    _, wp_default, _ = stats.calculate_projected_correlation(
        delta, spacing, nbins=6
    )
    _, wp_explicit, _ = stats.calculate_projected_correlation(
        delta, spacing, nbins=6, pi_max=0.5 * n * spacing
    )
    np.testing.assert_allclose(wp_default, wp_explicit, rtol=0, atol=0)


def test_theory_vs_grid_prediction():
    # at matched band limit and pi_max, the grid-exact expectation should
    # approach the continuum transform away from the bin-edge/minimum-
    # image extremes.  The spectrum must carry negligible power below the
    # box's fundamental mode (k^2 suppression here) — the periodic grid
    # has no modes there, while the continuum transform integrates them.
    n, spacing, nbins = 64, 2.0, 32
    amp, R = 2500.0, 4.0
    k = np.logspace(-4, 2, 1500)
    table = (k, amp * (k * R) ** 2 * np.exp(-((k * R) ** 2)))
    pi_max = 24.0
    rp, wp_grid, cnt = stats.predicted_projected_correlation(
        table, (n, n, n), spacing, nbins=nbins, pi_max=pi_max
    )
    k_ny = np.pi / spacing
    sel = slice(2, 14)
    wp_theory = rf_power.power_to_projected_correlation(
        table, rp[sel], pi_max=pi_max, kmax=k_ny, n=4096, npi=257
    )
    # relative where w_p is large, absolute floor through the decaying
    # tail (grid discreteness and bin-averaging dominate the tiny values)
    np.testing.assert_allclose(
        wp_grid[sel], wp_theory, rtol=0.12,
        atol=0.03 * np.max(np.abs(wp_theory)),
    )
