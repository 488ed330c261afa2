"""Weak-lensing module tests (Born convergence + Kaiser-Squires shear)."""

import numpy as np
import pytest

from randomfield_tpu.models import lensing
from randomfield_tpu.models.cosmology import C_KM_S, Planck13, create_cosmology


def test_efficiency_weights_shape_and_support():
    nz, spacing = 64, 40.0
    w = lensing.lensing_efficiency(None, nz, spacing, z_source=0.5)
    assert w.shape == (nz,)
    assert np.all(w >= 0.0)
    from randomfield_tpu.models.cosmology import get_redshifts

    z = get_redshifts(Planck13, nz, spacing)
    assert np.all(w[z >= 0.5] == 0.0)  # beyond the source: no lensing
    interior = w[(z > 0.05) & (z < 0.45)]
    assert interior.size and interior.max() > w[0]  # peaks between
    # deeper source -> strictly more total lensing
    w2 = lensing.lensing_efficiency(None, nz, spacing, z_source=1.0)
    assert w2.sum() > w.sum()


def test_efficiency_matches_closed_form_flat():
    c = Planck13
    nz, spacing = 16, 100.0
    zs = 1.0
    w = lensing.lensing_efficiency(c, nz, spacing, z_source=zs)
    from randomfield_tpu.models.cosmology import get_redshifts

    z = get_redshifts(c, nz, spacing)
    i = 5
    chi = c.comoving_distance(z[i])
    chi_s = c.comoving_distance(zs)
    expect = (
        1.5 * c.Om0 * (c.H0 / C_KM_S) ** 2 * (spacing / c.h)
        * (1.0 + z[i]) * chi * (chi_s - chi) / chi_s
    )
    assert w[i] == pytest.approx(expect, rel=1e-12)


def test_convergence_map_is_weighted_sum():
    rng = np.random.default_rng(0)
    delta = rng.standard_normal((8, 8, 32)).astype(np.float32)
    w = lensing.lensing_efficiency(None, 32, 60.0, z_source=0.8)
    k = np.asarray(lensing.convergence_map(delta, None, 60.0, z_source=0.8))
    np.testing.assert_allclose(k, delta @ w.astype(np.float32),
                               rtol=1e-4, atol=1e-7)
    # unit density: kappa == sum of weights everywhere
    k1 = np.asarray(
        lensing.convergence_map(np.ones((4, 4, 32), np.float32), None, 60.0,
                                z_source=0.8)
    )
    np.testing.assert_allclose(k1, w.sum(), rtol=1e-4)


def test_convergence_grows_with_source_redshift():
    from randomfield_tpu import Generator

    g = Generator(32, 32, 64, grid_spacing=50.0)
    d = g.generate_delta_field(seed=3)
    s = []
    for zs in (0.3, 0.8, 1.5):
        k = np.asarray(lensing.convergence_map(d, g.cosmology,
                                               g.scene.grid_spacing,
                                               z_source=zs))
        assert abs(k.mean()) < 5.0 * k.std() / np.sqrt(k.size) + 1e-6
        s.append(float(k.std()))
    assert s[0] < s[1] < s[2]


def test_curved_cosmology_efficiency_runs():
    c = create_cosmology({"Om0": 0.25, "Ok0": 0.1})
    w_open = lensing.lensing_efficiency(c, 32, 80.0, z_source=1.0)
    assert np.all(np.isfinite(w_open)) and w_open.sum() > 0
    c2 = create_cosmology({"Om0": 0.35, "Ok0": -0.1})
    w_closed = lensing.lensing_efficiency(c2, 32, 80.0, z_source=1.0)
    assert np.all(np.isfinite(w_closed)) and w_closed.sum() > 0


def test_kaiser_squires_plane_wave():
    # kappa = cos(2 pi (ax x + ay y) / n): gamma1/gamma2 are the same
    # wave scaled by the KS factors at that single mode
    n = 32
    ax, ay = 3, 5
    x = np.arange(n)
    phase = 2.0 * np.pi * (ax * x[:, None] + ay * x[None, :]) / n
    kappa = np.cos(phase).astype(np.float32)
    g1, g2 = lensing.convergence_to_shear(kappa, spacing=1.0)
    ksq = float(ax * ax + ay * ay)
    np.testing.assert_allclose(
        np.asarray(g1), (ax * ax - ay * ay) / ksq * kappa, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(g2), 2.0 * ax * ay / ksq * kappa, atol=2e-5
    )
    # mass-sheet degeneracy: constant kappa maps to zero shear
    g1c, g2c = lensing.convergence_to_shear(
        np.full((n, n), 0.7, np.float32), spacing=1.0
    )
    assert np.max(np.abs(np.asarray(g1c))) < 1e-5
    assert np.max(np.abs(np.asarray(g2c))) < 1e-5


def test_convergence_power_matches_exact_prediction():
    # measured P_kappa(k_perp) of a lightcone render vs the exact
    # discrete expectation (kz sum with the plane-weight window):
    # residuals are pure sample noise
    from randomfield_tpu import Generator

    n, spacing, z_source = 32, 25.0, 0.6
    g = Generator(n, n, n, grid_spacing=spacing)
    w_eff = lensing.lensing_efficiency(
        g.cosmology, n, spacing, z_source
    ) * np.asarray(g.growth_function, np.float64)
    kp, pp, nc = lensing.predicted_convergence_power(
        g.power, (n, n, n), spacing, w_eff, nbins=8
    )
    ratios, counts = [], []
    for seed in (1, 2, 3, 4):
        delta = g.generate_delta_field(seed=seed)  # lightcone ON
        kappa = lensing.convergence_map(delta, g.cosmology, spacing,
                                        z_source)
        km, pm, nm = lensing.convergence_power(kappa, spacing, nbins=8)
        np.testing.assert_allclose(km, kp, rtol=1e-6, equal_nan=True)
        ok = np.isfinite(pm) & np.isfinite(pp) & (nc > 8)
        ratios.append(pm[ok] / pp[ok])
        counts.append(nc[ok])
    ratio = np.stack(ratios).mean(axis=0)
    n_eff = 4.0 * np.stack(counts).mean(axis=0)
    noise = np.sqrt(2.0 / n_eff)
    resid = np.abs(ratio - 1.0)
    assert np.all(resid < 5.0 * noise + 0.02), (ratio, noise)


def test_convergence_power_single_plane_window():
    # weights picking one plane: |W(kz)|^2 == 1 for every kz, so the
    # prediction is the flat kz average of P3 — check against a direct
    # numpy evaluation, and the estimator on a delta-slice map
    from randomfield_tpu import Generator
    from randomfield_tpu.ops.power import interpolate_power

    n, spacing = 16, 25.0
    g = Generator(n, n, n, grid_spacing=spacing)
    w = np.zeros(n)
    w[3] = 1.0
    kp, pp, nc = lensing.predicted_convergence_power(
        g.power, (n, n, n), spacing, w, nbins=10
    )
    kx = 2 * np.pi * np.fft.fftfreq(n, d=spacing)
    kz = 2 * np.pi * np.fft.fftfreq(n, d=spacing)
    # check one k_perp mode by hand: (kx[1], 0)
    kperp = abs(kx[1])
    kmag = np.sqrt(kperp**2 + kz**2)
    p3 = np.asarray(interpolate_power(g.power, kmag.astype(np.float32)),
                    np.float64)
    direct = p3.sum() / (n * spacing)
    # 10 log bins: the first holds EXACTLY the 4 fundamental |k_perp|
    # modes (the sqrt(2) k_f diagonals land in a later bin)
    assert nc[0] == 4
    assert np.isfinite(pp[0])
    assert abs(pp[0] / direct - 1.0) < 1e-4  # same-|k| modes, same value


def test_tomographic_convergence_stacks_and_orders():
    from randomfield_tpu import Generator

    n, spacing = 32, 25.0
    g = Generator(n, n, n, grid_spacing=spacing)
    delta = g.generate_delta_field(seed=2)
    z_sources = (0.3, 0.6, 1.0)
    kappas = np.asarray(lensing.tomographic_convergence(
        delta, g.cosmology, spacing, z_sources))
    assert kappas.shape == (3, n, n)
    # each slice equals the single-source map
    for i, zs in enumerate(z_sources):
        single = np.asarray(lensing.convergence_map(
            delta, g.cosmology, spacing, zs))
        scale = np.abs(single).max()
        np.testing.assert_allclose(kappas[i], single, rtol=2e-4,
                                   atol=1e-6 * scale)
    # deeper sources integrate more structure
    assert kappas[0].std() < kappas[1].std() < kappas[2].std()
    # shared lightcone: neighboring bins strongly but imperfectly
    # correlated
    r = np.corrcoef(kappas[1].ravel(), kappas[2].ravel())[0, 1]
    assert 0.5 < r < 0.999


def test_convergence_cross_power_matches_exact_prediction():
    from randomfield_tpu import Generator

    n, spacing = 32, 25.0
    z1, z2 = 0.45, 0.9
    g = Generator(n, n, n, grid_spacing=spacing)
    gf = np.asarray(g.growth_function, np.float64)
    w1 = lensing.lensing_efficiency(g.cosmology, n, spacing, z1) * gf
    w2 = lensing.lensing_efficiency(g.cosmology, n, spacing, z2) * gf
    kp, pp, nc = lensing.predicted_convergence_cross_power(
        g.power, (n, n, n), spacing, w1, w2, nbins=8)
    ratios, counts = [], []
    for seed in (1, 2, 3, 4):
        delta = g.generate_delta_field(seed=seed)
        ka, kb = lensing.tomographic_convergence(
            delta, g.cosmology, spacing, (z1, z2))
        km, pm, nm = lensing.convergence_cross_power(ka, kb, spacing,
                                                     nbins=8)
        np.testing.assert_allclose(km, kp, rtol=1e-6, equal_nan=True)
        ok = np.isfinite(pm) & np.isfinite(pp) & (nc > 8)
        ratios.append(pm[ok] / pp[ok])
        counts.append(nc[ok])
    ratio = np.stack(ratios).mean(axis=0)
    noise = np.sqrt(2.0 / (4.0 * np.stack(counts).mean(axis=0)))
    assert np.all(np.abs(ratio - 1.0) < 5.0 * noise + 0.03), (ratio, noise)
    # cross of a map with itself IS the auto estimator
    ka = lensing.convergence_map(
        g.generate_delta_field(seed=9), g.cosmology, spacing, z1)
    k_a, p_a, _ = lensing.convergence_power(ka, spacing, nbins=8)
    k_x, p_x, _ = lensing.convergence_cross_power(ka, ka, spacing, nbins=8)
    np.testing.assert_allclose(p_x, p_a, rtol=1e-6, equal_nan=True)
    # and the auto prediction is the cross prediction with w1 == w2
    _, pp_auto, _ = lensing.predicted_convergence_power(
        g.power, (n, n, n), spacing, w1, nbins=8)
    _, pp_x, _ = lensing.predicted_convergence_cross_power(
        g.power, (n, n, n), spacing, w1, w1, nbins=8)
    np.testing.assert_allclose(pp_x, pp_auto, rtol=1e-12, equal_nan=True)


def test_predicted_convergence_power_validates_weights():
    from randomfield_tpu.ops.power import load_default_power

    with pytest.raises(ValueError):
        lensing.predicted_convergence_power(
            load_default_power(), (8, 8, 8), 25.0, np.ones(4)
        )


def _nyquist_filtered(kappa):
    """kappa with DC and the even-axis Nyquist lines zeroed — the band
    limit the spin-2 kernels impose (models/lensing.py:_eb_factors)."""
    c = np.fft.fft2(np.asarray(kappa, np.float64))
    n0, n1 = c.shape
    c[0, 0] = 0.0
    if n0 % 2 == 0:
        c[n0 // 2, :] = 0.0
    if n1 % 2 == 0:
        c[:, n1 // 2] = 0.0
    return np.fft.ifft2(c).real


def test_eb_roundtrip_recovers_kappa_and_null_b():
    # KS shear of any kappa: E = kappa (band-limited below the spin-2
    # Nyquist cut, mean removed) to roundoff, B = 0
    from randomfield_tpu import Generator

    n, spacing = 32, 25.0
    g = Generator(n, n, n, grid_spacing=spacing)
    kappa = np.asarray(lensing.convergence_map(
        g.generate_delta_field(seed=4), g.cosmology, spacing, 0.6))
    g1, g2 = lensing.convergence_to_shear(kappa, spacing)
    e, b = lensing.shear_to_eb(g1, g2, spacing)
    want = _nyquist_filtered(kappa)
    scale = np.abs(want).max()
    np.testing.assert_allclose(
        np.asarray(e, np.float64), want, atol=3e-5 * scale
    )
    assert np.max(np.abs(np.asarray(b))) < 3e-5 * scale


def test_eb_power_matches_convergence_power_and_null_b():
    from randomfield_tpu import Generator

    n, spacing = 32, 25.0
    g = Generator(n, n, n, grid_spacing=spacing)
    kappa = np.asarray(lensing.convergence_map(
        g.generate_delta_field(seed=7), g.cosmology, spacing, 0.8))
    g1, g2 = lensing.convergence_to_shear(kappa, spacing)
    k_e, p_e, p_b, cnt = lensing.shear_power_eb(g1, g2, spacing, nbins=8)
    k_k, p_k, cnt_k = lensing.convergence_power(
        _nyquist_filtered(kappa).astype(np.float32), spacing, nbins=8
    )
    np.testing.assert_allclose(cnt, cnt_k, atol=0)
    m = cnt > 0
    np.testing.assert_allclose(p_e[m], p_k[m], rtol=5e-4, atol=1e-7)
    assert (np.abs(p_b[m]) < 1e-4 * np.abs(p_k[m]).max()).all()


def test_shape_noise_floor_splits_evenly_into_e_and_b():
    # pure white shape noise: E and B both flat at sigma_e^2 spacing^2
    # (odd map size: no Nyquist lines, so the spin-2 band limit removes
    # nothing and the flat floor is the exact per-bin expectation)
    n, spacing, sigma_e = 63, 10.0, 0.3
    zeros = np.zeros((n, n), np.float32)
    g1, g2 = lensing.add_shape_noise(zeros, zeros, sigma_e, seed=11)
    p_floor = lensing.shape_noise_power(sigma_e, spacing)
    acc_e, acc_b = [], []
    for seed in range(6):
        g1, g2 = lensing.add_shape_noise(zeros, zeros, sigma_e, seed=seed)
        _, p_e, p_b, cnt = lensing.shear_power_eb(
            g1, g2, spacing, nbins=8
        )
        acc_e.append(p_e)
        acc_b.append(p_b)
    m = cnt > 20
    e_mean = np.mean(acc_e, axis=0)[m]
    b_mean = np.mean(acc_b, axis=0)[m]
    # per-bin chi^2-mean error ~ p_floor * sqrt(2/(n_modes*nseeds))
    err = 5.0 * p_floor * np.sqrt(2.0 / (cnt[m] * 6))
    assert (np.abs(e_mean - p_floor) < err).all()
    assert (np.abs(b_mean - p_floor) < err).all()
    # determinism + actual noise injection
    a1, a2 = lensing.add_shape_noise(zeros, zeros, sigma_e, seed=3)
    b1, _ = lensing.add_shape_noise(zeros, zeros, sigma_e, seed=3)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(b1), atol=0)
    assert np.std(np.asarray(a1)) > 0.2 * sigma_e
    assert not np.allclose(np.asarray(a1), np.asarray(a2))


def test_convergence_correlation_matches_exact_expectation():
    # measured transverse w(R) of convergence maps vs the exactly
    # binned expectation (same modes, same minimum-image shells):
    # residuals are pure sample noise
    from randomfield_tpu import Generator

    n, spacing, nseeds = 32, 25.0, 6
    zs = 0.7
    g = Generator(n, n, n, grid_spacing=spacing)
    w = lensing.lensing_efficiency(g.cosmology, n, spacing, zs)
    weights = w * np.asarray(g.growth_function)
    r_pred, w_pred, cnt = lensing.predicted_convergence_correlation(
        g.power, (n, n, n), spacing, weights, nbins=10
    )
    acc = []
    for s in range(nseeds):
        kappa = lensing.convergence_map(
            g.generate_delta_field(seed=s), g.cosmology, spacing, zs
        )
        r, wm, c = lensing.convergence_correlation(kappa, spacing,
                                                   nbins=10)
        acc.append(wm)
    np.testing.assert_allclose(r, r_pred, rtol=1e-6, equal_nan=True)
    np.testing.assert_allclose(c, cnt, atol=0)
    w_mean = np.mean(acc, axis=0)
    w_sd = np.std(acc, axis=0, ddof=1) / np.sqrt(nseeds)
    m = cnt > 4
    resid = np.abs(w_mean - w_pred)[m]
    budget = (5.0 * w_sd + 5e-3 * np.abs(w_pred).max())[m]
    assert (resid < budget).all(), (resid / budget).max()
    # physics: w declines from small to large separation
    assert w_pred[m][0] > w_pred[m][-1]
    assert w_pred[m][0] > 0


def test_masked_convergence_unit_mask_reduces_exactly():
    from randomfield_tpu import Generator

    n, spacing = 24, 30.0
    g = Generator(n, n, n, grid_spacing=spacing)
    delta = g.generate_delta_field(seed=3)
    kappa = lensing.convergence_map(delta, g.cosmology, spacing, 0.5)
    ones = np.ones((n, n))
    k0, p0, c0 = lensing.convergence_power(kappa, spacing, nbins=6)
    k1, p1, c1 = lensing.masked_convergence_power(kappa, ones, spacing,
                                                  nbins=6)
    np.testing.assert_allclose(p1, p0, rtol=1e-6, equal_nan=True)
    w_eff = lensing.lensing_efficiency(
        g.cosmology, n, spacing, 0.5
    ) * np.asarray(g.growth_function, np.float64)
    _, e0, _ = lensing.predicted_convergence_power(
        g.power, (n, n, n), spacing, w_eff, nbins=6)
    _, e1, _ = lensing.predicted_masked_convergence_power(
        g.power, ones, (n, n, n), spacing, w_eff, nbins=6)
    np.testing.assert_allclose(e1, e0, rtol=1e-9, equal_nan=True)


def test_masked_convergence_matches_exact_prediction():
    # survey footprint with a hole + apodized edge: measured pseudo
    # spectrum over an ensemble matches the exact mode-coupled
    # expectation bin for bin
    from randomfield_tpu import Generator

    n, spacing, z_source, nbins = 32, 25.0, 0.6, 7
    g = Generator(n, n, n, grid_spacing=spacing)
    # footprint: half the sky in x, cosine-apodized, with a masked disc
    x = np.arange(n)
    apod = 0.5 * (1.0 - np.cos(np.pi * np.clip(x / 6.0, 0, 1)))
    mask = np.outer(apod * (x < 24), np.ones(n))
    xx, yy = np.meshgrid(x, x, indexing="ij")
    mask[(xx - 10) ** 2 + (yy - 20) ** 2 < 9] = 0.0
    w_eff = lensing.lensing_efficiency(
        g.cosmology, n, spacing, z_source
    ) * np.asarray(g.growth_function, np.float64)
    kp, pp, nc = lensing.predicted_masked_convergence_power(
        g.power, mask, (n, n, n), spacing, w_eff, nbins=nbins)
    _, pu, _ = lensing.predicted_convergence_power(
        g.power, (n, n, n), spacing, w_eff, nbins=nbins)
    # the window transfers power across bins: prediction differs from
    # the unmasked one
    ok = np.isfinite(pp) & np.isfinite(pu)
    assert np.max(np.abs(pp[ok] / pu[ok] - 1.0)) > 0.02
    nseeds = 24
    meas = []
    for seed in range(nseeds):
        delta = g.generate_delta_field(seed=seed)
        kappa = lensing.convergence_map(delta, g.cosmology, spacing,
                                        z_source)
        km, pm, _ = lensing.masked_convergence_power(kappa, mask, spacing,
                                                     nbins=nbins)
        meas.append(pm)
    meas = np.asarray(meas)
    mean = np.nanmean(meas, 0)
    sem = np.nanstd(meas, 0, ddof=1) / np.sqrt(nseeds)
    ok = np.isfinite(mean) & np.isfinite(pp) & (sem > 0) & (nc > 8)
    z = (mean[ok] - pp[ok]) / sem[ok]
    assert np.all(np.abs(z) < 5.0), z
    amp = np.sum(mean[ok] * pp[ok] / sem[ok] ** 2) / np.sum(
        pp[ok] ** 2 / sem[ok] ** 2)
    assert abs(amp - 1.0) < 0.05, amp


def test_masked_shear_eb_unit_mask_exact():
    # unit mask: estimator reduces to shear_power_eb identically; the
    # prediction gives P_B = 0 exactly and P_E = the unmasked spectrum
    from randomfield_tpu import Generator

    n, spacing = 24, 30.0
    g = Generator(n, n, n, grid_spacing=spacing)
    delta = g.generate_delta_field(seed=5)
    kappa = lensing.convergence_map(delta, g.cosmology, spacing, 0.5)
    g1, g2 = lensing.convergence_to_shear(kappa, spacing)
    ones = np.ones((n, n))
    k0, pe0, pb0, c0 = lensing.shear_power_eb(g1, g2, spacing, nbins=6)
    k1, pe1, pb1, c1 = lensing.masked_shear_power_eb(g1, g2, ones,
                                                     spacing, nbins=6)
    np.testing.assert_allclose(pe1, pe0, rtol=1e-6, equal_nan=True)
    w_eff = lensing.lensing_efficiency(
        g.cosmology, n, spacing, 0.5
    ) * np.asarray(g.growth_function, np.float64)
    kp, pe_p, pb_p, cp = lensing.predicted_masked_shear_power_eb(
        g.power, ones, (n, n, n), spacing, w_eff, nbins=6)
    ok = np.isfinite(pb_p)
    assert np.all(np.abs(pb_p[ok]) < 1e-12 * np.abs(pe_p[ok]).max())


@pytest.mark.slow
def test_masked_shear_eb_leakage_matches_prediction():
    # apodized half-footprint: measured E AND leaked B pseudo-spectra
    # over a 24-seed ensemble match the exact predictions bin for bin
    from randomfield_tpu import Generator

    n, spacing, z_source, nbins = 32, 25.0, 0.6, 6
    g = Generator(n, n, n, grid_spacing=spacing)
    x = np.arange(n)
    apod = 0.5 * (1.0 - np.cos(np.pi * np.clip(x / 6.0, 0, 1)))
    mask = np.outer(apod * (x < 26), 0.5 + 0.5 * apod)
    w_eff = lensing.lensing_efficiency(
        g.cosmology, n, spacing, z_source
    ) * np.asarray(g.growth_function, np.float64)
    kp, pe_p, pb_p, nc = lensing.predicted_masked_shear_power_eb(
        g.power, mask, (n, n, n), spacing, w_eff, nbins=nbins)
    # leakage is real: predicted B is a finite fraction of E
    ok = np.isfinite(pe_p) & (nc > 8)
    assert np.all(pb_p[ok] > 0)
    assert np.max(pb_p[ok] / pe_p[ok]) > 0.01
    es, bs = [], []
    for seed in range(24):
        delta = g.generate_delta_field(seed=seed)
        kappa = lensing.convergence_map(delta, g.cosmology, spacing,
                                        z_source)
        g1, g2 = lensing.convergence_to_shear(kappa, spacing)
        _, pe, pb, _ = lensing.masked_shear_power_eb(g1, g2, mask, spacing,
                                                     nbins=nbins)
        es.append(pe)
        bs.append(pb)
    for meas, pred in ((np.asarray(es), pe_p), (np.asarray(bs), pb_p)):
        mean = np.nanmean(meas, 0)
        sem = np.nanstd(meas, 0, ddof=1) / np.sqrt(len(meas))
        use = np.isfinite(mean) & np.isfinite(pred) & (sem > 0) & (nc > 8)
        z = (mean[use] - pred[use]) / sem[use]
        assert np.all(np.abs(z) < 5.0), z
        amp = np.sum(mean[use] * pred[use] / sem[use] ** 2) / np.sum(
            pred[use] ** 2 / sem[use] ** 2)
        assert abs(amp - 1.0) < 0.06, amp
