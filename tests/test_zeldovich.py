"""Zel'dovich catalog gates: painting identities, spectrum recovery,
Kaiser redshift-space boost, Poisson shot noise.

Statistical tolerances follow the suite's convention: gate residuals
against the estimator's own sampling noise (Gaussian mode counting),
with generous multipliers for the single-seed cases.
"""

import numpy as np
import pytest

from randomfield_tpu import Generator
from randomfield_tpu.models import zeldovich as zl
from randomfield_tpu.models.powerspec import power_law_power
from randomfield_tpu.ops.power import PowerTable, interpolate_power
from randomfield_tpu.validate.stats import calculate_power


def _scaled_default(shape, spacing, amplitude):
    """A low-amplitude spectrum fully covered by this grid's band."""
    from randomfield_tpu.ops.grid import get_k_bounds

    kmin, kmax = get_k_bounds(shape, spacing)
    k = np.logspace(np.log10(kmin * 0.5), np.log10(kmax * 2.0), 256)
    return PowerTable(k, amplitude * power_law_power(k, ns=-1.0))


def test_lagrangian_paint_is_uniform():
    # undisplaced cell-center particles paint to exactly zero contrast
    shape = (8, 12, 10)
    q = zl.lagrangian_positions(shape, 5.0)
    for window in ("ngp", "cic", "tsc"):
        delta, mean = zl.paint(q, shape, 5.0, window=window)
        np.testing.assert_allclose(np.asarray(delta), 0.0, atol=1e-5)
        assert np.isclose(float(mean), 1.0, atol=1e-5)


def test_paint_conserves_mass_off_grid():
    # arbitrary positions: total painted mass == total weight
    rng = np.random.default_rng(3)
    shape = (6, 6, 6)
    pos = rng.uniform(0, 6 * 4.0, size=(3, 5, 7)).astype(np.float32)
    w = rng.uniform(0.5, 2.0, size=(5, 7)).astype(np.float32)
    for window in ("cic", "tsc"):
        delta, mean = zl.paint(pos, shape, 4.0, weights=w, window=window)
        mass = (np.asarray(delta) + 1.0) * float(mean)
        np.testing.assert_allclose(mass.sum(), w.sum(), rtol=1e-5)
        assert mass.min() >= 0.0  # all three kernels are non-negative


def test_zeldovich_positions_shift_and_wrap():
    shape = (4, 4, 4)
    spacing = 10.0
    psi = np.zeros((3,) + shape, np.float32)
    psi[0] += 38.0  # just under one box length (40): wraps
    x = np.asarray(zl.zeldovich_positions(psi, spacing))
    q = np.asarray(zl.lagrangian_positions(shape, spacing))
    np.testing.assert_allclose(x[1:], q[1:], atol=1e-5)
    np.testing.assert_allclose(x[0], (q[0] + 38.0) % 40.0, atol=1e-4)
    # rsd: f boosts the los component only
    s = np.asarray(zl.zeldovich_positions(psi, spacing, f=0.5, los_axis=0))
    np.testing.assert_allclose(s[0], (q[0] + 1.5 * 38.0) % 40.0, atol=1e-4)


def test_displaced_catalog_recovers_linear_power():
    # low amplitude => Zel'dovich displacement is linear: the painted
    # catalog's deconvolved P(k) matches the input spectrum at k well
    # below Nyquist
    n, spacing = 32, 8.0
    shape = (n, n, n)
    table = _scaled_default(shape, spacing, amplitude=3e-3)
    g = Generator(n, n, n, grid_spacing=spacing, power=table)
    psi = g.generate_displacement(seed=11)
    pos = zl.zeldovich_positions(psi, spacing)
    k, p, nm = zl.catalog_power(pos, spacing, nbins=12, window="cic")
    ok = np.isfinite(p) & (nm > 60)
    k, p, nm = k[ok], p[ok], nm[ok]
    lowk = k < 0.5 * np.pi / spacing  # under half Nyquist
    assert lowk.sum() >= 3
    pexp = np.asarray(interpolate_power(table, k[lowk].astype(np.float32)),
                      np.float64)
    resid = p[lowk] / pexp - 1.0
    noise = np.sqrt(2.0 / nm[lowk])
    assert np.all(np.abs(resid) < 5.0 * noise + 0.1), (resid, noise)


def test_kaiser_monopole_boost():
    # redshift-space monopole / real-space P = 1 + 2f/3 + f^2/5 at low k
    n, spacing, f = 32, 8.0, 0.7
    shape = (n, n, n)
    table = _scaled_default(shape, spacing, amplitude=1.5e-3)
    g = Generator(n, n, n, grid_spacing=spacing, power=table)
    ratios = []
    for seed in (1, 2, 3, 4):
        psi = g.generate_displacement(seed=seed)
        pos_r = zl.zeldovich_positions(psi, spacing)
        pos_s = zl.zeldovich_positions(psi, spacing, f=f)
        k, pr, nm = zl.catalog_power(pos_r, spacing, nbins=10, window="cic")
        _, ps, _ = zl.catalog_power(pos_s, spacing, nbins=10, window="cic")
        ok = np.isfinite(pr) & np.isfinite(ps) & (nm > 30) & (
            k < 0.3 * np.pi / spacing
        )
        # same seed => same modes: the ratio cancels sample variance at
        # leading order
        ratios.append(ps[ok] / pr[ok])
    ratio = np.concatenate(ratios).mean()
    kaiser = 1.0 + 2.0 * f / 3.0 + f * f / 5.0
    assert abs(ratio / kaiser - 1.0) < 0.08, (ratio, kaiser)


def test_poisson_shot_noise_flat():
    # uniform intensity, cell-center particles: P(k) == V/N (white) and
    # catalog_power's subtraction removes it
    n, spacing, nbar = 24, 5.0, 0.02
    shape = (n, n, n)
    counts = zl.poisson_sample(np.zeros(shape, np.float32), nbar, spacing,
                               seed=5)
    c = np.asarray(counts)
    lam = nbar * spacing**3
    assert abs(c.mean() / lam - 1.0) < 0.05
    assert abs(c.var() / lam - 1.0) < 0.08  # Poisson: var == mean
    q = zl.lagrangian_positions(shape, spacing)
    # particles at cell centers: NGP painting is exact; gate at low k
    # where the window deconvolution is ~1
    k, p, nm = zl.catalog_power(q, spacing, weights=counts, nbins=10,
                                window="ngp", subtract_shot_noise=False)
    volume = n**3 * spacing**3
    expected = zl.shot_noise(c, volume)  # counts form: V / N_gal
    assert abs(expected / (volume / float(c.sum())) - 1.0) < 1e-6
    ok = np.isfinite(p) & (nm > 30) & (k < 0.5 * np.pi / spacing)
    resid = p[ok] / expected - 1.0
    noise = np.sqrt(2.0 / nm[ok])
    assert np.all(np.abs(resid) < 5.0 * noise + 0.05), (resid, noise)
    # subtraction (the weighted default) zeroes it within noise
    _, p0, _ = zl.catalog_power(q, spacing, weights=counts, nbins=10,
                                window="ngp")
    assert np.all(np.abs(p0[ok]) < 5.0 * noise * expected + 0.05 * expected)


def test_window_deconvolution_matches_field_power():
    # painting the displaced grid with CIC then deconvolving must agree
    # with the spectral density field's own P(k) at moderate k; without
    # deconvolution the high-k bins are suppressed
    n, spacing = 32, 8.0
    table = _scaled_default((n, n, n), spacing, amplitude=2e-3)
    g = Generator(n, n, n, grid_spacing=spacing, power=table)
    delta = g.generate_delta_field(seed=7)
    kf, pf, nf = calculate_power(delta, spacing, nbins=12)
    psi = g.generate_displacement(seed=7)
    pos = zl.zeldovich_positions(psi, spacing)
    kc, pc, nc = zl.catalog_power(pos, spacing, nbins=12, window="cic")
    ok = np.isfinite(pf) & np.isfinite(pc) & (nf > 60) & (
        kf < 0.4 * np.pi / spacing
    )
    resid = pc[ok] / pf[ok] - 1.0
    assert np.all(np.abs(resid) < 0.15), resid


def test_catalog_power_validation_errors():
    with pytest.raises(ValueError):
        zl.paint(np.zeros((2, 4, 4, 4)), (4, 4, 4), 1.0)
    with pytest.raises(ValueError):
        zl.paint(np.zeros((3, 4, 4, 4)), (4, 4, 4), 1.0, window="spline")
    with pytest.raises(ValueError):
        zl.zeldovich_positions(np.zeros((4, 4, 4)), 1.0)
    with pytest.raises(ValueError):
        zl.catalog_power(np.zeros((3, 64)), 1.0)  # no shape for flat list
    with pytest.raises(ValueError):
        calculate_power(np.zeros((8, 8, 8), np.float32), 1.0,
                        window="bogus")


def test_multipoles_isotropic_field():
    # an isotropic Gaussian field has P_0 == calculate_power and
    # P_2, P_4 consistent with zero
    from randomfield_tpu.validate.stats import calculate_power_multipoles

    n, spacing = 32, 8.0
    table = _scaled_default((n, n, n), spacing, amplitude=1.0)
    g = Generator(n, n, n, grid_spacing=spacing, power=table)
    delta = g.generate_delta_field(seed=2, apply_lightcone=False)
    k0, p0, nm0 = calculate_power(delta, spacing, nbins=10)
    k, p_ell, nm = calculate_power_multipoles(delta, spacing, nbins=10)
    assert p_ell.shape == (3, 10)
    np.testing.assert_allclose(k, k0, rtol=1e-6, equal_nan=True)
    np.testing.assert_allclose(nm, nm0, rtol=1e-6)
    # bins past the axis Nyquist hold incomplete k-shells (only
    # diagonal-ish modes exist), which biases the mu moments — gate the
    # zero checks below k_Ny (documented estimator domain)
    ok = np.isfinite(p0) & (nm > 100) & (k < np.pi / spacing)
    np.testing.assert_allclose(p_ell[0][ok], p0[ok], rtol=2e-4)
    # quadrupole/hexadecapole: zero within (2l+1)*sqrt(2/N) mode noise
    for row, ell in ((1, 2), (2, 4)):
        noise = (2 * ell + 1) * np.sqrt(2.0 / nm[ok]) * p0[ok]
        assert np.all(np.abs(p_ell[row][ok]) < 5.0 * noise), (
            ell, p_ell[row][ok] / p0[ok])


def test_multipoles_validation_errors():
    from randomfield_tpu.validate.stats import calculate_power_multipoles

    delta = np.zeros((8, 8, 8), np.float32)
    with pytest.raises(ValueError):
        calculate_power_multipoles(delta, 1.0, ells=(0, 1))
    with pytest.raises(ValueError):
        calculate_power_multipoles(delta, 1.0, window="spline")


def test_kaiser_quadrupole():
    # redshift-space quadrupole / real-space monopole = 4f/3 + 4f^2/7
    # at low k; same-seed ratios cancel sample variance at leading order
    n, spacing, f = 32, 8.0, 0.7
    table = _scaled_default((n, n, n), spacing, amplitude=1.5e-3)
    g = Generator(n, n, n, grid_spacing=spacing, power=table)
    quad_ratio, mono_ratio = [], []
    for seed in (1, 2, 3, 4):
        psi = g.generate_displacement(seed=seed)
        pos_r = zl.zeldovich_positions(psi, spacing)
        pos_s = zl.zeldovich_positions(psi, spacing, f=f)
        k, pr, nm = zl.catalog_power(pos_r, spacing, nbins=10, window="cic")
        _, ps_ell, _ = zl.catalog_power_multipoles(
            pos_s, spacing, nbins=10, window="cic"
        )
        ok = np.isfinite(pr) & (nm > 30) & (k < 0.3 * np.pi / spacing)
        quad_ratio.append(ps_ell[1][ok] / pr[ok])
        mono_ratio.append(ps_ell[0][ok] / pr[ok])
    quad = np.concatenate(quad_ratio).mean()
    mono = np.concatenate(mono_ratio).mean()
    kaiser_0 = 1.0 + 2.0 * f / 3.0 + f * f / 5.0
    kaiser_2 = 4.0 * f / 3.0 + 4.0 * f * f / 7.0
    assert abs(mono / kaiser_0 - 1.0) < 0.08, (mono, kaiser_0)
    assert abs(quad / kaiser_2 - 1.0) < 0.15, (quad, kaiser_2)


def test_multipoles_los_axis_equivariance():
    # boosting along x and measuring with los_axis=0 must match the
    # z-axis measurement statistically; check it EXACTLY by transposing
    from randomfield_tpu.validate.stats import calculate_power_multipoles

    n, spacing = 16, 8.0
    rng = np.random.default_rng(0)
    delta = rng.normal(size=(n, n, n)).astype(np.float32)
    delta[:, :, :8] *= 2.0  # anisotropic along... make los matter
    k_z, p_z, nm_z = calculate_power_multipoles(delta, spacing, nbins=6,
                                                los_axis=2)
    k_x, p_x, nm_x = calculate_power_multipoles(
        np.transpose(delta, (2, 1, 0)), spacing, nbins=6, los_axis=0
    )
    np.testing.assert_allclose(nm_z, nm_x, rtol=1e-6)
    np.testing.assert_allclose(p_z, p_x, rtol=2e-3, equal_nan=True)


def _poisson_catalog(g, seed, mean_per_cell=2.0):
    """Discrete tracers at uniform positions within cells, counts
    Poisson(lam = mean_per_cell * (1 + delta)): the continuum
    assignment window applies (unlike near-lattice displaced grids)."""
    n = g.scene.shape[0]
    spacing = g.scene.grid_spacing
    rng = np.random.default_rng(seed)
    d = np.asarray(g.generate_fixed_field(seed=seed, apply_lightcone=False),
                   np.float64)
    counts = rng.poisson(np.maximum(1.0 + d, 0.0) * mean_per_cell)
    pos_list = []
    for c in range(1, counts.max() + 1):
        cells = np.argwhere(counts >= c)
        u = rng.uniform(0, 1, size=cells.shape)
        pos_list.append(((cells + u) * spacing).T)
    pos = np.concatenate(pos_list, axis=1).astype(np.float32)
    return pos, int(counts.sum())


@pytest.mark.slow
def test_interlacing_cancels_shot_noise_aliasing():
    """Sefusatti+16 behavior: for a Poisson catalog the aliased shot
    noise biases the deconvolved plain estimate by O(1) approaching
    Nyquist; the half-cell interlaced estimate stays at percent level
    (and matches the plain one at low k, where there is no aliasing)."""
    n, spacing = 32, 8.0
    shape = (n, n, n)
    table = _scaled_default(shape, spacing, amplitude=2e-2)
    g = Generator(n, n, n, grid_spacing=spacing, power=table)
    kny = np.pi / spacing
    volume = n**3 * spacing**3
    pos, npart = _poisson_catalog(g, seed=5)
    w = np.ones(pos.shape[1], np.float32)
    shot = volume / npart
    for window in ("cic", "tsc"):
        k_p, p_p, nm = zl.catalog_power(
            pos, spacing, shape=shape, weights=w, nbins=12,
            window=window, subtract_shot_noise=False,
        )
        k_i, p_i, _ = zl.catalog_power(
            pos, spacing, shape=shape, weights=w, nbins=12,
            window=window, subtract_shot_noise=False, interlaced=True,
        )
        ok = np.isfinite(p_p) & (nm > 30)
        pexp = np.asarray(
            interpolate_power(table, k_p[ok].astype(np.float32)), np.float64
        ) + shot
        rp = p_p[ok] / pexp - 1.0
        ri = p_i[ok] / pexp - 1.0
        # below the axis Nyquist the interlaced estimate is percent-level
        hi = (k_p[ok] > 0.6 * kny) & (k_p[ok] < kny)
        assert hi.sum() >= 2
        assert np.abs(ri[hi]).max() < 0.08, (window, ri[hi])
        # through the corner bins (incomplete shells just past the axis
        # Nyquist) plain aliasing is O(1); interlacing cuts it severalfold
        hi2 = k_p[ok] > 0.6 * kny
        assert np.abs(rp[hi2]).max() > 0.5, (window, rp[hi2])
        assert np.abs(ri[hi2]).max() < 0.5 * np.abs(rp[hi2]).max(), (
            window, ri[hi2], rp[hi2],
        )
        low = k_p[ok] < 0.3 * kny
        np.testing.assert_allclose(p_i[ok][low], p_p[ok][low], rtol=0.02)


def test_interlaced_multipoles_monopole_consistency():
    n, spacing = 24, 8.0
    shape = (n, n, n)
    table = _scaled_default(shape, spacing, amplitude=3e-3)
    g = Generator(n, n, n, grid_spacing=spacing, power=table)
    psi = g.generate_displacement(seed=4)
    pos = zl.zeldovich_positions(psi, spacing)
    k0, p0, _ = zl.catalog_power(
        pos, spacing, nbins=8, window="tsc", interlaced=True
    )
    kl, pl, _ = zl.catalog_power_multipoles(
        pos, spacing, nbins=8, ells=(0, 2), window="tsc", interlaced=True
    )
    ok = np.isfinite(p0)
    np.testing.assert_allclose(pl[0][ok], p0[ok], rtol=2e-4)
