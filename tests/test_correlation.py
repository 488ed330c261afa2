"""Two-point correlation function: theory transform + measured estimator.

Gates:
* ``power_to_correlation`` against the closed form for a Gaussian P(k);
* ``predicted_correlation`` == binned grid-mode sum (single-cosine algebra);
* ``calculate_correlation`` of rendered fields against its exact
  expectation ``predicted_correlation`` (same modes, same bins — the
  residual is pure sample noise);
* Parseval: the xi estimator's zero-lag completion equals the variance.
"""

import numpy as np
import jax.numpy as jnp

from randomfield_tpu import Generator
from randomfield_tpu.ops import power as rf_power
from randomfield_tpu.validate import stats


def _gaussian_table(amp=2500.0, R=8.0):
    k = np.logspace(-4, 2, 1500)
    return k, amp * np.exp(-(k * R) ** 2)


def test_power_to_correlation_gaussian_closed_form():
    # P(k) = A exp(-k^2 R^2)  =>  xi(r) = A exp(-r^2/4R^2) / (8 pi^1.5 R^3)
    amp, R = 2500.0, 8.0
    table = _gaussian_table(amp, R)
    r = np.array([0.5, 4.0, 10.0, 25.0, 40.0])
    xi = rf_power.power_to_correlation(table, r)
    expected = amp * np.exp(-(r**2) / (4 * R**2)) / (8 * np.pi**1.5 * R**3)
    np.testing.assert_allclose(xi, expected, rtol=2e-3)


def test_power_to_correlation_scalar_and_consistency():
    table = _gaussian_table()
    xi = rf_power.power_to_correlation(table, 10.0)
    assert isinstance(xi, float)
    np.testing.assert_allclose(
        xi, rf_power.power_to_correlation(table, [10.0])[0], rtol=0
    )


def test_calculate_correlation_single_cosine():
    # delta = A cos(k0 x): xi(r) = A^2/2 cos(k0 rx) — deterministic; every
    # cell in a bin contributes A^2/2 cos(k0 * rx(cell))
    n, spacing, amp, m = 32, 2.0, 0.7, 3
    x = np.arange(n) * spacing
    k0 = 2 * np.pi / (n * spacing) * m
    delta = np.broadcast_to(amp * np.cos(k0 * x)[:, None, None], (n, n, n))
    nbins = 16
    r, xi, cnt = stats.calculate_correlation(
        jnp.asarray(delta, jnp.float32), spacing, nbins=nbins
    )
    # reproduce the bin averages directly from the known xi(r) field
    ax = np.minimum(np.arange(n), n - np.arange(n)) * spacing
    rx = ax[:, None, None]
    rmag = np.sqrt(rx**2 + ax[None, :, None] ** 2 + ax[None, None, :] ** 2)
    xi_field = amp**2 / 2 * np.cos(k0 * rx) * np.ones((n, n, n))
    edges = np.linspace(0.0, 0.5 * n * spacing, nbins + 1)
    idx = np.searchsorted(edges, rmag) - 1
    valid = (idx >= 0) & (idx < nbins) & (rmag > 0)
    for b in range(nbins):
        sel = valid & (idx == b)
        if not sel.any():
            assert np.isnan(xi[b])
            continue
        np.testing.assert_allclose(xi[b], xi_field[sel].mean(), rtol=2e-4,
                                   atol=1e-7)
        np.testing.assert_allclose(cnt[b], sel.sum(), rtol=1e-6)


def test_measured_correlation_matches_prediction():
    n, spacing, nbins, nseeds = 32, 4.0, 12, 6
    g = Generator(n, n, n, grid_spacing=spacing)
    r_pred, xi_pred, cnt = stats.predicted_correlation(
        g.power, (n, n, n), spacing, nbins=nbins
    )
    acc = []
    for s in range(nseeds):
        r, xi, _ = stats.calculate_correlation(
            g.generate_delta_field(s, apply_lightcone=False), spacing,
            nbins=nbins,
        )
        acc.append(xi)
        np.testing.assert_allclose(r, r_pred, rtol=1e-5)
    xi_mean = np.mean(acc, axis=0)
    xi_sd = np.std(acc, axis=0, ddof=1) / np.sqrt(nseeds)
    mask = cnt > 0
    # 5-sigma gate per bin on the seed-averaged residual, with an absolute
    # floor for bins where xi ~ 0
    resid = np.abs(xi_mean - xi_pred)[mask]
    budget = 5.0 * xi_sd[mask] + 1e-4 * np.nanmax(np.abs(xi_pred))
    assert (resid < budget).all(), (resid / budget).max()


def test_zero_lag_completes_to_variance():
    # sum_k P_hat/V over ALL modes = var(delta): check the Parseval
    # identity through the same P_hat grid the estimator uses
    n, spacing = 24, 4.0
    g = Generator(n, n, n, grid_spacing=spacing)
    delta = g.generate_delta_field(11, apply_lightcone=False)
    _, var = stats.field_moments(delta)
    p = stats._mode_power(jnp.asarray(delta), (n, n, n), spacing)
    p = np.asarray(p, np.float64)
    mult = np.full(n // 2 + 1, 2.0)
    mult[0] = 1.0
    mult[-1] = 1.0  # even n
    volume = n**3 * spacing**3
    total = (p * mult[None, None, :]).sum() / volume
    mean, _ = stats.field_moments(delta)
    np.testing.assert_allclose(total - mean**2, var, rtol=1e-4)


def test_predicted_correlation_zero_lag_is_variance():
    # completing predicted xi bins with the zero-lag cell reproduces the
    # engine's predicted variance: xi(0) = sum_k P/V / V ... = sigma^2
    n, spacing = 32, 4.0
    g = Generator(n, n, n, grid_spacing=spacing)
    from randomfield_tpu.ops import grid as rf_grid
    from randomfield_tpu.ops.power import interpolate_power

    kmag = rf_grid.kmag((n, n, n), spacing, jnp.float32)
    pgrid = np.asarray(interpolate_power(g.power, kmag), np.float64)
    pgrid[0, 0, 0] = 0.0
    mult = np.full(n // 2 + 1, 2.0)
    mult[0] = 1.0
    mult[-1] = 1.0
    volume = n**3 * spacing**3
    xi0 = (pgrid * mult[None, None, :]).sum() / volume
    np.testing.assert_allclose(xi0, g.predicted_variance(), rtol=2e-3)


def test_correlation_multipole_monopole_matches_isotropic():
    # ells=(0,): L_0 weight is 1, so the multipole estimator reproduces
    # calculate_correlation bin for bin (same lags, same bins)
    n, spacing, nbins = 32, 4.0, 12
    g = Generator(n, n, n, grid_spacing=spacing)
    delta = g.generate_delta_field(3, apply_lightcone=False)
    r0, xi0, c0 = stats.calculate_correlation(delta, spacing, nbins=nbins)
    r, xil, c = stats.calculate_correlation_multipoles(
        delta, spacing, nbins=nbins, ells=(0,)
    )
    np.testing.assert_allclose(r, r0, rtol=1e-6)
    np.testing.assert_allclose(c, c0, rtol=1e-6)
    np.testing.assert_allclose(xil[0], xi0, rtol=1e-5, atol=1e-9)


def test_predicted_multipoles_isotropic_limits():
    # f=0 monopole equals predicted_correlation; the quadrupole /
    # hexadecapole expectations are pure discreteness residuals, small
    # relative to the monopole peak
    n, spacing, nbins = 32, 4.0, 12
    g = Generator(n, n, n, grid_spacing=spacing)
    r0, xi0, _ = stats.predicted_correlation(
        g.power, (n, n, n), spacing, nbins=nbins
    )
    r, xil, cnt = stats.predicted_correlation_multipoles(
        g.power, (n, n, n), spacing, f=0.0, nbins=nbins
    )
    np.testing.assert_allclose(r, r0, rtol=1e-6)
    np.testing.assert_allclose(xil[0], xi0, rtol=1e-5, atol=1e-9)
    peak = np.nanmax(np.abs(xi0))
    mask = cnt > 200  # shells with decent mu coverage
    assert np.nanmax(np.abs(xil[1][mask])) < 0.12 * peak
    assert np.nanmax(np.abs(xil[2][mask])) < 0.12 * peak


def test_measured_multipoles_match_kaiser_prediction():
    # distort isotropic renders with the linear Kaiser factor
    # (1 + f mu_k^2) applied to their spectra; the measured xi_ell must
    # match predicted_correlation_multipoles(f) — same modes, same bins,
    # so the seed-averaged residual is pure sample noise
    n, spacing, f, nbins, nseeds = 32, 4.0, 0.8, 10, 6
    shape = (n, n, n)
    g = Generator(n, n, n, grid_spacing=spacing)
    r_pred, xi_pred, cnt = stats.predicted_correlation_multipoles(
        g.power, shape, spacing, f=f, nbins=nbins
    )
    kx = np.fft.fftfreq(n, d=spacing) * 2 * np.pi
    kz = np.fft.rfftfreq(n, d=spacing) * 2 * np.pi
    k2 = kx[:, None, None] ** 2 + kx[None, :, None] ** 2 + kz[None, None, :] ** 2
    with np.errstate(invalid="ignore", divide="ignore"):
        mu2 = np.where(k2 > 0, kz[None, None, :] ** 2 / k2, 0.0)
    boost = 1.0 + f * mu2
    acc = []
    for s in range(nseeds):
        delta = np.asarray(
            g.generate_delta_field(s, apply_lightcone=False), np.float64
        )
        c = np.fft.rfftn(delta) * boost
        delta_s = np.fft.irfftn(c, s=shape)
        r, xil, _ = stats.calculate_correlation_multipoles(
            jnp.asarray(delta_s, jnp.float32), spacing, nbins=nbins
        )
        acc.append(xil)
        np.testing.assert_allclose(r, r_pred, rtol=1e-5)
    acc = np.array(acc)
    xi_mean = acc.mean(axis=0)
    xi_sd = acc.std(axis=0, ddof=1) / np.sqrt(nseeds)
    mask = cnt > 0
    floor = 2e-4 * np.nanmax(np.abs(xi_pred))
    for l in range(3):
        resid = np.abs(xi_mean[l] - xi_pred[l])[mask]
        budget = 5.0 * xi_sd[l][mask] + floor
        assert (resid < budget).all(), (l, (resid / budget).max())


def test_correlation_multipoles_odd_ell_rejected():
    n = 8
    delta = np.zeros((n, n, n), np.float32)
    try:
        stats.calculate_correlation_multipoles(delta, 1.0, ells=(0, 3))
    except ValueError as e:
        assert "ell=3" in str(e)
    else:
        raise AssertionError("ell=3 should raise")


def test_mesh_correlation_matches_single_device():
    import jax
    from randomfield_tpu.parallel.mesh import make_mesh

    n, spacing, nbins = 16, 8.0, 8
    g_ref = Generator(n, n, n, grid_spacing=spacing)
    d_ref = g_ref.generate_delta_field(9, apply_lightcone=False)
    r0, xi0, c0 = stats.calculate_correlation(d_ref, spacing, nbins=nbins)
    for data, space in ((1, 4), (2, 2)):
        mesh = make_mesh(data=data, space=space)
        g = Generator(n, n, n, grid_spacing=spacing, mesh=mesh)
        d = g.generate_delta_field(9, apply_lightcone=False)
        r, xi, c = stats.calculate_correlation(d, spacing, nbins=nbins,
                                               mesh=mesh)
        np.testing.assert_allclose(c, c0, rtol=1e-6)
        np.testing.assert_allclose(r, r0, rtol=1e-5)
        m = c0 > 0
        np.testing.assert_allclose(xi[m], xi0[m], rtol=5e-3, atol=5e-6)
    # pencil meshes run their own distributed path (round-4 change);
    # parity is asserted in test_pencil_correlation_matches_single_device


def test_spherical_bessels_against_legendre_integral():
    # j_ell(x) = (-1)^(ell/2)/2 * integral_{-1}^{1} P_ell(mu) cos(x mu) dmu
    # for even ell — an independent quadrature check of the closed forms
    mu = np.linspace(-1.0, 1.0, 20001)
    p2 = 0.5 * (3 * mu**2 - 1)
    p4 = 0.125 * (35 * mu**4 - 30 * mu**2 + 3)
    for x in (0.05, 0.3, 1.0, 4.0, 15.0):
        ref2 = -0.5 * np.trapezoid(p2 * np.cos(x * mu), mu)
        ref4 = 0.5 * np.trapezoid(p4 * np.cos(x * mu), mu)
        np.testing.assert_allclose(rf_power._j2(np.asarray(x)), ref2,
                                   rtol=0, atol=2e-8)
        np.testing.assert_allclose(rf_power._j4(np.asarray(x)), ref4,
                                   rtol=0, atol=2e-8)


def test_theory_multipoles_consistency():
    # f=0: monopole reduces to power_to_correlation, ell>0 vanish
    table = _gaussian_table()
    r = np.array([5.0, 15.0, 30.0])
    xi = rf_power.power_to_correlation_multipoles(table, r, f=0.0)
    xi0 = rf_power.power_to_correlation(table, r)
    np.testing.assert_allclose(xi[0], xi0, rtol=1e-10)
    assert np.abs(xi[1:]).max() == 0.0
    # Kaiser: each multipole is its coefficient times the isotropic
    # transform of P with the matching bessel (linear in P by design)
    f = 0.7
    xif = rf_power.power_to_correlation_multipoles(table, r, f=f)
    np.testing.assert_allclose(xif[0], (1 + 2 * f / 3 + f**2 / 5) * xi0,
                               rtol=1e-10)


def test_theory_multipoles_match_grid_expectation():
    # continuum Hankel transform vs the grid-exact FFT expectation, with
    # matched band limit: agree to a few % at intermediate r
    from randomfield_tpu.ops.power import load_default_power
    from randomfield_tpu.ops.grid import get_k_bounds

    n, spacing, f = 64, 4.0, 0.6
    shape = (n, n, n)
    table = load_default_power()
    r_pred, xi_grid, cnt = stats.predicted_correlation_multipoles(
        table, shape, spacing, f=f, nbins=24
    )
    kmax = get_k_bounds(shape, spacing)[1]
    m = (cnt > 500) & (r_pred > 3 * spacing) & (r_pred < n * spacing / 4)
    assert m.sum() >= 3
    xi_th = rf_power.power_to_correlation_multipoles(
        table, r_pred[m], f=f, kmax=kmax
    )
    scale = np.abs(xi_grid[0][m]).max()
    # the grid keeps (anisotropic) corner modes past the axis Nyquist and
    # bins over discrete mu shells, so agreement is at the tens-of-percent
    # level for the monopole/quadrupole and looser for the small
    # hexadecapole — this is a cross-validation of two independent code
    # paths (continuum Hankel vs discrete FFT), not an exactness gate
    np.testing.assert_allclose(xi_th[0], xi_grid[0][m],
                               atol=0.03 * scale, rtol=0.3)
    np.testing.assert_allclose(xi_th[1], xi_grid[1][m],
                               atol=0.03 * scale, rtol=0.3)
    np.testing.assert_allclose(xi_th[2], xi_grid[2][m],
                               atol=0.08 * scale, rtol=0.0)


def test_pencil_correlation_matches_single_device():
    from randomfield_tpu import Generator
    from randomfield_tpu.parallel.pencil import make_pencil_mesh
    from randomfield_tpu.validate.stats import calculate_correlation

    shape, spacing = (16, 16, 16), 4.0
    g = Generator(*shape, grid_spacing=spacing)
    delta = g.generate_delta_field(seed=6)
    r0, xi0, n0 = calculate_correlation(delta, spacing, nbins=10)
    mesh = make_pencil_mesh(data=1, spx=2, spy=2)
    r1, xi1, n1 = calculate_correlation(delta, spacing, nbins=10, mesh=mesh)
    np.testing.assert_allclose(n1, n0, rtol=1e-6)
    m = n0 > 0
    np.testing.assert_allclose(r1[m], r0[m], rtol=1e-5)
    np.testing.assert_allclose(
        xi1[m], xi0[m], rtol=5e-4, atol=1e-4 * np.nanmax(np.abs(xi0))
    )


def test_mesh_correlation_multipoles_match_single_device():
    from randomfield_tpu import Generator
    from randomfield_tpu.parallel.mesh import make_mesh
    from randomfield_tpu.parallel.pencil import make_pencil_mesh
    from randomfield_tpu.validate.stats import (
        calculate_correlation_multipoles,
    )

    shape, spacing = (16, 16, 16), 4.0
    g = Generator(*shape, grid_spacing=spacing)
    delta = g.generate_kaiser_field(seed=3, bias=1.5)
    r0, xi0, n0 = calculate_correlation_multipoles(delta, spacing, nbins=8)
    for mesh in (make_mesh(data=1, space=4),
                 make_pencil_mesh(data=1, spx=2, spy=2)):
        r1, xi1, n1 = calculate_correlation_multipoles(
            delta, spacing, nbins=8, mesh=mesh
        )
        np.testing.assert_allclose(n1, n0, rtol=1e-6)
        m = n0 > 0
        np.testing.assert_allclose(r1[m], r0[m], rtol=1e-5)
        np.testing.assert_allclose(
            xi1[:, m], xi0[:, m], rtol=5e-4,
            atol=1e-4 * np.nanmax(np.abs(xi0)),
        )
