"""Zel'dovich BAO reconstruction (models/reconstruction.py): exact
displacement-estimator anchor, Kaiser removal, cross-correlation
recovery on an evolved mock."""

import numpy as np
import jax.numpy as jnp

from randomfield_tpu import Generator
from randomfield_tpu.models import reconstruction as rc
from randomfield_tpu.validate import stats


def _cross_r(a, b, spacing, nbins=8):
    """Per-bin cross-correlation coefficient r(k) of two fields."""
    k, pab, c = stats.calculate_cross_power(a, b, spacing, nbins=nbins)
    _, paa, _ = stats.calculate_power(a, spacing, nbins=nbins)
    _, pbb, _ = stats.calculate_power(b, spacing, nbins=nbins)
    denom = np.sqrt(np.maximum(paa * pbb, 1e-30))
    return k, np.where(c > 0, pab / denom, np.nan), c


def test_estimator_matches_seed_direct_displacement():
    # smoothing=0, bias=1, f=0 on a linear field: psi_hat IS the
    # engine's Zel'dovich displacement of that realization
    n, spacing = 32, 8.0
    g = Generator(n, n, n, grid_spacing=spacing)
    delta = g.generate_delta_field(3, apply_lightcone=False)
    psi_hat = np.asarray(rc.estimate_displacement(delta, spacing,
                                                  smoothing=0.0))
    psi_true = np.stack([
        np.asarray(g.generate_displacement(3, component=c))
        for c in range(3)
    ])
    scale = np.abs(psi_true).max()
    np.testing.assert_allclose(psi_hat, psi_true, atol=2e-5 * scale)


def test_kaiser_removal():
    # a Kaiser-distorted field divided by b(1 + beta mu^2) gives the
    # same displacement as the undistorted field / b
    n, spacing, b, f = 32, 8.0, 1.5, 0.6
    g = Generator(n, n, n, grid_spacing=spacing)
    d_real = g.generate_delta_field(5, apply_lightcone=False)
    d_red = g.generate_kaiser_field(5, bias=b, f=f)
    psi_from_red = np.asarray(rc.estimate_displacement(
        d_red, spacing, smoothing=4.0, bias=b, f=f))
    psi_from_real = np.asarray(rc.estimate_displacement(
        d_real, spacing, smoothing=4.0, bias=1.0, f=0.0))
    scale = np.abs(psi_from_real).max()
    np.testing.assert_allclose(psi_from_red, psi_from_real,
                               atol=2e-5 * scale)


def test_reconstruction_linear_field_is_near_identity():
    # at linear order delta_rec = delta: on a (small-amplitude) linear
    # field reconstruction must be close to a no-op on large scales
    n, spacing = 32, 8.0
    g = Generator(n, n, n, grid_spacing=spacing)
    delta = np.asarray(g.generate_delta_field(2, apply_lightcone=False,
                                              smoothing_length=8.0))
    delta = (0.05 / delta.std()) * delta  # force deeply linear
    rec, psi = rc.reconstruct_field(jnp.asarray(delta), spacing,
                                    smoothing=8.0)
    k, r, c = _cross_r(np.asarray(rec, np.float32), delta, spacing)
    good = c > 8
    assert np.all(r[good][:4] > 0.98)


def test_reconstruction_sharpens_evolved_mock():
    # Zel'dovich-evolve a linear field (nonlinear smearing), then
    # reconstruct: r(k) with the INITIAL field must beat the evolved
    # field's r(k) at quasi-linear k
    from randomfield_tpu.models import zeldovich as zl

    n, spacing = 48, 5.0
    g = Generator(n, n, n, grid_spacing=spacing)
    seed = 11
    delta_lin = np.asarray(g.generate_delta_field(
        seed, apply_lightcone=False))
    psi = jnp.stack([
        g.generate_displacement(seed, component=c) for c in range(3)
    ])
    q = zl.lagrangian_positions((n, n, n), spacing)
    evolved, _ = zl.paint(q + psi, (n, n, n), spacing, window="cic")
    evolved = np.asarray(evolved, np.float32)

    rec, _ = rc.reconstruct_field(jnp.asarray(evolved), spacing,
                                  smoothing=10.0)
    rec = np.asarray(rec, np.float32)
    nbins = 10
    k, r_ev, c = _cross_r(evolved, delta_lin, spacing, nbins)
    _, r_rec, _ = _cross_r(rec, delta_lin, spacing, nbins)
    ql = (k > 0.25) & (k < 0.6) & (c > 50)  # quasi-linear band
    assert ql.sum() >= 2
    assert np.nanmean(r_rec[ql]) > np.nanmean(r_ev[ql]) + 0.01
    # and reconstruction must not damage the fully linear scales
    lin = (k < 0.15) & (c > 8)
    assert np.all(r_rec[lin] > 0.95)


def test_displacement_at_positions_and_determinism():
    n, spacing = 16, 8.0
    g = Generator(n, n, n, grid_spacing=spacing)
    delta = g.generate_delta_field(7, apply_lightcone=False)
    psi = np.asarray(rc.estimate_displacement(delta, spacing,
                                              smoothing=8.0))
    pos = np.array([[4.0, 20.0, 100.0], [127.9, 0.1, 64.0]])
    out = rc.displacement_at_positions(psi, pos, spacing)
    assert out.shape == (2, 3)
    cells = np.floor(pos / spacing).astype(int) % n
    for i in range(2):
        np.testing.assert_array_equal(
            out[i], psi[:, cells[i][0], cells[i][1], cells[i][2]])
    rec1, _ = rc.reconstruct_field(delta, spacing)
    rec2, _ = rc.reconstruct_field(delta, spacing)
    np.testing.assert_array_equal(np.asarray(rec1), np.asarray(rec2))
