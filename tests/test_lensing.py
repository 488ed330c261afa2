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
