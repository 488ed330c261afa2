"""Pairwise-velocity gates: deterministic parity on the realized
spectrum, statistical agreement with the exact expectation, infall sign,
and continuum (FFTLog) consistency in a big box."""

import numpy as np
import pytest

import jax.numpy as jnp

from randomfield_tpu.engine.generator import Generator
from randomfield_tpu.ops import derived as _derived
from randomfield_tpu.validate import velocity as vv
from randomfield_tpu.validate.stats import _mode_power


def test_parity_on_realized_spectrum():
    # v = delta_to_velocity(delta) means the measured cross spectrum is
    # EXACTLY i pref (k_j/k^2) |c_k|^2 — pushing the realized per-mode
    # power through the prediction pipeline must reproduce the measured
    # psi_r with no sample noise at all.
    shape = (20, 24, 16)
    spacing = 6.0
    g = Generator(*shape, spacing, power="eh98")
    d = g.generate_delta_field(seed=3, apply_lightcone=False)
    v = _derived.delta_to_velocity(d, spacing, g.cosmology, z=0.0)
    r_m, psi_m, c_m = vv.density_velocity_correlation(d, v, spacing,
                                                      nbins=14)
    pgrid = np.asarray(_mode_power(d, shape, spacing), np.float64)
    pgrid[0, 0, 0] = 0.0
    r_p, psi_p, c_p = vv.predicted_density_velocity_correlation(
        None, shape, spacing, g.cosmology, z=0.0, nbins=14, pgrid=pgrid)
    np.testing.assert_array_equal(c_m, c_p)
    good = c_m > 0
    scale = np.max(np.abs(psi_m[good]))
    np.testing.assert_allclose(psi_m[good], psi_p[good],
                               atol=2e-4 * scale, rtol=2e-4)


@pytest.mark.slow
def test_seed_direct_velocity_matches_prediction_statistically():
    # engine-rendered (delta, velocity) pairs over several seeds: the
    # ensemble-mean psi_r must match the exact P(k) expectation within
    # the ensemble's own standard error.
    shape = (24, 24, 24)
    spacing = 8.0
    nbins = 10
    g = Generator(*shape, spacing, power="eh98")
    psis = []
    # 60 seeds: the outer bins are dominated by the box's few largest
    # modes, so small ensembles land correlated multi-bin excursions
    # (the round-4 canonical-stream change re-drew the ensemble and the
    # old 10-seed sample sat at ~1.1x the allowance; 60 seeds measure
    # z < 1 in every bin)
    for seed in range(60):
        d = g.generate_delta_field(seed, apply_lightcone=False)
        v = g.generate_velocity(seed)
        _, psi, counts = vv.density_velocity_correlation(d, v, spacing,
                                                         nbins=nbins)
        psis.append(psi)
    psis = np.asarray(psis)
    mean = psis.mean(axis=0)
    sem = psis.std(axis=0, ddof=1) / np.sqrt(psis.shape[0])
    _, psi_pred, _ = vv.predicted_density_velocity_correlation(
        g.power, shape, spacing, g.cosmology, nbins=nbins)
    good = counts > 0
    resid = np.abs(mean - psi_pred)[good]
    allow = 5.0 * sem[good] + 1e-3 * np.max(np.abs(psi_pred[good]))
    assert np.all(resid < allow), (resid / allow)
    # infall: the well-measured inner bins are negative
    assert psi_pred[good][0] < 0
    assert mean[good][0] < 0


def test_pairwise_velocity_sign_and_decay():
    shape = (32, 32, 32)
    spacing = 8.0
    g = Generator(*shape, spacing, power="eh98")
    r, v12, counts = vv.predicted_pairwise_velocity(
        g.power, shape, spacing, g.cosmology, nbins=12)
    good = counts > 0
    v = v12[good]
    # infall everywhere on linear scales, strongest well inside the box
    assert np.all(v < 0)
    assert np.abs(v[-1]) < np.abs(v[1:-1]).max()
    # measured v12 from one seed agrees within sample noise (loose gate;
    # the ratio estimator is noisy at this size)
    d = g.generate_delta_field(seed=7, apply_lightcone=False)
    vel = g.generate_velocity(7)
    r_m, v12_m, c_m = vv.pairwise_velocity(d, vel, spacing, nbins=12)
    sel = good & (c_m > 0)
    assert np.corrcoef(v12_m[sel], v12[sel])[0, 1] > 0.9


def test_smoothing_damps_cross():
    shape = (24, 24, 24)
    spacing = 8.0
    g = Generator(*shape, spacing, power="eh98")
    _, psi0, c = vv.predicted_density_velocity_correlation(
        g.power, shape, spacing, g.cosmology, nbins=10)
    _, psi_s, _ = vv.predicted_density_velocity_correlation(
        g.power, shape, spacing, g.cosmology, nbins=10,
        smoothing_length=16.0)
    good = c > 0
    # smoothing suppresses the small-r correlation amplitude
    assert np.abs(psi_s[good][0]) < np.abs(psi0[good][0])
    # ... and the smoothed prediction still matches a smoothed render
    d = g.generate_delta_field(seed=5, smoothing_length=16.0,
                               apply_lightcone=False)
    v = g.generate_velocity(5, smoothing_length=16.0)
    _, psi_m, _ = vv.density_velocity_correlation(d, v, spacing, nbins=10)
    # single-seed: just demand same sign and right scale in the deepest bin
    ratio = psi_m[good][0] / psi_s[good][0]
    assert 0.4 < ratio < 2.5, ratio


def test_continuum_limit_big_box():
    # discrete binned prediction -> FFTLog continuum curve for r well
    # inside the box and far above the grid scale.
    shape = (96, 96, 96)
    spacing = 10.0
    g = Generator(*shape, spacing, power="eh98")
    nbins = 24
    r, psi, counts = vv.predicted_density_velocity_correlation(
        g.power, shape, spacing, g.cosmology, nbins=nbins)
    good = (counts > 0) & (r > 6 * spacing) & (r < 0.25 * shape[0] * spacing)
    psi_cont, v12_cont = vv.continuum_pairwise_velocity(
        g.power, r[good], g.cosmology)
    np.testing.assert_allclose(psi[good], psi_cont,
                               rtol=0.12, atol=0.02 * np.abs(psi_cont).max())
    assert np.all(v12_cont < 0)


def test_mesh_psi_matches_single_device():
    """Distributed psi_r / v12 (slab + pencil) equal the single-device
    estimator on the same fields."""
    from randomfield_tpu.parallel.mesh import make_mesh
    from randomfield_tpu.parallel.pencil import make_pencil_mesh

    shape, spacing = (16, 16, 16), 4.0
    g = Generator(*shape, grid_spacing=spacing)
    delta = g.generate_delta_field(seed=2, apply_lightcone=False)
    vel = g.generate_velocity(seed=2)
    r0, psi0, c0 = vv.density_velocity_correlation(delta, vel, spacing)
    rv0, v0, _ = vv.pairwise_velocity(delta, vel, spacing)
    for mesh in (make_mesh(data=1, space=4),
                 make_pencil_mesh(data=1, spx=2, spy=2)):
        r1, psi1, c1 = vv.density_velocity_correlation(
            delta, vel, spacing, mesh=mesh
        )
        np.testing.assert_allclose(c1, c0, rtol=1e-6)
        m = c0 > 0
        np.testing.assert_allclose(r1[m], r0[m], rtol=1e-5)
        np.testing.assert_allclose(
            psi1[m], psi0[m], rtol=5e-4,
            atol=1e-4 * np.nanmax(np.abs(psi0)),
        )
        rv1, v1, _ = vv.pairwise_velocity(delta, vel, spacing, mesh=mesh)
        np.testing.assert_allclose(
            v1[m], v0[m], rtol=5e-4, atol=1e-4 * np.nanmax(np.abs(v0))
        )
