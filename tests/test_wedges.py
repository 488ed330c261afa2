"""P(k, mu) clustering wedges: exact binning identities + Kaiser gates.

The wedge estimator (validate/stats.py:calculate_power_wedges) shares
the spherical estimator's k shells, Hermitian multiplicities and masks,
so its count-weighted mu average must reproduce calculate_power bin for
bin EXACTLY; anisotropy gates run against the exactly binned expectation
(generator.py:predicted_kaiser_wedges), so residuals are pure sample
noise.
"""

import numpy as np
import pytest

from randomfield_tpu import Generator
from randomfield_tpu.validate import stats


def test_wedge_monopole_recovery_is_exact():
    # summing count-weighted wedges reproduces the spherical estimator
    # bin for bin — same modes, same masks, same multiplicities
    n, spacing, nbins, nmu = 32, 8.0, 8, 4
    g = Generator(n, n, n, grid_spacing=spacing)
    delta = g.generate_delta_field(11)
    k0, p0, c0 = stats.calculate_power(delta, spacing, nbins=nbins)
    kw, pw, cw = stats.calculate_power_wedges(
        delta, spacing, nbins=nbins, nmu=nmu
    )
    np.testing.assert_allclose(cw.sum(axis=1), c0, rtol=0, atol=0)
    m = c0 > 0
    pooled = np.nansum(pw * cw, axis=1)[m] / c0[m]
    np.testing.assert_allclose(pooled, p0[m], rtol=2e-5)
    np.testing.assert_allclose(kw[m], k0[m], rtol=2e-5)


@pytest.mark.parametrize("los_axis", [0, 1])
def test_wedges_los_axis_equivariance(los_axis):
    # measuring along axis j equals transposing the field so that axis
    # becomes z and measuring along z — pins the mu assignment
    n, spacing = 16, 8.0
    g = Generator(n, n, n, grid_spacing=spacing)
    delta = np.asarray(g.generate_delta_field(3))
    k1, p1, c1 = stats.calculate_power_wedges(
        delta, spacing, nbins=6, nmu=3, los_axis=los_axis
    )
    order = {0: (2, 1, 0), 1: (0, 2, 1)}[los_axis]
    k2, p2, c2 = stats.calculate_power_wedges(
        np.transpose(delta, order), spacing, nbins=6, nmu=3, los_axis=2
    )
    np.testing.assert_allclose(c1, c2, atol=0)
    m = c1 > 0
    np.testing.assert_allclose(p1[m], p2[m], rtol=1e-4)


def test_kaiser_wedges_match_exact_expectation():
    # measured P(k, mu) of Kaiser renders vs the exactly binned
    # expectation; residuals are pure sample noise per wedge
    n, spacing, nseeds, nbins, nmu = 32, 8.0, 8, 8, 3
    b, f = 1.3, 0.8
    g = Generator(n, n, n, grid_spacing=spacing)
    k_pred, p_pred, cnt = g.predicted_kaiser_wedges(
        bias=b, f=f, nbins=nbins, nmu=nmu
    )
    acc = []
    for s in range(nseeds):
        rs = g.generate_kaiser_field(s, bias=b, f=f)
        _, pw, _ = stats.calculate_power_wedges(
            rs, spacing, nbins=nbins, nmu=nmu
        )
        acc.append(pw)
    p_mean = np.mean(acc, axis=0)
    p_sd = np.std(acc, axis=0, ddof=1) / np.sqrt(nseeds)
    m = cnt > 4
    scale = np.nanmax(np.abs(p_pred), axis=1, keepdims=True)
    resid = np.abs(p_mean - p_pred)[m]
    budget = (5.0 * p_sd + 5e-3 * np.broadcast_to(scale, p_pred.shape))[m]
    assert (resid < budget).all(), (resid / budget).max()
    # physics: in populous sub-Nyquist shells the high-mu wedge carries
    # the full Kaiser boost — monotone increase with mu
    rich = (cnt.min(axis=1) > 30) & (k_pred < np.pi / spacing)
    assert rich.any()
    assert (np.diff(p_pred[rich], axis=1) > 0).all()


def test_isotropic_wedges_flat_in_mu():
    # f=0: the expectation is mu-independent at fixed |k| up to the
    # within-shell spread of |k| across wedges; measured wedges agree
    # with the exact expectation within noise
    n, spacing, nbins, nmu = 32, 8.0, 8, 4
    g = Generator(n, n, n, grid_spacing=spacing)
    k_pred, p_pred, cnt = g.predicted_kaiser_wedges(
        f=0.0, nbins=nbins, nmu=nmu
    )
    acc = []
    for s in range(6):
        d = g.generate_delta_field(s, apply_lightcone=False)
        _, pw, _ = stats.calculate_power_wedges(
            d, spacing, nbins=nbins, nmu=nmu
        )
        acc.append(pw)
    p_mean = np.mean(acc, axis=0)
    p_sd = np.std(acc, axis=0, ddof=1) / np.sqrt(len(acc))
    m = cnt > 4
    resid = np.abs(p_mean - p_pred)[m]
    budget = (5.0 * p_sd + 5e-3 * np.nanmax(np.abs(p_pred)))[m]
    assert (resid < budget).all(), (resid / budget).max()
    # flatness of the EXPECTATION across mu in populous shells (the
    # wedge means differ only through within-shell |k| spread)
    rich = cnt.min(axis=1) > 30
    spread = np.ptp(p_pred[rich], axis=1) / p_pred[rich].mean(axis=1)
    assert (spread < 0.35).all()


def test_mesh_wedges_match_single_device():
    # distributed wedges (slab AND pencil, two LOS axes) equal the
    # single-device estimator bin for bin
    from randomfield_tpu.parallel.mesh import make_mesh
    from randomfield_tpu.parallel.pencil import make_pencil_mesh

    n, spacing, nbins, nmu = 16, 8.0, 6, 3
    g0 = Generator(n, n, n, grid_spacing=spacing)
    delta = np.asarray(g0.generate_kaiser_field(5, bias=1.2, f=0.7))
    for los_axis in (0, 2):
        k0, p0, c0 = stats.calculate_power_wedges(
            delta, spacing, nbins=nbins, nmu=nmu, los_axis=los_axis
        )
        for mesh in (make_mesh(2, 4), make_pencil_mesh(2, 2, 2)):
            g = Generator(n, n, n, grid_spacing=spacing, mesh=mesh)
            d = g.generate_kaiser_field(5, bias=1.2, f=0.7)
            k1, p1, c1 = stats.calculate_power_wedges(
                d, spacing, nbins=nbins, nmu=nmu, los_axis=los_axis,
                mesh=mesh,
            )
            np.testing.assert_allclose(c1, c0, atol=0)
            m = c0 > 0
            np.testing.assert_allclose(p1[m], p0[m], rtol=2e-4)
            np.testing.assert_allclose(k1, k0, rtol=1e-5, equal_nan=True)
    # window deconvolution composes with mesh= since round 4
    # (test_paint_sharded.py asserts parity); interlacing remains
    # single-device for wedges
    with pytest.raises(ValueError, match="single-device"):
        stats.calculate_power_wedges(
            delta, spacing, interlaced_with=delta, mesh=make_mesh(2, 4)
        )
