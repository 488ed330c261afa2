"""Distributed catalog painting (parallel/paint.py) vs the single-device
painter, on the 8-virtual-device CPU mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from randomfield_tpu.models.zeldovich import paint
from randomfield_tpu.parallel.mesh import make_mesh
from randomfield_tpu.parallel.paint import paint_sharded


@pytest.mark.parametrize("window", ["ngp", "cic", "tsc"])
@pytest.mark.parametrize("space", [1, 4])
def test_paint_sharded_matches_single_device(window, space):
    shape, spacing = (16, 12, 8), 2.0
    rng = np.random.RandomState(7)
    n = 500
    box = np.asarray(shape) * spacing
    pos = rng.uniform(0, 1, size=(3, n)) * box[:, None]
    w = rng.uniform(0.5, 2.0, size=n).astype(np.float32)
    d0, m0 = paint(pos, shape, spacing, weights=w, window=window)
    mesh = make_mesh(data=1, space=space)
    d1, m1 = paint_sharded(pos, shape, spacing, mesh, weights=w,
                           window=window)
    assert np.isclose(m1, float(m0), rtol=1e-5)  # f32 add order
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d0), rtol=1e-4, atol=1e-5
    )


def test_paint_sharded_seam_particles():
    # particles exactly at the box/shard seams must conserve mass and
    # match the periodic single-device kernels
    shape, spacing = (16, 8, 8), 1.0
    mesh = make_mesh(data=1, space=4)
    seam_x = np.asarray([0.0, 0.01, 3.99, 4.0, 8.0, 15.99, 12.0, 0.5])
    pos = np.stack([
        seam_x,
        np.full_like(seam_x, 3.3),
        np.full_like(seam_x, 7.9),
    ])
    for window in ("ngp", "cic", "tsc"):
        d0, m0 = paint(pos, shape, spacing, window=window)
        d1, m1 = paint_sharded(pos, shape, spacing, mesh, window=window)
        np.testing.assert_allclose(
            np.asarray(d1), np.asarray(d0), rtol=1e-4, atol=1e-5
        )


def test_paint_sharded_mass_conservation():
    shape, spacing = (8, 8, 8), 4.0
    mesh = make_mesh(data=1, space=2)
    rng = np.random.RandomState(1)
    pos = rng.uniform(0, 32.0, size=(3, 200))
    d, mean = paint_sharded(pos, shape, spacing, mesh, window="tsc")
    # sum of (1 + delta) * mean over cells == total mass == N
    total = float(jnp.sum((d + 1.0) * mean))
    assert np.isclose(total, 200.0, rtol=1e-4)


def test_paint_sharded_bad_window():
    mesh = make_mesh(data=1, space=2)
    with pytest.raises(ValueError, match="window"):
        paint_sharded(np.zeros((3, 4)), (8, 8, 8), 1.0, mesh, window="spline")


def test_catalog_power_mesh_matches_single_device():
    from randomfield_tpu.models.zeldovich import catalog_power

    shape, spacing = (16, 16, 16), 4.0
    rng = np.random.RandomState(3)
    pos = rng.uniform(0, 64.0, size=(3, 2000)).astype(np.float32)
    w = rng.poisson(1.0, size=2000).astype(np.float32)
    k0, p0, n0 = catalog_power(pos, spacing, shape=shape, weights=w,
                               nbins=8, window="tsc")
    mesh = make_mesh(data=1, space=4)
    k1, p1, n1 = catalog_power(pos, spacing, shape=shape, weights=w,
                               nbins=8, window="tsc", mesh=mesh)
    np.testing.assert_allclose(n1, n0, rtol=1e-6)
    m = n0 > 0
    np.testing.assert_allclose(k1[m], k0[m], rtol=1e-5)
    np.testing.assert_allclose(
        p1[m], p0[m], rtol=2e-3, atol=1e-4 * np.nanmax(np.abs(p0))
    )


def test_fkp_power_mesh_matches_single_device():
    from randomfield_tpu.validate.fkp import fkp_power

    shape, spacing = (16, 16, 16), 4.0
    rng = np.random.RandomState(9)
    data = rng.uniform(0, 64.0, size=(3, 800)).astype(np.float32)
    rand = rng.uniform(0, 64.0, size=(3, 4000)).astype(np.float32)
    r0 = fkp_power(data, rand, spacing, shape, nbins=8, window="cic")
    mesh = make_mesh(data=1, space=2)
    r1 = fkp_power(data, rand, spacing, shape, nbins=8, window="cic",
                   mesh=mesh)
    np.testing.assert_allclose(r1.n_modes, r0.n_modes, rtol=1e-6)
    assert np.isclose(r1.alpha, r0.alpha, rtol=1e-6)
    assert np.isclose(r1.shot_noise, r0.shot_noise, rtol=1e-5)
    m = r0.n_modes > 0
    np.testing.assert_allclose(
        r1.p[m], r0.p[m], rtol=2e-3,
        atol=1e-4 * np.nanmax(np.abs(r0.p) + r0.shot_noise),
    )


def test_halo_counts_on_mesh_match_single_device():
    # the halo Poisson intensity pipeline is elementwise on the
    # (sharded) lognormal field; partitionable Threefry makes the
    # counts cube identical under sharding
    from randomfield_tpu.models.halos import HaloGenerator

    mesh = make_mesh(data=1, space=4)
    g0 = HaloGenerator(16, 16, 16, grid_spacing=8.0, nbins_mass=2)
    g1 = HaloGenerator(16, 16, 16, grid_spacing=8.0, nbins_mass=2,
                       mesh=mesh)
    c0 = np.asarray(g0.generate_halo_counts(seed=3))
    c1 = np.asarray(g1.generate_halo_counts(seed=3))
    assert c1.shape == c0.shape
    np.testing.assert_array_equal(c1, c0)


def test_mesh_interlaced_catalog_power_matches_single_device():
    from randomfield_tpu.models.zeldovich import catalog_power, paint
    from randomfield_tpu.parallel.pencil import make_pencil_mesh
    from randomfield_tpu.validate.stats import calculate_power

    shape, spacing = (16, 16, 16), 4.0
    rng = np.random.RandomState(5)
    pos = rng.uniform(0, 64.0, size=(3, 1500)).astype(np.float32)
    w = rng.poisson(1.0, size=1500).astype(np.float32)
    k0, p0, n0 = catalog_power(pos, spacing, shape=shape, weights=w,
                               nbins=8, window="tsc", interlaced=True)
    mesh = make_mesh(data=1, space=4)
    k1, p1, n1 = catalog_power(pos, spacing, shape=shape, weights=w,
                               nbins=8, window="tsc", interlaced=True,
                               mesh=mesh)
    np.testing.assert_allclose(n1, n0, rtol=1e-6)
    m = n0 > 0
    np.testing.assert_allclose(
        p1[m], p0[m], rtol=2e-3, atol=1e-4 * np.nanmax(np.abs(p0))
    )
    # pencil meshes: painting is slab-only, but the interlaced
    # ESTIMATOR runs on pencil shards (pre-painted grids)
    d1, _ = paint(pos, shape, spacing, weights=w, window="tsc")
    d2, _ = paint(pos + spacing / 2.0, shape, spacing, weights=w,
                  window="tsc")
    ke, pe, ne = calculate_power(d1, spacing, nbins=8, window="tsc",
                                 interlaced_with=d2)
    pmesh = make_pencil_mesh(data=1, spx=2, spy=2)
    kp, pp, np_ = calculate_power(d1, spacing, nbins=8, window="tsc",
                                  interlaced_with=d2, mesh=pmesh)
    np.testing.assert_allclose(np_, ne, rtol=1e-6)
    mp = ne > 0
    np.testing.assert_allclose(
        pp[mp], pe[mp], rtol=2e-3, atol=1e-4 * np.nanmax(np.abs(pe))
    )
    # (pencil painting landed later in round 4 — parity in
    # test_paint_sharded_pencil_matches_single_device)


def test_mesh_interlaced_fkp_matches_single_device():
    from randomfield_tpu.validate.fkp import fkp_power

    shape, spacing = (16, 16, 16), 4.0
    rng = np.random.RandomState(17)
    data = rng.uniform(0, 64.0, size=(3, 700)).astype(np.float32)
    rand = rng.uniform(0, 64.0, size=(3, 3500)).astype(np.float32)
    r0 = fkp_power(data, rand, spacing, shape, nbins=8, window="tsc",
                   interlaced=True)
    mesh = make_mesh(data=1, space=2)
    r1 = fkp_power(data, rand, spacing, shape, nbins=8, window="tsc",
                   interlaced=True, mesh=mesh)
    m = r0.n_modes > 0
    np.testing.assert_allclose(
        r1.p[m], r0.p[m], rtol=2e-3,
        atol=1e-4 * np.nanmax(np.abs(r0.p) + r0.shot_noise),
    )


def test_mesh_fkp_multipoles_match_single_device():
    from randomfield_tpu.validate.fkp import fkp_power_multipoles

    shape, spacing = (16, 16, 16), 4.0
    rng = np.random.RandomState(23)
    data = rng.uniform(0, 64.0, size=(3, 600)).astype(np.float32)
    rand = rng.uniform(0, 64.0, size=(3, 3000)).astype(np.float32)
    r0 = fkp_power_multipoles(data, rand, spacing, shape, nbins=8,
                              window="tsc")
    mesh = make_mesh(data=1, space=2)
    r1 = fkp_power_multipoles(data, rand, spacing, shape, nbins=8,
                              window="tsc", mesh=mesh)
    m = r0.n_modes > 0
    for ell in (0, 2, 4):
        np.testing.assert_allclose(
            r1.p[ell][m], r0.p[ell][m], rtol=2e-3,
            atol=1e-4 * np.nanmax(np.abs(r0.p[0]) + r0.shot_noise),
        )


def test_mesh_window_deconvolution_multipoles_wedges():
    """Window deconvolution on the mesh P_ell / wedge estimators equals
    the single-device deconvolving estimators on a painted catalog."""
    from randomfield_tpu.models.zeldovich import paint
    from randomfield_tpu.parallel.pencil import make_pencil_mesh
    from randomfield_tpu.validate.stats import (
        calculate_power_multipoles, calculate_power_wedges,
    )

    shape, spacing = (16, 16, 16), 4.0
    rng = np.random.RandomState(31)
    pos = rng.uniform(0, 64.0, size=(3, 1200)).astype(np.float32)
    d, _ = paint(pos, shape, spacing, window="tsc")
    k0, p0, n0 = calculate_power_multipoles(d, spacing, nbins=6,
                                            window="tsc")
    kw0, pw0, nw0 = calculate_power_wedges(d, spacing, nbins=6, nmu=3,
                                           window="tsc")
    for mesh in (make_mesh(data=1, space=4),
                 make_pencil_mesh(data=1, spx=2, spy=2)):
        k1, p1, n1 = calculate_power_multipoles(d, spacing, nbins=6,
                                                window="tsc", mesh=mesh)
        np.testing.assert_allclose(n1, n0, rtol=1e-6)
        m = n0 > 0
        np.testing.assert_allclose(
            p1[:, m], p0[:, m], rtol=2e-3,
            atol=1e-4 * np.nanmax(np.abs(p0)),
        )
        kw1, pw1, nw1 = calculate_power_wedges(d, spacing, nbins=6, nmu=3,
                                               window="tsc", mesh=mesh)
        np.testing.assert_allclose(nw1, nw0, rtol=1e-6)
        mw = nw0 > 0
        np.testing.assert_allclose(
            pw1[mw], pw0[mw], rtol=2e-3,
            atol=1e-4 * np.nanmax(np.abs(pw0[mw])),
        )


@pytest.mark.parametrize("window", ["ngp", "cic", "tsc"])
def test_paint_sharded_pencil_matches_single_device(window):
    from randomfield_tpu.parallel.pencil import make_pencil_mesh

    shape, spacing = (16, 12, 8), 2.0
    rng = np.random.RandomState(19)
    n = 600
    box = np.asarray(shape) * spacing
    pos = rng.uniform(0, 1, size=(3, n)) * box[:, None]
    # sprinkle exact seam particles on both sharded axes
    pos[0, :8] = np.asarray([0.0, 0.01, 7.99, 8.0, 16.0, 31.99, 24.0, 0.5])
    pos[1, :8] = np.asarray([0.0, 5.99, 6.0, 12.0, 18.0, 23.99, 11.9, 0.3])
    w = rng.uniform(0.5, 2.0, size=n).astype(np.float32)
    d0, m0 = paint(pos, shape, spacing, weights=w, window=window)
    mesh = make_pencil_mesh(data=1, spx=2, spy=2)
    d1, m1 = paint_sharded(pos, shape, spacing, mesh, weights=w,
                           window=window)
    assert np.isclose(m1, float(m0), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d0), rtol=1e-4, atol=2e-5
    )


def test_catalog_power_pencil_mesh():
    from randomfield_tpu.models.zeldovich import catalog_power
    from randomfield_tpu.parallel.pencil import make_pencil_mesh

    shape, spacing = (16, 16, 16), 4.0
    rng = np.random.RandomState(41)
    pos = rng.uniform(0, 64.0, size=(3, 1500)).astype(np.float32)
    k0, p0, n0 = catalog_power(pos, spacing, shape=shape, nbins=8,
                               window="cic", subtract_shot_noise=True)
    mesh = make_pencil_mesh(data=1, spx=2, spy=2)
    k1, p1, n1 = catalog_power(pos, spacing, shape=shape, nbins=8,
                               window="cic", subtract_shot_noise=True,
                               mesh=mesh)
    np.testing.assert_allclose(n1, n0, rtol=1e-6)
    m = n0 > 0
    np.testing.assert_allclose(
        p1[m], p0[m], rtol=2e-3, atol=1e-4 * np.nanmax(np.abs(p0))
    )


def test_mesh_interlaced_catalog_multipoles_match_single_device():
    from randomfield_tpu.models.zeldovich import catalog_power_multipoles
    from randomfield_tpu.parallel.pencil import make_pencil_mesh

    shape, spacing = (16, 16, 16), 4.0
    rng = np.random.RandomState(47)
    pos = rng.uniform(0, 64.0, size=(3, 1200)).astype(np.float32)
    k0, p0, n0 = catalog_power_multipoles(
        pos, spacing, shape=shape, nbins=6, window="tsc", interlaced=True
    )
    for mesh in (make_mesh(data=1, space=4),
                 make_pencil_mesh(data=1, spx=2, spy=2)):
        k1, p1, n1 = catalog_power_multipoles(
            pos, spacing, shape=shape, nbins=6, window="tsc",
            interlaced=True, mesh=mesh,
        )
        np.testing.assert_allclose(n1, n0, rtol=1e-6)
        m = n0 > 0
        np.testing.assert_allclose(
            np.asarray(p1)[:, m], np.asarray(p0)[:, m], rtol=2e-3,
            atol=1e-4 * np.nanmax(np.abs(np.asarray(p0))),
        )
