"""Direct pair-count statistics: brute-force parity + physics gates.

The estimator (validate/paircount.py) is pinned against an O(N^2)
float64 numpy oracle (weights, wedges, Legendre multipoles, cross
counts), its analytic RR normalization against uniform catalogs, and
its physics against the FFT/grid estimators on the same tracers.
"""

import numpy as np
import pytest

from randomfield_tpu import Generator
from randomfield_tpu.validate import paircount, stats


def _brute(pos1, box, edges, w1=None, pos2=None, w2=None, nmu=1,
           ells=(), los_axis=2):
    """O(N^2) float64 oracle: ordered pairs, minimum image, r2 > 0."""
    pos1 = np.asarray(pos1, np.float64)
    w1 = np.ones(len(pos1)) if w1 is None else np.asarray(w1, np.float64)
    auto = pos2 is None
    pos2 = pos1 if auto else np.asarray(pos2, np.float64)
    w2 = w1 if auto else (
        np.ones(len(pos2)) if w2 is None else np.asarray(w2, np.float64)
    )
    box = np.asarray(box if np.ndim(box) else [box] * 3, np.float64)
    d = pos1[:, None, :] - pos2[None, :, :]
    d -= box * np.round(d / box)
    r2 = (d * d).sum(-1)
    r = np.sqrt(r2)
    idx = np.searchsorted(edges, r, side="right") - 1
    valid = (idx >= 0) & (idx < len(edges) - 1) & (r2 > 0)
    wij = np.where(valid, w1[:, None] * w2[None, :], 0.0)
    nbins = len(edges) - 1
    mu2 = np.where(r2 > 0, d[..., los_axis] ** 2 / np.where(r2 > 0, r2, 1),
                   0.0)
    if nmu > 1:
        mu_idx = np.clip((np.sqrt(mu2) * nmu).astype(int), 0, nmu - 1)
        dd = np.zeros((nbins, nmu))
        for b in range(nbins):
            for m in range(nmu):
                dd[b, m] = wij[valid & (idx == b) & (mu_idx == m)].sum()
        return dd
    if ells:
        leg = {0: lambda x: np.ones_like(x),
               2: lambda x: 0.5 * (3 * x - 1),
               4: lambda x: 0.125 * (35 * x * x - 30 * x + 3)}
        out = np.zeros((len(ells), nbins))
        for i, e in enumerate(ells):
            wl = wij * (2 * e + 1) * leg[e](mu2)
            for b in range(nbins):
                out[i, b] = wl[valid & (idx == b)].sum()
        return out
    dd = np.zeros(nbins)
    for b in range(nbins):
        dd[b] = wij[valid & (idx == b)].sum()
    return dd


def test_pair_counts_match_brute_force():
    rng = np.random.default_rng(0)
    box = 100.0
    pos = rng.random((151, 3)) * box
    w = rng.random(151) + 0.5
    edges = np.array([0.0, 5.0, 12.0, 25.0, 50.0])
    c = paircount.pair_counts(pos, box, edges, weights=w, chunk=37)
    want = _brute(pos, box, edges, w1=w)
    np.testing.assert_allclose(c["dd"], want, rtol=5e-6)
    # unweighted, anisotropic box, mu wedges along a non-default axis
    box3 = (100.0, 80.0, 120.0)
    edges3 = np.array([0.0, 5.0, 12.0, 25.0, 38.0])
    pos = rng.random((120, 3)) * np.asarray(box3)
    c = paircount.pair_counts(pos, box3, edges3, nmu=3, los_axis=0,
                              chunk=11)
    want = _brute(pos, box3, edges3, nmu=3, los_axis=0)
    np.testing.assert_allclose(c["dd"], want, rtol=5e-6)
    assert c["dd"].shape == (4, 3)


def test_pair_counts_cross_and_multipoles_match_brute_force():
    rng = np.random.default_rng(1)
    box = 60.0
    p1 = rng.random((90, 3)) * box
    p2 = rng.random((140, 3)) * box
    w1 = rng.random(90) + 0.2
    w2 = rng.random(140) + 0.2
    edges = np.array([2.0, 8.0, 15.0, 30.0])
    c = paircount.pair_counts(p1, box, edges, weights=w1, positions2=p2,
                              weights2=w2, chunk=16)
    want = _brute(p1, box, edges, w1=w1, pos2=p2, w2=w2)
    np.testing.assert_allclose(c["dd"], want, rtol=5e-6)
    ells = (0, 2, 4)
    c = paircount.pair_counts(p1, box, edges, ells=ells, chunk=32)
    want = _brute(p1, box, edges, ells=ells)
    np.testing.assert_allclose(c["dd_ell"], want, rtol=5e-6, atol=1e-4)


def test_uniform_catalog_xi_is_zero():
    # the analytic RR normalization: uniform points give xi = 0 within
    # Poisson error on every scale, auto and cross
    rng = np.random.default_rng(2)
    box, n = 100.0, 4000
    pos = rng.random((n, 3)) * box
    edges = np.geomspace(3.0, 45.0, 9)
    r, xi, dd = paircount.catalog_correlation(pos, box, edges)
    sd = 2.0 / np.sqrt(dd)  # ordered pairs double-count -> 2/sqrt(DD)
    assert (np.abs(xi) < 5 * sd).all(), (np.abs(xi) / sd).max()
    pos2 = rng.random((n // 2, 3)) * box
    r, xi2, dd2 = paircount.catalog_correlation(pos, box, edges,
                                                positions2=pos2)
    assert (np.abs(xi2) < 5.0 / np.sqrt(dd2)).all()


def test_validation_errors():
    pos = np.zeros((4, 3))
    with pytest.raises(ValueError, match="minimum-image"):
        paircount.pair_counts(pos, 10.0, [0.0, 6.0])
    with pytest.raises(ValueError, match="increasing"):
        paircount.pair_counts(pos, 10.0, [3.0, 1.0])
    with pytest.raises(ValueError, match="positions"):
        paircount.pair_counts(np.zeros((5, 2)), 10.0, [0.0, 1.0])
    with pytest.raises(ValueError, match="ell"):
        paircount.pair_counts(pos, 10.0, [0.0, 2.0], ells=(1,))
    with pytest.raises(ValueError, match="not both"):
        paircount.pair_counts(pos, 10.0, [0.0, 2.0], ells=(0,), nmu=4)


@pytest.mark.slow
def test_tracer_xi_matches_grid_estimator():
    # Poisson tracers of a lognormal field, jittered uniformly in cells:
    # pair-count xi agrees with the theory xi of the mock within a few
    # sigma of the seed scatter at intermediate r (binning differs from
    # the grid estimator's minimum-image lattice shells, so gate against
    # smooth theory, not bin-exact parity)
    from randomfield_tpu.models.lognormal import LognormalGenerator
    from randomfield_tpu.models.zeldovich import poisson_sample
    from randomfield_tpu.ops import power as _power

    n, spacing = 32, 4.0
    box = n * spacing
    g = LognormalGenerator(n, n, n, grid_spacing=spacing)
    rng = np.random.default_rng(3)
    edges = np.geomspace(6.0, 50.0, 8)
    xis = []
    for seed in range(4):
        delta = g.generate_delta_field(seed)
        counts = np.asarray(poisson_sample(delta, 0.004, spacing,
                                           seed=seed))
        idx = np.argwhere(counts > 0)
        reps = counts[counts > 0].astype(int)
        cells = np.repeat(idx, reps, axis=0).astype(np.float64)
        pos = (cells + rng.random(cells.shape)) * spacing
        r, xi, dd = paircount.catalog_correlation(pos, box, edges)
        xis.append(xi)
    xi_mean = np.mean(xis, axis=0)
    xi_sd = np.std(xis, axis=0, ddof=1) / np.sqrt(len(xis))
    # theory xi of the TARGET spectrum on these scales (the lognormal
    # mock's xi equals the target by construction)
    r_th = np.asarray(r, np.float64)
    xi_th = np.asarray(
        _power.power_to_correlation(g.power, r_th), np.float64
    )
    resid = np.abs(xi_mean - xi_th)
    budget = 5 * xi_sd + 0.1 * np.abs(xi_th) + 0.01 * np.abs(xi_th).max()
    assert (resid < budget).all(), (resid / budget).max()


def test_rsd_multipoles_show_kaiser_anisotropy():
    # redshift-space Zel'dovich catalog: pair-count xi_2 is negative on
    # quasi-linear scales (Kaiser squashing) while the real-space
    # catalog's xi_2 is consistent with 0
    from randomfield_tpu.models.zeldovich import zeldovich_positions

    n, spacing, f = 32, 4.0, 0.8
    box = n * spacing
    g = Generator(n, n, n, grid_spacing=spacing)
    edges = np.geomspace(10.0, 60.0, 6)
    q2_rs, q2_zs, q0 = [], [], []
    for seed in range(3):
        psi = g.generate_displacement(seed)
        pos_r = np.asarray(zeldovich_positions(psi, spacing)).reshape(
            3, -1).T
        pos_z = np.asarray(
            zeldovich_positions(psi, spacing, f=f, los_axis=2)
        ).reshape(3, -1).T
        # subsample to keep the pair count light
        sel = np.random.default_rng(seed).choice(
            len(pos_r), 3000, replace=False
        )
        _, xr, _ = paircount.catalog_correlation_multipoles(
            pos_r[sel], box, edges, ells=(0, 2)
        )
        _, xz, _ = paircount.catalog_correlation_multipoles(
            pos_z[sel], box, edges, ells=(0, 2)
        )
        q2_rs.append(xr[1])
        q2_zs.append(xz[1])
        q0.append(xz[0])
    q2_rs = np.mean(q2_rs, axis=0)
    q2_zs = np.mean(q2_zs, axis=0)
    # the redshift-space quadrupole is clearly more negative than the
    # real-space one on these scales (Kaiser: xi_2 < 0 when xi falls
    # with r)
    assert q2_zs.mean() < q2_rs.mean() - 0.005
    assert q2_zs.mean() < 0


@pytest.mark.parametrize("family", ["slab", "pencil"])
def test_pair_counts_mesh_matches_single_device(family):
    """Row-sharded pair counting over every mesh device reproduces the
    single-device sums exactly (same chunk masking, same one-hot
    contraction, one psum)."""
    if family == "slab":
        from randomfield_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=2, space=4)
    else:
        from randomfield_tpu.parallel.pencil import make_pencil_mesh

        mesh = make_pencil_mesh(data=2, spx=2, spy=2)
    rng = np.random.RandomState(5)
    box = 64.0
    pos = rng.uniform(0, box, size=(300, 3)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, size=300).astype(np.float32)
    edges = np.linspace(0.0, 20.0, 6)
    d0 = paircount.pair_counts(pos, box, edges, weights=w, ells=(0, 2))
    d1 = paircount.pair_counts(pos, box, edges, weights=w, ells=(0, 2), mesh=mesh)
    np.testing.assert_allclose(d1["dd"], d0["dd"], rtol=1e-6)
    np.testing.assert_allclose(d1["dd_ell"], d0["dd_ell"], rtol=1e-6,
                               atol=1e-4 * np.abs(d0["dd_ell"]).max())
    np.testing.assert_allclose(d1["r_mean"], d0["r_mean"], rtol=1e-6)
    # wedge mode too
    d0 = paircount.pair_counts(pos, box, edges, weights=w, nmu=3)
    d1 = paircount.pair_counts(pos, box, edges, weights=w, nmu=3, mesh=mesh)
    np.testing.assert_allclose(d1["dd"], d0["dd"], rtol=1e-6)
