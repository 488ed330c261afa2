"""kNN-CDF statistics: exact lattice gates.

Gates:
* `count_in_spheres` against a direct O(N^2) periodic distance count
  (exact integer equality — the FFT convolution rounds clean);
* measured kNN-CDFs of uniform random catalogs against the EXACT
  binomial expectation `random_knn_cdf` (no continuum/Poisson
  approximation — same lattice balls);
* the degenerate all-in-one-cell catalog, where every CDF_k equals
  m(r)/M exactly;
* monotonicity in r and k, [0, 1] bounds, and the clustering
  inequality (clustering empties space: CDF_1 below random).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from randomfield_tpu.validate import knn


def _random_positions(rng, n, box):
    return rng.random((3, n)) * box


def test_count_in_spheres_brute_force_parity():
    n, spacing = 16, 2.0
    box = n * spacing
    rng = np.random.default_rng(3)
    pos = _random_positions(rng, 20, box)
    # NGP counts
    idx = np.floor(pos / spacing).astype(int) % n
    counts = np.zeros((n, n, n))
    np.add.at(counts, tuple(idx), 1.0)
    for radius in (2.0, 5.0, 9.0):
        got = np.asarray(
            knn.count_in_spheres(jnp.asarray(counts, jnp.float32),
                                 spacing, radius)
        )
        # direct periodic min-image count around every cell
        ax = np.minimum(np.arange(n), n - np.arange(n)) * spacing
        r2 = (
            (ax**2)[:, None, None]
            + (ax**2)[None, :, None]
            + (ax**2)[None, None, :]
        )
        ball = (r2 <= radius**2 + 1e-9 * spacing**2).astype(np.float64)
        # circular convolution by explicit roll-sum over occupied cells
        expect = np.zeros_like(counts)
        for cx, cy, cz in zip(*np.nonzero(counts)):
            expect += counts[cx, cy, cz] * np.roll(
                ball, (cx, cy, cz), axis=(0, 1, 2)
            )
        np.testing.assert_array_equal(got, expect)


def test_random_catalog_matches_exact_binomial():
    n, spacing, ntr, ncat = 24, 2.0, 200, 10
    box = n * spacing
    radii = (2.0, 4.0, 6.0, 9.0, 12.0)
    ks = (1, 2, 3)
    pred = knn.random_knn_cdf(ntr, (n, n, n), spacing, radii, ks)
    rng = np.random.default_rng(11)
    acc = []
    for _ in range(ncat):
        pos = _random_positions(rng, ntr, box)
        acc.append(
            knn.knn_cdf_positions(pos, (n, n, n), spacing, radii, ks)
        )
    mean = np.mean(acc, axis=0)
    sd = np.std(acc, axis=0, ddof=1) / np.sqrt(ncat)
    resid = np.abs(mean - pred)
    budget = 5.0 * sd + 5e-3
    assert (resid < budget).all(), (resid / budget).max()
    # bounds and monotonicity of the exact curve too
    assert (pred >= 0).all() and (pred <= 1).all()
    assert (np.diff(pred, axis=1) >= -1e-12).all()  # increasing in r
    assert (np.diff(pred, axis=0) <= 1e-12).all()  # decreasing in k


def test_all_in_one_cell_is_ball_fraction():
    n, spacing = 16, 2.0
    counts = np.zeros((n, n, n), np.float32)
    counts[3, 7, 1] = 5.0  # 5 tracers in one cell
    radii = (2.0, 6.0, 10.0)
    cdf = knn.knn_cdf(jnp.asarray(counts), spacing, radii, ks=(1, 2, 5))
    m = knn.lattice_ball_sizes((n, n, n), spacing, radii)
    expect = m / n**3
    for i in range(3):  # every k <= 5 sees the same ball fraction
        np.testing.assert_allclose(cdf[i], expect, rtol=0, atol=1e-12)


def test_clustering_lowers_cdf1():
    # same tracer count, maximally clustered vs uniform random: at
    # moderate radii the clustered catalog leaves more empty space
    n, spacing, ntr = 24, 2.0, 64
    rng = np.random.default_rng(5)
    box = n * spacing
    radii = (6.0,)
    pos_rand = _random_positions(rng, ntr, box)
    cdf_rand = knn.knn_cdf_positions(
        pos_rand, (n, n, n), spacing, radii, ks=(1,)
    )
    pos_clump = rng.random((3, ntr)) * 6.0  # all within one corner
    cdf_clump = knn.knn_cdf_positions(
        pos_clump, (n, n, n), spacing, radii, ks=(1,)
    )
    assert cdf_clump[0, 0] < cdf_rand[0, 0]


def test_knn_validation_errors():
    counts = jnp.zeros((8, 8, 8))
    with pytest.raises(ValueError):
        knn.knn_cdf(counts, 2.0, (1.0,), ks=(0,))
    with pytest.raises(ValueError):
        knn.knn_cdf_positions(
            jnp.zeros((2, 10)), (8, 8, 8), 2.0, (1.0,)
        )


@pytest.mark.parametrize("family", ["slab", "pencil"])
def test_knn_cdf_mesh_matches_single_device(family):
    """Distributed kNN-CDF (sharded transforms, in-program lattice-ball
    kernels, GSPMD reductions) equals the single-device estimate
    exactly — the integer-rounded counting identity leaves no room for
    FFT rounding."""
    if family == "slab":
        from randomfield_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=1, space=4)
    else:
        from randomfield_tpu.parallel.pencil import make_pencil_mesh

        mesh = make_pencil_mesh(data=1, spx=2, spy=2)
    n, spacing = 32, 4.0
    rng = np.random.RandomState(3)
    counts = np.zeros((n, n, n), np.float32)
    idx = rng.randint(0, n, size=(3, 500))
    np.add.at(counts, tuple(idx), 1.0)
    radii = (6.0, 10.0, 16.0)
    got0 = knn.knn_cdf(counts, spacing, radii, ks=(1, 2, 3))
    got1 = knn.knn_cdf(counts, spacing, radii, ks=(1, 2, 3), mesh=mesh)
    np.testing.assert_array_equal(got1, got0)


@pytest.mark.parametrize("family", ["slab", "pencil"])
def test_knn_cdf_positions_mesh_matches_single_device(family):
    """Catalog -> sharded NGP paint -> distributed kNN ladder equals
    the single-device positions path exactly."""
    if family == "slab":
        from randomfield_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=2, space=4)
    else:
        from randomfield_tpu.parallel.pencil import make_pencil_mesh

        mesh = make_pencil_mesh(data=2, spx=2, spy=2)
    rng = np.random.RandomState(2)
    n, spacing = 32, 4.0
    pos = rng.uniform(0, n * spacing, size=(3, 700))
    got0 = knn.knn_cdf_positions(pos, (n, n, n), spacing, (6.0, 12.0),
                                 ks=(1, 2))
    got1 = knn.knn_cdf_positions(pos, (n, n, n), spacing, (6.0, 12.0),
                                 ks=(1, 2), mesh=mesh)
    np.testing.assert_array_equal(got1, got0)
