"""k-space geometry tests (ref test strategy: test_powertools k-bounds)."""

import jax.numpy as jnp
import numpy as np

from randomfield_tpu.ops import grid


def test_half_shape():
    assert grid.half_shape((8, 6, 10)) == (8, 6, 6)
    assert grid.half_shape((8, 6, 9)) == (8, 6, 5)


def test_kvectors_match_numpy():
    shape, spacing = (8, 6, 10), 1.7
    kx, ky, kz = grid.kvectors(shape, spacing)
    np.testing.assert_allclose(
        np.asarray(kx), 2 * np.pi * np.fft.fftfreq(8, d=spacing), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(kz), 2 * np.pi * np.fft.rfftfreq(10, d=spacing), rtol=1e-6
    )


def test_kmag_brute_force():
    shape, spacing = (4, 6, 8), 0.9
    km = np.asarray(grid.kmag(shape, spacing))
    kx = 2 * np.pi * np.fft.fftfreq(4, d=spacing)
    ky = 2 * np.pi * np.fft.fftfreq(6, d=spacing)
    kz = 2 * np.pi * np.fft.rfftfreq(8, d=spacing)
    for i in range(4):
        for j in range(6):
            for l in range(5):
                expected = np.sqrt(kx[i] ** 2 + ky[j] ** 2 + kz[l] ** 2)
                assert abs(km[i, j, l] - expected) < 1e-5 * max(expected, 1)


def test_k_bounds():
    shape, spacing = (16, 16, 16), 2.0
    kmin, kmax = grid.get_k_bounds(shape, spacing)
    assert np.isclose(kmin, 2 * np.pi / (16 * 2.0))
    # corner mode: nyquist in each axis
    assert np.isclose(kmax, np.sqrt(3.0) * np.pi / 2.0)
    km = np.asarray(grid.kmag(shape, spacing))
    positive = km[km > 0]
    assert np.isclose(positive.min(), kmin, rtol=1e-5)
    assert np.isclose(km.max(), kmax, rtol=1e-5)


def test_fill_with_log10k():
    shape, spacing = (8, 8, 8), 1.0
    lg = np.asarray(grid.fill_with_log10k(shape, spacing))
    km = np.asarray(grid.kmag(shape, spacing))
    mask = km > 0
    np.testing.assert_allclose(lg[mask], np.log10(km[mask]), atol=1e-4)
    # DC sentinel is far below the fundamental
    assert lg[0, 0, 0] < np.log10(km[mask].min()) - 10


def test_conjugate_plane_pairs():
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.normal(size=(6, 8)) + 1j * rng.normal(size=(6, 8)))
    p = np.asarray(grid.conjugate_plane(z))
    zn = np.asarray(z)
    for i in range(6):
        for j in range(8):
            assert np.isclose(p[i, j], np.conj(zn[(-i) % 6, (-j) % 8]))


def test_hermitian_plane_masks_partition():
    for nx, ny in [(8, 8), (6, 4), (5, 8), (7, 7)]:
        self_conj, canonical = grid.hermitian_plane_masks(nx, ny)
        # every non-self-conjugate pair has exactly one canonical member
        for i in range(nx):
            for j in range(ny):
                ni, nj = (-i) % nx, (-j) % ny
                if (i, j) == (ni, nj):
                    assert self_conj[i, j]
                else:
                    assert canonical[i, j] != canonical[ni, nj]


def test_self_conjugate_kz_planes():
    assert grid.self_conjugate_kz_planes(8) == (0, 4)
    assert grid.self_conjugate_kz_planes(9) == (0,)
