"""Fixed & paired (variance-suppressed) field gates.

The defining property is EXACTNESS: a fixed field's per-mode power is
the target with zero scatter, so its variance equals
predicted_variance() to rounding and its binned P(k) is
seed-independent — assertions here are deterministic, not statistical.
"""

import numpy as np
import pytest

from randomfield_tpu import Generator
from randomfield_tpu.ops.sample import (
    sample_fixed_spectrum,
    sample_unit_hermitian,
)
from randomfield_tpu.validate.stats import field_moments


def test_fixed_spectrum_magnitudes_exact():
    import jax

    shape = (8, 10, 12)
    rng = np.random.default_rng(0)
    sigmas = rng.uniform(0.5, 2.0, size=(8, 10, 7)).astype(np.float32)
    c = np.asarray(sample_fixed_spectrum(jax.random.key(3),
                                         np.asarray(sigmas), shape))
    np.testing.assert_allclose(np.abs(c), sigmas, rtol=3e-6)
    # flip is the exact negation in spectrum space
    cf = np.asarray(sample_fixed_spectrum(jax.random.key(3),
                                          np.asarray(sigmas), shape,
                                          flip=True))
    np.testing.assert_allclose(cf, -c, rtol=0, atol=0)
    # Hermitian: the inverse transform is real (symmetrized planes
    # survive the normalization)
    from randomfield_tpu.ops.transform import is_hermitian

    assert bool(is_hermitian(
        sample_fixed_spectrum(jax.random.key(3),
                              np.asarray(np.ones((8, 10, 7), np.float32)),
                              shape)))


def test_fixed_field_variance_is_exact():
    n, spacing = 32, 8.0
    g = Generator(n, n, n, grid_spacing=spacing)
    d = g.generate_fixed_field(seed=1, apply_lightcone=False)
    _, var = field_moments(d)
    pred = g.predicted_variance()
    assert abs(var / pred - 1.0) < 1e-4, (var, pred)
    # a Gaussian draw at this size scatters at the percent level; the
    # fixed field must be orders of magnitude tighter
    dg = g.generate_delta_field(seed=1, apply_lightcone=False)
    _, var_g = field_moments(dg)
    assert abs(var / pred - 1.0) < 0.01 * abs(var_g / pred - 1.0) + 1e-5


def test_fixed_power_is_seed_independent():
    n, spacing = 24, 10.0
    g = Generator(n, n, n, grid_spacing=spacing)
    d1 = g.generate_fixed_field(seed=1, apply_lightcone=False)
    d2 = g.generate_fixed_field(seed=2, apply_lightcone=False)
    k1, p1, _ = g.calculate_power(d1, nbins=8)
    k2, p2, _ = g.calculate_power(d2, nbins=8)
    np.testing.assert_allclose(p1, p2, rtol=2e-4, equal_nan=True)
    assert not np.array_equal(np.asarray(d1), np.asarray(d2))  # phases differ


def test_paired_field_is_negation():
    g = Generator(16, 16, 16, grid_spacing=10.0)
    d = np.asarray(g.generate_fixed_field(seed=5))
    dp = np.asarray(g.generate_fixed_field(seed=5, flip=True))
    np.testing.assert_allclose(dp, -d, atol=1e-7)


def test_fixed_field_unsupported_paths_raise():
    gs = Generator(16, 16, 16, grid_spacing=10.0, pipeline="staged")
    with pytest.raises(ValueError):
        gs.generate_fixed_field(seed=0)
    with pytest.raises(ValueError):
        gs.generate_fixed_fields([0, 1])


def test_fixed_field_mesh_parity():
    """Magnitude pinning is elementwise on the shard-local draws, so
    mesh fixed fields equal the single-device ones exactly (slab and
    pencil), including the paired flip."""
    from randomfield_tpu.parallel.mesh import make_mesh
    from randomfield_tpu.parallel.pencil import make_pencil_mesh

    g = Generator(16, 16, 16, grid_spacing=10.0)
    want = np.asarray(g.generate_fixed_field(seed=9, smoothing_length=5.0))
    want_flip = np.asarray(
        g.generate_fixed_field(seed=9, smoothing_length=5.0, flip=True)
    )
    for mesh in (make_mesh(data=1, space=4),
                 make_pencil_mesh(data=1, spx=2, spy=2)):
        gm = Generator(16, 16, 16, grid_spacing=10.0, mesh=mesh)
        got = np.asarray(
            gm.generate_fixed_field(seed=9, smoothing_length=5.0)
        )
        np.testing.assert_allclose(got, want, atol=2e-5)
        got_flip = np.asarray(
            gm.generate_fixed_field(seed=9, smoothing_length=5.0, flip=True)
        )
        np.testing.assert_allclose(got_flip, want_flip, atol=2e-5)
        batch = np.asarray(
            gm.generate_fixed_fields([9], smoothing_length=5.0)
        )
        np.testing.assert_allclose(batch[0], want, atol=2e-5)


def test_lognormal_fixed_and_paired():
    from randomfield_tpu.models.lognormal import LognormalGenerator

    ln = LognormalGenerator(24, 24, 24, grid_spacing=10.0)
    d = np.asarray(ln.generate_fixed_field(seed=3, apply_lightcone=False))
    dp = np.asarray(ln.generate_fixed_field(seed=3, apply_lightcone=False,
                                            flip=True))
    assert d.min() > -1.0 and dp.min() > -1.0
    # pairing is NOT the negation after the nonlinear map...
    assert not np.allclose(dp, -d, atol=1e-4)
    # ...but the underlying Gaussians are: log1p(d) = g - var/2 and
    # log1p(dp) = -g - var/2, so their sum is the constant -var
    s = np.log1p(d) + np.log1p(dp)
    np.testing.assert_allclose(s, s.mean(), atol=1e-5)
    np.testing.assert_allclose(s.mean(), -ln.sigma_g2, rtol=1e-3)


def test_fixed_fields_batch_matches_singles():
    g = Generator(16, 16, 16, grid_spacing=10.0)
    batch = np.asarray(g.generate_fixed_fields([3, 4], smoothing_length=5.0))
    for i, seed in enumerate((3, 4)):
        single = np.asarray(
            g.generate_fixed_field(seed=seed, smoothing_length=5.0)
        )
        np.testing.assert_allclose(batch[i], single, atol=1e-6)
    flipped = np.asarray(
        g.generate_fixed_fields([3, 4], smoothing_length=5.0, flip=True)
    )
    np.testing.assert_allclose(flipped, -batch, atol=1e-7)
