"""Hermitian sampling tests (ref test strategy: test_generate statistics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from randomfield_tpu.ops import sample, transform


@pytest.mark.parametrize("shape", [(8, 8, 8), (6, 4, 10), (8, 6, 9)])
def test_unit_noise_is_hermitian_and_real_field(shape):
    z = sample.sample_unit_hermitian(jax.random.key(0), shape)
    assert transform.is_hermitian(z, nz=shape[2])
    field = np.asarray(transform.irfftn(z, shape, norm="backward"))
    assert np.all(np.isfinite(field))


def test_determinism():
    shape = (8, 8, 8)
    a = sample.sample_unit_hermitian(jax.random.key(7), shape)
    b = sample.sample_unit_hermitian(jax.random.key(7), shape)
    c = sample.sample_unit_hermitian(jax.random.key(8), shape)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_unit_variance_statistics():
    # average <|z|^2> over many seeds, per mode class
    shape = (6, 6, 6)
    nseeds = 800
    keys = jax.vmap(jax.random.key)(jnp.arange(nseeds, dtype=jnp.uint32))
    zs = jax.vmap(lambda k: sample.sample_unit_hermitian(k, shape))(keys)
    zs = np.asarray(zs)
    mode_var = np.mean(np.abs(zs) ** 2, axis=0)
    # every packed mode (interior and self-conjugate alike) has <|z|^2> = 1;
    # |z|^2 has variance 1 (complex modes) to 2 (self-conjugate real
    # modes), so bound max deviation at 3.5 sigma of the WORST class —
    # with 144 modes the expected max is ~3 sigma
    se = 3.5 * np.sqrt(2.0 / nseeds)
    assert np.all(np.abs(mode_var - 1.0) < se), np.max(np.abs(mode_var - 1.0))


def test_self_conjugate_modes_are_real():
    shape = (8, 8, 8)
    z = np.asarray(sample.sample_unit_hermitian(jax.random.key(3), shape))
    for p in (0, 4):
        plane = z[:, :, p]
        for i in (0, 4):
            for j in (0, 4):
                assert plane[i, j].imag == 0.0


def test_sample_spectrum_scales_by_sigma():
    shape = (8, 8, 8)
    sig = jnp.full((8, 8, 5), 2.5, jnp.float32)
    key = jax.random.key(11)
    c = sample.sample_spectrum(key, sig, shape)
    z = sample.sample_unit_hermitian(key, shape)
    np.testing.assert_allclose(np.asarray(c), 2.5 * np.asarray(z), rtol=1e-6)
