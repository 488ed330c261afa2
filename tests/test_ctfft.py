"""Cooley-Tukey einsum FFT vs numpy (CPU exactness)."""

import jax.numpy as jnp
import numpy as np
import pytest

from randomfield_tpu.ops import ctfft


@pytest.mark.parametrize("n", [8, 12, 32, 100, 128, 512, 33])
@pytest.mark.parametrize("axis", [0, 1, -1])
def test_ifft_matches_numpy(n, axis):
    rng = np.random.RandomState(n)
    shape = [6, 4, 10]
    shape[axis] = n
    x = (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(np.complex64)
    got = np.asarray(ctfft.ifft_ct(jnp.asarray(x), axis=axis))
    want = np.fft.ifft(x.astype(np.complex128), axis=axis, norm="forward")
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=3e-6 * scale)


@pytest.mark.parametrize("n", [16, 48, 256])
def test_fft_matches_numpy(n):
    rng = np.random.RandomState(n)
    x = (rng.normal(size=(5, n)) + 1j * rng.normal(size=(5, n))).astype(np.complex64)
    got = np.asarray(ctfft.fft_ct(jnp.asarray(x), axis=1))
    want = np.fft.fft(x.astype(np.complex128), axis=1, norm="backward")
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=3e-6 * np.abs(want).max())


def test_fft_ifft_roundtrip():
    rng = np.random.RandomState(0)
    x = (rng.normal(size=(4, 64)) + 1j * rng.normal(size=(4, 64))).astype(np.complex64)
    back = np.asarray(ctfft.ifft_ct(ctfft.fft_ct(jnp.asarray(x), axis=1), axis=1)) / 64
    np.testing.assert_allclose(back, x, atol=2e-5)


@pytest.mark.parametrize("n", [16, 17, 50])
def test_irfft_ct_matches_numpy(n):
    rng = np.random.RandomState(n)
    x = rng.normal(size=(3, 7, n)).astype(np.float32)
    c = np.fft.rfft(x, axis=-1)  # Hermitian by construction
    got = np.asarray(ctfft.irfft_ct(jnp.asarray(c.astype(np.complex64)), n, axis=-1))
    want = np.fft.irfft(c, n=n, axis=-1, norm="forward")
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4 * np.abs(want).max())


def test_prime_fallback():
    assert not ctfft.can_ct(13)
    rng = np.random.RandomState(1)
    x = (rng.normal(size=(4, 13)) + 1j * rng.normal(size=(4, 13))).astype(np.complex64)
    got = np.asarray(ctfft.ifft_ct(jnp.asarray(x), axis=1))
    want = np.fft.ifft(x.astype(np.complex128), axis=1, norm="forward")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_irfft_half_axis_reim_matches_complex():
    from randomfield_tpu.ops.ctfft import irfft_half_axis, irfft_half_axis_reim

    rng = np.random.RandomState(9)
    # Hermitian-along-axis packed spectrum: synthesize from a real field
    x = rng.normal(size=(4, 16, 6)).astype(np.float32)
    c = np.fft.rfft(x, axis=1).astype(np.complex64)
    a = irfft_half_axis(jnp.asarray(c), 16, 1)
    b = irfft_half_axis_reim(jnp.asarray(c.real), jnp.asarray(c.imag), 16, 1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
