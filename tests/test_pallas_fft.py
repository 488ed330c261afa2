"""Pallas CT minor-axis FFT (ops/pallas_fft.py) — interpret-mode tests.

The kernel's value proposition and its measured end-to-end outcome are
documented in docs/performance.md ("Pallas CT FFT"); these tests pin its
numerics against numpy on the CPU interpreter regardless of whether the
staged pipeline currently enables it (RF_PALLAS_FFT).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from randomfield_tpu.ops.pallas_fft import can_pallas_fft, ifft_minor_pallas


@pytest.mark.parametrize(
    "shape", [(4, 8, 1024), (16, 512), (3, 256), (2, 2048), (5, 128)]
)
def test_matches_numpy_ifft(shape):
    rng = np.random.RandomState(0)
    x = (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(
        np.complex64
    )
    got = np.asarray(ifft_minor_pallas(jnp.asarray(x), interpret=True))
    ref = np.fft.ifft(x, axis=-1, norm="forward")
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 3e-6, err


def test_single_mode_exact():
    # one excited mode -> pure phase ramp (catches index/twiddle bugs
    # that random input might average away)
    n = 512
    c = np.zeros((2, n), np.complex64)
    c[0, 3] = 1.5 + 0.5j
    c[1, n - 7] = 1.0j
    got = np.asarray(ifft_minor_pallas(jnp.asarray(c), interpret=True))
    ref = np.fft.ifft(c, axis=-1, norm="forward")
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_can_pallas_fft():
    assert can_pallas_fft(128)
    assert can_pallas_fft(1024)
    assert can_pallas_fft(2048)
    assert not can_pallas_fft(96)
    assert not can_pallas_fft(513)
    assert not can_pallas_fft(128 * 32)


def test_unsupported_length_raises():
    with pytest.raises(ValueError, match="unsupported"):
        ifft_minor_pallas(jnp.zeros((2, 96), jnp.complex64), interpret=True)


def test_reim_variant_matches_complex():
    rng = np.random.RandomState(5)
    x = (rng.normal(size=(6, 512)) + 1j * rng.normal(size=(6, 512))).astype(
        np.complex64
    )
    from randomfield_tpu.ops.pallas_fft import ifft_minor_pallas_reim

    re, im = ifft_minor_pallas_reim(
        jnp.asarray(x.real), jnp.asarray(x.imag), interpret=True
    )
    ref = ifft_minor_pallas(jnp.asarray(x), interpret=True)
    np.testing.assert_array_equal(np.asarray(re), np.asarray(ref.real))
    np.testing.assert_array_equal(np.asarray(im), np.asarray(ref.imag))


@pytest.mark.parametrize("n,groups,cols", [(128, 2, 256), (256, 1, 128),
                                           (512, 3, 128)])
def test_sublane_matches_numpy(n, groups, cols):
    # transform down the rows of each group; output rotated, digit order
    from randomfield_tpu.ops.pallas_fft import (
        digit_perm, ifft_sublane_pallas_reim,
    )

    rng = np.random.RandomState(7)
    x = (rng.normal(size=(groups * n, cols))
         + 1j * rng.normal(size=(groups * n, cols))).astype(np.complex64)
    gre, gim = ifft_sublane_pallas_reim(
        jnp.asarray(x.real), jnp.asarray(x.imag), n, interpret=True
    )
    got = (np.asarray(gre) + 1j * np.asarray(gim))[:, digit_perm(n)]
    # reference: out[g*cols + col, :] = ifft of x[g*n:(g+1)*n, col]
    ref = np.stack([
        np.fft.ifft(x[g * n:(g + 1) * n, col], norm="forward")
        for g in range(groups) for col in range(cols)
    ])
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 3e-6, err


@pytest.mark.parametrize("shape,nz", [((4, 8, 129), 256), ((2, 16, 513), 1024),
                                      ((3, 8, 257), 512)])
def test_irfft_tail_matches_numpy(shape, nz):
    # fused half-pack c2r + z-weights megakernel (the v5 staged tail)
    from randomfield_tpu.ops.pallas_fft import irfft_tail_pallas

    rng = np.random.RandomState(3)
    c = (rng.normal(size=shape)
         + 1j * rng.normal(size=shape)).astype(np.complex64)
    c[..., 0] = c[..., 0].real    # valid packed half-spectrum: DC and
    c[..., -1] = c[..., -1].real  # Nyquist bins are real
    w = rng.uniform(0.5, 1.5, size=nz).astype(np.float32)
    got = np.asarray(irfft_tail_pallas(
        jnp.asarray(c.real), jnp.asarray(c.imag), nz, jnp.asarray(w),
        interpret=True,
    ))
    ref = np.fft.irfft(c, n=nz, axis=-1, norm="forward") * w
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 5e-6, err


def test_irfft_tail_validation():
    from randomfield_tpu.ops.pallas_fft import irfft_tail_pallas

    w = jnp.ones((192,), jnp.float32)
    z = jnp.zeros((2, 8, 97), jnp.float32)
    with pytest.raises(ValueError, match="multiple of 128"):
        irfft_tail_pallas(z, z, 192, w, interpret=True)
    z = jnp.zeros((2, 8, 100), jnp.float32)
    with pytest.raises(ValueError, match="minor axis"):
        irfft_tail_pallas(z, z, 256, jnp.ones((256,), jnp.float32),
                          interpret=True)


def test_sublane_input_validation():
    from randomfield_tpu.ops.pallas_fft import ifft_sublane_pallas_reim

    z = jnp.zeros((256, 128), jnp.float32)
    with pytest.raises(ValueError, match="unsupported"):
        ifft_sublane_pallas_reim(z, z, 96, interpret=True)
    with pytest.raises(ValueError, match="group length"):
        ifft_sublane_pallas_reim(z, z, 512, interpret=True)
    with pytest.raises(ValueError, match="multiple of 128"):
        ifft_sublane_pallas_reim(
            jnp.zeros((128, 96), jnp.float32),
            jnp.zeros((128, 96), jnp.float32), 128, interpret=True,
        )
