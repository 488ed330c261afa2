"""Hermitian-symmetric Gaussian mode sampling of packed half-spectra.

Reference parity: the mode sampler inside ``randomfield/generate.py``
(seeded ``np.random.RandomState(seed).normal(scale=sigmas)`` over the
packed buffer, then ``transform.symmetrize`` — SURVEY.md section 3.2 hot
loop #1).

TPU-native design:

* ``jax.random`` counter-based Threefry keys replace the sequential
  Mersenne state.  JAX's partitionable threefry makes ``normal(key,
  global_shape)`` produce *the same values per logical index regardless of
  sharding*, so sharded sampling is deterministic and identical to
  single-device sampling for free — no per-shard key bookkeeping.
* Unit-variance Hermitian noise is sampled first and scaled by the
  precomputed sigma(k) grid afterwards; sigma is symmetric under k -> -k,
  so scaling commutes with symmetrization and XLA fuses draw + scale +
  filter into one pass over the spectrum.
* The Hermitian fixup touches only the kz = 0 / Nyquist planes (O(N^2));
  under spatial sharding XLA lowers the plane flips to small collective
  permutes — no hand-written communication.

A fused Pallas PRNG kernel (sample + interpolate + scale in one VMEM pass,
per the north star) lives in ``randomfield_tpu.ops.pallas_sampler`` and is
used by the engine when enabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from randomfield_tpu.ops import grid as _grid
from randomfield_tpu.ops import transform as _transform

__all__ = ["sample_unit_hermitian", "sample_spectrum",
           "sample_fixed_spectrum"]

_INV_SQRT2 = 0.7071067811865476


def sample_unit_hermitian(key, shape, dtype=jnp.complex64):
    """Unit-variance Hermitian complex noise on the packed half-spectrum.

    Each packed mode is (x + i y) / sqrt(2) with x, y ~ N(0, 1), giving
    <|z|^2> = 1; the self-conjugate kz planes are then symmetrized so the
    inverse c2r transform of the result is exactly real, with the
    self-conjugate modes real-valued at full (unit) variance.
    """
    real_dtype = jnp.finfo(dtype).dtype
    nx, ny, nz = shape
    draws = jax.random.normal(key, (2, nx, ny, nz // 2 + 1), dtype=real_dtype)
    z = jax.lax.complex(draws[0], draws[1]) * jnp.asarray(_INV_SQRT2, real_dtype)
    return _transform.symmetrize_with_shape(z, nz=nz, scale_self_conjugate=True)


def sample_spectrum(key, sigmas, shape):
    """Draw a packed spectrum c_k with per-mode std sigma(k).

    With sigma from :func:`randomfield_tpu.ops.power.tabulate_sigmas`
    (which folds 1/V), ``irfftn(c, norm='forward')`` of the result is a
    real Gaussian field with power spectrum P(k).
    """
    noise = sample_unit_hermitian(key, shape)
    return noise * sigmas.astype(noise.real.dtype)


def sample_fixed_spectrum(key, sigmas, shape, flip=False):
    """Variance-suppressed 'fixed' spectrum: |c_k| = sigma(k) EXACTLY.

    Angulo & Pontzen (2016) fixed fields: normalize the Hermitian
    Gaussian draw per mode to unit magnitude, keeping only its (uniform)
    phase, then scale by sigma — every realization carries exactly the
    target per-mode power, removing the leading cosmic-variance term
    from ensemble statistics while leaving phase statistics untouched.
    Self-conjugate modes (real after symmetrization) reduce to a random
    sign, the correct degenerate case.  ``flip=True`` returns the PAIRED
    realization (all phases shifted by pi — for Gaussian fields just the
    negation, but nonlinear descendants such as lognormal mocks or
    displaced catalogs differ nontrivially, which is the point of
    'fixed & paired' ensembles).
    """
    noise = sample_unit_hermitian(key, shape)
    mag = jnp.abs(noise)
    phase = jnp.where(mag > 0, noise / jnp.where(mag > 0, mag, 1.0), 1.0)
    if flip:
        phase = -phase
    return phase * sigmas.astype(noise.real.dtype)
