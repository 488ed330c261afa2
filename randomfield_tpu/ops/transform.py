"""Fourier transforms with physical normalization + Hermitian utilities.

Reference parity: ``randomfield/transform.py`` (``allocate``, ``Plan``,
``Plan.execute``, ``symmetrize``, ``is_hermitian``).  The reference wraps
pyfftw: byte-aligned in-place buffers, wisdom-planned packed c2r/r2c
transforms, explicit scaling of FFTW's unnormalized output.  None of that
survives on TPU — XLA owns planning, layout and buffer reuse (donation), so
this module is a thin, *convention-defining* layer:

Physical conventions
--------------------
A real field delta(x) on an (nx, ny, nz) grid with spacing ``a`` and box
volume ``V = nx*ny*nz * a**3`` has packed spectrum ``c_k`` with

    delta(x)  =  (1 / V) * sum_k c_k exp(+i k.x)        (synthesis)
    c_k       =  a^3 * sum_x delta(x) exp(-i k.x)       (analysis)

so ``c_k`` approximates the continuum Fourier transform
``integral d^3x delta(x) exp(-i k.x)`` and the power spectrum estimator is
``P(k) = <|c_k|^2> / V``.  These compose to the identity, and the Gaussian
random field recipe is: draw ``c_k`` with variance ``V * P(k)`` per mode.

The hot path in :mod:`randomfield_tpu.engine` folds ``1/V`` into the
precomputed sigma(k) grid so the render is a raw ``norm='forward'`` irfftn
with no extra scaling pass.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from randomfield_tpu.ops import grid as _grid

__all__ = [
    "spectrum_to_field",
    "field_to_spectrum",
    "irfftn",
    "rfftn",
    "symmetrize",
    "is_hermitian",
]


def irfftn(c, shape, norm="forward"):
    """Unnormalized-inverse packed c2r transform (sum over modes).

    ``norm='forward'`` means the inverse applies no 1/N scaling — the
    direct analog of FFTW's unnormalized c2r that the reference's
    ``Plan.execute`` runs (ref: transform.py:Plan).
    """
    return jnp.fft.irfftn(c, s=shape, axes=(-3, -2, -1), norm=norm)


def rfftn(x, norm="forward"):
    """Packed r2c transform matching :func:`irfftn`'s convention."""
    return jnp.fft.rfftn(x, axes=(-3, -2, -1), norm=norm)


def spectrum_to_field(c, spacing, shape):
    """Synthesis: delta(x) = (1/V) sum_k c_k exp(ik.x)."""
    nx, ny, nz = shape
    volume = nx * ny * nz * spacing**3
    return irfftn(c / jnp.asarray(volume, dtype=c.real.dtype), shape)


def field_to_spectrum(delta, spacing):
    """Analysis: c_k = a^3 sum_x delta(x) exp(-ik.x)."""
    c = rfftn(delta, norm="backward")
    return c * jnp.asarray(spacing**3, dtype=delta.dtype)


def _symmetrize_plane(z, scale_self_conjugate):
    nx, ny = z.shape[-2], z.shape[-1]
    self_conj, canonical = _grid.hermitian_plane_masks(nx, ny)
    partner = _grid.conjugate_plane(z)
    out = jnp.where(canonical, z, partner)
    scale = np.sqrt(2.0) if scale_self_conjugate else 1.0
    real_part = (scale * z.real).astype(z.dtype)  # imag -> 0 on cast
    return jnp.where(self_conj, real_part, out)


def symmetrize(c, scale_self_conjugate=True):
    """Enforce the Hermitian constraint on a packed half-spectrum.

    Interior kz planes (0 < kz < Nyquist) of an rfft-packed spectrum are
    unconstrained; only the kz = 0 plane and (for even nz) the kz = Nyquist
    plane must satisfy ``c(-kx, -ky) = conj(c(kx, ky))`` for the c2r output
    to be exactly real.  (Ref: transform.py:symmetrize.)

    For each conjugate pair on those planes the canonical member is kept
    and its partner overwritten with the conjugate.  Self-conjugate modes
    (kx in {0, Nx/2}, ky in {0, Ny/2}) keep only their real part; with
    ``scale_self_conjugate=True`` (the sampling convention) that real part
    is multiplied by sqrt(2) so a unit-variance complex draw keeps unit
    *total* variance after its imaginary half is dropped.  Pass ``False``
    for the pure idempotent projection (e.g. to test Hermitian-ness).

    ``c`` may have leading batch dimensions; the last three axes are the
    packed spectrum.
    """
    nzh = c.shape[-1]
    # nz even iff the packed length came from an even real length; both
    # nz = 2*(nzh-1) and nz = 2*nzh - 1 pack to nzh, so callers who care
    # about odd nz pass spectra where the last plane is NOT self-conjugate.
    # We follow the reference and treat the last plane as Nyquist (even nz)
    # unless told otherwise via keyword.
    return symmetrize_with_shape(c, nz=2 * (nzh - 1), scale_self_conjugate=scale_self_conjugate)


def symmetrize_with_shape(c, nz, scale_self_conjugate=True):
    """:func:`symmetrize` with the real-space nz given explicitly (odd-nz safe)."""
    planes = _grid.self_conjugate_kz_planes(nz)
    for p in planes:
        fixed = _symmetrize_plane(c[..., :, :, p], scale_self_conjugate)
        c = c.at[..., :, :, p].set(fixed)
    return c


def is_hermitian(c, nz=None, rtol=1e-5, atol=1e-6):
    """True if the packed spectrum corresponds to a real field.

    Checks that the self-conjugate kz planes are invariant under the pure
    Hermitian projection (ref: transform.py:is_hermitian).
    """
    if nz is None:
        nz = 2 * (c.shape[-1] - 1)
    proj = symmetrize_with_shape(c, nz=nz, scale_self_conjugate=False)
    return bool(jnp.allclose(c, proj, rtol=rtol, atol=atol))
