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

import functools
import os

import jax
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
    "fft_backend",
    "ifft_minor",
    "irfft_minor",
    "rotate_last3",
]


# --------------------------------------------------------------------------
# FFT backend selection.
#
# The TPU runtime available in this sandbox (experimental 'axon' PJRT
# tunnel) executes FFTs along NON-minor axes incorrectly: a single input
# mode comes out as several spurious modes (measured: a packed interior
# mode (3,5,7) produced an 8-mode mixture; isotropic spectra lose ~35% of
# their low-k power).  Minor-axis complex FFTs are exact.  XLA's
# simplifier additionally rewrites transpose+minor-FFT back into the
# broken non-minor form, so the safe path pins physical transposes with
# ``jax.lax.optimization_barrier``.
#
# The 'safe' backend therefore performs every transform along the minor
# axis, with barriered transposes in between, and implements c2r as a
# Hermitian extension + complex iFFT.  Verified exact to ~1e-6 relative
# against the float64 CPU reference at 128^3 on hardware.  Default: safe
# on TPU, native XLA elsewhere; override with RF_FFT_BACKEND=xla|safe.
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def fft_backend() -> str:
    """'xla' (native), 'safe' (minor-axis + barriered transposes), or
    'ct' (Cooley-Tukey einsum matmuls, ops/ctfft.py — fastest correct
    path on TPU: the native lowering computes 1-D transforms as direct
    O(n)-per-element DFT matmuls, and miscomputes non-minor axes here).
    """
    env = os.environ.get("RF_FFT_BACKEND")
    if env in ("xla", "safe", "ct"):
        return env
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    # 'safe' beats 'ct' at every size measured here (the native
    # minor-axis kernel outruns 32-wide einsum contractions on the MXU);
    # 'ct' remains available for runtimes whose minor-axis FFT is also
    # suspect, or for odd transform axes without transposes.
    return "safe" if platform == "tpu" else "xla"


_B = jax.lax.optimization_barrier


def rotate_last3(x):
    """(..., A, B, C) -> (..., B, C, A), physically (barrier-pinned)."""
    perm = (*range(x.ndim - 3), x.ndim - 2, x.ndim - 1, x.ndim - 3)
    return _B(jnp.transpose(x, perm))


def ifft_minor(x):
    """Unnormalized inverse complex FFT along the (safe) minor axis."""
    return jnp.fft.ifft(x, axis=-1, norm="forward")


def irfft_minor(c, n, assume_hermitian=False):
    """c2r along the minor axis (last transform of an inverse chain).

    Valid when the pre-transform is complete in all other axes (i.e. this
    is the LAST transform), where Hermitianity of the original packed
    spectrum makes the result real; the imaginary residue is rounding.

    ``assume_hermitian=True`` (render paths, where the spectrum has been
    through ``symmetrize``) dispatches even composite-half lengths to
    the half-length complex pack (ops/ctfft.py:irfft_half_axis): an
    n/2-point inverse replaces the full Hermitian extension + n-point
    inverse — 4x less transform work and half the intermediate bytes.
    Measured identical to the extension path to ~1e-7 relative on
    Hermitian input (CPU float64 oracle; on-chip 1024^3 fields).  The
    default stays False because the pack is ONLY exact for genuinely
    Hermitian input: the extension path (like numpy/FFTW c2r) silently
    projects non-Hermitian residue away, and public transforms keep
    that reference-parity semantic.

    The extension is built with ``.at[].set`` on real/imag lattices
    rather than flip+concat of complex values: the axon runtime executes
    the flip/concat form incorrectly at >= 512^3 (the conjugate tail is
    dropped), while set-based construction is exact (measured).
    """
    from randomfield_tpu.ops import ctfft

    if assume_hermitian and n % 2 == 0 and ctfft.can_ct(n // 2):
        return ctfft.irfft_half_axis(c, n, axis=-1)
    nh = c.shape[-1]
    cre, cim = c.real, c.imag  # all reversals on REAL lattices only
    tail_re = cre[..., 1:(n - n // 2)][..., ::-1]
    tail_im = cim[..., 1:(n - n // 2)][..., ::-1]
    re = jnp.zeros((*c.shape[:-1], n), cre.dtype)
    im = jnp.zeros((*c.shape[:-1], n), cre.dtype)
    re = re.at[..., :nh].set(cre).at[..., nh:].set(tail_re)
    im = im.at[..., :nh].set(cim).at[..., nh:].set(-tail_im)
    full = _B(jax.lax.complex(re, im))
    return ifft_minor(full).real


def _irfftn_safe(c, shape, assume_hermitian=False):
    nx, ny, nz = shape
    x = rotate_last3(c)          # (..., ky, kz, kx)
    x = ifft_minor(x)            # x done
    x = rotate_last3(x)          # (..., kz, x, ky)
    x = ifft_minor(x)            # y done
    x = rotate_last3(x)          # (..., x, y, kz)
    return irfft_minor(x, nz, assume_hermitian)  # z done -> real


def _rfftn_safe(x):
    nz = x.shape[-1]
    nzh = nz // 2 + 1
    c = jnp.fft.fft(x.astype(jnp.complex64 if x.dtype == jnp.float32
                             else jnp.complex128), axis=-1, norm="backward")
    c = _B(c[..., :nzh])         # z done, packed
    c = rotate_last3(c)          # (..., y, kz, x)... minor = x
    c = jnp.fft.fft(c, axis=-1, norm="backward")
    c = rotate_last3(c)          # minor = y
    c = jnp.fft.fft(c, axis=-1, norm="backward")
    return rotate_last3(c)       # back to (..., kx, ky, kz)


def _irfftn_ct(c, shape):
    from randomfield_tpu.ops import ctfft

    x = ctfft.ifft_ct(c, axis=-3)
    x = ctfft.ifft_ct(x, axis=-2)
    return ctfft.irfft_ct(x, shape[-1], axis=-1)


def _rfftn_ct(x):
    from randomfield_tpu.ops import ctfft

    nzh = x.shape[-1] // 2 + 1
    c = ctfft.fft_ct(x, axis=-1)[..., :nzh]
    c = ctfft.fft_ct(c, axis=-2)
    return ctfft.fft_ct(c, axis=-3)


def irfftn(c, shape, norm="forward", assume_hermitian=False):
    """Unnormalized-inverse packed c2r transform (sum over modes).

    ``norm='forward'`` means the inverse applies no 1/N scaling — the
    direct analog of FFTW's unnormalized c2r that the reference's
    ``Plan.execute`` runs (ref: transform.py:Plan).

    ``assume_hermitian=True`` lets the safe backend use the faster
    half-pack c2r tail; only pass it for spectra that went through
    ``symmetrize`` (see :func:`irfft_minor`).
    """
    backend = fft_backend()
    if backend == "ct":
        assert norm == "forward"
        return _irfftn_ct(c, shape)
    if backend == "safe":
        assert norm == "forward"
        return _irfftn_safe(c, shape, assume_hermitian)
    return jnp.fft.irfftn(c, s=shape, axes=(-3, -2, -1), norm=norm)


def rfftn(x, norm="forward"):
    """Packed r2c transform matching :func:`irfftn`'s convention."""
    backend = fft_backend()
    if backend in ("safe", "ct"):
        c = _rfftn_ct(x) if backend == "ct" else _rfftn_safe(x)
        if norm == "forward":
            n = x.shape[-3] * x.shape[-2] * x.shape[-1]
            c = c / jnp.asarray(n, c.real.dtype)
        return c
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


def _symmetrize_plane_reim(re2, im2, scale_self_conjugate):
    """:func:`_symmetrize_plane` on separate re/im lattices.

    Same math, never forms a complex array — the building block of the
    re/im-native staged pipeline (engine/staged.py v3), where complex
    formation/decomposition passes are what the pipeline exists to
    avoid.
    """
    nx, ny = re2.shape[-2], re2.shape[-1]
    self_conj, canonical = _grid.hermitian_plane_masks(nx, ny)
    pre = _grid.conjugate_plane(re2)
    pim = -_grid.conjugate_plane(im2)
    out_re = jnp.where(canonical, re2, pre)
    out_im = jnp.where(canonical, im2, pim)
    scale = np.sqrt(2.0) if scale_self_conjugate else 1.0
    out_re = jnp.where(self_conj, (scale * re2).astype(re2.dtype), out_re)
    out_im = jnp.where(self_conj, jnp.zeros((), im2.dtype), out_im)
    return out_re, out_im


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


def symmetrize_with_shape_reim(re, im, nz, scale_self_conjugate=True):
    """:func:`symmetrize_with_shape` on separate re/im lattices.

    Same plane math via :func:`_symmetrize_plane_reim`; no complex array
    is formed (the re/im-native mesh render path — at the 1-device
    1024^3 ceiling the complex pack alone is a 4.3 GB allocation).
    """
    planes = _grid.self_conjugate_kz_planes(nz)
    for p in planes:
        fre, fim = _symmetrize_plane_reim(
            re[..., :, :, p], im[..., :, :, p], scale_self_conjugate
        )
        re = re.at[..., :, :, p].set(fre)
        im = im.at[..., :, :, p].set(fim)
    return re, im


def symmetrize_xzy_reim(re, im, nz, scale_self_conjugate=True):
    """Hermitian projection of 'xzy'-layout (.., nx, nzh, ny) re/im.

    The kz planes sit on axis -2; each (nx, ny) plane gets the same
    :func:`_symmetrize_plane_reim` math as the packed-minor layouts.
    """
    planes = _grid.self_conjugate_kz_planes(nz)
    for p in planes:
        fre, fim = _symmetrize_plane_reim(
            re[..., p, :], im[..., p, :], scale_self_conjugate
        )
        re = re.at[..., p, :].set(fre)
        im = im.at[..., p, :].set(fim)
    return re, im


def is_hermitian(c, nz=None, rtol=1e-5, atol=1e-6):
    """True if the packed spectrum corresponds to a real field.

    Checks that the self-conjugate kz planes are invariant under the pure
    Hermitian projection (ref: transform.py:is_hermitian).
    """
    if nz is None:
        nz = 2 * (c.shape[-1] - 1)
    proj = symmetrize_with_shape(c, nz=nz, scale_self_conjugate=False)
    return bool(jnp.allclose(c, proj, rtol=rtol, atol=atol))
