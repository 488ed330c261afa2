"""Float64 numpy oracle — the stand-in reference implementation.

The reference mount was empty at survey time (SURVEY.md "Provenance"), so
per SURVEY.md section 7 this module is the from-scratch float64 CPU
implementation of the reference pipeline (sigma tabulation -> Hermitian
sampling -> packed c2r inverse FFT -> lightcone weighting) that the JAX
engine is validated against.  It reimplements the *math* of
``randomfield/{powertools,transform,generate}.py`` in pure numpy with no
JAX, sharing only conventions (documented in ops/transform.py) — an
independent implementation, so agreement is a real check.

Two comparison modes:

* **algebraic** — ``render_from_noise`` consumes externally supplied unit
  normal draws, so the JAX engine (fed the same draws) must agree to f32
  rounding; this pins every normalization constant.
* **statistical** — seeded end-to-end fields whose realized P(k) /
  variance / sigma(R) are compared distributionally (the reference's own
  test strategy, SURVEY.md section 4).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "oracle_sigmas",
    "oracle_symmetrize",
    "render_from_noise",
    "oracle_render",
    "predicted_variance",
]


def _kgrid(shape, spacing):
    nx, ny, nz = shape
    kx = 2 * np.pi * np.fft.fftfreq(nx, d=spacing)
    ky = 2 * np.pi * np.fft.fftfreq(ny, d=spacing)
    kz = 2 * np.pi * np.fft.rfftfreq(nz, d=spacing)
    return np.sqrt(
        kx[:, None, None] ** 2 + ky[None, :, None] ** 2 + kz[None, None, :] ** 2
    )


def oracle_sigmas(shape, spacing, power, interpolation="log10k"):
    """sigma(k) = sqrt(P(|k|)/V) with P interpolated against log10(k)."""
    k, pk = np.asarray(power[0], np.float64), np.asarray(power[1], np.float64)
    kmag = _kgrid(shape, spacing)
    nx, ny, nz = shape
    volume = nx * ny * nz * spacing**3
    lk = np.log10(np.where(kmag > 0, kmag, k[0]))
    if interpolation == "log10k":
        pki = np.interp(lk, np.log10(k), pk)
    elif interpolation == "loglog":
        pki = 10.0 ** np.interp(lk, np.log10(k), np.log10(pk))
    else:
        raise ValueError(interpolation)
    sig = np.sqrt(pki / volume)
    sig[kmag == 0] = 0.0
    return sig


def oracle_symmetrize(c, nz, scale_self_conjugate=True):
    """Hermitian fixup of the kz = 0 / Nyquist planes (ref: transform.symmetrize)."""
    c = np.array(c, copy=True)
    nx, ny = c.shape[0], c.shape[1]
    planes = [0] + ([nz // 2] if nz % 2 == 0 else [])
    i = np.arange(nx)[:, None]
    j = np.arange(ny)[None, :]
    ni, nj = (-i) % nx, (-j) % ny
    self_conj = (i == ni) & (j == nj)
    canonical = (i < ni) | ((i == ni) & (j <= nj))
    scale = np.sqrt(2.0) if scale_self_conjugate else 1.0
    for p in planes:
        z = c[:, :, p]
        partner = np.conj(z[(-np.arange(nx)) % nx][:, (-np.arange(ny)) % ny])
        out = np.where(canonical, z, partner)
        out = np.where(self_conj, scale * z.real + 0j, out)
        c[:, :, p] = out
    return c


def render_from_noise(noise_re, noise_im, shape, spacing, power,
                      smoothing_length=0.0, plane_weights=None,
                      interpolation="log10k"):
    """Full render pipeline from externally supplied unit normal draws.

    ``noise_re/noise_im`` have the packed half-spectrum shape.  Returns the
    real-space field, float64.  Mirrors SURVEY.md section 3.2:
    sample -> symmetrize -> filter -> c2r -> lightcone weighting.
    """
    nx, ny, nz = shape
    z = (noise_re + 1j * noise_im).astype(np.complex128) / np.sqrt(2.0)
    z = oracle_symmetrize(z, nz=nz, scale_self_conjugate=True)
    c = z * oracle_sigmas(shape, spacing, power, interpolation)
    if smoothing_length:
        kmag = _kgrid(shape, spacing)
        c = c * np.exp(-0.5 * (kmag * smoothing_length) ** 2)
    field = np.fft.irfftn(c, s=shape, axes=(0, 1, 2), norm="forward")
    if plane_weights is not None:
        field = field * np.asarray(plane_weights, np.float64)[None, None, :]
    return field


def oracle_render(seed, shape, spacing, power, **kw):
    """Seeded end-to-end oracle render (numpy RandomState, like the reference)."""
    nx, ny, nz = shape
    rng = np.random.RandomState(seed)
    nre = rng.normal(size=(nx, ny, nz // 2 + 1))
    nim = rng.normal(size=(nx, ny, nz // 2 + 1))
    return render_from_noise(nre, nim, shape, spacing, power, **kw)


def predicted_variance(shape, spacing, power, smoothing_length=0.0,
                       interpolation="log10k"):
    """Exact expected field variance: sum_k P(k)/V^2 * V = sum_k P(k)/V.

    <delta^2> = (1/V) * sum over the FULL spectrum of P(k) — evaluated by
    summing the packed half-spectrum with multiplicity 2 for modes whose
    conjugate partner is not stored (0 < kz < Nyquist), 1 otherwise.
    """
    nx, ny, nz = shape
    volume = nx * ny * nz * spacing**3
    sig2 = oracle_sigmas(shape, spacing, power, interpolation) ** 2  # P/V
    if smoothing_length:
        kmag = _kgrid(shape, spacing)
        sig2 = sig2 * np.exp(-((kmag * smoothing_length) ** 2))
    mult = np.full(sig2.shape, 2.0)
    mult[:, :, 0] = 1.0
    if nz % 2 == 0:
        mult[:, :, -1] = 1.0
    return float(np.sum(mult * sig2))
