"""Cooley-Tukey FFTs as MXU matmul pairs (einsum), any axis.

Why this exists (performance + trust):

* The platform FFT executes 1-D transforms as direct O(n) DFT matmuls
  per element (measured ~200 ms per axis at 1024^3 on a v5e — exactly
  the direct-DFT FLOP count) and, on this sandbox's runtime, miscomputes
  non-minor-axis transforms outright (ops/transform.py).
* A two-stage Cooley-Tukey split n = A*B lowers the work to A+B MACs
  per element (32+32 vs 1024 at n=1024, a 16x FLOP cut) and expresses
  every step as einsum contractions — plain MXU matmuls, the most-tested
  code path on any TPU runtime — plus one tiny twiddle multiply that XLA
  fuses.  No FFT custom-call at all.

Derivation (inverse transform, e^{+2 pi i jk/n}; forward = conjugate):
with n = A*B, j = a*B + b, k = c + A*d,

    X[c + A d] = sum_b W_n^{bc} W_B^{bd} ( sum_a x[aB+b] W_A^{ac} )

      S1[c,b]  = sum_a W_A[a,c] x[a,b]        (einsum over a: MXU)
      M [c,b]  = S1[c,b] * T[c,b],  T = W_n^{bc}   (fused elementwise)
      X [d,c]  = sum_b W_B[b,d] M[c,b]        (einsum over b: MXU)

and flattening (d, c) row-major is exactly k = c + A*d.

DFT/twiddle matrices are built in float64 and cast once; two-stage f32
accuracy is ~1e-6 relative (tested against numpy at many n).  Prime n
falls back to the native minor-axis FFT (which is correct everywhere).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fft_ct", "ifft_ct", "irfft_ct", "can_ct"]


def _factor(n: int) -> tuple[int, int]:
    """Split n = A*B with A <= B, A as large as possible (A=1 if prime)."""
    for a in range(int(math.isqrt(n)), 1, -1):
        if n % a == 0:
            return a, n // a
    return 1, n


def can_ct(n: int) -> bool:
    return _factor(n)[0] > 1


@functools.lru_cache(maxsize=64)
def _matrices_np(n: int, sign: int):
    """Host float64 DFT/twiddle matrices (cached as numpy: caching device
    arrays would leak tracers when first built inside a jit trace)."""
    a_size, b_size = _factor(n)
    a = np.arange(a_size)
    b = np.arange(b_size)
    c = np.arange(a_size)
    d = np.arange(b_size)
    wa = np.exp(sign * 2j * np.pi * np.outer(a, c) / a_size)
    wb = np.exp(sign * 2j * np.pi * np.outer(b, d) / b_size)
    tw = np.exp(sign * 2j * np.pi * np.outer(c, b) / n)
    return wa, wb, tw, a_size, b_size


def _matrices(n: int, sign: int, dtype_name: str):
    wa, wb, tw, a_size, b_size = _matrices_np(n, sign)
    cdt = jnp.dtype(dtype_name)
    return (
        jnp.asarray(wa, cdt),
        jnp.asarray(wb, cdt),
        jnp.asarray(tw, cdt),
        a_size,
        b_size,
    )


def _apply(x, axis, sign):
    n = x.shape[axis]
    a_size, b_size = _factor(n)
    if a_size == 1:  # prime length: native minor-axis FFT is correct
        xm = jnp.moveaxis(x, axis, -1)
        if sign > 0:
            out = jnp.fft.ifft(xm, axis=-1, norm="forward")
        else:
            out = jnp.fft.fft(xm, axis=-1, norm="backward")
        return jnp.moveaxis(out, -1, axis)

    cdt = x.dtype if jnp.issubdtype(x.dtype, jnp.complexfloating) else (
        jnp.complex64 if x.dtype == jnp.float32 else jnp.complex128
    )
    wa, wb, tw, A, B = _matrices(n, sign, str(jnp.dtype(cdt)))
    xm = jnp.moveaxis(x.astype(cdt), axis, 0).reshape(A, B, -1)
    s1 = jnp.einsum("ac,abr->cbr", wa, xm,
                    preferred_element_type=cdt, precision=jax.lax.Precision.HIGHEST)
    s1 = s1 * tw[:, :, None]
    out = jnp.einsum("bd,cbr->dcr", wb, s1,
                     preferred_element_type=cdt, precision=jax.lax.Precision.HIGHEST)
    out = out.reshape((n,) + tuple(np.delete(x.shape, axis % x.ndim)))
    return jnp.moveaxis(out, 0, axis)


def ifft_ct(x, axis=-1):
    """Unnormalized inverse FFT (norm='forward' semantics), any axis."""
    return _apply(x, axis, +1)


def fft_ct(x, axis=-1):
    """Unnormalized forward FFT (norm='backward' semantics), any axis."""
    return _apply(x, axis, -1)


def irfft_ct(c, n, axis=-1):
    """c2r via Hermitian extension + CT inverse; valid as the LAST axis
    transformed (same contract as transform.irfft_minor)."""
    c = jnp.moveaxis(c, axis, -1)
    nh = c.shape[-1]
    cre, cim = c.real, c.imag
    tail_re = cre[..., 1:(n - n // 2)][..., ::-1]
    tail_im = cim[..., 1:(n - n // 2)][..., ::-1]
    re = jnp.zeros((*c.shape[:-1], n), cre.dtype)
    im = jnp.zeros((*c.shape[:-1], n), cre.dtype)
    re = re.at[..., :nh].set(cre).at[..., nh:].set(tail_re)
    im = im.at[..., :nh].set(cim).at[..., nh:].set(-tail_im)
    full = jax.lax.complex(re, im)
    out = ifft_ct(full, axis=-1).real
    return jnp.moveaxis(out, -1, axis)
