"""Field statistics: realized power spectrum estimator and moments.

Reference parity: the power estimator assumed in
``randomfield/powertools.py:calculate_power`` and the statistical checks
in ``randomfield/tests/test_generate.py`` (SURVEY.md sections 3.5, 4).
Runs as a jitted device program (forward rfftn + scatter-add binning) so
it scales to ensemble validation on TPU; results return as host numpy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from randomfield_tpu.ops import grid as _grid
from randomfield_tpu.ops import transform as _transform

__all__ = ["calculate_power", "field_moments"]


@functools.partial(jax.jit, static_argnames=("shape", "spacing"))
def _mode_power(delta, shape, spacing):
    c = _transform.field_to_spectrum(delta, spacing)
    nx, ny, nz = shape
    volume = nx * ny * nz * spacing**3
    return (c.real**2 + c.imag**2) / volume


def _bin_setup(shape, spacing, nbins):
    kmin, kmax = _grid.get_k_bounds(shape, spacing)
    edges = np.logspace(np.log10(kmin * 0.999), np.log10(kmax * 1.001), nbins + 1)
    nz = shape[2]
    mult = np.full(_grid.half_shape(shape)[2], 2.0, np.float32)
    mult[0] = 1.0
    if nz % 2 == 0:
        mult[-1] = 1.0
    return edges, mult


@functools.partial(jax.jit, static_argnames=("shape", "spacing", "nbins"))
def _binned(delta, shape, spacing, nbins):
    p = _mode_power(delta, shape, spacing)
    kmag = _grid.kmag(shape, spacing, p.dtype)
    edges, mult = _bin_setup(shape, spacing, nbins)
    w = jnp.asarray(mult)[None, None, :] * jnp.ones_like(p)
    idx = jnp.searchsorted(jnp.asarray(edges, p.dtype), kmag) - 1
    valid = (idx >= 0) & (idx < nbins) & (kmag > 0)
    idx = jnp.where(valid, idx, nbins)
    w = jnp.where(valid, w, 0.0)
    flat_idx, flat_w = idx.ravel(), w.ravel()
    counts = jnp.zeros(nbins + 1, p.dtype).at[flat_idx].add(flat_w)
    psum = jnp.zeros(nbins + 1, p.dtype).at[flat_idx].add(flat_w * p.ravel())
    ksum = jnp.zeros(nbins + 1, p.dtype).at[flat_idx].add(flat_w * kmag.ravel())
    return counts[:nbins], psum[:nbins], ksum[:nbins]


def calculate_power(delta, spacing, nbins=32):
    """Realized isotropic P(k) of a field, binned in log |k|.

    Returns ``(k_mean, p_hat, n_modes)`` numpy arrays: per-bin
    mode-weighted mean |k|, mean estimated power <|c_k|^2>/V, and the
    effective number of (full-spectrum) modes.  Empty bins yield NaN.
    """
    shape = tuple(int(s) for s in delta.shape[-3:])
    counts, psum, ksum = _binned(delta, shape, float(spacing), int(nbins))
    counts = np.asarray(counts, np.float64)
    psum = np.asarray(psum, np.float64)
    ksum = np.asarray(ksum, np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        return ksum / counts, psum / counts, counts


def field_moments(delta):
    """(mean, variance) of a field as float64 host scalars."""
    d = jnp.asarray(delta)
    m = jnp.mean(d)
    v = jnp.mean((d - m) ** 2)
    return float(m), float(v)
