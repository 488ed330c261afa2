"""Spherical-underdensity void finding and void statistics.

Voids — large underdense regions — are the density troughs whose
abundance and sizes probe growth and dark energy complementarily to
peaks and halos.  This module implements the standard
spherical-underdensity (SO) definition the TPU-friendly way: instead of
growing spheres around candidate centers one by one (data-dependent
loops), the mean ENCLOSED density contrast at every voxel for a ladder
of radii comes from FFT top-hat convolutions — one elementwise spectral
multiply + inverse transform per radius, all jitted — and the void
radius field is the running ladder maximum

    R_v(x) = largest R with delta_bar(<R'; x) < threshold
             for every ladder radius R' <= R,

evaluated with pure `lax` arithmetic.  Only the final (tiny) catalog
compaction — local maxima of R_v, greedy non-overlap — runs on host,
mirroring models/halos.py's device-intensity/host-compaction split.

Gates (tests/test_voids.py): a PLANTED spherical underdensity is
recovered deterministically (center exact, radius within one ladder
step of the analytic dilution radius (amp/|t|)^(1/3) R_0); the
underdense volume fraction of Gaussian renders matches the exact
normal-CDF expectation Phi(t sigma0 / sigma_R) with sigma_R the
exact DISCRETE top-hat-filtered sigma on this grid's modes; the
catalog is non-overlapping by construction; and lattice minima counts
equal peak counts of the negated field exactly (validate/peaks.py
symmetry).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from randomfield_tpu.ops import grid as _grid
from randomfield_tpu.ops import transform as _transform

__all__ = [
    "tophat_smooth",
    "void_radius_grid",
    "find_voids",
    "void_size_function",
    "predicted_underdense_fraction",
    "underdense_fraction",
    "minima_statistics",
]


def _tophat_w(x):
    """Spherical top-hat window W(x) = 3 (sin x - x cos x) / x^3, W(0)=1.

    Evaluated in a numerically safe form (series below x = 1e-3).
    """
    x = jnp.asarray(x)
    safe = jnp.where(x > 1e-3, x, 1.0)
    w = 3.0 * (jnp.sin(safe) - safe * jnp.cos(safe)) / safe**3
    return jnp.where(x > 1e-3, w, 1.0 - x * x / 10.0)


@functools.partial(jax.jit, static_argnames=("shape", "spacing", "radius"))
def _tophat_smooth_jit(delta, shape, spacing, radius):
    # field_to_spectrum / spectrum_to_field are a physical-convention
    # round-trip pair (ops/transform.py), so the window multiply is the
    # whole convolution
    c = _transform.field_to_spectrum(delta, spacing)
    km = _grid.kmag(shape, spacing, jnp.float32)
    c = c * _tophat_w(km * jnp.asarray(radius, jnp.float32))
    return _transform.spectrum_to_field(c, spacing, shape)


def tophat_smooth(delta, spacing, radius):
    """Mean enclosed density contrast delta_bar(< radius) at every voxel
    (FFT convolution with the spherical top-hat of that radius)."""
    shape = tuple(int(s) for s in delta.shape[-3:])
    return _tophat_smooth_jit(delta, shape, float(spacing), float(radius))


@functools.partial(jax.jit, static_argnames=("shape", "spacing", "radii",
                                             "threshold"))
def _void_radius_jit(delta, shape, spacing, radii, threshold):
    c0 = _transform.field_to_spectrum(delta, spacing)
    km = _grid.kmag(shape, spacing, jnp.float32)
    t = jnp.asarray(threshold, delta.dtype)
    rv = jnp.zeros(shape, delta.dtype)
    alive = jnp.ones(shape, bool)
    for r in radii:  # static ladder: unrolled, one irfftn per rung
        sm = _transform.spectrum_to_field(
            c0 * _tophat_w(km * jnp.asarray(r, jnp.float32)), spacing, shape)
        alive = alive & (sm < t)
        rv = jnp.where(alive, jnp.asarray(r, rv.dtype), rv)
    return rv


def void_radius_grid(delta, spacing, radii, threshold=-0.4):
    """SO void radius at every voxel: the largest ladder radius R such
    that the enclosed mean contrast stays below ``threshold`` for every
    ladder rung up to R (0 where even the smallest rung fails).

    ``radii``: ascending ladder in the same length units as
    ``spacing``.  One FFT per rung; the ladder is compiled statically.
    """
    shape = tuple(int(s) for s in delta.shape[-3:])
    radii = tuple(float(r) for r in radii)
    if any(b <= a for a, b in zip(radii, radii[1:])) or not radii:
        raise ValueError("radii must be a non-empty ascending ladder")
    if threshold >= 0:
        raise ValueError("void threshold must be negative")
    return _void_radius_jit(delta, shape, float(spacing), radii,
                            float(threshold))


def find_voids(delta, spacing, radii, threshold=-0.4):
    """Non-overlapping SO void catalog.

    Candidates are voxels whose R_v is a 27-cube local maximum with
    R_v > 0 and whose own density is a local minimum of the R_v-selected
    smoothed hierarchy (in practice: R_v local max suffices — ties
    broken toward deeper delta).  Candidates are accepted greedily in
    descending R_v, rejecting any center inside an accepted void
    (periodic minimum-image).  Returns ``(positions, radii_v)`` —
    (n, 3) voxel-center coordinates and radii, host float64.
    """
    shape = tuple(int(s) for s in delta.shape[-3:])
    spacing = float(spacing)
    rv = np.asarray(void_radius_grid(delta, spacing, radii, threshold),
                    np.float64)
    d = np.asarray(delta, np.float64)
    # 27-cube local maximum of rv (strict against a deterministic
    # tie-breaker: deeper delta wins inside plateaus)
    key = rv - 1e-9 * d  # deeper (more negative) delta => larger key
    neigh_max = np.full_like(key, -np.inf)
    for sx in (-1, 0, 1):
        for sy in (-1, 0, 1):
            for sz in (-1, 0, 1):
                if sx == sy == sz == 0:
                    continue
                np.maximum(
                    neigh_max,
                    np.roll(np.roll(np.roll(key, sx, 0), sy, 1), sz, 2),
                    out=neigh_max)
    cand = np.argwhere((key > neigh_max) & (rv > 0))
    if cand.size == 0:
        return np.zeros((0, 3)), np.zeros(0)
    rv_c = rv[tuple(cand.T)]
    order = np.argsort(-rv_c, kind="stable")
    cand = cand[order]
    rv_c = rv_c[order]
    pos = (cand + 0.5) * spacing
    box = np.asarray(shape, np.float64) * spacing
    accepted = []
    acc_pos = np.empty((0, 3))
    acc_r = np.empty(0)
    for i in range(pos.shape[0]):
        if acc_pos.shape[0]:
            dvec = np.abs(acc_pos - pos[i])
            dvec = np.minimum(dvec, box - dvec)
            dist = np.sqrt((dvec**2).sum(axis=1))
            if np.any(dist < acc_r):  # center inside an accepted void
                continue
        accepted.append(i)
        acc_pos = np.concatenate([acc_pos, pos[i:i + 1]])
        acc_r = np.concatenate([acc_r, rv_c[i:i + 1]])
    return acc_pos, acc_r


def void_size_function(radii_v, box_volume, edges):
    """dn/dlnR from a void catalog: counts in ``edges`` (radius bins)
    divided by box volume and dlnR.  Returns ``(r_centers, dndlnr,
    counts)``."""
    edges = np.asarray(edges, np.float64)
    counts, _ = np.histogram(np.asarray(radii_v, np.float64), bins=edges)
    dlnr = np.diff(np.log(edges))
    centers = np.sqrt(edges[:-1] * edges[1:])
    return centers, counts / (float(box_volume) * dlnr), counts


def _discrete_sigma_r(power, shape, spacing, radius, interpolation):
    """Exact top-hat-filtered sigma on this grid's discrete modes."""
    from randomfield_tpu.ops import power as _power

    table = _power.validate_power(power)
    _power.require_coverage(table, shape, spacing)
    km = np.asarray(_grid.kmag(shape, spacing, jnp.float32), np.float64)
    pg = np.asarray(_power.interpolate_power(
        table, jnp.asarray(km, jnp.float32), interpolation), np.float64)
    pg[km == 0] = 0.0
    x = km * float(radius)
    with np.errstate(invalid="ignore", divide="ignore"):
        w = np.where(x > 1e-3,
                     3.0 * (np.sin(x) - x * np.cos(x)) / np.maximum(x, 1e-3)**3,
                     1.0 - x * x / 10.0)
    nz = shape[2]
    nzh = nz // 2 + 1
    mult = np.full(nzh, 2.0)
    mult[0] = 1.0
    if nz % 2 == 0:
        mult[-1] = 1.0
    volume = shape[0] * shape[1] * shape[2] * float(spacing) ** 3
    var = np.sum(mult[None, None, :] * w**2 * pg) / volume
    return float(np.sqrt(var))


def predicted_underdense_fraction(power, shape, spacing, radius,
                                  threshold, interpolation="log10k"):
    """EXACT expected volume fraction with delta_bar(<radius) <
    threshold for a Gaussian field: Phi(threshold / sigma_R), sigma_R
    the exact discrete top-hat-filtered rms on this grid's modes (the
    marginal of each voxel of the smoothed field is N(0, sigma_R^2))."""
    s = _discrete_sigma_r(power, tuple(int(x) for x in shape),
                          float(spacing), float(radius), interpolation)
    from math import erf, sqrt

    return 0.5 * (1.0 + erf(float(threshold) / s / sqrt(2.0)))


def underdense_fraction(delta, spacing, radius, threshold):
    """Measured volume fraction with delta_bar(<radius) < threshold."""
    sm = tophat_smooth(delta, spacing, radius)
    return float(jnp.mean((sm < jnp.asarray(threshold, sm.dtype)).astype(
        jnp.float32)))


def minima_statistics(delta, spacing, nbins=14, nu_min=-5.0, nu_max=2.0,
                      sigma0=None, mesh=None):
    """Lattice minima counts binned by depth nu = delta/sigma0.

    By the Gaussian field's sign symmetry this is exactly
    validate/peaks.py:peak_statistics of ``-delta`` with reflected
    bins; BBKS expectations apply with nu -> -nu
    (peaks.bbks_expected_counts on the reflected edges).  Returns
    ``(nu_centers, counts, total)`` with centers ascending in nu.
    """
    from randomfield_tpu.validate.peaks import peak_statistics

    centers, counts, total = peak_statistics(
        -jnp.asarray(delta), spacing, nbins=nbins, nu_min=-float(nu_max),
        nu_max=-float(nu_min), sigma0=sigma0, mesh=mesh)
    return -centers[::-1], counts[::-1], total
