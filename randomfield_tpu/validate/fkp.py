"""FKP survey power spectra: data + randoms catalogs on the grid.

The Feldman-Kaiser-Peacock (1994) estimator is the standard survey
P(k) workflow: paint the weighted data catalog and a randoms catalog
(sampling the survey selection n_bar(x)) onto the grid, difference
them into the fluctuation field

    F(x) = [n_d(x) - alpha n_r(x)] w(x) / sqrt(I22),
    alpha = sum_d w_i / sum_r w_i,
    I22   = alpha sum_r nbar_i w_i^2     (~ Int d^3x nbar^2 w^2),

and estimate P(k) = <|F_hat(k)|^2> - P_shot with

    P_shot = (sum_d w_i^2 + alpha^2 sum_r w_i^2) / I22.

Optimal FKP weights w = 1 / (1 + nbar(x) P0) minimize the estimator
variance at power level P0.

Everything downstream of the painting reuses the framework's estimator
core — :func:`randomfield_tpu.validate.stats.calculate_power` (and the
multipole variant) with mass-assignment window deconvolution and
optional interlacing — so bins, deconvolution and alias treatment are
identical to :func:`randomfield_tpu.models.zeldovich.catalog_power`.
Exact reductions gated in tests/test_fkp.py:

- randoms on the cell-center lattice in a full uniform box make
  F exactly proportional to the painted overdensity, so the estimator
  reduces to ``catalog_power`` bin for bin (including the shot noise,
  with ``randoms_are_poisson=False``);
- for weighted-lattice "catalogs" built from a rendered field the
  whole pipeline is a deterministic quadratic form in the field,
  checked against a host float64 np.fft oracle;
- the estimator is exactly invariant under any scalar rescaling of
  the weights (the FKP normalization is scale-free).

The 2015 reference package has no survey estimator layer (SURVEY.md
section 0: clustering estimators are framework-side capability
expansion); this module pairs with validate/stats.py's mask
pseudo-P(k) (known window deconvolution) by handling the
catalog-level workflow instead.  With ``mesh=`` the painting shards
over the slab x axis (parallel/paint.py) and the estimator runs
distributed with window deconvolution — the survey grid never gathers;
interlacing remains single-device.
"""

from __future__ import annotations

import typing

import jax.numpy as jnp
import numpy as np

__all__ = ["FKPPower", "fkp_weights", "fkp_power", "fkp_power_multipoles"]


class FKPPower(typing.NamedTuple):
    """FKP estimate: ``p`` is shot-subtracted (the monopole only, for
    multipoles); ``p + shot_noise`` recovers the raw spectrum."""

    k: np.ndarray
    p: typing.Any            # array, or {ell: array} for multipoles
    n_modes: np.ndarray
    shot_noise: float
    alpha: float
    i22: float


def fkp_weights(nbar, p0):
    """Optimal FKP weights 1 / (1 + nbar P0)."""
    nbar = np.asarray(nbar, np.float64)
    if np.any(nbar < 0):
        raise ValueError("nbar must be non-negative")
    return 1.0 / (1.0 + nbar * float(p0))


def _prep_catalog(positions, weights, nbar, p0, name, counts=False):
    """Returns (positions, painted_weights, sum_w, sum_w2, sum_nbar_w2)
    with the sums taken PER OBJECT.  ``counts=True`` reads ``weights``
    as per-cell multiplicities of unit-weight objects at lattice
    positions (models/zeldovich.py:poisson_sample): a cell holding c
    objects with FKP weight m contributes c*m to sum_w but c*m^2 (not
    (c*m)^2) to sum_w2 and to the I22 integrand."""
    positions = jnp.asarray(positions)
    if positions.ndim != 2 or positions.shape[0] != 3:
        raise ValueError(f"{name} positions must be (3, N), "
                         f"got {positions.shape}")
    n = positions.shape[1]
    base = np.broadcast_to(np.asarray(weights, np.float64), (n,))
    mult = np.ones(n)
    if nbar is not None and p0:
        mult = fkp_weights(
            np.broadcast_to(np.asarray(nbar, np.float64), (n,)), p0)
    if counts:
        painted = base * mult
        sum_w = float(painted.sum())
        sum_w2 = float(np.sum(base * mult * mult))
        nw2 = base * mult * mult
    else:
        painted = base * mult
        sum_w = float(painted.sum())
        sum_w2 = float(np.sum(painted * painted))
        nw2 = painted * painted
    sum_nw2 = (float(np.sum(np.broadcast_to(
        np.asarray(nbar, np.float64), (n,)) * nw2))
        if nbar is not None else None)
    return positions, painted, sum_w, sum_w2, sum_nw2


def _fkp_field(data, randoms, spacing, shape, data_weights, randoms_weights,
               nbar_data, nbar_randoms, p0, window, shift=0.0,
               data_are_counts=False, randoms_are_counts=False,
               mesh=None):
    """Paint and normalize the FKP fluctuation field; returns the
    scaled grid plus (alpha, i22, shot terms).  A ``*_are_counts``
    catalog holds per-cell Poisson COUNTS at lattice positions
    (models/zeldovich.py:poisson_sample): its shot term is sum(w)
    rather than sum(w^2) (zeldovich.shot_noise, counts=True)."""
    from randomfield_tpu.models.zeldovich import _paint

    orders = {"ngp": 1, "cic": 2, "tsc": 3}
    if window not in orders:
        raise ValueError(f"window must be 'ngp', 'cic' or 'tsc', "
                         f"got {window!r}")
    shape = tuple(int(s) for s in shape)
    spacing = float(spacing)
    pos_d, w_d, sw_d, sw2_d, snw2_d = _prep_catalog(
        data, data_weights, nbar_data, p0, "data", counts=data_are_counts)
    pos_r, w_r, sw_r, sw2_r, snw2_r = _prep_catalog(
        randoms, randoms_weights, nbar_randoms, p0, "randoms",
        counts=randoms_are_counts)
    if sw_d <= 0 or sw_r <= 0:
        raise ValueError("catalog weights must sum to a positive total")
    alpha = sw_d / sw_r
    volume = shape[0] * shape[1] * shape[2] * spacing**3

    if snw2_r is not None:
        i22 = alpha * snw2_r
    elif snw2_d is not None:
        i22 = snw2_d
    else:
        # uniform selection: nbar = alpha sum_r w / V everywhere
        i22 = alpha * (alpha * sw_r / volume) * sw2_r
    if i22 <= 0:
        raise ValueError("FKP normalization I22 is non-positive")

    dtype = jnp.zeros(0).dtype
    if shift:
        pos_d = pos_d + shift
        pos_r = pos_r + shift
    if mesh is not None:
        # pod path: both catalogs paint sharded (parallel/paint.py);
        # the mass grid is (1 + delta) * mean by that painter's contract
        from randomfield_tpu.parallel.paint import paint_sharded

        dd, dm = paint_sharded(np.asarray(pos_d), shape, spacing, mesh,
                               weights=np.asarray(w_d, np.float32),
                               window=window)
        rd, rm = paint_sharded(np.asarray(pos_r), shape, spacing, mesh,
                               weights=np.asarray(w_r, np.float32),
                               window=window)
        d_mass = (dd + 1.0) * dtype.type(dm)
        r_mass = (rd + 1.0) * dtype.type(rm)
    else:
        d_mass = _paint(pos_d, jnp.asarray(w_d, dtype), shape, spacing,
                        orders[window])
        r_mass = _paint(pos_r, jnp.asarray(w_r, dtype), shape, spacing,
                        orders[window])
    # calculate_power computes |V_cell DFT(f)|^2 / V; the FKP spectrum
    # is |DFT(D - alpha R)|^2 / I22, so scale by sqrt(V) / (V_cell
    # sqrt(I22))
    cell = spacing**3
    scale = np.sqrt(volume) / (cell * np.sqrt(i22))
    f = (d_mass - alpha * r_mass) * dtype.type(scale)
    return f, alpha, i22, sw2_d, sw2_r


def _shot(i22, shot_d, shot_r, alpha, randoms_are_poisson):
    return (shot_d + (alpha * alpha * shot_r if randoms_are_poisson
                      else 0.0)) / i22


def fkp_power(data, randoms, spacing, shape, data_weights=1.0,
              randoms_weights=1.0, nbar_data=None, nbar_randoms=None,
              p0=0.0, nbins=32, window="cic", interlaced=False,
              randoms_are_poisson=True, data_are_counts=False,
              randoms_are_counts=False, mesh=None):
    """FKP P(k) of a survey catalog against a randoms catalog.

    ``data``/``randoms``: (3, N) positions [Mpc/h] on the periodic
    box ``shape`` x ``spacing``.  ``*_weights`` are completeness
    weights; with ``p0 > 0`` and per-object ``nbar_*`` the optimal FKP
    weight 1/(1 + nbar P0) multiplies them.  ``nbar_randoms`` (or
    ``nbar_data``) feeds the I22 normalization; omitted, the selection
    is assumed uniform at alpha sum(w_r)/V.  ``randoms_are_poisson=
    False`` drops the alpha^2 randoms term from the shot noise (use
    for deterministic lattice/analytic randoms); ``*_are_counts=True``
    declares a per-cell-Poisson-counts catalog (sum(w) shot term, see
    :func:`_fkp_field`).  ``window`` and ``interlaced`` follow
    :func:`catalog_power`.  Returns :class:`FKPPower`.
    """
    from randomfield_tpu.validate import stats as _stats

    kw = dict(data_are_counts=data_are_counts,
              randoms_are_counts=randoms_are_counts)
    f, alpha, i22, shot_d, shot_r = _fkp_field(
        data, randoms, spacing, shape, data_weights, randoms_weights,
        nbar_data, nbar_randoms, p0, window, mesh=mesh, **kw)
    f2 = None
    if interlaced:
        f2 = _fkp_field(
            data, randoms, spacing, shape, data_weights, randoms_weights,
            nbar_data, nbar_randoms, p0, window, shift=float(spacing) / 2.0,
            mesh=mesh, **kw)[0]
    k, p, n = _stats.calculate_power(f, float(spacing), nbins=int(nbins),
                                     window=window, interlaced_with=f2,
                                     mesh=mesh)
    shot = _shot(i22, shot_d, shot_r, alpha, randoms_are_poisson)
    return FKPPower(k, p - shot, n, shot, alpha, i22)


def fkp_power_multipoles(data, randoms, spacing, shape, data_weights=1.0,
                         randoms_weights=1.0, nbar_data=None,
                         nbar_randoms=None, p0=0.0, nbins=32,
                         ells=(0, 2, 4), los_axis=2, window="cic",
                         interlaced=False, randoms_are_poisson=True,
                         data_are_counts=False, randoms_are_counts=False,
                         mesh=None):
    """FKP P_ell(k) (plane-parallel LOS along a box axis — the
    periodic-box analog of the Yamamoto estimator; shot noise is
    subtracted from the monopole only).  Returns :class:`FKPPower`
    with ``p = {ell: array}``.
    """
    from randomfield_tpu.validate import stats as _stats

    kw = dict(data_are_counts=data_are_counts,
              randoms_are_counts=randoms_are_counts)
    f, alpha, i22, shot_d, shot_r = _fkp_field(
        data, randoms, spacing, shape, data_weights, randoms_weights,
        nbar_data, nbar_randoms, p0, window, mesh=mesh, **kw)
    f2 = None
    if interlaced:
        f2 = _fkp_field(
            data, randoms, spacing, shape, data_weights, randoms_weights,
            nbar_data, nbar_randoms, p0, window, shift=float(spacing) / 2.0,
            mesh=mesh, **kw)[0]
    ells = tuple(int(e) for e in ells)
    k, p_ell, n = _stats.calculate_power_multipoles(
        f, float(spacing), nbins=int(nbins), ells=ells,
        los_axis=int(los_axis), window=window, interlaced_with=f2,
        mesh=mesh)
    shot = _shot(i22, shot_d, shot_r, alpha, randoms_are_poisson)
    p_out = {ell: (row - shot if ell == 0 else row)
             for ell, row in zip(ells, np.asarray(p_ell))}
    return FKPPower(k, p_out, n, shot, alpha, i22)
