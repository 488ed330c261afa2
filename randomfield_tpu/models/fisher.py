"""Fisher-matrix forecasting by autodiff through the discrete theory.

The reference package (SURVEY.md section 0) validates realizations
against their input P(k); production survey analysis additionally needs
the *inverse* question — given this box, what parameter precision does
the measured spectrum support?  This module answers it the JAX-native
way: the per-mode theory P(k; theta) on the exact discrete half-spectrum
is a differentiable function, so parameter derivatives come from
``jax.jacfwd`` rather than hand-coded finite differences, and the Fisher
information is an exact mode sum over this grid (no continuum V*int
d^3k approximation — incomplete shells and the Hermitian DC/Nyquist
bookkeeping are included mode by mode, matching the framework's
exact-expectation philosophy in validate/ensemble.py and
engine/generator.py:predicted_kaiser_multipoles).

Mode weights: for a Gaussian field each Hermitian *pair* is one complex
mode with per-mode likelihood curvature d(lnP)_i d(lnP)_j; each
self-conjugate real mode (on the kz = 0 / Nyquist planes) carries half
that.  With the same multiplicity convention as
validate/ensemble.py:predicted_power_covariance (interior-kz entries
mult = 2 represent their unstored conjugate; kz-plane entries mult = 1),
every stored half-grid entry contributes weight mult/2, so

    F_ij = sum_k (mult_k / 2) dlnP_i(k) dlnP_j(k),

whose equal-P binned limit is the familiar F = N_modes/2 (dlnP)^2.

Host-f64 accumulation at validation scale (O(N^3) memory); the
forecasting grids of interest (<= 256^3) are cheap.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from randomfield_tpu.ops import grid as _grid
from randomfield_tpu.ops import power as _power

__all__ = [
    "PARAM_DEFAULTS",
    "make_kaiser_model",
    "fisher_matrix",
    "fisher_matrix_binned",
    "fisher_matrix_multipoles",
    "binned_covariance_from_pgrid",
    "forecast_errors",
]

#: Fiducial values used for parameters not varied (and not overridden
#: via ``fixed=``).  ``ln_amp`` scales exp(ln_amp) * P; ``alpha`` is an
#: isotropic Alcock-Paczynski dilation P_obs(k) = P(alpha k) / alpha^3;
#: ``sigma_s`` is the isotropic Gaussian smoothing of the render path
#: (exp(-(k sigma_s)^2), engine/generator.py:_kaiser_pgrid); ``sigma_fog``
#: is a Gaussian Fingers-of-God damping exp(-(k mu sigma_fog)^2).
PARAM_DEFAULTS = {
    "ln_amp": 0.0,
    "bias": 1.0,
    "f": 0.0,
    "alpha": 1.0,
    "sigma_s": 0.0,
    "sigma_fog": 0.0,
}


def make_kaiser_model(power, shape, spacing, params=("ln_amp", "bias", "f"),
                      los_axis=2, interpolation="log10k", fixed=None,
                      dtype=jnp.float32):
    """Differentiable per-mode Kaiser theory on this grid's half-spectrum.

    Returns ``(model_fn, theta0)``: ``model_fn(theta) -> pgrid`` maps the
    active-parameter vector (ordered as ``params``) to the per-mode power
    expectation

        exp(ln_amp) * (b + f mu^2)^2 * P_lin(alpha |k|) / alpha^3
        * exp(-(|k| sigma_s)^2) * exp(-(|k| mu sigma_fog)^2)

    on the packed half-grid (DC = 0), using the same log10(k)
    interpolation as the render path (ops/power.py:interpolate_power),
    and is differentiable in every parameter (``jnp.interp`` is
    piecewise-linear in its query points, so d/d alpha is exact between
    knots).  ``theta0`` holds the fiducial values (PARAM_DEFAULTS
    overridden by ``fixed``).

    Note: ``sigma_s``/``sigma_fog`` derivatives vanish identically at a
    fiducial of exactly 0 (the damping is quadratic in sigma) — choose a
    nonzero fiducial to forecast them.  Also note that varying
    (``ln_amp``, ``bias``, ``f``) together is EXACTLY degenerate — the
    amplitude is a (b, f) rescaling (2 dlnP/dln_amp = b dlnP/db +
    f dlnP/df per mode); :func:`forecast_errors` detects and refuses the
    singular Fisher matrix.
    """
    shape = tuple(int(s) for s in shape)
    spacing = float(spacing)
    table = _power.validate_power(power)
    _power.require_coverage(table, shape, spacing)
    params = tuple(params)
    for name in params:
        if name not in PARAM_DEFAULTS:
            raise ValueError(
                f"unknown parameter {name!r}; known: {sorted(PARAM_DEFAULTS)}")
    fid = dict(PARAM_DEFAULTS)
    fid.update(fixed or {})

    kmag = _grid.kmag(shape, spacing, dtype)
    kv = _grid.kvectors(shape, spacing)
    k_los = jnp.asarray(kv[int(los_axis)], dtype)
    bcast = [None, None, None]
    bcast[int(los_axis)] = slice(None)
    k2 = kmag * kmag
    inv = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
    mu2 = (k_los * k_los)[tuple(bcast)] * inv

    lk_tab = jnp.asarray(np.log10(table.k), dtype)
    if interpolation == "log10k":
        val_tab = jnp.asarray(table.Pk, dtype)
        log_values = False
    elif interpolation == "loglog":
        if np.any(table.Pk <= 0):
            raise ValueError("loglog interpolation requires P(k) > 0")
        val_tab = jnp.asarray(np.log10(table.Pk), dtype)
        log_values = True
    else:
        raise ValueError(f"unknown interpolation {interpolation!r}")

    def model(theta):
        theta = jnp.asarray(theta, dtype)
        d = {k: jnp.asarray(v, dtype) for k, v in fid.items()}
        for i, name in enumerate(params):
            d[name] = theta[i]
        kq = d["alpha"] * kmag
        p = _power._interp_traced(kq, lk_tab, val_tab, log_values)
        p = p / d["alpha"] ** 3
        p = jnp.exp(d["ln_amp"]) * p * (d["bias"] + d["f"] * mu2) ** 2
        p = p * jnp.exp(-(kmag * d["sigma_s"]) ** 2)
        p = p * jnp.exp(-(k2 * mu2) * d["sigma_fog"] ** 2)
        return jnp.where(kmag > 0, p, 0.0)

    theta0 = jnp.asarray([fid[name] for name in params], dtype)
    return model, theta0


def _mode_weights(shape):
    """Half-grid estimator multiplicities (mult in {1, 2}), numpy f64."""
    nx, ny, nz = (int(s) for s in shape)
    nzh = nz // 2 + 1
    mult = np.full(nzh, 2.0)
    mult[0] = 1.0
    if nz % 2 == 0:
        mult[-1] = 1.0
    return np.broadcast_to(mult[None, None, :], (nx, ny, nzh))


def fisher_matrix(model_fn, theta0, shape):
    """Exact per-mode Fisher matrix F_ij = sum (mult/2) dlnP_i dlnP_j.

    ``model_fn`` from :func:`make_kaiser_model` (or any function mapping
    a parameter vector to a per-mode half-grid power expectation);
    ``shape`` is the FULL grid shape (needed to tell an even from an odd
    nz, which the half-grid alone cannot).  Derivatives via
    ``jax.jacfwd``; weighted sums accumulate on host in float64.  Modes
    with P = 0 (DC, zero-power table entries) carry no information and
    are skipped.  Returns (nparam, nparam) numpy f64.
    """
    theta0 = jnp.asarray(theta0)
    p0 = np.asarray(model_fn(theta0), np.float64)
    jac = np.asarray(jax.jacfwd(model_fn)(theta0), np.float64)
    w = _mode_weights(shape) / 2.0
    good = p0 > 0
    dlnp = np.zeros_like(jac)
    dlnp[good] = jac[good] / p0[good][..., None]
    wd = (w * good)[..., None] * dlnp
    n = int(theta0.shape[0])
    return np.einsum("xyzi,xyzj->ij", wd, dlnp, optimize=True).reshape(n, n)


def binned_covariance_from_pgrid(pgrid, shape, spacing, nbins=32):
    """Exact Gaussian covariance of binned P(k) for an arbitrary per-mode
    power expectation half-grid.

    The generalization of validate/ensemble.py:predicted_power_covariance
    (which assumes an isotropic interpolated table) to any ``pgrid`` —
    e.g. an anisotropic Kaiser expectation from
    :func:`make_kaiser_model`.  Same bin edges, masks and multiplicity
    convention as validate/stats.py:calculate_power.  Returns
    ``(edges, counts, cov)`` with cov diagonal (nbins, nbins), NaN in
    empty bins.
    """
    shape = tuple(int(s) for s in shape)
    pg = np.asarray(pgrid, np.float64)
    km = np.asarray(_grid.kmag(shape, float(spacing), jnp.float32),
                    np.float64)
    mult = _mode_weights(shape)
    var_k = np.where(mult == 2.0, 4.0 * pg**2, 2.0 * pg**2)
    kmin, kmax = _grid.get_k_bounds(shape, float(spacing))
    edges = np.logspace(np.log10(kmin * 0.999), np.log10(kmax * 1.001),
                        int(nbins) + 1)
    idx = np.searchsorted(edges, km) - 1
    valid = (idx >= 0) & (idx < int(nbins)) & (km > 0)
    counts = np.bincount(idx[valid], weights=mult[valid],
                         minlength=int(nbins))
    vsum = np.bincount(idx[valid], weights=var_k[valid],
                       minlength=int(nbins))
    with np.errstate(invalid="ignore", divide="ignore"):
        var = np.where(counts > 0, vsum / counts**2, np.nan)
    return edges, counts, np.diag(var)


def fisher_matrix_binned(model_fn, theta0, shape, spacing, nbins=32):
    """Fisher matrix of the *binned* P(k) estimator, F = J^T C^-1 J.

    ``J`` is the jacobian of the exact per-bin expectation (mult-weighted
    bin means of the per-mode model, the same reduction as
    validate/stats.py:bin_power_grid) and ``C`` the exact Gaussian
    covariance from :func:`binned_covariance_from_pgrid`.  Information
    inequality: binned F <= per-mode :func:`fisher_matrix`, with
    equality when dlnP is constant within every bin (e.g. a pure
    amplitude parameter on any spectrum — binning is lossless for it
    only when P is bin-constant; see tests/test_fisher.py).  Returns
    (nparam, nparam) numpy f64.
    """
    shape = tuple(int(s) for s in shape)
    theta0 = jnp.asarray(theta0)
    p0 = np.asarray(model_fn(theta0), np.float64)
    jac = np.asarray(jax.jacfwd(model_fn)(theta0), np.float64)
    km = np.asarray(_grid.kmag(shape, float(spacing), jnp.float32),
                    np.float64)
    mult = _mode_weights(shape)
    edges, counts, cov = binned_covariance_from_pgrid(
        p0, shape, spacing, nbins=nbins)
    idx = np.searchsorted(edges, km) - 1
    valid = (idx >= 0) & (idx < int(nbins)) & (km > 0)
    nparam = int(theta0.shape[0])
    J = np.zeros((int(nbins), nparam))
    wj = mult[valid][:, None] * jac[valid]
    for i in range(nparam):
        J[:, i] = np.bincount(idx[valid], weights=wj[:, i],
                              minlength=int(nbins))
    nonempty = counts > 0
    J[nonempty] /= counts[nonempty][:, None]
    var = np.diag(cov)
    use = nonempty & np.isfinite(var) & (var > 0)
    return (J[use].T / var[use]) @ J[use]


def fisher_matrix_multipoles(model_fn, theta0, shape, spacing, nbins=32,
                             ells=(0, 2, 4), los_axis=2):
    """Fisher matrix of the binned P_ell(k) data vector.

    The redshift-space forecasting workhorse: F = sum_a J_a^T C_a^-1
    J_a over |k| bins, where ``J_a`` is the jacobian of the exact
    per-bin multipole expectations (the
    validate/stats.py:bin_power_multipoles_grid reduction of the
    per-mode model) and ``C_a`` the exact within-bin covariance block
    across ells (validate/ensemble.py:predicted_multipole_covariance).
    Information chain (PSD ordering, gated in tests/test_fisher.py):

        fisher_matrix  >=  fisher_matrix_multipoles  >=
        fisher_matrix_binned  ==  this with ells=(0,)   (exactly).

    Multipoles recover the mu-structure information (bias/f splits)
    that monopole binning destroys; ell <= 4 captures nearly all of it
    for Kaiser-type models.  Bins with singular covariance blocks
    (empty or mu-degenerate) are skipped.  Returns (nparam, nparam)
    numpy f64.
    """
    from randomfield_tpu.validate import ensemble as _ensemble

    shape = tuple(int(s) for s in shape)
    spacing = float(spacing)
    ells = tuple(int(e) for e in ells)
    theta0 = jnp.asarray(theta0)
    p0 = np.asarray(model_fn(theta0), np.float64)
    jac = np.asarray(jax.jacfwd(model_fn)(theta0), np.float64)
    cov = _ensemble.predicted_multipole_covariance(
        p0, shape, spacing, nbins=nbins, ells=ells, los_axis=los_axis)

    km = np.asarray(_grid.kmag(shape, spacing, jnp.float32), np.float64)
    kv = _grid.kvectors(shape, spacing)
    k_los = np.asarray(kv[int(los_axis)], np.float64)
    bcast = [None, None, None]
    bcast[int(los_axis)] = slice(None)
    with np.errstate(invalid="ignore", divide="ignore"):
        mu2 = np.where(km > 0, (k_los[tuple(bcast)] / np.where(
            km > 0, km, 1.0)) ** 2, 0.0)
    mu2 = np.broadcast_to(mu2, p0.shape)
    mult = _mode_weights(shape)
    kmin, kmax = _grid.get_k_bounds(shape, spacing)
    edges = np.logspace(np.log10(kmin * 0.999), np.log10(kmax * 1.001),
                        int(nbins) + 1)
    idx = np.searchsorted(edges, km) - 1
    valid = (idx >= 0) & (idx < int(nbins)) & (km > 0)
    counts = np.bincount(idx[valid], weights=mult[valid],
                         minlength=int(nbins))

    # Legendre weights on mu^2 (plain numpy; the stats table is jnp)
    leg = {0: lambda m2: np.ones_like(m2),
           2: lambda m2: 0.5 * (3.0 * m2 - 1.0),
           4: lambda m2: 0.125 * (35.0 * m2 * m2 - 30.0 * m2 + 3.0)}
    for e in ells:
        if e not in leg:
            raise ValueError(f"unsupported multipole ell={e}")

    nparam = int(theta0.shape[0])
    ne = len(ells)
    J = np.zeros((int(nbins), ne, nparam))
    mv = mult[valid]
    jv = jac[valid]
    iv = idx[valid]
    for e_i, ell in enumerate(ells):
        w = (2.0 * ell + 1.0) * leg[ell](mu2[valid])
        for p_i in range(nparam):
            J[:, e_i, p_i] = np.bincount(
                iv, weights=mv * w * jv[:, p_i], minlength=int(nbins))
    nonempty = counts > 0
    J[nonempty] /= counts[nonempty][:, None, None]

    F = np.zeros((nparam, nparam))
    for a in range(int(nbins)):
        if not nonempty[a] or not np.all(np.isfinite(cov[a])):
            continue
        c = cov[a]
        if np.linalg.cond(c) > 1e12:
            continue
        F += J[a].T @ np.linalg.solve(c, J[a])
    return F


def forecast_errors(fisher, names=None):
    """Marginalized and conditional 1-sigma errors from a Fisher matrix.

    Returns a dict ``name -> (marginalized, conditional)`` where
    marginalized = sqrt((F^-1)_ii) (all other parameters free) and
    conditional = 1/sqrt(F_ii) (all others fixed).  ``names`` defaults
    to ``p0..pN``.  Raises on a singular Fisher matrix (exactly
    degenerate parameter pair — e.g. ln_amp with bias at f = 0).
    """
    F = np.asarray(fisher, np.float64)
    n = F.shape[0]
    if names is None:
        names = [f"p{i}" for i in range(n)]
    cond = np.linalg.cond(F)
    if not np.isfinite(cond) or cond > 1e12:
        raise np.linalg.LinAlgError(
            f"Fisher matrix is singular/degenerate (cond={cond:.3g}); "
            "remove one of the degenerate parameters")
    inv = np.linalg.inv(F)
    return {
        str(name): (float(np.sqrt(inv[i, i])), float(1.0 / np.sqrt(F[i, i])))
        for i, name in enumerate(names)
    }
