"""BAO scale fitting: the standard template fit for alpha.

The analysis step downstream of every mock pipeline in this package
(render -> estimate P(k) -> fit the acoustic scale): fits the isotropic
dilation parameter alpha in

    P_model(k) = B^2 P_template(k / alpha) + sum_i a_i k^{p_i}

to a measured spectrum — the Eisenstein/Anderson-style fit used in BOSS/
eBOSS-class BAO analyses (smooth broadband polynomial absorbs bias,
shot noise and mild nonlinearity; alpha carries the acoustic-scale
information; alpha = r_s,fid D_V / (r_s D_V,fid) in the isotropic
convention).  chi^2 is linear in (B^2, a_i) at fixed alpha, so the fit
is an exact linear solve per alpha on a grid plus a parabolic
refinement; the 1-sigma error comes from Delta chi^2 = 1.

Reference parity: none — the reference (SURVEY.md section 2) stops at
field generation; this is part of the analysis layer its users would
pair it with.  Host float64 numpy by design (dozens of bins x a few
hundred alpha values — an analysis utility, not a device hot path, same
stance as ops/fftlog.py).
"""

from __future__ import annotations

import numpy as np

from randomfield_tpu.ops import power as _power

__all__ = ["fit_bao_scale"]


def _template_at(table, k):
    """Template P at k, linear in log10(k) (the engine's 'log10k'
    interpolation convention, float64)."""
    return np.interp(
        np.log10(np.maximum(k, table.k[0] * 1e-12)),
        np.log10(table.k), table.Pk,
    )


def fit_bao_scale(k, pk, template=None, sigma=None, n_modes=None,
                  alpha_range=(0.85, 1.15), n_alpha=301,
                  broadband=(-1, 0, 1), kmin=None, kmax=None):
    """Fit the BAO dilation parameter alpha to a measured P(k).

    Parameters: ``k``/``pk`` — the measured spectrum (e.g. from
    ``validate.stats.calculate_power`` or an ensemble mean; NaN bins are
    dropped); ``template`` — tabulated template spectrum (anything
    ``as_power_table`` accepts; defaults to the package's default P(k));
    ``sigma`` — per-bin Gaussian errors, or ``n_modes`` to use the
    Gaussian P(k) variance ``sigma = pk sqrt(2 / n_modes)`` (divide
    n_modes by the realization count for ensemble means); unweighted if
    neither is given; ``broadband`` — powers p_i of the additive terms
    ``a_i k^{p_i}`` ((-1, 0, 1) is the standard three-term polynomial;
    () disables the broadband); ``kmin``/``kmax`` — fit range cuts.

    Returns a dict: ``alpha`` (best fit, parabola-refined),
    ``alpha_err`` (Delta chi^2 = 1), ``b2`` (template amplitude),
    ``broadband`` (coefficients a_i), ``chi2_min``, ``dof``,
    ``alpha_grid`` and ``chi2`` (the full profile for plotting /
    posterior checks).  ``alpha_err`` is NaN when the minimum touches
    the edge of ``alpha_range`` (widen the range).
    """
    k = np.asarray(k, np.float64).ravel()
    pk = np.asarray(pk, np.float64).ravel()
    if k.shape != pk.shape:
        raise ValueError("k and pk must have the same length")
    table = (
        _power.load_default_power()
        if template is None
        else _power.validate_power(template)
    )
    keep = np.isfinite(k) & np.isfinite(pk) & (k > 0)
    if kmin is not None:
        keep &= k >= float(kmin)
    if kmax is not None:
        keep &= k <= float(kmax)
    if sigma is not None and n_modes is not None:
        raise ValueError("pass sigma or n_modes, not both")
    if n_modes is not None:
        n_modes = np.asarray(n_modes, np.float64).ravel()
        if n_modes.shape != pk.shape:
            raise ValueError("n_modes must match pk")
        with np.errstate(invalid="ignore", divide="ignore"):
            sigma_full = np.abs(pk) * np.sqrt(
                2.0 / np.where(n_modes > 0, n_modes, np.nan)
            )
    elif sigma is not None:
        sigma_full = np.asarray(sigma, np.float64).ravel()
        if sigma_full.shape != pk.shape:
            raise ValueError("sigma must match pk")
    else:
        sigma_full = np.ones_like(pk)
    keep &= np.isfinite(sigma_full) & (sigma_full > 0)
    k, pk, sig = k[keep], pk[keep], sigma_full[keep]
    broadband = tuple(float(p) for p in broadband)
    npar = 1 + len(broadband)
    if k.size <= npar + 1:
        raise ValueError(
            f"only {k.size} usable bins for {npar} linear parameters — "
            "widen the fit range"
        )
    lo, hi = float(alpha_range[0]), float(alpha_range[1])
    if not (0 < lo < hi):
        raise ValueError("alpha_range must be increasing and positive")
    alphas = np.linspace(lo, hi, int(n_alpha))
    bb_cols = np.stack([k**p for p in broadband], axis=1) if broadband \
        else np.zeros((k.size, 0))
    w = 1.0 / sig
    y = pk * w
    chi2 = np.empty_like(alphas)
    params = np.empty((alphas.size, npar))
    for i, a in enumerate(alphas):
        X = np.concatenate(
            [_template_at(table, k / a)[:, None], bb_cols], axis=1
        ) * w[:, None]
        coef, _, _, _ = np.linalg.lstsq(X, y, rcond=None)
        r = y - X @ coef
        chi2[i] = r @ r
        params[i] = coef
    i0 = int(np.argmin(chi2))
    alpha, chi2_min = alphas[i0], chi2[i0]
    alpha_err = np.nan
    if 0 < i0 < alphas.size - 1:
        # parabolic refinement through the three bracketing points
        x0, x1, x2 = alphas[i0 - 1:i0 + 2]
        c0, c1, c2 = chi2[i0 - 1:i0 + 2]
        denom = (c0 - 2 * c1 + c2)
        if denom > 0:
            h = x1 - x0
            alpha = x1 + 0.5 * h * (c0 - c2) / denom
            chi2_min = c1 - 0.125 * (c0 - c2) ** 2 / denom
            # Delta chi^2 = 1 on the parabola: curvature denom / h^2
            alpha_err = h * np.sqrt(2.0 / denom)
    return {
        "alpha": float(alpha),
        "alpha_err": float(alpha_err),
        "b2": float(params[i0, 0]),
        "broadband": params[i0, 1:].copy(),
        "chi2_min": float(chi2_min),
        "dof": int(k.size - npar - 1),
        "alpha_grid": alphas,
        "chi2": chi2,
        "n_bins": int(k.size),
    }
