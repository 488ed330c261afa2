"""Local primordial non-Gaussianity: f_NL fields with exact tree gates.

Two flavors of the local quadratic model (capability beyond the
reference, which renders Gaussian fields only — SURVEY.md section 0):

* ``kind='field'`` — the field-level local model
  ``delta = g + f_NL (g^2 - <g^2>)`` on the rendered Gaussian field g.
  Exact tree bispectrum ``B = 2 f_NL [P(k1) P(k2) + 2 perms]``.
* ``kind='potential'`` — the standard cosmological local model: f_NL
  applied to the (linear, z=0) peculiar potential.  With the engine's
  Poisson kernel Phi_k/c^2 = -(3/2) Om delta_k / (k D_H)^2
  (ops/derived.py), delta_k = alpha(k) Phi_k with
  alpha = -(k D_H)^2 / ((3/2) Om), so
  ``B_delta = 2 f_NL alpha1 alpha2 alpha3 [P_Phi(k1) P_Phi(k2) + 2
  perms]`` with P_Phi = P / alpha^2 — the famous squeezed-limit
  enhancement (P_Phi blows up at low k).  Convention note: this is
  f_NL on the LATE-TIME linear potential; the primordial convention
  differs by the growth-suppression factor g(inf)/g(0) ~ 1.3 (Om-
  dependent), which rescales f_NL only.

The gate is EXACT at tree level and exactly binned: the estimator's
shell-field identity (validate/bispectrum.py)

    sum_x F_i F_j F_l = Ncells sum_{k1+k2+k3=0} f(k1) f(k2) f(k3)

holds for ANY per-mode weights, so evaluating it with (alpha P_Phi)-
and alpha-weighted shells computes sum over the SAME closed triads of
the tree bispectrum — measured-vs-predicted residuals carry no
binning or thin-shell systematics, only sample noise and the O(f_NL^3)
loop terms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from randomfield_tpu.ops import grid as _grid
from randomfield_tpu.ops import power as _power
from randomfield_tpu.ops import transform as _transform
from randomfield_tpu.validate import bispectrum as _bisp

__all__ = [
    "generate_local_ng_field",
    "predicted_ng_bispectrum",
]


def _alpha_grid(shape, spacing, cosmology, dtype=jnp.float32):
    """delta_k / Phi_k at z = 0, CMB (Bardeen) sign; 0 at DC.

    The engine's Newtonian kernel (ops/derived.py) is the negative of
    this; the local model is conventionally defined on the
    Bardeen-sign potential so f_NL > 0 produces a POSITIVE squeezed
    matter bispectrum — keeping the published sign convention.
    """
    from randomfield_tpu.models.cosmology import create_cosmology
    from randomfield_tpu.ops.derived import D_H_MPC_H

    c = create_cosmology(cosmology)
    k2 = _grid.ksq(shape, spacing, dtype)
    return (k2 * D_H_MPC_H**2) / (1.5 * c.Om0)


@functools.partial(jax.jit, static_argnames=("shape", "spacing", "kind"))
def _quadratic_ng(g, fnl, shape, spacing, kind, alpha):
    """delta_NG from the Gaussian render g, in one device program."""
    if kind == "field":
        q = g * g
        return g + fnl * (q - jnp.mean(q))
    # potential: phi = K g (K = 1/alpha), square, back through alpha
    a = _transform.rfftn(g, norm="forward")
    inv_alpha = jnp.where(alpha != 0, 1.0 / jnp.where(alpha != 0, alpha, 1.0), 0.0)
    phi = _transform.irfftn(a * inv_alpha, shape, norm="forward")
    q = phi * phi
    cq = _transform.rfftn(q - jnp.mean(q), norm="forward")
    dq = _transform.irfftn(cq * alpha, shape, norm="forward")
    return g + fnl * dq


def generate_local_ng_field(generator, seed, fnl, kind="field",
                            smoothing_length=0.0):
    """Render a local-f_NL non-Gaussian field from a Generator scene.

    The Gaussian part is the scene's ordinary realization for ``seed``
    (identical modes — f_NL = 0 recovers it bit-for-bit), the quadratic
    part is added in one fused device program (module docstring for the
    two ``kind`` conventions).  Lightcone weighting is intentionally
    not applied: the gate statistics assume homogeneity.  Validate
    with ``calculate_bispectrum`` against
    :func:`predicted_ng_bispectrum`.
    """
    if kind not in ("field", "potential"):
        raise ValueError(f"kind must be 'field' or 'potential', got {kind!r}")
    g = generator.generate_delta_field(
        seed, smoothing_length=smoothing_length, apply_lightcone=False
    )
    shape = tuple(int(s) for s in g.shape[-3:])
    spacing = float(generator.scene.grid_spacing)
    alpha = (
        _alpha_grid(shape, spacing, generator.cosmology, g.dtype)
        if kind == "potential" else jnp.zeros((), g.dtype)
    )
    return _quadratic_ng(
        g, jnp.asarray(fnl, g.dtype), shape, spacing, kind, alpha
    )


@functools.partial(
    jax.jit, static_argnames=("shape", "spacing", "edges", "triples")
)
def _weighted_triple_sums(wa, wb, shape, spacing, edges, triples):
    """Symmetrized sum_x [A_i A_j B_l + A_j A_l B_i + A_l A_i B_j].

    A/B are unnormalized syntheses of the (real, Hermitian-even) mode
    weights ``wa``/``wb`` cut into |k| shells — the exact closed-triad
    sums of wa(k1) wa(k2) wb(k3) + perms per bin triple.
    """
    kmag = _grid.kmag(shape, spacing, jnp.float32)
    sa, sb = [], []
    for b in range(len(edges) - 1):
        mask = (kmag >= edges[b]) & (kmag < edges[b + 1]) & (kmag > 0)
        sa.append(_transform.irfftn(
            jnp.where(mask, wa, 0.0).astype(jnp.complex64), shape,
            assume_hermitian=True,
        ))
        sb.append(_transform.irfftn(
            jnp.where(mask, wb, 0.0).astype(jnp.complex64), shape,
            assume_hermitian=True,
        ))
    sums = []
    for (i, j, l) in triples:
        tot = (
            sa[i] * sa[j] * sb[l]
            + sa[j] * sa[l] * sb[i]
            + sa[l] * sa[i] * sb[j]
        )
        sums.append(jnp.sum(jnp.sum(tot, axis=(1, 2)), axis=0))
    return jnp.stack(sums)


def predicted_ng_bispectrum(power, shape, spacing, fnl, kind="field",
                            cosmology="Planck13", smoothing_length=0.0,
                            nbins=8, kmin=None, kmax=None,
                            interpolation="log10k"):
    """Exact binned tree-level bispectrum of a local-f_NL field.

    Evaluates ``2 f_NL sum_triads [w(k1) w(k2) b(k3) + perms] / Ntri``
    per bin triple through the same shell-field machinery, bins and
    triad geometry as ``calculate_bispectrum`` — with
    ``(w, b) = (P_eff, 1)`` for ``kind='field'`` and
    ``(alpha P_Phi, alpha) = (P_eff / alpha, alpha)`` for
    ``kind='potential'`` (P_eff includes the render's Gaussian
    smoothing).  Returns ``(k_centers, triples, B_pred, ntri)`` aligned
    with the estimator's output on the same arguments.
    """
    if kind not in ("field", "potential"):
        raise ValueError(f"kind must be 'field' or 'potential', got {kind!r}")
    shape = tuple(int(s) for s in shape)
    table = _power.validate_power(power)
    _power.require_coverage(table, shape, float(spacing))
    kmag = _grid.kmag(shape, float(spacing), jnp.float32)
    peff = _power.interpolate_power(table, kmag, interpolation)
    sm = float(smoothing_length)
    peff = peff * jnp.exp(-(kmag * kmag) * sm * sm)
    peff = jnp.where(kmag > 0, peff, 0.0)
    if kind == "field":
        wa, wb = peff, jnp.ones_like(peff)
    else:
        alpha = _alpha_grid(shape, float(spacing), cosmology, jnp.float32)
        inv = jnp.where(alpha != 0,
                        1.0 / jnp.where(alpha != 0, alpha, 1.0), 0.0)
        wa, wb = peff * inv, alpha

    edges, triples = _bisp.bispectrum_bins(
        shape, float(spacing), nbins, kmin, kmax
    )
    ekey = tuple(float(e) for e in edges)
    tkey = tuple(map(tuple, triples.tolist()))
    num = np.asarray(
        _weighted_triple_sums(wa, wb, shape, float(spacing), ekey, tkey),
        np.float64,
    )
    den = _bisp._triangle_counts(shape, float(spacing), ekey, tkey)
    ncells = shape[0] * shape[1] * shape[2]
    ntri = den / ncells
    keep = ntri > 0.5
    with np.errstate(invalid="ignore", divide="ignore"):
        pred = 2.0 * float(fnl) * num / den
    centers = 0.5 * (edges[:-1] + edges[1:])
    return centers, triples[keep], pred[keep], ntri[keep]
