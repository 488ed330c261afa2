"""One-loop standard perturbation theory (SPT) matter power spectrum.

Extends the reference's linear-theory surface
(``randomfield/powertools.py``, SURVEY.md section 2: tabulated P(k) is
the only theory input) with the leading nonlinear correction

    P_1loop(k) = P_lin(k) + P22(k) + P13(k),

the standard Eulerian one-loop result (Makino, Sasaki & Suto 1992;
Jain & Bertschinger 1994; conventions as in Carlson, White &
Padmanabhan 2009).  This is the theory counterpart of the package's
*measured* nonlinear statistics: 2LPT mocks (`ops/derived.py`), the
halo-model P(k) (`models/halomodel.py`) and the bispectrum estimator
(`validate/bispectrum.py`).

Definitions (continuum, this package's physical Fourier conventions):

    P22(k) = 2 int d^3q/(2 pi)^3 [F2(q, k-q)]^2 P(q) P(|k-q|)
    P13(k) = 6 P(k) int d^3q/(2 pi)^3 F3(k, q, -q) P(q)

reduced with r = q/k, x = k.q/(kq), y = |k-q|/k = sqrt(1+r^2-2rx) to

    P22(k) = k^3/(392 pi^2) int dr P(kr) int_-1^1 dx P(ky)
             (3r + 7x - 10 r x^2)^2 / y^4
    P13(k) = k^3 P(k)/(1008 pi^2) int dr P(kr) f13(r)

    f13(r) = 12/r^2 - 158 + 100 r^2 - 42 r^4
             + (3/r^3)(r^2-1)^3 (7r^2+2) ln|(1+r)/(1-r)|

Exact anchors used by tests/test_spt.py:

* UV expansion of f13 (derived from atanh(1/r) = sum r^-(2m+1)/(2m+1)):
  f13(r->inf) = -488/5 + (96/5)/r^2 - (160/21)/r^4 - (1376/1155)/r^6,
  which yields the classic low-k limit
  P13 -> -(61/105) k^2 sigma_v^2 P(k),  sigma_v^2 = (1/6pi^2) int P dq.
* f13(0) = -168, f13(1) = -88 (the (r^2-1)^3 log zero is exact).
* P22(k->0) = (9/196 pi^2) k^4 int dq P(q)^2/q^2 (angular integral of
  (3-10x^2)^2 = 18 exactly).
* The *discrete* second-order density delta2 = F2[delta, delta] built
  on the grid (:func:`second_order_density`) equals a brute-force
  O(N^6) lattice convolution, and its ensemble mean power equals the
  lattice Wick sum 2 sum_q F2^2 P P — pinning the F2 kernel and the
  Wick combinatorics independently of the continuum quadrature.

All quadratures are host-side float64 numpy (theory code, evaluated
once per study) — the grid operator is a jitted JAX program.
"""

from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
import numpy as np

from randomfield_tpu.ops import transform as _transform
from randomfield_tpu.ops.fftlog import log_grid, resample_loglog
from randomfield_tpu.ops.power import PowerTable, validate_power

__all__ = [
    "SPTResult",
    "p13_kernel",
    "sigma_v2",
    "oneloop_terms",
    "oneloop_power",
    "second_order_density",
    "predicted_tree_bispectrum",
]


class SPTResult(typing.NamedTuple):
    """One-loop SPT decomposition at wavenumbers ``k`` [h/Mpc]."""

    k: np.ndarray
    p_lin: np.ndarray
    p22: np.ndarray
    p13: np.ndarray

    @property
    def total(self) -> np.ndarray:
        return self.p_lin + self.p22 + self.p13


def p13_kernel(r):
    """The P13 radial kernel f13(r), float64, stable for all r > 0.

    Direct evaluation cancels 42 r^4-sized terms down to an O(1)
    remainder; beyond r ~ 20 the float64 cancellation error would
    exceed the 1/r^2 tail, so the exact asymptotic series (module
    docstring) takes over.  Continuity at the switch is gated in
    tests/test_spt.py at 1e-9 relative.
    """
    r = np.asarray(r, np.float64)
    out = np.empty(r.shape, np.float64)
    big = r > 20.0
    small = r < 3e-3
    mid = ~(big | small)
    rm = r[mid]
    r2 = rm * rm
    one = np.abs(rm - 1.0) < 1e-12
    safe = np.where(one, 0.5, np.minimum(rm, 1.0 / rm))
    ell = np.where(one, 0.0, 2.0 * np.arctanh(safe))
    poly = ((7.0 * r2 - 19.0) * r2 + 15.0) * r2 * r2 - r2 - 2.0
    out[mid] = (
        12.0 / r2 - 158.0 + 100.0 * r2 - 42.0 * r2 * r2
        + 3.0 / (r2 * rm) * poly * ell
    )
    s2 = r[small] * r[small]
    out[small] = -168.0 + s2 * (
        928.0 / 5.0 + s2 * (-4512.0 / 35.0 + s2 * (416.0 / 21.0))
    )
    t2 = 1.0 / (r[big] * r[big])
    out[big] = (
        -488.0 / 5.0
        + t2 * (96.0 / 5.0 + t2 * (-160.0 / 21.0 + t2 * (-1376.0 / 1155.0)))
    )
    return out


def _power_interp(power, qmin, qmax, nq):
    """Log-spaced q grid + table values with end-slope power-law tails."""
    k_t, p_t = validate_power(power)
    k_t = np.asarray(k_t, np.float64)
    p_t = np.asarray(p_t, np.float64)
    q = log_grid(qmin, qmax, nq)
    pq = resample_loglog(k_t, p_t, q)
    return k_t, p_t, q, pq


def sigma_v2(power, qmin=None, qmax=None, nq=4096):
    """1-D displacement dispersion sigma_v^2 = (1/6 pi^2) int P(q) dq."""
    k_t, _ = validate_power(power)
    qmin = float(k_t[0]) / 10.0 if qmin is None else float(qmin)
    qmax = float(k_t[-1]) * 10.0 if qmax is None else float(qmax)
    _, _, q, pq = _power_interp(power, qmin, qmax, int(nq))
    return float(np.trapezoid(pq * q, np.log(q)) / (6.0 * np.pi**2))


def oneloop_terms(power, k=None, z=0.0, cosmology=None,
                  nq=2048, nx=128, qmin=None, qmax=None) -> SPTResult:
    """P_lin, P22 and P13 at wavenumbers ``k``.

    ``power`` is a z=0 linear table in this package's units (k in
    h/Mpc, P in (Mpc/h)^3).  With ``z`` and a ``cosmology``, the
    linear term scales by D(z)^2 and both loops by D(z)^4 (EdS-exact;
    the standard approximation elsewhere).  The q integral runs over
    [``qmin``, ``qmax``] (default: one decade past the table at both
    ends, via end-slope power-law extension) with ``nq`` log-trapezoid
    nodes; the P22 angular integral uses ``nx``-point Gauss-Legendre.
    Accuracy at defaults: <0.1% against doubled-resolution arbiters
    (gated in tests).
    """
    k_t, p_t = validate_power(power)
    k_t = np.asarray(k_t, np.float64)
    if k is None:
        lo = k_t[0] * 10.0 ** 0.5
        hi = k_t[-1] * 10.0 ** -0.5
        k = log_grid(lo, hi, 128)
    k = np.atleast_1d(np.asarray(k, np.float64))
    if np.any(k <= 0):
        raise ValueError("k must be positive")
    qmin = float(k_t[0]) / 10.0 if qmin is None else float(qmin)
    qmax = float(k_t[-1]) * 10.0 if qmax is None else float(qmax)
    if not (0.0 < qmin < qmax):
        raise ValueError("need 0 < qmin < qmax")
    _, _, q, pq = _power_interp(power, qmin, qmax, int(nq))
    lnq = np.log(q)
    # trapezoid weights in ln q
    w = np.empty_like(lnq)
    w[1:-1] = 0.5 * (lnq[2:] - lnq[:-2])
    w[0] = 0.5 * (lnq[1] - lnq[0])
    w[-1] = 0.5 * (lnq[-1] - lnq[-2])
    wqp = w * q * pq  # integral dr P(kr) g(r) = (1/k) sum wqp * g(q/k)

    p_lin = resample_loglog(k_t, p_t, k)

    # P13: one radial integral per k
    r = q[None, :] / k[:, None]
    f13 = p13_kernel(r)
    p13 = (k**2 / (1008.0 * np.pi**2)) * p_lin * (f13 @ wqp)

    # P22: the angular integral via the exact substitution y = |k-q|/k
    # (dx = y dy / r), with log-spaced y nodes — this resolves the
    # integrable 1/|1-r| spike at q ~ k that defeats Gauss-Legendre
    # in x.  inner(r) = int_{|1-r|}^{1+r} num(x(y))^2 P(ky) / (r y^3) y dy
    ny = int(nx)
    p22 = np.empty_like(k)
    u = np.linspace(0.0, 1.0, ny)  # per-(k, r) log-y parameterization
    chunk = max(1, int(2e7 // (len(q) * ny)))
    for i0 in range(0, len(k), chunk):
        kc = k[i0:i0 + chunk, None, None]
        rc = q[None, :, None] / kc
        ymin = np.maximum(np.abs(1.0 - rc), 1e-10 * (1.0 + rc))
        ymax = 1.0 + rc
        lny = np.log(ymin) + (np.log(ymax) - np.log(ymin)) * u
        y = np.exp(lny)
        x = (1.0 + rc * rc - y * y) / (2.0 * rc)
        num = 3.0 * rc + 7.0 * x - 10.0 * rc * x * x
        pky = resample_loglog(k_t, p_t, (kc * y).ravel()).reshape(y.shape)
        f = num * num * pky / (rc * y * y)  # integrand * y (log measure)
        # trapezoid in ln y (uniform step per (k, r))
        dln = (np.log(ymax) - np.log(ymin))[..., 0] / (ny - 1)
        inner = (f.sum(-1) - 0.5 * (f[..., 0] + f[..., -1])) * dln
        p22[i0:i0 + chunk] = (
            k[i0:i0 + chunk] ** 2 / (392.0 * np.pi**2) * (inner @ wqp)
        )

    if z != 0.0 or cosmology is not None:
        if cosmology is None:
            raise ValueError("scaling to z != 0 requires a cosmology")
        from randomfield_tpu.models.cosmology import create_cosmology

        d = float(create_cosmology(cosmology).growth_function(float(z)))
        p_lin = d * d * p_lin
        p22 = d**4 * p22
        p13 = d**4 * p13
    return SPTResult(k, p_lin, p22, p13)


def oneloop_power(power, k=None, z=0.0, cosmology=None, **kw) -> PowerTable:
    """One-loop total P(k) as a :class:`PowerTable` (feedable back into
    ``Generator(power=...)`` — e.g. lognormal mocks with a one-loop
    target spectrum).  Raises if the loop corrections drive P <= 0
    (deep in the UV where SPT has broken down anyway)."""
    res = oneloop_terms(power, k=k, z=z, cosmology=cosmology, **kw)
    total = res.total
    if np.any(total <= 0):
        bad = res.k[total <= 0]
        raise ValueError(
            "one-loop P(k) is non-positive at k >= %.3g h/Mpc; restrict the "
            "requested k range (SPT is invalid there)" % bad.min()
        )
    return PowerTable(res.k, total)


@functools.partial(jax.jit, static_argnames=("shape", "spacing"))
def _second_order_density(delta, shape, spacing):
    from randomfield_tpu.ops.derived import _grad_kvectors, _inv_ksq

    a = _transform.rfftn(delta, norm="forward")
    inv = _inv_ksq(shape, spacing, delta.dtype)
    kx, ky, kz = _grad_kvectors(shape, spacing, delta.dtype)
    kvecs = (
        (kx, (slice(None), None, None)),
        (ky, (None, slice(None), None)),
        (kz, (None, None, slice(None))),
    )

    def inv_fft(spec):
        return _transform.irfftn(spec, shape, norm="forward")

    # F2(q1,q2) = 5/7 + (q1.q2/2)(1/q1^2 + 1/q2^2) + (2/7)(q1.q2)^2/(q1 q2)^2
    #  term 1 -> (5/7) delta^2
    #  term 2 -> -psi . grad delta,  psi_k = +i k delta_k / k^2
    #  term 3 -> (2/7) sum_ij t_ij^2, t_ij,k = +k_i k_j delta_k / k^2
    out = (5.0 / 7.0) * delta * delta
    for kv, bc in kvecs:
        psi = inv_fft(a * (1j * kv[bc] * inv))
        grd = inv_fft(a * (1j * kv[bc]))
        out = out - psi * grd
    for i in range(3):
        for j in range(i, 3):
            ki = kvecs[i][0][kvecs[i][1]]
            kj = kvecs[j][0][kvecs[j][1]]
            t = inv_fft(a * (ki * kj * inv))
            out = out + (2.0 / 7.0) * (1.0 if i == j else 2.0) * t * t
    return out


def second_order_density(delta, spacing):
    """Second-order SPT density delta2(x) = F2[delta, delta] on the grid.

    The exact discrete Galileon decomposition of the F2 convolution
    (one forward + 13 inverse transforms, one jitted program): the
    lattice realization whose ensemble mean power is the discrete P22.
    Useful as a quadratic-bias / tree-level building block and as the
    Wick-level gate for :func:`oneloop_terms` (tests/test_spt.py pins
    it against a brute-force O(N^6) lattice convolution).
    """
    shape = tuple(int(s) for s in delta.shape[-3:])
    return _second_order_density(delta, shape, float(spacing))


# ---------------------------------------------------------------------------
# Tree-level (F2) bispectrum, exactly binned on this grid
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("shape", "spacing", "edges", "triples")
)
def _tree_triple_sums(pgrid, shape, spacing, edges, triples):
    """sum_x over the separable F2 shell decomposition, every triple.

    For each bin pair (a, b) the pair field

        S_ab(x) = sum_{k1 in S_a, k2 in S_b} 2 F2(k1,k2) P1 P2
                  e^{i(k1+k2).x}

    is assembled from 13 weighted shell syntheses per bin using
    F2 = 5/7 + (k1.k2)/2 (1/k1^2 + 1/k2^2) + (2/7)(k1.k2)^2/(k1^2 k2^2):
    the even weights {P, P k_m k_n / k^2} synthesize directly; the odd
    weights {P k_m, P k_m / k^2} synthesize as i*w (Hermitian), whose
    pair products carry i^2 = -1.  Odd weights are zeroed on the
    self-conjugate lattice points (their Hermitian projection; only
    relevant for even grid sizes).  Then

        sum_{triads in (i,j,l)} B_tree = sum_x [ S_ij u_l + S_jl u_i
                                                 + S_li u_j ] / Ncells.
    """
    from randomfield_tpu.ops import grid as _grid

    kx, ky, kz = _grid.kvectors(shape, spacing, jnp.float32)
    kvec = (kx[:, None, None], ky[None, :, None], kz[None, None, :])
    k2 = _grid.ksq(shape, spacing, jnp.float32)
    kmag = jnp.sqrt(k2)
    inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)

    # Hermitian projection mask for odd weights: zero the self-conjugate
    # lattice points (DC + even-size Nyquist corners on the kz planes).
    nx, ny, nz = shape
    sc_xy, _ = _grid.hermitian_plane_masks(nx, ny)
    odd_ok = np.ones(_grid.half_shape(shape), bool)
    for zp in _grid.self_conjugate_kz_planes(nz):
        odd_ok[:, :, zp] &= ~sc_xy
    odd_ok = jnp.asarray(odd_ok)

    def synth(w, odd):
        if odd:
            spec = jax.lax.complex(jnp.zeros_like(w),
                                   jnp.where(odd_ok, w, 0.0))
        else:
            spec = jax.lax.complex(w, jnp.zeros_like(w))
        return _transform.irfftn(spec, shape, assume_hermitian=True)

    nb = len(edges) - 1
    shells = []
    for b in range(nb):
        mask = (kmag >= edges[b]) & (kmag < edges[b + 1]) & (kmag > 0)
        p = jnp.where(mask, pgrid, 0.0)
        u = synth(mask.astype(jnp.float32), False)
        a = synth(p, False)
        v = [synth(p * kvec[m], True) for m in range(3)]
        g = [synth(p * kvec[m] * inv_k2, True) for m in range(3)]
        t = [synth(p * kvec[m] * kvec[n] * inv_k2, False)
             for m in range(3) for n in range(m, 3)]
        shells.append((u, a, v, g, t))

    # T contraction weights: sum_{mn over 9} = diag once + off-diag twice
    t_pairs = [(m, n) for m in range(3) for n in range(m, 3)]
    t_w = [1.0 if m == n else 2.0 for (m, n) in t_pairs]

    def pair_field(a_i, b_i):
        ua, aa, va, ga, ta = shells[a_i]
        ub, ab, vb, gb, tb = shells[b_i]
        s = (10.0 / 7.0) * aa * ab
        for m in range(3):
            # odd*odd synth products carry i^2 = -1; the F2 dot term is
            # +(k1.k2)/2 (1/k1^2 + 1/k2^2) * 2 (the leading B factor 2)
            s = s - (va[m] * gb[m] + ga[m] * vb[m])
        for idx6, w in enumerate(t_w):
            s = s + (4.0 / 7.0) * w * ta[idx6] * tb[idx6]
        return s

    cache = {}

    def pair(a_i, b_i):
        key = (min(a_i, b_i), max(a_i, b_i))
        if key not in cache:
            cache[key] = pair_field(*key)
        return cache[key]

    sums = []
    for (i, j, l) in triples:
        tot = (pair(i, j) * shells[l][0]
               + pair(j, l) * shells[i][0]
               + pair(l, i) * shells[j][0])
        sums.append(jnp.sum(jnp.sum(tot, axis=(1, 2)), axis=0))
    return jnp.stack(sums)


def predicted_tree_bispectrum(power, shape, spacing, nbins=8, kmin=None,
                              kmax=None, smoothing_length=0.0,
                              interpolation="log10k"):
    """Exact binned tree-level gravity bispectrum on this grid.

    The theory companion of ``validate.bispectrum.calculate_bispectrum``
    for gravitationally evolved fields:

        B_tree(k1, k2, k3) = 2 F2(k1, k2) P(k1) P(k2) + cyclic,

    averaged over exactly the lattice-closed triads, shells, bins and
    masks of the estimator (including aliased closures, with all
    kernels evaluated at the in-zone wavevectors — matching
    :func:`second_order_density`'s spectral gradients), so that the
    measured bispectrum of ``delta + eps * second_order_density(delta)``
    over a Gaussian ensemble equals ``eps * B_pred`` at O(eps) with
    residuals of pure sample noise (gated, plus a direct per-triad
    float64 enumeration parity gate, in tests/test_bispectrum.py).
    ``P`` is the render's discrete spectrum (same interpolation and
    optional Gaussian smoothing).  On even grid sizes the odd-weight
    contribution of self-conjugate (Nyquist) modes is Hermitian-
    projected to zero — prefer odd sizes or kmax below the Nyquist for
    exactness at the top shell.  Returns ``(k_centers, triples, B_pred,
    ntri)`` aligned with the estimator's output on the same arguments.
    """
    from randomfield_tpu.ops import grid as _grid
    from randomfield_tpu.ops import power as _power
    from randomfield_tpu.validate import bispectrum as _bisp

    shape = tuple(int(s) for s in shape)
    table = _power.validate_power(power)
    _power.require_coverage(table, shape, float(spacing))
    kmag = _grid.kmag(shape, float(spacing), jnp.float32)
    peff = _power.interpolate_power(table, kmag, interpolation)
    sm = float(smoothing_length)
    if sm:
        peff = peff * jnp.exp(-(kmag * kmag) * sm * sm)
    peff = jnp.where(kmag > 0, peff, 0.0)

    edges, triples = _bisp.bispectrum_bins(
        shape, float(spacing), nbins, kmin, kmax
    )
    ekey = tuple(float(e) for e in edges)
    tkey = tuple(map(tuple, triples.tolist()))
    num = np.asarray(
        _tree_triple_sums(peff, shape, float(spacing), ekey, tkey),
        np.float64,
    )
    den = _bisp._triangle_counts(shape, float(spacing), ekey, tkey)
    ncells = shape[0] * shape[1] * shape[2]
    ntri = den / ncells
    keep = ntri > 0.5
    with np.errstate(invalid="ignore", divide="ignore"):
        pred = num / den
    centers = 0.5 * (edges[:-1] + edges[1:])
    return centers, triples[keep], pred[keep], ntri[keep]
