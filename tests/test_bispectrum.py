"""Bispectrum estimator gates.

Three independent anchors:
1. analytic: a deterministic three-cosine field whose bispectrum is
   exactly A^3 V^2 / 8 in the matched shell triple;
2. oracle parity: the FFT shell estimator equals a direct O(N^6)
   float64 sum over closed triads on the same field;
3. physics: a quadratic field g + eps*(g^2 - <g^2>) reproduces the
   tree-level B = 2 eps [P1 P2 + P2 P3 + P3 P1].
"""

import numpy as np
import pytest

from randomfield_tpu import Generator
from randomfield_tpu.validate.bispectrum import (
    bispectrum_bins,
    calculate_bispectrum,
    reduced_bispectrum,
)


def _oracle_bispectrum(delta, spacing, edges, triples):
    """Direct float64 sum over closed triads (ordered, like the FFT
    estimator): for k1 in shell i, k2 in shell j, k3 = -(k1+k2) in
    shell l, accumulate c1 c2 c3; B = sum / (V * Ntri)."""
    delta = np.asarray(delta, np.float64)
    n = delta.shape
    c = spacing**3 * np.fft.fftn(delta)
    ks = [2 * np.pi * np.fft.fftfreq(m, d=spacing) for m in n]
    km = np.sqrt(
        ks[0][:, None, None] ** 2
        + ks[1][None, :, None] ** 2
        + ks[2][None, None, :] ** 2
    )
    shell = np.searchsorted(edges, km, side="right") - 1
    shell[(km < edges[0]) | (km >= edges[-1]) | (km == 0)] = -1
    idx = [np.argwhere(shell == b) for b in range(len(edges) - 1)]
    volume = n[0] * n[1] * n[2] * spacing**3
    out, ntri = [], []
    for (i, j, l) in triples:
        a, b = idx[i], idx[j]
        k3 = -(a[:, None, :] + b[None, :, :]) % np.asarray(n)
        in_l = shell[k3[..., 0], k3[..., 1], k3[..., 2]] == l
        vals = (
            c[tuple(a.T)][:, None]
            * c[tuple(b.T)][None, :]
            * c[k3[..., 0], k3[..., 1], k3[..., 2]]
        )
        s = vals[in_l].sum()
        cnt = int(in_l.sum())
        out.append(s.real / (volume * cnt) if cnt else np.nan)
        ntri.append(cnt)
    return np.asarray(out), np.asarray(ntri)


def test_three_cosine_field_exact():
    n, spacing = 16, 1.0
    kf = 2 * np.pi / (n * spacing)
    x = np.arange(n) * spacing
    xg, yg, zg = np.meshgrid(x, x, x, indexing="ij")
    # k_a + k_b + k_c = 0 with distinct |k|: (2,0,0), (0,3,0), (-2,-3,0)
    amp = 0.7
    delta = amp * (
        np.cos(2 * kf * xg) + np.cos(3 * kf * yg)
        + np.cos(-2 * kf * xg - 3 * kf * yg)
    )
    volume = (n * spacing) ** 3
    # shells 1 wide in units of kf put |k| = 2, 3, sqrt(13) in bins 1,2,3
    edges = kf * np.asarray([1.5, 2.5, 3.5, 4.5])
    k, triples, bis, ntri = calculate_bispectrum(
        delta.astype(np.float32), spacing, nbins=3,
        kmin=edges[0], kmax=edges[-1],
    )
    tri = {tuple(t): (b, c) for t, b, c in zip(triples, bis, ntri)}
    b_012, n_012 = tri[(0, 1, 2)]
    # exactly two populated closed triads — (+++) and (---), each
    # contributing (amp V / 2)^3 — averaged over ALL n_012 triads the
    # shells admit: B = 2 (amp V / 2)^3 / (V n_012)
    expected = 2 * (amp * volume / 2) ** 3 / (volume * n_012)
    np.testing.assert_allclose(b_012, expected, rtol=1e-3)
    # every other triple has zero bispectrum (phases don't close)
    scale = abs(expected * n_012)
    for t, (b, c) in tri.items():
        if t != (0, 1, 2):
            assert abs(b * c) < 1e-3 * scale, (t, b)


def test_oracle_parity_random_field():
    n, spacing = 12, 5.0
    rng = np.random.default_rng(7)
    delta = rng.normal(size=(n, n, n)).astype(np.float32)
    edges, triples = bispectrum_bins((n, n, n), spacing, nbins=4)
    k, tri, bis, ntri = calculate_bispectrum(delta, spacing, nbins=4)
    b_oracle, n_oracle = _oracle_bispectrum(
        np.asarray(delta, np.float64), spacing, edges,
        [tuple(t) for t in tri],
    )
    np.testing.assert_allclose(ntri, n_oracle, rtol=1e-4)
    np.testing.assert_allclose(bis, b_oracle, rtol=2e-3)


def test_gaussian_field_bispectrum_consistent_with_zero():
    n, spacing = 32, 8.0
    g = Generator(n, n, n, grid_spacing=spacing)
    volume = n**3 * spacing**3
    d = g.generate_fixed_field(seed=11, apply_lightcone=False)
    k, tri, bis, ntri = calculate_bispectrum(d, spacing, nbins=5)
    kp, pp, _ = g.calculate_power(d, nbins=12)
    ok = np.isfinite(pp)
    pk = np.interp(k[tri], kp[ok], pp[ok])
    # Gaussian estimator variance: var B = s V P1 P2 P3 / Ntri with the
    # triangle-multiplicity factor s = 1 / 2 / 6 (scalene / isoceles /
    # equilateral bins)
    mult = np.asarray(
        [{1: 6, 2: 2, 3: 1}[len(set(t))] for t in map(tuple, tri)],
        np.float64,
    )
    sig = np.sqrt(mult * volume * pk[:, 0] * pk[:, 1] * pk[:, 2] / ntri)
    z = bis / sig
    assert np.abs(z).max() < 5.0, z
    rms = float(np.sqrt(np.mean(z**2)))
    assert 0.4 < rms < 2.0, rms


def test_quadratic_field_tree_level():
    """Paired fixed fields cancel the <ggg> noise term exactly, so the
    pair-averaged bispectrum of g + eps (g^2 - <g^2>) isolates the tree
    term 2 eps [P1 P2 + perms] up to shell-binning bias (interior,
    non-degenerate triples only: squeezed/folded/edge-bin shapes carry
    known wide-bin biases that are properties of the test, not the
    estimator — the oracle-parity test above pins the estimator)."""
    n, spacing, eps = 32, 8.0, 0.15
    g = Generator(n, n, n, grid_spacing=spacing)
    allB = []
    for seed in (1, 2):
        for flip in (False, True):
            base = np.asarray(
                g.generate_fixed_field(
                    seed=seed, flip=flip, apply_lightcone=False
                ),
                np.float64,
            )
            quad = base**2 - base.mean() ** 2 - base.var()
            delta = (base + eps * quad).astype(np.float32)
            k, tri, bis, ntri = calculate_bispectrum(delta, spacing, nbins=5)
            allB.append(bis)
    bmean = np.mean(allB, axis=0)
    kp, pp, _ = g.calculate_power(
        np.asarray(
            g.generate_fixed_field(seed=1, apply_lightcone=False)
        ),
        nbins=12,
    )
    okp = np.isfinite(pp)
    pk = np.interp(k[tri], kp[okp], pp[okp])
    pred = 2 * eps * (
        pk[:, 0] * pk[:, 1] + pk[:, 1] * pk[:, 2] + pk[:, 2] * pk[:, 0]
    )
    interior = {
        (1, 1, 1), (1, 1, 2), (1, 2, 2), (1, 2, 3),
        (1, 3, 3), (2, 2, 2), (2, 2, 3), (2, 3, 3),
    }
    sel = np.asarray([tuple(t) in interior for t in tri])
    assert sel.sum() == len(interior)
    ratio = bmean[sel] / pred[sel]
    assert np.all(np.abs(ratio - 1.0) < 0.2), ratio
    assert abs(ratio.mean() - 1.0) < 0.1, ratio.mean()
