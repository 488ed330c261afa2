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


# ------------------------------------------------------- tree-level theory


def _inzone_freqs(n, spacing):
    return 2.0 * np.pi * np.fft.fftfreq(n, d=spacing)


def _f2(k1, k2):
    a2 = k1 @ k1
    b2 = k2 @ k2
    if a2 == 0.0 or b2 == 0.0:
        return 0.0
    d = float(k1 @ k2)
    return (5.0 / 7.0 + 0.5 * d * (1.0 / a2 + 1.0 / b2)
            + 2.0 / 7.0 * d * d / (a2 * b2))


def test_tree_bispectrum_matches_direct_enumeration():
    # 9^3 (odd: no Nyquist special cases): the shell-FFT prediction must
    # equal a float64 per-triad enumeration of 2 F2 P1 P2 + cyc over all
    # lattice-closed ordered triples, with identical bins and P values.
    from randomfield_tpu.models.spt import predicted_tree_bispectrum
    from randomfield_tpu.ops import grid as _grid
    from randomfield_tpu.ops import power as _power

    n, spacing, nbins = 9, 6.0, 3
    table = _power.load_default_power()
    centers, triples, pred, ntri = predicted_tree_bispectrum(
        table, (n, n, n), spacing, nbins=nbins)

    # same interpolated P on the half grid, folded to the full grid
    import jax.numpy as jnp
    kmag = _grid.kmag((n, n, n), spacing, jnp.float32)
    ph = np.asarray(_power.interpolate_power(table, kmag, "log10k"),
                    np.float64)
    kf = _inzone_freqs(n, spacing)
    idx = np.arange(n)
    I, J, L = np.meshgrid(idx, idx, idx, indexing="ij")
    modes = np.stack([I.ravel(), J.ravel(), L.ravel()], 1)
    K = np.stack([kf[modes[:, 0]], kf[modes[:, 1]], kf[modes[:, 2]]], 1)
    kzh = np.where(modes[:, 2] <= n // 2, modes[:, 2], n - modes[:, 2])
    ix = np.where(modes[:, 2] <= n // 2, modes[:, 0],
                  (-modes[:, 0]) % n)
    iy = np.where(modes[:, 2] <= n // 2, modes[:, 1],
                  (-modes[:, 1]) % n)
    pfull = ph[ix, iy, kzh]
    kabs = np.sqrt((K**2).sum(1))
    edges, _ = bispectrum_bins((n, n, n), spacing, nbins)
    bins = np.searchsorted(edges, kabs) - 1
    inb = (bins >= 0) & (bins < nbins) & (kabs > 0)

    num = {}
    den = {}
    nm = n**3
    live = np.flatnonzero(kabs > 0)
    for a in live:
        if not inb[a]:
            continue
        # closing mode for every partner b: l3 = (-(ia+ib)) mod n
        t3 = np.stack([(-(modes[a, 0] + modes[:, 0])) % n,
                       (-(modes[a, 1] + modes[:, 1])) % n,
                       (-(modes[a, 2] + modes[:, 2])) % n], 1)
        flat3 = t3[:, 0] * n * n + t3[:, 1] * n + t3[:, 2]
        ok = inb & inb[flat3]
        for b in np.flatnonzero(ok):
            c = flat3[b]
            k1, k2, k3 = K[a], K[b], K[c]
            key = (bins[a], bins[b], bins[c])
            btree = 2.0 * (_f2(k1, k2) * pfull[a] * pfull[b]
                           + _f2(k2, k3) * pfull[b] * pfull[c]
                           + _f2(k3, k1) * pfull[c] * pfull[a])
            num[key] = num.get(key, 0.0) + btree
            den[key] = den.get(key, 0.0) + 1.0
    for (i, j, l), b_fft, nt in zip(triples, pred, ntri):
        key = (int(i), int(j), int(l))
        assert key in den, key
        np.testing.assert_allclose(nt, den[key], rtol=1e-5)  # f32 shells
        np.testing.assert_allclose(b_fft, num[key] / den[key], rtol=5e-4,
                                   err_msg=str(key))


@pytest.mark.slow
def test_tree_bispectrum_mc_gate():
    # Antithetic matched-pair Monte Carlo:
    # [B(g + eps Q) - B(g - eps Q)] / (2 eps) with Q = F2[g, g] has
    # expectation B_pred + O(eps^2) — the pure Gaussian ggg noise AND
    # the even-in-eps <g Q Q> loop term cancel exactly in the
    # difference (B is cubic in the field), so ~32 seeds pin every
    # triple to a few percent.
    from randomfield_tpu import Generator
    from randomfield_tpu.models.spt import (
        predicted_tree_bispectrum,
        second_order_density,
    )
    from randomfield_tpu.validate.bispectrum import calculate_bispectrum

    n, spacing, nbins, nseeds, eps = 25, 8.0, 3, 32, 0.05
    g = Generator(n, n, n, grid_spacing=spacing)
    _, triples, pred, ntri = predicted_tree_bispectrum(
        g.power, (n, n, n), spacing, nbins=nbins)
    diffs = []
    for s in range(nseeds):
        # snapshot statistics: the default lightcone weighting makes the
        # field non-stationary (plane-dependent growth), which is not
        # what the stationary tree prediction describes
        delta = np.asarray(
            g.generate_delta_field(s, apply_lightcone=False), np.float32)
        d2 = np.asarray(second_order_density(delta, spacing), np.float32)
        bp = calculate_bispectrum(delta + eps * d2, spacing, nbins=nbins)[2]
        bm = calculate_bispectrum(delta - eps * d2, spacing, nbins=nbins)[2]
        diffs.append((bp - bm) / (2.0 * eps))
    diffs = np.asarray(diffs)  # (nseeds, T)
    mean = diffs.mean(0)
    sem = diffs.std(0, ddof=1) / np.sqrt(nseeds)
    z = (mean - pred) / sem
    assert np.all(np.abs(z) < 5.0), (z, mean / pred)
    # global amplitude: inverse-variance-weighted ratio within a few %
    wsum = np.sum(pred**2 / sem**2)
    amp = np.sum(mean * pred / sem**2) / wsum
    amp_err = 1.0 / np.sqrt(wsum)
    assert abs(amp - 1.0) < max(5.0 * amp_err, 0.05), (amp, amp_err)


def test_mesh_bispectrum_matches_single_device():
    """Slab + pencil distributed bispectrum equals the single-device
    estimator (same bins/triads; sharded shell synthesis + psums)."""
    from randomfield_tpu.parallel.mesh import make_mesh
    from randomfield_tpu.parallel.pencil import make_pencil_mesh

    shape, spacing = (16, 16, 16), 4.0
    g = Generator(*shape, grid_spacing=spacing)
    delta = g.generate_delta_field(seed=3)
    k0, t0, b0, n0 = calculate_bispectrum(delta, spacing, nbins=4)
    for mesh in (make_mesh(data=1, space=4),
                 make_pencil_mesh(data=1, spx=2, spy=2)):
        k1, t1, b1, n1 = calculate_bispectrum(
            delta, spacing, nbins=4, mesh=mesh
        )
        np.testing.assert_array_equal(t1, t0)
        np.testing.assert_allclose(n1, n0, rtol=1e-4, atol=0.1)
        np.testing.assert_allclose(
            b1, b0, rtol=5e-4, atol=1e-4 * np.abs(b0).max()
        )


def test_generator_mesh_bispectrum_runs():
    from randomfield_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=1, space=2)
    g = Generator(16, 16, 16, grid_spacing=4.0, mesh=mesh)
    d = g.generate_delta_field(seed=1)
    k, t, b, n = g.calculate_bispectrum(d, nbins=3)
    assert np.isfinite(b).all() and (n > 0).all()
