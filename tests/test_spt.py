"""One-loop SPT (models/spt.py).

Gates: exact f13 kernel anchors and branch continuity, the two
analytic low-k asymptotes (-61/105 k^2 sigma_v^2 P for P13 and
9/(196 pi^2) k^4 int P^2/q^2 for P22), quadrature self-convergence on
the default EH98 table, a brute-force O(N^6) lattice-convolution
oracle for the grid F2 operator, and the lattice Wick expectation of
the second-order power over a rendered ensemble."""

import numpy as np
import pytest

from randomfield_tpu import Generator
from randomfield_tpu.models import spt
from randomfield_tpu.ops.power import load_default_power


def _bump_table(amp=1e3, width=0.3, k0=1.0):
    q = np.logspace(-4, 3, 900)
    return np.stack([q, amp * np.exp(-0.5 * (np.log(q / k0) / width) ** 2)], 1)


def test_p13_kernel_anchors():
    assert spt.p13_kernel(1e-9) == pytest.approx(-168.0, rel=1e-9)
    assert spt.p13_kernel(1.0) == pytest.approx(-88.0, rel=1e-12)
    assert spt.p13_kernel(1e5) == pytest.approx(-488.0 / 5.0, rel=1e-9)
    # branch switch points are seamless
    for r0 in (3e-3, 20.0):
        lo = spt.p13_kernel(r0 * (1 - 1e-7))
        hi = spt.p13_kernel(r0 * (1 + 1e-7))
        assert abs(hi - lo) <= 1e-8 * abs(lo)
    # vector evaluation crosses all three branches at once
    r = np.array([1e-5, 0.5, 1.0, 5.0, 1e3])
    v = spt.p13_kernel(r)
    assert v.shape == r.shape and np.all(np.isfinite(v))


def test_p13_low_k_asymptote():
    # P13(k->0) = -(61/105) k^2 sigma_v^2 P(k), exact for support q >> k
    tab = _bump_table()
    sv2 = spt.sigma_v2(tab)
    k = np.array([1e-3, 3e-3])
    res = spt.oneloop_terms(tab, k=k, nq=3000)
    pred = -(61.0 / 105.0) * k**2 * sv2 * res.p_lin
    assert np.allclose(res.p13, pred, rtol=1e-4)


def test_p22_low_k_asymptote():
    # P22(k->0) = (9/196 pi^2) k^4 int dq P(q)^2 / q^2
    tab = _bump_table()
    q, P = tab[:, 0], tab[:, 1]
    integral = np.trapezoid(P**2 / q**2, q)
    k = np.array([1e-3, 3e-3])
    res = spt.oneloop_terms(tab, k=k, nq=3000, nx=96)
    pred = 9.0 / (196.0 * np.pi**2) * k**4 * integral
    assert np.allclose(res.p22, pred, rtol=5e-3)


def test_quadrature_convergence_eh98():
    tab = load_default_power()
    k = np.logspace(np.log10(0.05), np.log10(0.5), 7)
    base = spt.oneloop_terms(tab, k=k)
    fine = spt.oneloop_terms(tab, k=k, nq=6144, nx=256)
    assert np.allclose(base.p22, fine.p22, rtol=2e-3)
    assert np.allclose(base.p13, fine.p13, rtol=2e-3)
    # physical sanity on a LCDM-like spectrum: P22 > 0, P13 < 0; the
    # net loop is a small correction in the quasilinear regime (k <=
    # 0.16 h/Mpc) and a growing positive boost into the nonlinear one
    assert np.all(base.p22 > 0) and np.all(base.p13 < 0)
    quasi = base.k <= 0.16
    net = base.p22 + base.p13
    assert np.all(np.abs(net[quasi]) < 0.25 * base.p_lin[quasi])
    assert np.all(net[base.k >= 0.2] > 0)


def test_oneloop_growth_scaling_and_validation():
    tab = load_default_power()
    k = np.array([0.1, 0.2])
    z0 = spt.oneloop_terms(tab, k=k)
    z1 = spt.oneloop_terms(tab, k=k, z=1.0, cosmology="Planck13")
    from randomfield_tpu.models.cosmology import create_cosmology

    d = float(create_cosmology("Planck13").growth_function(1.0))
    assert np.allclose(z1.p_lin, d**2 * z0.p_lin, rtol=1e-12)
    assert np.allclose(z1.p22, d**4 * z0.p22, rtol=1e-12)
    assert np.allclose(z1.p13, d**4 * z0.p13, rtol=1e-12)
    with pytest.raises(ValueError, match="cosmology"):
        spt.oneloop_terms(tab, k=k, z=1.0)
    with pytest.raises(ValueError, match="positive"):
        spt.oneloop_terms(tab, k=np.array([0.0, 0.1]))
    table = spt.oneloop_power(tab, k=k)
    assert np.allclose(table.Pk, z0.total)
    assert np.all(table.Pk > 0)


def _full_f2(q1, q2):
    """Continuum F2 on explicit 3-vectors (zero if either leg is DC)."""
    a2 = float(q1 @ q1)
    b2 = float(q2 @ q2)
    if a2 == 0.0 or b2 == 0.0:
        return 0.0
    d = float(q1 @ q2)
    return 5.0 / 7.0 + 0.5 * d * (1.0 / a2 + 1.0 / b2) + 2.0 / 7.0 * d * d / (a2 * b2)


def test_second_order_density_matches_bruteforce():
    # 9^3 (odd: no Nyquist special cases), mean-free field; the grid
    # operator must equal the direct O(N^6) cyclic lattice convolution
    N, spacing = 9, 5.0
    rng = np.random.default_rng(3)
    delta = rng.normal(size=(N, N, N))
    delta -= delta.mean()
    d2 = np.asarray(spt.second_order_density(delta.astype(np.float32), spacing))

    dk = np.fft.fftn(delta) / N**3
    kf = 2 * np.pi * np.fft.fftfreq(N, d=spacing)
    K = np.stack(np.meshgrid(kf, kf, kf, indexing="ij"), -1).reshape(-1, 3)
    q2n = (K**2).sum(1)
    dkf = dk.reshape(-1)
    idx = np.arange(N)
    I, J, L = np.meshgrid(idx, idx, idx, indexing="ij")
    ib, jb, lb = I.reshape(-1), J.reshape(-1), L.reshape(-1)
    out = np.zeros(N**3, complex)
    for a in range(N**3):
        if q2n[a] == 0:
            continue
        ia, ja, la = a // (N * N), (a // N) % N, a % N
        tgt = ((ia + ib) % N) * N * N + ((ja + jb) % N) * N + ((la + lb) % N)
        dot = K @ K[a]
        good = q2n > 0
        safe = np.where(good, q2n, 1.0)
        f2 = np.where(
            good,
            5.0 / 7.0 + 0.5 * dot * (1.0 / q2n[a] + 1.0 / safe)
            + 2.0 / 7.0 * dot * dot / (q2n[a] * safe),
            0.0,
        )
        np.add.at(out, tgt, f2 * dkf[a] * dkf * good)
    oracle = np.fft.ifftn(out.reshape(N, N, N) * N**3).real
    assert np.abs(d2 - oracle).max() < 1e-4 * np.abs(oracle).max()


def test_p22_lattice_wick():
    # ensemble mean power of delta2 at fixed modes == the exact lattice
    # Wick sum 2 sum_{q1+q2=k} F2^2 sigma^2(q1) sigma^2(q2)  (k != 0)
    N, spacing, M = 9, 10.0, 96
    tab = _bump_table(amp=2e4, width=0.6, k0=0.12)
    g = Generator(N, N, N, grid_spacing=spacing, power=tab)
    sig_half = np.asarray(g.sigmas, np.float64)  # (N, N, N//2+1)

    # full-grid sigma^2 via Hermitian symmetry
    nzh = N // 2 + 1
    sig2 = np.empty((N, N, N))
    for l in range(N):
        if l < nzh:
            sig2[:, :, l] = sig_half[:, :, l] ** 2
        else:
            src = sig_half[(-np.arange(N)) % N][:, (-np.arange(N)) % N, N - l]
            sig2[:, :, l] = src**2

    kf = 2 * np.pi * np.fft.fftfreq(N, d=spacing)
    targets = [(1, 0, 0), (2, 1, 0), (1, 1, 1), (3, 0, 2)]
    s2f = sig2.reshape(-1)
    idx = np.arange(N)
    I, J, L = np.meshgrid(idx, idx, idx, indexing="ij")
    iv, jv, lv = I.reshape(-1), J.reshape(-1), L.reshape(-1)
    K = np.stack(np.meshgrid(kf, kf, kf, indexing="ij"), -1).reshape(-1, 3)
    q2n = (K**2).sum(1)

    wick = []
    for t in targets:
        # q2 = k - q1 (mod N) componentwise
        i2, j2, l2 = (t[0] - iv) % N, (t[1] - jv) % N, (t[2] - lv) % N
        b = i2 * N * N + j2 * N + l2
        acc = 0.0
        for a in range(N**3):
            if q2n[a] == 0 or q2n[b[a]] == 0:
                continue
            f2 = _full_f2(K[a], K[b[a]])
            acc += 2.0 * f2 * f2 * s2f[a] * s2f[b[a]]
        wick.append(acc)
    wick = np.array(wick)

    meas = np.zeros((M, len(targets)))
    for s in range(M):
        d = np.asarray(g.generate_delta_field(seed=s, apply_lightcone=False))
        d2k = np.fft.fftn(np.asarray(spt.second_order_density(d, spacing),
                                     np.float64)) / N**3
        for j, t in enumerate(targets):
            meas[s, j] = np.abs(d2k[t]) ** 2
    mean = meas.mean(0)
    sem = meas.std(0, ddof=1) / np.sqrt(M)
    assert np.all(np.abs(mean - wick) < 5.0 * sem + 1e-12 * wick)
    assert np.all(sem < 0.5 * wick)  # the gate has teeth
