"""2LPT displacement gates: f64 oracle parity, plane-wave identities,
and the sign-sensitive skewness physics check (S3: Zel'dovich ~ 4,
2LPT ~ 34/7 at tree level — a flipped psi(2) sign would DECREASE the
skewness below Zel'dovich instead of increasing it).
"""

import numpy as np
import pytest

from randomfield_tpu import Generator
from randomfield_tpu.models import zeldovich as zl
from randomfield_tpu.models.powerspec import power_law_power
from randomfield_tpu.ops.derived import (
    delta_to_displacement,
    delta_to_displacement_2lpt,
)
from randomfield_tpu.ops.power import PowerTable


def _oracle_psi2(delta, spacing):
    """float64 numpy 2LPT displacement (odd grids only: no Nyquist)."""
    delta = np.asarray(delta, np.float64)
    shape = delta.shape
    assert all(n % 2 == 1 for n in shape), "oracle assumes odd grids"
    kx = 2 * np.pi * np.fft.fftfreq(shape[0], d=spacing)
    ky = 2 * np.pi * np.fft.fftfreq(shape[1], d=spacing)
    kz = 2 * np.pi * np.fft.rfftfreq(shape[2], d=spacing)
    kv = [kx[:, None, None], ky[None, :, None], kz[None, None, :]]
    k2 = kv[0] ** 2 + kv[1] ** 2 + kv[2] ** 2
    inv = np.where(k2 > 0, 1.0 / np.where(k2 > 0, k2, 1.0), 0.0)
    d_k = np.fft.rfftn(delta)
    tid = {}
    for i in range(3):
        for j in range(i, 3):
            tid[i, j] = np.fft.irfftn(d_k * kv[i] * kv[j] * inv, s=shape)
    s2 = (
        tid[0, 0] * tid[1, 1] + tid[0, 0] * tid[2, 2]
        + tid[1, 1] * tid[2, 2]
        - tid[0, 1] ** 2 - tid[0, 2] ** 2 - tid[1, 2] ** 2
    )
    s_k = np.fft.rfftn(s2)
    return np.stack([
        np.fft.irfftn((3.0 / 7.0) * 1j * kv[i] * inv * s_k, s=shape)
        for i in range(3)
    ])


def test_psi2_matches_f64_oracle():
    rng = np.random.default_rng(11)
    shape, spacing = (9, 11, 13), 7.0
    delta = rng.normal(scale=0.3, size=shape).astype(np.float32)
    got = np.asarray(delta_to_displacement_2lpt(delta, spacing))
    want = _oracle_psi2(delta, spacing)
    scale = np.abs(want).max()
    assert scale > 0
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=2e-4)


def test_psi2_single_plane_wave_vanishes():
    # a single plane wave has zero 2LPT source: k_i^2 k_j^2 == (k_i k_j)^2
    n, spacing = 16, 4.0
    x = np.arange(n) * spacing
    delta = (0.5 * np.cos(2 * np.pi * 3 * x / (n * spacing)))[
        :, None, None
    ] * np.ones((n, n, n), np.float32)
    psi2 = np.asarray(delta_to_displacement_2lpt(
        np.asarray(delta, np.float32), spacing))
    psi1 = np.asarray(delta_to_displacement(
        np.asarray(delta, np.float32), spacing))
    assert np.abs(psi2).max() < 1e-5 * np.abs(psi1).max()


def test_generator_order2_composition_and_errors():
    n, spacing = 16, 8.0
    g = Generator(n, n, n, grid_spacing=spacing)
    psi1 = np.asarray(g.generate_displacement(seed=3))
    psi_2lpt = np.asarray(g.generate_displacement(seed=3, order=2))
    delta = g.generate_delta_field(seed=3, apply_lightcone=False)
    psi2 = np.asarray(delta_to_displacement_2lpt(delta, spacing))
    np.testing.assert_allclose(psi_2lpt, psi1 + psi2, atol=1e-6)
    # component selection consistent with the stack
    c1 = np.asarray(g.generate_displacement(seed=3, order=2, component=1))
    np.testing.assert_allclose(c1, psi_2lpt[1], atol=1e-6)
    with pytest.raises(ValueError):
        g.generate_displacement(seed=3, order=3)


def test_mesh_native_2lpt_matches_single_device():
    """Mesh 2LPT equals the single-device composition: identical draws,
    the only residual is the single-device path's extra forward-FFT
    roundtrip (it re-transforms the rendered field, the mesh program
    uses the sampled spectrum directly)."""
    from randomfield_tpu.parallel.mesh import make_mesh
    from randomfield_tpu.parallel.pencil import make_pencil_mesh

    n, spacing = 16, 8.0
    g0 = Generator(n, n, n, grid_spacing=spacing)
    ref = np.asarray(g0.generate_displacement(seed=3, order=2))
    scale = np.abs(ref).max()
    for mesh in (make_mesh(data=1, space=4),
                 make_pencil_mesh(data=2, spx=2, spy=2)):
        gm = Generator(n, n, n, grid_spacing=spacing, mesh=mesh)
        got = np.asarray(gm.generate_displacement(seed=3, order=2))
        np.testing.assert_allclose(got, ref, atol=2e-5 * scale)
        c1 = np.asarray(
            gm.generate_displacement(seed=3, order=2, component=1)
        )
        np.testing.assert_allclose(c1, got[1], atol=1e-6 * scale)


def test_2lpt_raises_skewness_above_zeldovich():
    # tree level: painted-density skewness S3 = <d^3>/<d^2>^2 is ~4 for
    # Zel'dovich and 34/7 ~ 4.86 for 2LPT; a sign error in psi(2) would
    # push it BELOW the Zel'dovich value
    n, spacing = 32, 8.0
    from randomfield_tpu.ops.grid import get_k_bounds

    kmin, kmax = get_k_bounds((n, n, n), spacing)
    k = np.logspace(np.log10(kmin * 0.5), np.log10(kmax * 2.0), 256)
    # sigma^2 ~ 0.11: gravitational skewness dominates painting noise
    # (it scales as sigma^4; numerical third moments do not) while
    # loop corrections stay small — measured S3_ZA = 3.94, S3_2LPT =
    # 4.61 over these seeds, right at tree level (4 and 34/7 = 4.857)
    table = PowerTable(k, 0.05 * power_law_power(k, ns=-1.0))
    g = Generator(n, n, n, grid_spacing=spacing, power=table)
    s3_za, s3_2lpt = [], []
    for seed in (1, 2, 3):
        psi1 = g.generate_displacement(seed=seed)
        psi_2 = g.generate_displacement(seed=seed, order=2)
        for psi, acc in ((psi1, s3_za), (psi_2, s3_2lpt)):
            pos = zl.zeldovich_positions(psi, spacing)
            d = np.asarray(zl.paint_cic(pos, (n, n, n), spacing), np.float64)
            acc.append((d**3).mean() / (d**2).mean() ** 2)
    za, lpt = np.mean(s3_za), np.mean(s3_2lpt)
    assert 3.0 < za < 5.5, za          # tree-level Zel'dovich ~ 4
    assert lpt > za * 1.08, (za, lpt)  # 34/28 ~ 1.21; sign-sensitive
    assert lpt < za * 1.40, (za, lpt)


# -------------------------------------------------- Zel'dovich theory P(k)


def test_zeldovich_power_linear_limit_and_convergence():
    from randomfield_tpu.models.spt import sigma_v2
    from randomfield_tpu.models.zeldovich import zeldovich_power
    from randomfield_tpu.ops.power import load_default_power

    p = load_default_power()
    sv2 = sigma_v2(p)
    kq = np.array([0.005, 0.01])
    _, pza = zeldovich_power(p, k=kq)
    plin = np.exp(np.interp(np.log(kq), np.log(np.asarray(p.k)),
                            np.log(np.asarray(p.Pk))))
    # exact low-k behavior: P_ZA = P_lin (1 - k^2 sigma_v^2 + O(k^4))
    coef = (1.0 - pza / plin) / (kq * kq * sv2)
    assert np.all((coef > 0.85) & (coef < 1.01)), coef
    # quadrature convergence: doubled resolution moves nothing
    km = np.array([0.1, 0.25, 0.5, 1.0])
    _, a = zeldovich_power(p, k=km)
    _, b = zeldovich_power(p, k=km, n_q=2 * 12288, n_mu=192,
                           q_max=1000.0)
    np.testing.assert_allclose(a, b, rtol=5e-3)


def test_zeldovich_power_damping_physics():
    from randomfield_tpu.models.irresum import nowiggle_power
    from randomfield_tpu.models.zeldovich import zeldovich_power
    from randomfield_tpu.ops.power import load_default_power

    p = load_default_power()
    k = np.geomspace(0.05, 1.0, 48)
    _, pza = zeldovich_power(p, k=k)
    plin = np.interp(k, p.k, p.Pk)
    # small scales: the displaced lattice suppresses power
    hi = k > 0.4
    assert np.all(pza[hi] < plin[hi])
    ratio = pza / plin
    assert ratio[-1] < 0.5
    # essentially monotone damping (the residual inverse-wiggle in the
    # ratio is ~1% where linear BAO oscillate)
    assert np.all(np.diff(ratio) < 0.02)
    # BAO wiggles are damped: the ZA wiggle residual around its own
    # broadband is smaller than linear theory's
    nw = nowiggle_power(p)
    pnw = np.interp(k, np.asarray(nw.k), np.asarray(nw.Pk))
    band = (k > 0.1) & (k < 0.4)
    wig_lin = plin[band] / pnw[band] - 1.0
    lnk = np.log(k[band])
    smooth = np.exp(np.polyval(np.polyfit(lnk, np.log(ratio[band]), 3),
                               lnk))
    wig_za = pza[band] / (pnw[band] * smooth) - 1.0
    # overall damping plus strong suppression of the high-k wiggles
    # (the exp(-k^2 Sigma^2/2)-like envelope barely touches the first
    # oscillation near k ~ 0.1)
    assert np.std(wig_za) < 0.85 * np.std(wig_lin), (
        np.std(wig_za), np.std(wig_lin))
    tail = k[band] > 0.2
    assert np.std(wig_za[tail]) < 0.4 * np.std(wig_lin[tail]), (
        np.std(wig_za[tail]), np.std(wig_lin[tail]))


def test_zeldovich_power_matches_displaced_lattice_mocks():
    # ensemble of Zel'dovich-displaced lattices: the measured catalog
    # P(k) follows the exact ZA curve much more closely than linear
    # theory below ~0.4 k_Nyquist (beyond that, the mocks' band-limited
    # displacements and lattice discreteness add power the continuum
    # theory excludes — documented, not gated)
    from randomfield_tpu import Generator
    from randomfield_tpu.models import zeldovich as zl
    from randomfield_tpu.models.zeldovich import zeldovich_power

    n, spacing, nseeds = 64, 6.0, 6
    g = Generator(n, n, n, grid_spacing=spacing)
    ps = []
    for s in range(nseeds):
        psi = g.generate_displacement(seed=s)
        pos = zl.zeldovich_positions(psi, spacing)
        kb, pb, nm = zl.catalog_power(pos, spacing, shape=(n, n, n),
                                      nbins=16, interlaced=True)
        ps.append(np.asarray(pb))
    kb = np.asarray(kb)
    mean = np.nanmean(np.asarray(ps), 0)
    _, pza = zeldovich_power(g.power, k=kb)
    plin = np.interp(kb, g.power.k, g.power.Pk)
    band = (kb > 0.05) & (kb < 0.2) & np.isfinite(mean) & (nm > 90)
    dev_za = mean[band] / pza[band] - 1.0
    dev_lin = mean[band] / plin[band] - 1.0
    assert np.all(np.abs(dev_za) < 0.10), (kb[band], dev_za)
    assert np.sqrt(np.mean(dev_za**2)) < 0.8 * np.sqrt(
        np.mean(dev_lin**2)), (dev_za, dev_lin)
