"""Tidal tensor fields + cosmic-web classification.

Gates: exact trace identity (sum of diagonal tidal components == the
density field per voxel); eigenvalue-solver parity with LAPACK; web
fractions against an EXACT-lattice-covariance Monte Carlo oracle (the
6x6 covariance of the tidal components is computed analytically from
the mode sum on the actual grid, then sampled independently of any
field machinery); mesh parity; continuum Doroshkevich fractions as the
smooth-limit cross-check.
"""

import numpy as np

import randomfield_tpu as rf
from randomfield_tpu.models import web
from randomfield_tpu.ops import derived
from randomfield_tpu.validate.oracle import oracle_sigmas


def _lattice_tidal_covariance(shape, spacing, power, sm=0.0):
    """Exact 6x6 covariance of (T_xx..T_yz) on THIS grid, float64.

    Cov(T_a, T_b) = sum_packed m_k sigma_eff^2 g_a(k) g_b(k) with
    g_(ij) = k_i k_j / k^2 — the kernels are real, so the packed sum
    with kz multiplicity is the full-spectrum sum.  Off-diagonal
    kernels use the engine's Nyquist-zeroed gradient vectors
    (ops/derived.py kind='tidal' convention).
    """
    sig = oracle_sigmas(shape, spacing, (power.k, power.Pk))
    nx, ny, nz = shape
    kx = 2 * np.pi * np.fft.fftfreq(nx, d=spacing)
    ky = 2 * np.pi * np.fft.fftfreq(ny, d=spacing)
    kz = 2 * np.pi * np.fft.rfftfreq(nz, d=spacing)
    k2 = (kx**2)[:, None, None] + (ky**2)[None, :, None] + (kz**2)[None, None, :]
    inv = np.where(k2 > 0, 1.0 / np.where(k2 > 0, k2, 1.0), 0.0)
    kvec = (
        np.broadcast_to(kx[:, None, None], k2.shape),
        np.broadcast_to(ky[None, :, None], k2.shape),
        np.broadcast_to(kz[None, None, :], k2.shape),
    )
    gx, gy, gz = (v.copy() for v in (kx, ky, kz))
    if nx % 2 == 0:
        gx[nx // 2] = 0.0
    if ny % 2 == 0:
        gy[ny // 2] = 0.0
    if nz % 2 == 0:
        gz[-1] = 0.0
    gvec = (
        np.broadcast_to(gx[:, None, None], k2.shape),
        np.broadcast_to(gy[None, :, None], k2.shape),
        np.broadcast_to(gz[None, None, :], k2.shape),
    )
    mult = np.full(nz // 2 + 1, 2.0)
    mult[0] = 1.0
    if nz % 2 == 0:
        mult[-1] = 1.0
    w = mult[None, None, :] * (sig * np.exp(-0.5 * k2 * sm * sm)) ** 2
    g = [
        (kvec if i == j else gvec)[i] * (kvec if i == j else gvec)[j] * inv
        for i, j in derived.TIDAL_PAIRS
    ]
    cov = np.empty((6, 6))
    for a in range(6):
        for b in range(6):
            cov[a, b] = np.sum(w * g[a] * g[b])
    return cov


def _mc_fractions_from_cov(cov, threshold=0.0, n=400_000, seed=0):
    rng = np.random.RandomState(seed)
    L = np.linalg.cholesky(cov + 1e-12 * np.eye(6))
    comp = (L @ rng.normal(size=(6, n)))
    t = np.empty((n, 3, 3))
    t[:, 0, 0], t[:, 1, 1], t[:, 2, 2] = comp[0], comp[1], comp[2]
    t[:, 0, 1] = t[:, 1, 0] = comp[3]
    t[:, 0, 2] = t[:, 2, 0] = comp[4]
    t[:, 1, 2] = t[:, 2, 1] = comp[5]
    lam = np.linalg.eigvalsh(t)
    counts = (lam > threshold).sum(axis=1)
    return np.bincount(counts, minlength=4).astype(np.float64) / n


def test_trace_identity():
    """Diagonal tidal components sum to the density field EXACTLY."""
    g = rf.Generator(24, 24, 24, grid_spacing=8.0)
    t = np.asarray(g.generate_tidal_field(3))
    d = np.asarray(g.generate_delta_field(3, apply_lightcone=False))
    np.testing.assert_allclose(t[0] + t[1] + t[2], d, atol=2e-5 * d.std())


def test_field_first_matches_seed_direct():
    g = rf.Generator(16, 16, 16, grid_spacing=16.0)
    d = g.generate_delta_field(1, apply_lightcone=False)
    t_field = np.asarray(derived.delta_to_tidal(d, 16.0))
    t_seed = np.asarray(g.generate_tidal_field(1))
    np.testing.assert_allclose(t_field, t_seed, atol=3e-5 * t_seed.std())


def test_single_component_selection():
    g = rf.Generator(16, 16, 16, grid_spacing=16.0)
    t = np.asarray(g.generate_tidal_field(2))
    for c in (0, 3, 5):
        tc = np.asarray(g.generate_tidal_field(2, component=c))
        np.testing.assert_allclose(tc, t[c], atol=1e-6)


def test_eigenvalues_match_lapack():
    rng = np.random.RandomState(0)
    comp = rng.normal(size=(6, 500)).astype(np.float32)
    lam = np.asarray(web.eigenvalues_sym3(comp))
    t = np.empty((500, 3, 3))
    t[:, 0, 0], t[:, 1, 1], t[:, 2, 2] = comp[0], comp[1], comp[2]
    t[:, 0, 1] = t[:, 1, 0] = comp[3]
    t[:, 0, 2] = t[:, 2, 0] = comp[4]
    t[:, 1, 2] = t[:, 2, 1] = comp[5]
    want = np.linalg.eigvalsh(t).T[::-1]  # descending
    np.testing.assert_allclose(lam, want, atol=2e-5 * np.abs(want).max())
    # degenerate tensors (isotropic): all eigenvalues equal the diagonal
    iso = np.zeros((6, 4), np.float32)
    iso[:3] = 1.7
    np.testing.assert_allclose(np.asarray(web.eigenvalues_sym3(iso)), 1.7,
                               atol=1e-6)


def test_web_fractions_match_exact_lattice_oracle():
    """Field-measured signature fractions vs the exact-covariance MC.

    The oracle covariance is the analytic mode sum on this very grid
    (cubic-lattice anisotropy included), so the only error budget is
    MC noise + the finite number of correlated voxels.
    """
    sm = 16.0
    g = rf.Generator(32, 32, 32, grid_spacing=8.0)
    counts = np.zeros(4)
    nseeds = 4
    for s in range(nseeds):
        cls = np.asarray(g.classify_web(s, smoothing_length=sm))
        counts += np.bincount(cls.ravel(), minlength=4)
    frac = counts / counts.sum()
    cov = _lattice_tidal_covariance(g.shape, g.grid_spacing, g.power, sm=sm)
    want = _mc_fractions_from_cov(cov)
    np.testing.assert_allclose(frac, want, atol=0.025)
    # threshold moves mass outward: more voids + knots lose to sheets?
    # no — higher threshold strictly grows the low-count classes
    cls_t = np.asarray(g.classify_web(0, smoothing_length=sm, threshold=0.5))
    frac_t = web.web_fractions(cls_t)
    frac_0 = web.web_fractions(np.asarray(
        g.classify_web(0, smoothing_length=sm)
    ))
    assert frac_t[0] > frac_0[0]  # more voids at higher threshold
    assert frac_t[3] < frac_0[3]  # fewer knots


def test_continuum_doroshkevich_limit():
    """The continuum helper reproduces the classic ~8/42/42/8% split and
    the exact-lattice oracle approaches it for a well-sampled grid."""
    frac = web.doroshkevich_fractions(n_samples=400_000)
    np.testing.assert_allclose(frac, [0.08, 0.42, 0.42, 0.08], atol=0.01)
    assert abs(frac[0] - frac[3]) < 0.002  # symmetry
    assert abs(frac[1] - frac[2]) < 0.002


def test_mesh_parity():
    from randomfield_tpu.parallel.mesh import make_mesh

    g0 = rf.Generator(16, 16, 16, grid_spacing=16.0)
    gm = rf.Generator(16, 16, 16, grid_spacing=16.0,
                      mesh=make_mesh(data=2, space=4))
    for c in (0, 4):
        t0 = np.asarray(g0.generate_tidal_field(5, component=c))
        tm = np.asarray(gm.generate_tidal_field(5, component=c))
        np.testing.assert_allclose(tm, t0, atol=1e-5 * t0.std(), rtol=2e-4)


def test_kernel_layout_consistency():
    """'xzy' (staged-pipeline) tidal kernels equal the 'xyz' ones."""
    import jax

    from randomfield_tpu.ops import sample as _sample

    shape, spacing = (12, 10, 8), 8.0
    c = _sample.sample_unit_hermitian(jax.random.key(0), shape)
    for comp in range(6):
        a = np.asarray(derived.apply_kernel_inline(
            c, shape, spacing, "xyz", "tidal", comp
        ))
        b = np.asarray(derived.apply_kernel_inline(
            jnp_transpose(c), shape, spacing, "xzy", "tidal", comp
        ))
        np.testing.assert_allclose(np.transpose(b, (0, 2, 1)), a, atol=1e-6)


def jnp_transpose(c):
    import jax.numpy as jnp

    return jnp.transpose(c, (0, 2, 1))


def test_smoothing_reduces_variance():
    g = rf.Generator(24, 24, 24, grid_spacing=8.0)
    t0 = np.asarray(g.generate_tidal_field(1, component=0))
    t1 = np.asarray(g.generate_tidal_field(1, component=0,
                                           smoothing_length=16.0))
    assert t1.var() < 0.5 * t0.var()
