"""Constrained realizations (Hoffman-Ribak) + Wiener/posterior sampling.

Gates: exact per-realization constraint satisfaction measured through an
independent forward-transform path; float64 oracle parity of the
constraint Gram matrix and the functional measurement; conditional
ensemble statistics (mean -> conditional mean, variance suppressed at the
constraint, variance at a probe point matching the exact Gaussian
conditional-variance formula); Wiener-filter algebra and the exact
posterior MSE expectation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import randomfield_tpu as rf
from randomfield_tpu.models import constrained as con
from randomfield_tpu.validate.oracle import oracle_sigmas


def _gen(shape=(32, 32, 32), spacing=8.0, **kw):
    return rf.Generator(*shape, grid_spacing=spacing, **kw)


def _oracle_kernels(shape, spacing, pos, scales):
    """float64 packed kernels K = W exp(ik.x), Im zeroed at self-conj."""
    nx, ny, nz = shape
    kx = 2 * np.pi * np.fft.fftfreq(nx, d=spacing)
    ky = 2 * np.pi * np.fft.fftfreq(ny, d=spacing)
    kz = 2 * np.pi * np.fft.rfftfreq(nz, d=spacing)
    k2 = (kx**2)[:, None, None] + (ky**2)[None, :, None] + (kz**2)[None, None, :]

    sx = np.zeros(nx, bool); sx[0] = True
    if nx % 2 == 0: sx[nx // 2] = True
    sy = np.zeros(ny, bool); sy[0] = True
    if ny % 2 == 0: sy[ny // 2] = True
    sz = np.zeros(len(kz), bool); sz[0] = True
    if nz % 2 == 0: sz[-1] = True
    self_conj = sx[:, None, None] & sy[None, :, None] & sz[None, None, :]
    out = []
    for p, r in zip(np.asarray(pos, np.float64), np.asarray(scales, np.float64)):
        phase = (
            kx[:, None, None] * p[0]
            + ky[None, :, None] * p[1]
            + kz[None, None, :] * p[2]
        )
        w = np.exp(-0.5 * k2 * r * r)
        kr = w * np.cos(phase)
        ki = np.where(self_conj, 0.0, w * np.sin(phase))
        out.append(kr + 1j * ki)
    return np.stack(out)


def _oracle_mult(shape):
    nzh = shape[2] // 2 + 1
    m = np.full(nzh, 2.0)
    m[0] = 1.0
    if shape[2] % 2 == 0:
        m[-1] = 1.0
    return m


def _oracle_gram(shape, spacing, power, pos, scales, sm=0.0):
    sig = oracle_sigmas(shape, spacing, (power.k, power.Pk))
    nx, ny, nz = shape
    kx = 2 * np.pi * np.fft.fftfreq(nx, d=spacing)
    ky = 2 * np.pi * np.fft.fftfreq(ny, d=spacing)
    kz = 2 * np.pi * np.fft.rfftfreq(nz, d=spacing)
    k2 = (kx**2)[:, None, None] + (ky**2)[None, :, None] + (kz**2)[None, None, :]
    se2 = (sig * np.exp(-0.5 * k2 * sm * sm)) ** 2
    K = _oracle_kernels(shape, spacing, pos, scales)
    w = _oracle_mult(shape)[None, None, :] * se2
    M = len(K)
    xi = np.empty((M, M))
    for i in range(M):
        for j in range(M):
            xi[i, j] = np.sum(w * (K[i] * K[j].conj()).real)
    return xi


CONSTRAINTS = [
    ((64.0, 64.0, 64.0), 2.5, 16.0),   # grid point, smoothed peak
    ((128.0, 96.0, 32.0), -1.0, 24.0),  # grid point, smoothed void
    ((40.0, 200.0, 120.0), 0.7, 0.0),   # grid point, raw field value
]


def test_exact_constraint_satisfaction():
    g = _gen()
    d = g.generate_constrained_field(7, CONSTRAINTS)
    got = g.measure_constraints(d, CONSTRAINTS)
    want = [c[1] for c in CONSTRAINTS]
    np.testing.assert_allclose(got, want, atol=2e-3)
    # raw-value constraint: the band-limited value at a grid point IS the
    # field value there — check the voxel directly
    i, j, k = (int(round(x / 8.0)) for x in CONSTRAINTS[2][0])
    assert abs(float(d[i, j, k]) - 0.7) < 2e-3


def test_exact_satisfaction_off_grid_and_smoothed_render():
    g = _gen()
    cons = [((61.3, 70.2, 99.9), 1.5, 20.0), ((150.0, 10.5, 200.0), -0.5, 12.0)]
    d = g.generate_constrained_field(3, cons, smoothing_length=6.0)
    got = g.measure_constraints(d, cons)
    np.testing.assert_allclose(got, [1.5, -0.5], atol=2e-3)


def test_odd_anisotropic_grid():
    g = _gen(shape=(18, 15, 20), spacing=10.0)
    cons = [((50.0, 70.0, 90.0), 1.2, 25.0)]
    d = g.generate_constrained_field(11, cons)
    got = g.measure_constraints(d, cons)
    np.testing.assert_allclose(got, [1.2], atol=2e-3)


def test_self_consistency_with_unconstrained_render():
    """Constraining to a seed's OWN values must return that seed's field."""
    g = _gen(shape=(24, 24, 24))
    ref = np.asarray(g.generate_delta_field(5, apply_lightcone=False))
    vals = g.measure_constraints(ref, CONSTRAINTS[:2])
    cons = [(c[0], v, c[2]) for c, v in zip(CONSTRAINTS[:2], vals)]
    d = np.asarray(g.generate_constrained_field(5, cons))
    np.testing.assert_allclose(d, ref, atol=5e-4 * ref.std())


def test_gram_oracle_parity():
    g = _gen(shape=(16, 12, 18), spacing=12.0)
    pos = [c[0] for c in CONSTRAINTS]
    scl = [c[2] + 10.0 for c in CONSTRAINTS]  # keep windows resolved
    cons = [(p, 0.0, s) for p, s in zip(pos, scl)]
    xi = g.constraint_matrix(cons, smoothing_length=5.0)
    xi0 = _oracle_gram(
        g.shape, g.grid_spacing, g.power,
        np.asarray(pos), np.asarray(scl), sm=5.0,
    )
    np.testing.assert_allclose(xi, xi0, rtol=2e-3, atol=1e-8)


def test_measure_oracle_parity():
    g = _gen(shape=(16, 16, 16), spacing=16.0)
    d = np.asarray(g.generate_delta_field(2, apply_lightcone=False), np.float64)
    got = g.measure_constraints(d, CONSTRAINTS)
    c = np.fft.rfftn(d) / d.size
    K = _oracle_kernels(
        g.shape, g.grid_spacing,
        np.asarray([c_[0] for c_ in CONSTRAINTS]),
        np.asarray([c_[2] for c_ in CONSTRAINTS]),
    )
    want = [
        np.sum(_oracle_mult(g.shape)[None, None, :] * (c * K[m]).real)
        for m in range(len(K))
    ]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_conditional_mean_and_variance():
    """Ensemble statistics of constrained renders match the exact Gaussian
    conditional distribution: mean -> conditional mean field; variance at
    a probe point -> xi_ff - xi_fc xi_cc^{-1} xi_cf (computed by treating
    the probe as an extra zero-width constraint row)."""
    g = _gen(shape=(16, 16, 16), spacing=16.0)
    cons = [((64.0, 64.0, 64.0), 2.0, 30.0)]
    probe = (192.0, 128.0, 64.0)
    pi, pj, pk = (int(round(x / 16.0)) for x in probe)

    mean_field = np.asarray(g.constrained_mean_field(cons))
    np.testing.assert_allclose(
        g.measure_constraints(mean_field, cons), [2.0], atol=2e-3
    )

    nseeds = 256
    fields = np.stack([
        np.asarray(g.generate_constrained_field(s, cons))
        for s in range(nseeds)
    ])
    # constraint satisfied per realization
    sat = np.array([
        float(g.measure_constraints(f, cons)[0]) for f in fields[:16]
    ])
    np.testing.assert_allclose(sat, 2.0, atol=3e-3)

    # mean -> conditional mean (per-voxel tolerance from the conditional
    # std / sqrt(nseeds), bounded by the unconditional std)
    sd = np.sqrt(g.predicted_variance())
    resid = fields.mean(axis=0) - mean_field
    assert np.abs(resid).max() < 6.0 * sd / np.sqrt(nseeds)

    # probe-point conditional variance via the (M+1) Gram matrix
    aug = cons + [(probe, 0.0, 0.0)]
    xi = g.constraint_matrix(aug)
    cond_var = xi[1, 1] - xi[1, 0] ** 2 / xi[0, 0]
    var = fields[:, pi, pj, pk].var()
    assert abs(var - cond_var) < 5.0 * cond_var * np.sqrt(2.0 / nseeds)

    # variance AT a zero-width constraint is exactly zero per realization
    cons0 = [((64.0, 64.0, 64.0), 1.0, 0.0)]
    vals = [
        float(np.asarray(g.generate_constrained_field(s, cons0))[4, 4, 4])
        for s in range(8)
    ]
    np.testing.assert_allclose(vals, 1.0, atol=2e-3)


def test_wiener_zero_noise_is_identity():
    g = _gen(shape=(24, 24, 24))
    d = g.generate_delta_field(1, apply_lightcone=False)
    w = np.asarray(g.wiener_filter(d, 0.0))
    np.testing.assert_allclose(w, np.asarray(d), atol=1e-5 * np.std(w))


def test_wiener_mse_matches_exact_expectation():
    g = _gen(shape=(32, 32, 32))
    truth = np.asarray(g.generate_delta_field(4, apply_lightcone=False))
    noise_std = 0.5 * truth.std()
    rng = np.random.RandomState(0)
    data = truth + rng.normal(scale=noise_std, size=truth.shape)
    noise_power = noise_std**2 * g.grid_spacing**3
    rec = np.asarray(g.wiener_filter(data, noise_power))
    mse = float(np.mean((rec - truth) ** 2))
    pred = g.predicted_posterior_mse(noise_power)
    assert abs(mse - pred) < 0.2 * pred
    # and it actually reconstructs: better than the raw data
    assert mse < float(np.mean((data - truth) ** 2))

    post = np.asarray(g.generate_posterior_field(9, data, noise_power))
    mse_post = float(np.mean((post - truth) ** 2))
    assert abs(mse_post - 2.0 * pred) < 0.4 * pred


def test_posterior_mean_is_wiener():
    g = _gen(shape=(16, 16, 16), spacing=16.0)
    truth = np.asarray(g.generate_delta_field(0, apply_lightcone=False))
    rng = np.random.RandomState(1)
    noise_std = truth.std()
    data = truth + rng.normal(scale=noise_std, size=truth.shape)
    npow = noise_std**2 * g.grid_spacing**3
    rec = np.asarray(g.wiener_filter(data, npow))
    nseeds = 64
    mean_post = np.mean(
        [np.asarray(g.generate_posterior_field(s, data, npow))
         for s in range(nseeds)], axis=0,
    )
    scatter = np.sqrt(g.predicted_posterior_mse(npow) / nseeds)
    assert np.abs(mean_post - rec).max() < 6.0 * scatter


def test_nested_sampler_supported():
    g = _gen(shape=(16, 16, 16), spacing=16.0, sampler="nested")
    d = g.generate_constrained_field(1, CONSTRAINTS[:1])
    np.testing.assert_allclose(
        g.measure_constraints(d, CONSTRAINTS[:1]),
        [CONSTRAINTS[0][1]], atol=2e-3,
    )


def test_mesh_native_constrained_matches_single_device():
    """Slab AND pencil constrained renders equal the single-device one
    (identical Threefry draws; the HR correction is deterministic), and
    the mesh Gram / measurement paths agree with the single-device ones."""
    from randomfield_tpu.parallel.mesh import make_mesh
    from randomfield_tpu.parallel.pencil import make_pencil_mesh

    cons = [((64.0, 64.0, 64.0), 2.0, 20.0), ((100.0, 30.0, 90.0), -0.7, 12.0)]
    g0 = rf.Generator(16, 16, 16, grid_spacing=16.0)
    ref = np.asarray(g0.generate_constrained_field(9, cons))
    xi0 = g0.constraint_matrix(cons)
    mean0 = np.asarray(g0.constrained_mean_field(cons))

    for mesh in (make_mesh(data=2, space=4),
                 make_pencil_mesh(data=2, spx=2, spy=2)):
        gm = rf.Generator(16, 16, 16, grid_spacing=16.0, mesh=mesh)
        xim = gm.constraint_matrix(cons)
        np.testing.assert_allclose(xim, xi0, rtol=2e-4)
        # the draws are identical; the residual is f32 reduction-order
        # noise in Gamma amplified through the xi^{-1} solve (the mesh
        # path reduces via global psum, the single-device path via
        # chunked matmuls), so the parity tolerance is looser than the
        # draw-exact render parity elsewhere
        d = np.asarray(gm.generate_constrained_field(9, cons))
        np.testing.assert_allclose(d, ref, atol=6e-3 * ref.std(), rtol=2e-3)
        got = gm.measure_constraints(d, cons)
        np.testing.assert_allclose(got, [2.0, -0.7], atol=4e-3)
        m = np.asarray(gm.constrained_mean_field(cons))
        np.testing.assert_allclose(m, mean0, atol=1e-3 * np.abs(mean0).max())


def test_mesh_native_wiener_posterior_matches_single_device():
    """Mesh Wiener / posterior / MSE equal the single-device results
    (same forward+filter+inverse math, identical Threefry draws) for
    both scalar and tabulated noise, on slab AND pencil meshes."""
    from randomfield_tpu.parallel.mesh import make_mesh
    from randomfield_tpu.parallel.pencil import make_pencil_mesh

    g0 = rf.Generator(16, 16, 16, grid_spacing=16.0)
    truth = np.asarray(g0.generate_delta_field(4, apply_lightcone=False))
    rng = np.random.RandomState(0)
    noise_std = 0.5 * truth.std()
    data = (truth + rng.normal(scale=noise_std, size=truth.shape)).astype(
        np.float32
    )
    npow = float(noise_std**2 * g0.grid_spacing**3)
    ktab = np.geomspace(g0.k_min / 2.0, g0.k_max * 2.0, 24)
    npow_tab = np.column_stack([ktab, np.full_like(ktab, npow)])

    for noise in (npow, npow_tab):
        rec0 = np.asarray(g0.wiener_filter(data, noise))
        post0 = np.asarray(g0.generate_posterior_field(9, data, noise))
        mse0 = g0.predicted_posterior_mse(noise)
        for mesh in (make_mesh(data=2, space=4),
                     make_pencil_mesh(data=2, spx=2, spy=2)):
            gm = rf.Generator(16, 16, 16, grid_spacing=16.0, mesh=mesh)
            rec = np.asarray(gm.wiener_filter(data, noise))
            np.testing.assert_allclose(
                rec, rec0, atol=2e-4 * rec0.std(), rtol=1e-3
            )
            post = np.asarray(gm.generate_posterior_field(9, data, noise))
            np.testing.assert_allclose(
                post, post0, atol=1e-3 * post0.std(), rtol=1e-3
            )
            mse = gm.predicted_posterior_mse(noise)
            np.testing.assert_allclose(mse, mse0, rtol=1e-4)


def test_unsupported_configurations_raise():
    gp = rf.Generator(16, 16, 16, grid_spacing=8.0, pipeline="staged")
    with pytest.raises(ValueError, match="single-device fused"):
        gp.generate_constrained_field(0, CONSTRAINTS)
    with pytest.raises(ValueError, match="single-device fused"):
        gp.wiener_filter(np.zeros(gp.shape, np.float32), 1.0)


def test_lightcone_weights_applied_after_constraining():
    g = _gen(shape=(16, 16, 16), spacing=16.0)
    d0 = np.asarray(g.generate_constrained_field(3, CONSTRAINTS[:1]))
    d1 = np.asarray(
        g.generate_constrained_field(3, CONSTRAINTS[:1], apply_lightcone=True)
    )
    w = np.asarray(g.growth_function)
    np.testing.assert_allclose(d1, d0 * w[None, None, :], rtol=1e-5,
                               atol=1e-6)
