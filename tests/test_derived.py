"""Derived-field tests: Poisson potential, Zel'dovich, velocities."""

import jax.numpy as jnp
import numpy as np
import pytest

from randomfield_tpu import Generator
from randomfield_tpu.models.cosmology import Planck13
from randomfield_tpu.ops import derived


def _cosine_field(n, spacing, kidx, amp=0.8, axis=0):
    x = np.arange(n) * spacing
    k0 = 2 * np.pi / (n * spacing) * kidx
    wave = amp * np.cos(k0 * x)
    shape = [1, 1, 1]
    shape[axis] = n
    return (
        jnp.asarray(np.broadcast_to(wave.reshape(shape), (n, n, n)), jnp.float32),
        k0,
    )


def test_potential_single_mode():
    n, spacing, kidx = 32, 4.0, 3
    delta, k0 = _cosine_field(n, spacing, kidx)
    phi = np.asarray(derived.delta_to_potential(delta, spacing, Planck13, z=0.0))
    # grad^2 Phi = C delta with C = 1.5 Om / D_H^2  =>  Phi = -C/k0^2 delta
    pref = 1.5 * Planck13.Om0 / derived.D_H_MPC_H**2
    expected = -pref / k0**2 * np.asarray(delta)
    np.testing.assert_allclose(phi, expected, rtol=1e-4, atol=1e-10)


def test_displacement_single_mode():
    # delta = A cos(k0 x) => psi_x = (A/k0) sin(k0 x), psi_y = psi_z = 0
    n, spacing, kidx = 32, 2.0, 5
    delta, k0 = _cosine_field(n, spacing, kidx)
    psi = np.asarray(derived.delta_to_displacement(delta, spacing))
    x = np.arange(n) * spacing
    # psi_k = +ik/k^2 delta_k => psi_x = -(A/k0) sin(k0 x): flows point
    # toward the overdensity at x = 0
    expected_x = -(0.8 / k0) * np.sin(k0 * x)
    np.testing.assert_allclose(
        psi[0], np.broadcast_to(expected_x[:, None, None], (n, n, n)),
        rtol=1e-4, atol=1e-6,
    )
    assert np.abs(psi[1]).max() < 1e-6 and np.abs(psi[2]).max() < 1e-6
    # divergence closes the loop: delta = -div(psi) (spectral consistency)


def test_divergence_of_displacement_recovers_delta():
    g = Generator(16, 16, 16, grid_spacing=8.0)
    # smooth away Nyquist power: the gradient operator zeroes Nyquist
    # modes by convention, so the identity holds on the band-limited field
    delta = g.generate_delta_field(3, smoothing_length=20.0, apply_lightcone=False)
    psi = derived.delta_to_displacement(delta, 8.0)
    # spectral divergence
    from randomfield_tpu.ops import grid, transform

    shape = (16, 16, 16)
    kx, ky, kz = grid.kvectors(shape, 8.0)
    div_k = 0
    for i, (kv, b) in enumerate([
        (kx, (slice(None), None, None)),
        (ky, (None, slice(None), None)),
        (kz, (None, None, slice(None))),
    ]):
        div_k = div_k + 1j * kv[b] * transform.rfftn(psi[i], norm="forward")
    recovered = np.asarray(transform.irfftn(div_k, shape, norm="forward"))
    # continuity convention: delta = -div(psi)
    np.testing.assert_allclose(
        -recovered, np.asarray(delta), rtol=1e-3,
        atol=1e-4 * np.std(np.asarray(delta)),
    )


def test_growth_rate_limits():
    assert 0.4 < Planck13.growth_rate(0.0) < 0.6  # ~ Om^0.55 ~ 0.52
    assert abs(Planck13.growth_rate(50.0) - 1.0) < 0.02  # matter domination
    approx = Planck13.Om0 ** 0.55
    # Om(z=0)^0.55 approximation good to ~2%
    assert abs(Planck13.growth_rate(0.0) - approx ** 1.0) < 0.05


def test_velocity_magnitude_sane():
    g = Generator(32, 32, 32, grid_spacing=8.0)
    delta = g.generate_delta_field(0, apply_lightcone=False)
    v = np.asarray(derived.delta_to_velocity(delta, 8.0, Planck13, z=0.0))
    rms = np.sqrt((v**2).sum(axis=0).mean())
    # linear-theory pairwise velocities are a few hundred km/s
    assert 50 < rms < 1500, rms

def test_seed_direct_derived_matches_field_first():
    # generate_* (spectrum-side kernels) must equal delta_to_* (field
    # first) for the same seed, on both pipelines
    shape, spacing = (16, 16, 16), 8.0
    for pipeline in ("fused", "staged"):
        g = Generator(*shape, grid_spacing=spacing, pipeline=pipeline)
        d = np.asarray(g.generate_delta_field(5, apply_lightcone=False))
        dj = jnp.asarray(d)

        phi_ref = np.asarray(derived.delta_to_potential(dj, spacing, g.cosmology))
        phi = np.asarray(g.generate_potential(5))
        sc = np.abs(phi_ref).max()
        np.testing.assert_allclose(phi, phi_ref, atol=5e-5 * sc, rtol=2e-4)

        psi_ref = np.asarray(derived.delta_to_displacement(dj, spacing))
        psi = np.asarray(g.generate_displacement(5))
        sc = np.abs(psi_ref).max()
        np.testing.assert_allclose(psi, psi_ref, atol=5e-5 * sc, rtol=2e-4)

        one = np.asarray(g.generate_displacement(5, component=1))
        np.testing.assert_allclose(one, psi[1], atol=1e-7)

        v_ref = np.asarray(derived.delta_to_velocity(dj, spacing, g.cosmology))
        v = np.asarray(g.generate_velocity(5))
        sc = np.abs(v_ref).max()
        np.testing.assert_allclose(v, v_ref, atol=5e-5 * sc, rtol=2e-4)


def test_mesh_derived_matches_single_device():
    # mesh-native derived fields: the elementwise kernel fuses into the
    # sharded render (parallel/render.py:make_sharded_derived) and must
    # reproduce the single-device result on both mesh families
    from randomfield_tpu.parallel.mesh import make_mesh
    from randomfield_tpu.parallel.pencil import make_pencil_mesh

    shape, spacing = (16, 16, 16), 8.0
    g0 = Generator(*shape, grid_spacing=spacing)
    phi0 = np.asarray(g0.generate_potential(5))
    psi0 = np.asarray(g0.generate_displacement(5, component=1))
    v0 = np.asarray(g0.generate_velocity(5, component=0))
    for mesh in (make_mesh(2, 4), make_pencil_mesh(2, 2, 2)):
        g = Generator(*shape, grid_spacing=spacing, mesh=mesh)
        phi = np.asarray(g.generate_potential(5))
        np.testing.assert_allclose(
            phi, phi0, atol=1e-5 * np.abs(phi0).max(), rtol=2e-4
        )
        psi = np.asarray(g.generate_displacement(5, component=1))
        np.testing.assert_allclose(
            psi, psi0, atol=1e-5 * np.abs(psi0).max(), rtol=2e-4
        )
        v = np.asarray(g.generate_velocity(5, component=0))
        np.testing.assert_allclose(
            v, v0, atol=1e-5 * np.abs(v0).max(), rtol=2e-4
        )


def test_mesh_derived_smoothing_matches():
    from randomfield_tpu.parallel.mesh import make_mesh

    shape, spacing = (16, 16, 16), 8.0
    g0 = Generator(*shape, grid_spacing=spacing)
    g1 = Generator(*shape, grid_spacing=spacing, mesh=make_mesh(1, 4))
    a = np.asarray(g0.generate_potential(2, smoothing_length=12.0))
    b = np.asarray(g1.generate_potential(2, smoothing_length=12.0))
    np.testing.assert_allclose(b, a, atol=1e-5 * np.abs(a).max(), rtol=2e-4)


def test_predicted_derived_power_matches_measured():
    # measured auto-spectra of potential / displacement / velocity renders
    # match their exact per-bin expectations (same modes, kernels, bins)
    import numpy as np
    from randomfield_tpu import Generator
    from randomfield_tpu.validate import stats

    n, spacing, nseeds, nbins = 32, 8.0, 6, 8
    g = Generator(n, n, n, grid_spacing=spacing)
    cases = [
        ("potential", lambda s: g.generate_potential(seed=s)),
        ("displacement", lambda s: g.generate_displacement(
            seed=s, component=2)),
        ("velocity", lambda s: g.generate_velocity(seed=s, z=0.5,
                                                   component=2)),
    ]
    for kind, make in cases:
        k_pred, p_pred, cnt = g.predicted_derived_power(
            kind, component=2, z=0.5 if kind == "velocity" else 0.0,
            nbins=nbins)
        acc = []
        for s in range(nseeds):
            k, p, c = stats.calculate_power(make(s), spacing, nbins=nbins)
            acc.append(p)
        p_mean = np.mean(acc, axis=0)
        p_sd = np.std(acc, axis=0, ddof=1) / np.sqrt(nseeds)
        m = cnt > 4
        resid = np.abs(p_mean - p_pred)[m]
        budget = 5.0 * p_sd[m] + 5e-3 * np.abs(p_pred[m])
        assert (resid < budget).all(), (kind, (resid / budget).max())
    # delta kind reproduces the engine's own spectrum expectation
    k_pred, p_pred, cnt = g.predicted_derived_power("delta", nbins=nbins)
    ks, ps, ns = g.sample_power(0, nbins=nbins)
    m = (cnt > 4) & (ns > 0)
    # sample_power is one draw; its seed-scatter is ~sqrt(2/n) per bin
    resid = np.abs(ps[m] / p_pred[m] - 1.0)
    assert (resid < 6.0 * np.sqrt(2.0 / ns[m])).all()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="kind"):
        g.predicted_derived_power("curl")
