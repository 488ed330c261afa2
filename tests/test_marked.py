"""Marked power spectrum: estimator + exact Wick gate for linear marks.

Gates:
* smoothing: `smooth_field` is the exact spectrum multiply (single
  cosine stays a cosine, scaled by W(k0));
* `p = 0` / `eps = 0` identities: the marked spectrum IS the plain
  spectrum, bit for bit through the same binning;
* the exact Wick expectation `predicted_linear_marked_power` against
  measured linear-marked renders (residual = pure sample noise);
* the eps^2 mark term is actually visible (prediction differs from the
  unmarked one by much more than the gate budget);
* White mark vs its linearization: deterministic Taylor agreement at
  small smoothed amplitude.
"""

import numpy as np
import jax.numpy as jnp

from randomfield_tpu import Generator
from randomfield_tpu.validate import marked, stats


def test_smooth_field_single_cosine():
    n, spacing, amp, m, R = 32, 2.0, 0.8, 3, 6.0
    x = np.arange(n) * spacing
    k0 = 2 * np.pi / (n * spacing) * m
    delta = np.broadcast_to(amp * np.cos(k0 * x)[:, None, None], (n, n, n))
    sm = np.asarray(
        marked.smooth_field(jnp.asarray(delta, jnp.float32), spacing, R)
    )
    expected = amp * np.exp(-0.5 * (k0 * R) ** 2) * np.cos(k0 * x)
    np.testing.assert_allclose(
        sm, np.broadcast_to(expected[:, None, None], (n, n, n)),
        rtol=1e-4, atol=1e-6,
    )


def test_constant_mark_identity():
    n, spacing = 24, 4.0
    g = Generator(n, n, n, grid_spacing=spacing)
    delta = g.generate_delta_field(7, apply_lightcone=False)
    k0, p0, c0 = stats.calculate_power(delta, spacing, nbins=10)
    k1, p1, c1 = marked.calculate_marked_power(
        delta, spacing, nbins=10, p=0.0
    )
    np.testing.assert_array_equal(p0, p1)
    k2, p2, _ = stats.calculate_power(
        marked.linear_marked_field(delta, spacing, eps=0.0), spacing,
        nbins=10,
    )
    np.testing.assert_allclose(p2, p0, rtol=1e-6)


def test_predicted_linear_marked_eps0_is_plain_binning():
    n, spacing, nbins = 32, 4.0, 12
    g = Generator(n, n, n, grid_spacing=spacing)
    k_a, p_a, c_a = marked.predicted_linear_marked_power(
        g.power, (n, n, n), spacing, eps=0.0, R=8.0, nbins=nbins
    )
    from randomfield_tpu.ops import grid as rf_grid
    from randomfield_tpu.ops.power import interpolate_power

    kmag = rf_grid.kmag((n, n, n), spacing, jnp.float32)
    pgrid = jnp.where(kmag > 0, interpolate_power(g.power, kmag), 0.0)
    k_b, p_b, c_b = stats.bin_power_grid(pgrid, (n, n, n), spacing, nbins)
    np.testing.assert_allclose(p_a, p_b, rtol=1e-5)


def test_measured_linear_marked_matches_wick_prediction():
    n, spacing, nbins, nseeds = 32, 4.0, 10, 8
    eps, R = 0.6, 8.0
    g = Generator(n, n, n, grid_spacing=spacing)
    k_pred, p_pred, cnt = marked.predicted_linear_marked_power(
        g.power, (n, n, n), spacing, eps=eps, R=R, nbins=nbins
    )
    _, p_plain, _ = marked.predicted_linear_marked_power(
        g.power, (n, n, n), spacing, eps=0.0, R=R, nbins=nbins
    )
    acc = []
    for s in range(nseeds):
        delta = g.generate_delta_field(s, apply_lightcone=False)
        gfield = marked.linear_marked_field(delta, spacing, eps=eps, R=R)
        _, p_hat, _ = stats.calculate_power(gfield, spacing, nbins=nbins)
        acc.append(p_hat)
    p_mean = np.mean(acc, axis=0)
    p_sd = np.std(acc, axis=0, ddof=1) / np.sqrt(nseeds)
    mask = cnt > 0
    resid = np.abs(p_mean - p_pred)[mask]
    budget = 5.0 * p_sd[mask] + 1e-4 * np.nanmax(np.abs(p_pred))
    assert (resid < budget).all(), (resid / budget).max()
    # the eps^2 term must be visible: the marked prediction deviates
    # from the unmarked one by >= 5% somewhere (deterministic check —
    # both are exact expectations, no sample noise involved)
    shift = (np.abs(p_pred - p_plain) / np.abs(p_plain))[mask]
    assert shift.max() > 0.05, shift.max()


def test_white_mark_taylor_matches_linearization():
    # m_white = ((1+ds)/(1+ds+dr))^p = 1 - p dr/(1+ds) + O(dr^2): on a
    # low-amplitude field the White-marked field equals the linear one
    # with eps = -p/(1+ds) up to the quadratic remainder
    n, spacing, R, p, ds = 24, 4.0, 12.0, 2.0, 0.25
    g = Generator(n, n, n, grid_spacing=spacing)
    delta = 0.05 * np.asarray(
        g.generate_delta_field(3, apply_lightcone=False)
    )
    delta_j = jnp.asarray(delta, jnp.float32)
    dr = np.asarray(marked.smooth_field(delta_j, spacing, R))
    gw = np.asarray(
        marked.white_mark(jnp.asarray(dr), p=p, delta_s=ds) * delta_j
    )
    gl = np.asarray(
        marked.linear_marked_field(
            delta_j, spacing, eps=-p / (1.0 + ds), R=R
        )
    )
    # remainder bound: |m_white - m_lin| <= p(p+1)/2 (dr/(1+ds))^2 * C
    rem = np.abs(gw - gl)
    bound = (
        np.abs(delta) * (p * (p + 1) / 2) * (np.abs(dr) / (1.0 + ds)) ** 2
    )
    assert (rem <= 2.0 * bound + 1e-6).all()
    # and the linear term itself is much larger than the remainder
    assert np.abs(gw - delta).max() > 10 * rem.max()


def test_white_marked_power_runs_and_differs():
    n, spacing = 32, 4.0
    g = Generator(n, n, n, grid_spacing=spacing)
    delta = g.generate_delta_field(5, apply_lightcone=False)
    k, pm, cnt = marked.calculate_marked_power(
        delta, spacing, nbins=10, R=10.0, p=2.0, delta_s=0.25
    )
    _, pp, _ = stats.calculate_power(delta, spacing, nbins=10)
    m = cnt > 0
    assert np.isfinite(pm[m]).all()
    assert np.abs(pm[m] - pp[m]).max() > 0  # the mark does something
    # custom callable mark: identity mark reproduces plain P(k)
    k2, pc, _ = marked.calculate_marked_power(
        delta, spacing, nbins=10, mark=lambda dr: jnp.ones_like(dr)
    )
    np.testing.assert_array_equal(pc, pp)


def test_mesh_marked_power_matches_single_device():
    """Distributed marked P(k) (slab + pencil smoothing + estimator)
    equals the single-device one."""
    from randomfield_tpu.parallel.mesh import make_mesh
    from randomfield_tpu.parallel.pencil import make_pencil_mesh

    shape, spacing = (16, 16, 16), 4.0
    g = Generator(*shape, grid_spacing=spacing)
    delta = g.generate_delta_field(seed=4, apply_lightcone=False)
    k0, p0, n0 = marked.calculate_marked_power(delta, spacing, nbins=8)
    for mesh in (make_mesh(data=1, space=4),
                 make_pencil_mesh(data=1, spx=2, spy=2)):
        k1, p1, n1 = marked.calculate_marked_power(
            delta, spacing, nbins=8, mesh=mesh
        )
        np.testing.assert_allclose(n1, n0, rtol=1e-6)
        m = n0 > 0
        np.testing.assert_allclose(k1[m], k0[m], rtol=1e-5)
        np.testing.assert_allclose(p1[m], p0[m], rtol=1e-3)
