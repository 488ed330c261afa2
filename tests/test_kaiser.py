"""Kaiser redshift-space fields: oracle parity + exact multipole gates.

The render applies (b + f mu^2) per mode in the sampled spectrum
(ops/derived.py:apply_kernel_inline kind='kaiser'); these tests pin it
against a field-level oracle (forward transform of the SAME seed's
density render, explicit kernel, inverse transform) and against the
exactly binned multipole expectations (generator.py:
predicted_kaiser_multipoles), on single devices and both mesh families.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from randomfield_tpu import Generator
from randomfield_tpu.ops import grid, transform
from randomfield_tpu.validate import stats


def _kaiser_oracle(delta, spacing, b, f, los_axis):
    """(b + f mu^2) applied field-side with the engine's conventions."""
    shape = tuple(int(s) for s in delta.shape)
    c = transform.rfftn(jnp.asarray(delta), norm="forward")
    kx, ky, kz = grid.kvectors(shape, spacing)
    k2 = (
        (kx * kx)[:, None, None]
        + (ky * ky)[None, :, None]
        + (kz * kz)[None, None, :]
    )
    inv = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
    kvec = (kx, ky, kz)[los_axis]
    bcast = [None, None, None]
    bcast[los_axis] = slice(None)
    mu2 = (kvec * kvec)[tuple(bcast)] * inv
    out = transform.irfftn(c * (b + f * mu2), shape, norm="forward")
    return np.asarray(out)


@pytest.mark.parametrize("los_axis", [0, 1, 2])
def test_kaiser_matches_field_oracle(los_axis):
    g = Generator(16, 16, 16, grid_spacing=8.0)
    delta = g.generate_delta_field(7, apply_lightcone=False)
    for b, f in [(1.0, 0.53), (1.7, 0.8)]:
        want = _kaiser_oracle(delta, 8.0, b, f, los_axis)
        got = np.asarray(
            g.generate_kaiser_field(7, bias=b, f=f, los_axis=los_axis)
        )
        np.testing.assert_allclose(
            got, want, atol=2e-5 * np.abs(want).max(), rtol=2e-4
        )


def test_kaiser_staged_pipeline_matches_its_own_oracle():
    # the staged (xzy-layout) kernel path, pinned against the SAME
    # pipeline's density render (cross-pipeline seeds differ by design)
    g = Generator(16, 16, 16, grid_spacing=8.0, pipeline="staged")
    delta = g.generate_delta_field(3, apply_lightcone=False)
    want = _kaiser_oracle(delta, 8.0, 1.4, 0.6, 2)
    got = np.asarray(g.generate_kaiser_field(3, bias=1.4, f=0.6))
    np.testing.assert_allclose(
        got, want, atol=2e-5 * np.abs(want).max(), rtol=2e-4
    )


def test_kaiser_default_growth_rate_and_bias_validation():
    g = Generator(16, 16, 16, grid_spacing=8.0)
    a = np.asarray(g.generate_kaiser_field(1, z=0.5))
    b = np.asarray(
        g.generate_kaiser_field(1, f=g.cosmology.growth_rate(0.5))
    )
    np.testing.assert_allclose(a, b, atol=1e-7)
    with pytest.raises(ValueError, match="bias"):
        g.generate_kaiser_field(1, bias=0.0)
    with pytest.raises(ValueError, match="bias"):
        g.predicted_kaiser_multipoles(bias=0.0)


def test_kaiser_f_zero_bias_one_is_plain_snapshot():
    g = Generator(16, 16, 16, grid_spacing=8.0)
    delta = np.asarray(g.generate_delta_field(5, apply_lightcone=False))
    rs = np.asarray(g.generate_kaiser_field(5, f=0.0))
    np.testing.assert_allclose(
        rs, delta, atol=2e-5 * np.abs(delta).max(), rtol=2e-4
    )


def test_mesh_kaiser_matches_single_device():
    from randomfield_tpu.parallel.mesh import make_mesh
    from randomfield_tpu.parallel.pencil import make_pencil_mesh

    shape, spacing = (16, 16, 16), 8.0
    g0 = Generator(*shape, grid_spacing=spacing)
    want = np.asarray(g0.generate_kaiser_field(5, bias=1.3, f=0.5))
    for mesh in (make_mesh(2, 4), make_pencil_mesh(2, 2, 2)):
        g = Generator(*shape, grid_spacing=spacing, mesh=mesh)
        got = np.asarray(g.generate_kaiser_field(5, bias=1.3, f=0.5))
        np.testing.assert_allclose(
            got, want, atol=1e-5 * np.abs(want).max(), rtol=2e-4
        )


def test_kaiser_multipoles_match_exact_expectation():
    # measured P_0/P_2/P_4 of Kaiser renders vs the exactly binned
    # expectation: residuals are pure sample noise (same modes, same
    # Legendre weights, same bins)
    n, spacing, nseeds, nbins = 32, 8.0, 8, 8
    b, f = 1.3, 0.8
    g = Generator(n, n, n, grid_spacing=spacing)
    k_pred, p_pred, cnt = g.predicted_kaiser_multipoles(
        bias=b, f=f, nbins=nbins
    )
    acc = []
    for s in range(nseeds):
        rs = g.generate_kaiser_field(s, bias=b, f=f)
        k, p_ell, c = stats.calculate_power_multipoles(
            rs, spacing, nbins=nbins
        )
        acc.append(p_ell)
    p_mean = np.mean(acc, axis=0)
    p_sd = np.std(acc, axis=0, ddof=1) / np.sqrt(nseeds)
    m = cnt > 4
    # the monopole sets the noise scale of every multipole (they share
    # the same |c_k|^2 draws, only the Legendre weights differ)
    scale = np.abs(p_pred[0])
    for i in range(p_pred.shape[0]):
        resid = np.abs(p_mean[i] - p_pred[i])[m]
        budget = (5.0 * p_sd[i] + 5e-3 * scale)[m]
        assert (resid < budget).all(), (i, (resid / budget).max())
    # Kaiser boost sanity: the binned monopole boost over the pure-bias
    # expectation brackets between 1 and the maximal (b+f)^2/b^2, and
    # populous sub-Nyquist shells sit near the continuum value
    # (b^2 + 2bf/3 + f^2/5)/b^2 (small discrete-mu^2 deviations allowed)
    _, p_iso, _ = g.predicted_kaiser_multipoles(bias=b, f=0.0, nbins=nbins)
    ratio = (p_pred[0] / p_iso[0])[m]
    boost = (b * b + 2 * b * f / 3.0 + f * f / 5.0) / (b * b)
    assert (ratio > 1.0).all() and (ratio < (b + f) ** 2 / b**2).all()
    rich = m & (cnt > 200) & (k_pred < np.pi / spacing)
    assert np.allclose((p_pred[0] / p_iso[0])[rich], boost, rtol=2e-2)


def test_kaiser_smoothing_matches_prediction_chain():
    # smoothing flows through both the render and the expectation
    n, spacing, nbins = 32, 8.0, 8
    g = Generator(n, n, n, grid_spacing=spacing)
    sl = 16.0
    k_pred, p_pred, cnt = g.predicted_kaiser_multipoles(
        f=0.6, nbins=nbins, smoothing_length=sl, ells=(0,)
    )
    acc = []
    for s in range(6):
        rs = g.generate_kaiser_field(s, f=0.6, smoothing_length=sl)
        _, p_ell, _ = stats.calculate_power_multipoles(
            rs, spacing, nbins=nbins, ells=(0,)
        )
        acc.append(p_ell[0])
    p_mean = np.mean(acc, axis=0)
    p_sd = np.std(acc, axis=0, ddof=1) / np.sqrt(len(acc))
    # heavy smoothing drives the tail bins 20+ decades down — below the
    # f32 render's roundoff floor; gate only bins within f32 dynamic range
    m = (cnt > 4) & (p_pred[0] > 1e-7 * p_pred[0].max())
    resid = np.abs(p_mean - p_pred[0])[m]
    budget = (5.0 * p_sd + 5e-3 * np.abs(p_pred[0]))[m]
    assert m.sum() >= 4 and (resid < budget).all()
