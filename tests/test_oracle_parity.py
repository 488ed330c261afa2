"""Algebraic parity: JAX f32 engine vs float64 numpy oracle, same draws.

This pins every normalization constant in the pipeline (SURVEY.md section
7, hard part #3): both implementations consume identical unit normal
draws, so any convention mismatch shows up as an O(1) discrepancy, far
above f32 rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from randomfield_tpu.engine import generator as gen
from randomfield_tpu.models import cosmology as cosmo
from randomfield_tpu.validate import oracle


def _draws(shape, seed=0):
    nx, ny, nz = shape
    rng = np.random.RandomState(seed)
    return rng.normal(size=(2, nx, ny, nz // 2 + 1)).astype(np.float32)


@pytest.mark.parametrize("shape", [(8, 8, 8), (6, 4, 10), (8, 6, 9)])
@pytest.mark.parametrize("smoothing", [0.0, 3.0])
def test_render_matches_oracle(shape, smoothing):
    spacing = 4.0
    k = np.logspace(-3, 1.5, 300)
    pk = 2e4 * (k / 0.05) ** -2.0
    draws = _draws(shape)

    from randomfield_tpu.ops import power as pw

    sigmas = pw.tabulate_sigmas(shape, spacing, (k, pk))
    weights = jnp.ones(shape[2], jnp.float32)
    got = np.asarray(
        gen.render_from_noise(
            jnp.asarray(draws), sigmas, weights,
            jnp.asarray(smoothing, jnp.float32), shape, spacing,
        )
    )
    want = oracle.render_from_noise(
        draws[0].astype(np.float64), draws[1].astype(np.float64),
        shape, spacing, (k, pk), smoothing_length=smoothing,
    )
    scale = np.std(want)
    assert scale > 0
    np.testing.assert_allclose(got, want, atol=2e-5 * scale + 1e-7, rtol=2e-4)


def test_lightcone_weighting_matches_oracle():
    shape, spacing = (8, 8, 16), 25.0
    k = np.logspace(-4, 1.5, 300)
    pk = 1e4 * np.exp(-((np.log(k / 0.1)) ** 2))
    draws = _draws(shape, seed=3)

    from randomfield_tpu.ops import power as pw

    redshifts = cosmo.get_redshifts("Planck13", shape[2], spacing)
    growth = cosmo.get_growth_function("Planck13", redshifts)

    sigmas = pw.tabulate_sigmas(shape, spacing, (k, pk))
    got = np.asarray(
        gen.render_from_noise(
            jnp.asarray(draws), sigmas, jnp.asarray(growth, jnp.float32),
            jnp.asarray(0.0, jnp.float32), shape, spacing,
        )
    )
    want = oracle.render_from_noise(
        draws[0].astype(np.float64), draws[1].astype(np.float64),
        shape, spacing, (k, pk), plane_weights=growth,
    )
    np.testing.assert_allclose(got, want, atol=3e-5 * np.std(want), rtol=2e-4)


def test_oracle_variance_prediction_is_consistent():
    # the oracle's own ensemble variance converges to predicted_variance
    shape, spacing = (8, 8, 8), 2.0
    k = np.logspace(-3, 1.5, 200)
    pk = np.full_like(k, 300.0)
    pred = oracle.predicted_variance(shape, spacing, (k, pk))
    # white noise: variance = sum_k P/V^2 * ... = P * N^3 / V^2 * V = P/(a^3)
    assert np.isclose(pred, 300.0 / spacing**3 * (1 - 1 / 8**3), rtol=1e-6)
    fields = [oracle.oracle_render(s, shape, spacing, (k, pk)) for s in range(200)]
    var = np.mean([np.var(f) for f in fields])
    assert abs(var - pred) < 0.05 * pred
