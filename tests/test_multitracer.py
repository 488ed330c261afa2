"""Correlated multi-tracer fields (models/multitracer.py): exact
cross-spectrum gates, limiting cases, stream identities."""

import numpy as np
import pytest

from randomfield_tpu.models.multitracer import MultiTracerGenerator
from randomfield_tpu.ops import power as rf_power
from randomfield_tpu.validate import stats


def _gen(r, n=32, spacing=8.0, **kw):
    return MultiTracerGenerator(n, n, n, grid_spacing=spacing,
                                correlation=r, **kw)


def test_tracer1_stream_untouched_and_determinism():
    # mixing leaves stream 1 alone: tracer 1 IS g1's plain render
    mt = _gen(0.7, n=16)
    d1, d2 = mt.generate_fields(seed=4, apply_lightcone=False)
    d1b, d2b = mt.generate_fields(seed=4, apply_lightcone=False)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d1b))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d2b))
    plain = mt.g1.generate_delta_field(4, apply_lightcone=False)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(plain))


@pytest.mark.slow
def test_limiting_cases():
    # r = 1: identical unit draws => with equal powers, identical fields
    mt = _gen(1.0, n=16)
    d1, d2 = mt.generate_fields(seed=2, apply_lightcone=False)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), atol=1e-5)
    # r = 0: independent fields — cross-power consistent with zero
    mt0 = _gen(0.0, n=32)
    acc = []
    for s in range(6):
        a, b = mt0.generate_fields(seed=s, apply_lightcone=False)
        k, px, c = stats.calculate_cross_power(
            np.asarray(a), np.asarray(b), 8.0, nbins=8)
        acc.append(px)
    _, p_auto, cnt = mt0.g1.sample_power(0, nbins=8)
    px_mean = np.mean(acc, axis=0)
    good = cnt > 8
    sig = p_auto[good] / np.sqrt(6 * cnt[good])
    assert np.all(np.abs(px_mean[good]) < 6 * sig)


@pytest.mark.slow
def test_cross_power_matches_prediction():
    # intermediate r with DIFFERENT tracer powers: measured cross vs
    # the exact binned expectation r sqrt(P1 P2)
    table = rf_power.load_default_power()
    p2 = rf_power.PowerTable(table.k, 2.25 * table.Pk)  # b = 1.5 tracer
    mt = MultiTracerGenerator(32, 32, 32, grid_spacing=8.0,
                              power1=table, power2=p2, correlation=0.6)
    nseeds, nbins = 8, 8
    acc = []
    for s in range(nseeds):
        a, b = mt.generate_fields(seed=s, apply_lightcone=False)
        k, px, c = stats.calculate_cross_power(
            np.asarray(a), np.asarray(b), 8.0, nbins=nbins)
        acc.append(px)
    px_mean = np.mean(acc, axis=0)
    k_e, p_exp, cnt = mt.predicted_cross_power(nbins=nbins)
    good = cnt > 8
    # cross-estimator noise ~ sqrt((1 + r^2)/2) * sqrt(P1 P2) per mode
    sig = (np.abs(p_exp[good]) / 0.6) * np.sqrt(1.0 / (nseeds * cnt[good]))
    resid = np.abs(px_mean[good] - p_exp[good])
    assert np.all(resid < 5 * sig + 0.05 * np.abs(p_exp[good]))
    # and each tracer's auto-spectrum is its own target
    _, pa, _ = stats.calculate_power(np.asarray(a), 8.0, nbins=nbins)
    _, pb, _ = stats.calculate_power(np.asarray(b), 8.0, nbins=nbins)
    assert 1.5 < np.nanmedian(pb[good] / pa[good]) < 3.5  # ~b^2 = 2.25


def test_tabulated_correlation_and_validation():
    table = rf_power.load_default_power()
    k_r = np.geomspace(1e-4, 500.0, 32)
    r_t = 0.9 * np.exp(-k_r / 1.0)  # decorrelates at small scales
    mt = MultiTracerGenerator(16, 16, 16, grid_spacing=8.0,
                              correlation=(k_r, r_t))
    rg = np.asarray(mt.correlation_grid)
    assert rg.max() <= 0.9 + 1e-6 and rg[0, 0, 0] == 0.0  # DC zeroed
    # larger k -> smaller r on the grid
    from randomfield_tpu.ops import grid as _grid
    import jax.numpy as jnp

    km = np.asarray(_grid.kmag((16, 16, 16), 8.0, jnp.float32))
    assert rg[km > 0.3].mean() < rg[(km > 0) & (km < 0.1)].mean()
    with pytest.raises(ValueError, match="outside"):
        _gen(1.5, n=16)
    with pytest.raises(ValueError, match="<= 1"):
        MultiTracerGenerator(16, 16, 16, grid_spacing=8.0,
                             correlation=(k_r, 1.2 * np.ones_like(k_r)))
