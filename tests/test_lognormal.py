"""Lognormal field generation: transform accuracy + statistical gates."""

import numpy as np
import jax.numpy as jnp
import pytest

from randomfield_tpu.models.lognormal import (
    LognormalGenerator,
    gaussian_to_lognormal,
    transformed_power,
)
from randomfield_tpu.ops import power as rf_power
from randomfield_tpu.validate import stats


def _target(amp_scale=1.0):
    table = rf_power.load_default_power()
    return rf_power.PowerTable(table.k, table.Pk * amp_scale)


def test_transformed_power_small_amplitude_limit():
    # xi << 1  =>  log1p(xi) ~ xi  =>  P_G ~ P
    n, spacing = 32, 8.0
    table = _target(1e-3)
    pg, info = transformed_power(table, (n, n, n), spacing)
    k = np.logspace(np.log10(pg.k[1] * 1.01), np.log10(pg.k[-2] * 0.99), 40)
    p_target = np.interp(np.log10(k), np.log10(table.k), table.Pk)
    p_gauss = np.interp(np.log10(k), np.log10(pg.k), pg.Pk)
    np.testing.assert_allclose(p_gauss, p_target, rtol=0.05)
    assert info["clipped_fraction"] < 1e-6
    assert info["sigma_g2"] == pytest.approx(
        np.log1p(info["sigma2"]), rel=1e-6
    )


def test_transform_rejects_unrepresentable():
    # a huge single-scale spectrum drives xi below -1 somewhere
    k = np.logspace(-4, 2, 800)
    pk = 5e7 * np.exp(-((np.log(k / 0.05)) ** 2) * 8)
    with pytest.raises(ValueError, match="lognormal"):
        transformed_power((k, pk), (32, 32, 32), 8.0)


def test_exp_map_moments():
    rng = np.random.RandomState(2)
    sigma2 = 0.49
    g = rng.normal(scale=np.sqrt(sigma2), size=(48, 48, 48)).astype(np.float32)
    d = np.asarray(gaussian_to_lognormal(jnp.asarray(g), sigma2))
    assert d.min() > -1.0
    assert abs(d.mean()) < 5e-3
    np.testing.assert_allclose(d.var(), np.expm1(sigma2), rtol=0.02)
    # log1p(d) is Gaussian: skewness ~ 0 while the field itself is skewed
    x = np.log1p(d.astype(np.float64)).ravel()
    skew_log = np.mean((x - x.mean()) ** 3) / x.std() ** 3
    y = d.astype(np.float64).ravel()
    skew_field = np.mean((y - y.mean()) ** 3) / y.std() ** 3
    assert abs(skew_log) < 0.02
    assert skew_field > 3 * sigma2**0.5 * 0.5  # LN skewness ~ 3 sigma + sigma^3


def test_lognormal_field_statistics():
    n, spacing, nseeds = 32, 8.0, 6
    gen = LognormalGenerator(n, n, n, grid_spacing=spacing)
    fields = [
        np.asarray(gen.generate_delta_field(s, apply_lightcone=False))
        for s in range(nseeds)
    ]
    allv = np.stack(fields)
    assert allv.min() > -1.0
    assert abs(allv.mean()) < 4 * np.sqrt(gen.predicted_variance() / allv.size)
    np.testing.assert_allclose(
        allv.var(), gen.predicted_variance(), rtol=0.12
    )


def test_lognormal_power_matches_target():
    n, spacing, nseeds, nbins = 32, 8.0, 8, 10
    gen = LognormalGenerator(n, n, n, grid_spacing=spacing)
    acc = []
    for s in range(nseeds):
        d = gen.generate_delta_field(s, apply_lightcone=False)
        k, p, cnt = stats.calculate_power(d, spacing, nbins=nbins)
        acc.append(p)
    p_mean = np.mean(acc, axis=0)
    p_sd = np.std(acc, axis=0, ddof=1) / np.sqrt(nseeds)
    # expectation of the estimator for the TARGET spectrum
    kk, p_pred, cnt = stats.calculate_power(
        np.zeros((n, n, n), np.float32), spacing, nbins=nbins
    )  # just for k/cnt layout
    mask = cnt > 4
    p_target = np.interp(np.log10(k[mask]), np.log10(gen.power.k),
                         gen.power.Pk)
    resid = np.abs(p_mean[mask] - p_target)
    # 5 sigma + 6% systematic allowance (shell-binned table + exp-map
    # second-order corrections at this amplitude)
    budget = 5.0 * p_sd[mask] + 0.06 * p_target
    assert (resid < budget).all(), (resid / budget).max()


def test_lognormal_lightcone_per_plane():
    n, spacing = 24, 10.0
    gen = LognormalGenerator(n, n, n, grid_spacing=spacing)
    d = np.asarray(gen.generate_delta_fields(np.arange(8)))
    w = np.asarray(gen.growth_function)
    var_planes = d.var(axis=(0, 1, 2))
    pred = np.expm1(w**2 * gen.sigma_g2)
    # per-plane sample noise at 8 seeds x 24^2 cells is ~a few %
    np.testing.assert_allclose(var_planes, pred, rtol=0.25)
    mean_planes = d.mean(axis=(0, 1, 2))
    assert np.abs(mean_planes).max() < 6 * np.sqrt(pred.max() / (8 * n * n))


def test_lognormal_on_mesh():
    import jax
    from randomfield_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=1, space=4)
    n, spacing = 16, 16.0
    gen = LognormalGenerator(n, n, n, grid_spacing=spacing, mesh=mesh)
    ref = LognormalGenerator(n, n, n, grid_spacing=spacing)
    d_mesh = gen.generate_delta_field(5, apply_lightcone=False)
    d_ref = ref.generate_delta_field(5, apply_lightcone=False)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(d_mesh)), np.asarray(d_ref),
        rtol=2e-4, atol=2e-5,
    )


def test_biased_field_bias_one_is_delta_field():
    n, spacing = 24, 8.0
    gen = LognormalGenerator(n, n, n, grid_spacing=spacing)
    d = np.asarray(gen.generate_delta_field(3, apply_lightcone=False))
    b = np.asarray(gen.generate_biased_field(3, bias=1.0,
                                             apply_lightcone=False))
    np.testing.assert_allclose(b, d, rtol=1e-6, atol=1e-7)


def test_biased_field_statistics_and_power():
    # auto-spectrum of a b=2 tracer matches its exact per-bin expectation
    # (exp(b^2 xi_G) - 1 transform on the same modes/bins); at low k the
    # tracer/matter prediction ratio approaches b^2
    n, spacing, b, nseeds, nbins = 32, 8.0, 2.0, 8, 10
    gen = LognormalGenerator(n, n, n, grid_spacing=spacing,
                             power=_target(0.25))
    acc, means = [], []
    for s in range(nseeds):
        d = gen.generate_biased_field(s, bias=b, apply_lightcone=False)
        d = np.asarray(d)
        assert d.min() > -1.0
        means.append(d.mean())
        k, p, cnt = stats.calculate_power(d, spacing, nbins=nbins)
        acc.append(p)
    k_pred, p_pred, cnt = gen.predicted_biased_power(bias=b, nbins=nbins)
    p_mean = np.mean(acc, axis=0)
    p_sd = np.std(acc, axis=0, ddof=1) / np.sqrt(nseeds)
    mask = cnt > 4
    np.testing.assert_allclose(k[mask], k_pred[mask], rtol=1e-5)
    resid = np.abs(p_mean - p_pred)[mask]
    budget = 5.0 * p_sd[mask] + 0.02 * p_pred[mask]
    assert (resid < budget).all(), (resid / budget).max()
    # exactly mean-zero construction: the seed-averaged field mean is
    # noise-level (dominated by the largest modes, ~sqrt(P_min_k / V))
    vol = (n * spacing) ** 3
    assert abs(np.mean(means)) < 6 * np.sqrt(p_pred[mask][0] / vol / nseeds)
    # low-k ratio of predictions ~ b^2 (linear bias recovered)
    _, p_m, _ = gen.predicted_biased_power(bias=1.0, nbins=nbins)
    lowk = mask & (k_pred < 0.06)
    assert lowk.sum() >= 2
    ratio = p_pred[lowk] / p_m[lowk]
    np.testing.assert_allclose(ratio, b * b, rtol=0.25)


def test_biased_cross_power_matches_prediction():
    # tracer x matter cross-spectrum of the SAME seed matches the exact
    # exp(b xi_G) - 1 expectation; cross of different seeds ~ 0
    n, spacing, b, nseeds, nbins = 32, 8.0, 1.8, 8, 10
    gen = LognormalGenerator(n, n, n, grid_spacing=spacing,
                             power=_target(0.25))
    acc = []
    for s in range(nseeds):
        dm = gen.generate_delta_field(s, apply_lightcone=False)
        dt = gen.generate_biased_field(s, bias=b, apply_lightcone=False)
        k, p, cnt = stats.calculate_cross_power(dm, dt, spacing, nbins=nbins)
        acc.append(p)
    k_pred, p_pred, cnt = gen.predicted_biased_power(bias=b, bias2=1.0,
                                                     nbins=nbins)
    p_mean = np.mean(acc, axis=0)
    p_sd = np.std(acc, axis=0, ddof=1) / np.sqrt(nseeds)
    mask = cnt > 4
    resid = np.abs(p_mean - p_pred)[mask]
    budget = 5.0 * p_sd[mask] + 0.02 * p_pred[mask]
    assert (resid < budget).all(), (resid / budget).max()
    # independent seeds decorrelate: |cross| under 5 sigma of its scatter
    da = gen.generate_delta_field(101, apply_lightcone=False)
    db = gen.generate_biased_field(202, bias=b, apply_lightcone=False)
    _, p0, cnt0 = stats.calculate_cross_power(da, db, spacing, nbins=nbins)
    m = cnt0 > 8
    # per-bin scatter of a zero-expectation cross: sqrt(P_a P_b / n_modes)
    p_auto_m = gen.predicted_biased_power(1.0, nbins=nbins)[1]
    p_auto_t = gen.predicted_biased_power(b, nbins=nbins)[1]
    scatter = np.sqrt(p_auto_m[m] * p_auto_t[m] / cnt0[m])
    assert (np.abs(p0[m]) < 6 * scatter).all()


def test_cross_power_self_consistency():
    n, spacing, nbins = 24, 8.0, 8
    gen = LognormalGenerator(n, n, n, grid_spacing=spacing)
    d = gen.generate_delta_field(7, apply_lightcone=False)
    k1, p1, c1 = stats.calculate_power(d, spacing, nbins=nbins)
    k2, p2, c2 = stats.calculate_cross_power(d, d, spacing, nbins=nbins)
    np.testing.assert_allclose(p2, p1, rtol=2e-5, atol=0)
    np.testing.assert_allclose(c2, c1, rtol=1e-6)
    with pytest.raises(ValueError, match="share a grid"):
        stats.calculate_cross_power(
            np.zeros((8, 8, 8), np.float32),
            np.zeros((8, 8, 4), np.float32), 1.0)


def test_biased_field_on_mesh():
    import jax
    from randomfield_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=2, space=4)
    n, spacing, b = 16, 8.0, 1.6
    gm = LognormalGenerator(n, n, n, grid_spacing=spacing, mesh=mesh)
    gs = LognormalGenerator(n, n, n, grid_spacing=spacing)
    bm = np.asarray(jax.device_get(
        gm.generate_biased_field(3, bias=b, apply_lightcone=False)))
    bs = np.asarray(gs.generate_biased_field(3, bias=b,
                                             apply_lightcone=False))
    np.testing.assert_allclose(bm, bs, atol=3e-4, rtol=2e-4)
