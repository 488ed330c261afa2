"""FKP survey power-spectrum gates.

Exact identities: lattice randoms in a uniform full box reduce the
estimator to catalog_power bin for bin (shot noise included), the
whole pipeline equals a directly-constructed FKP field pushed through
the shared estimator core, the normalization is exactly invariant
under scalar weight rescaling, and explicit FKP weights equal
pre-multiplied weights.  Statistical: a Poisson-sampled lognormal
catalog against dense Poisson randoms recovers the underlying field's
spectrum.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import randomfield_tpu as rf
from randomfield_tpu.models import lognormal as ln
from randomfield_tpu.models import zeldovich as zl
from randomfield_tpu.validate import fkp
from randomfield_tpu.validate import stats as stats

SHAPE = (16, 16, 16)
SPACING = 8.0
VOLUME = SHAPE[0] * SHAPE[1] * SHAPE[2] * SPACING**3


def _lattice():
    return np.asarray(zl.lagrangian_positions(SHAPE, SPACING)).reshape(3, -1)


def _scatter_points(n, seed):
    rng = np.random.RandomState(seed)
    return rng.uniform(0.0, SHAPE[0] * SPACING, size=(3, n))


@pytest.mark.parametrize("window", ["ngp", "cic", "tsc"])
def test_lattice_randoms_reduce_to_catalog_power(window):
    """Uniform box + cell-center lattice randoms: the FKP field is
    exactly the painted overdensity, so the estimate (shot included,
    deterministic randoms) equals catalog_power bin for bin."""
    data = _scatter_points(3000, seed=1)
    res = fkp.fkp_power(data, _lattice(), SPACING, SHAPE, window=window,
                        randoms_are_poisson=False)
    k_c, p_c, n_c = zl.catalog_power(
        jnp.asarray(data), SPACING, shape=SHAPE, weights=1.0,
        window=window, subtract_shot_noise=True)
    # catalog_power's scalar-weight path subtracts nothing by default;
    # subtract_shot_noise=True uses the counts formula V/sum(w) = V/N,
    # identical to the FKP data term here
    assert np.isclose(res.shot_noise, VOLUME / data.shape[1], rtol=1e-12)
    good = res.n_modes > 0
    assert np.allclose(res.k[good], k_c[good], rtol=1e-6)
    assert np.allclose(res.p[good], p_c[good], rtol=2e-4,
                       atol=1e-6 * VOLUME / data.shape[1])


def test_quadratic_form_parity_with_direct_field():
    """Weighted-lattice catalogs make the estimator a deterministic
    quadratic form: building F = (D - alpha R) * scale by hand and
    pushing it through the shared estimator core must reproduce the
    FKP result exactly."""
    g = rf.Generator(*SHAPE, grid_spacing=SPACING)
    delta = np.asarray(g.generate_delta_field(seed=7), np.float64)
    x = np.arange(SHAPE[0]) / SHAPE[0]
    sel = (0.3 + 0.7 * np.exp(-((x - 0.45) ** 2) / 0.05))[:, None, None]
    w_sel = np.broadcast_to(sel, SHAPE).ravel()
    w_data = w_sel * (2.0 + delta.ravel())          # positive by range
    lattice = _lattice()

    res = fkp.fkp_power(lattice, lattice, SPACING, SHAPE,
                        data_weights=w_data, randoms_weights=w_sel,
                        window="ngp", randoms_are_poisson=False)

    alpha = w_data.sum() / w_sel.sum()
    i22 = alpha * (alpha * w_sel.sum() / VOLUME) * np.sum(w_sel**2)
    assert np.isclose(res.alpha, alpha, rtol=1e-12)
    assert np.isclose(res.i22, i22, rtol=1e-12)
    scale = np.sqrt(VOLUME) / (SPACING**3 * np.sqrt(i22))
    f_direct = ((w_data - alpha * w_sel) * scale).reshape(SHAPE)
    k_d, p_d, n_d = stats.calculate_power(
        jnp.asarray(f_direct, jnp.float32), SPACING, window="ngp")
    good = res.n_modes > 0
    assert np.allclose(res.p[good] + res.shot_noise, p_d[good],
                       rtol=1e-5, atol=1e-8)


def test_weight_rescaling_invariance():
    """With nbar held fixed, the estimator is exactly invariant under
    any scalar rescaling of the weights (the FKP normalization is
    scale-free).  Without explicit nbar the uniform fallback estimates
    nbar FROM the weighted randoms, so the rescaling propagates there
    by design — gate that too."""
    data = _scatter_points(2000, seed=3)
    randoms = _scatter_points(8000, seed=4)
    nb = np.full(randoms.shape[1], 2000.0 / VOLUME)
    a = fkp.fkp_power(data, randoms, SPACING, SHAPE, nbar_randoms=nb)
    b = fkp.fkp_power(data, randoms, SPACING, SHAPE, nbar_randoms=nb,
                      data_weights=7.3, randoms_weights=7.3)
    good = a.n_modes > 0
    assert np.isclose(a.alpha, b.alpha, rtol=1e-12)
    assert np.allclose(a.p[good], b.p[good], rtol=1e-5)
    assert np.isclose(a.shot_noise, b.shot_noise, rtol=1e-10)
    # fallback path: nbar estimated from weighted randoms scales with c,
    # so I22 gains c^3 and the raw spectrum loses exactly one factor c
    c = 7.3
    a0 = fkp.fkp_power(data, randoms, SPACING, SHAPE)
    b0 = fkp.fkp_power(data, randoms, SPACING, SHAPE,
                       data_weights=c, randoms_weights=c)
    assert np.isclose(b0.i22, c**3 * a0.i22, rtol=1e-10)
    assert np.allclose((b0.p[good] + b0.shot_noise) * c,
                       a0.p[good] + a0.shot_noise, rtol=1e-5)


def test_fkp_weights_equal_premultiplied():
    data = _scatter_points(2000, seed=5)
    randoms = _scatter_points(6000, seed=6)
    rng = np.random.RandomState(9)
    nb_d = rng.uniform(1e-4, 5e-4, data.shape[1])
    nb_r = rng.uniform(1e-4, 5e-4, randoms.shape[1])
    p0 = 2e4
    a = fkp.fkp_power(data, randoms, SPACING, SHAPE, nbar_data=nb_d,
                      nbar_randoms=nb_r, p0=p0)
    b = fkp.fkp_power(data, randoms, SPACING, SHAPE,
                      data_weights=fkp.fkp_weights(nb_d, p0),
                      randoms_weights=fkp.fkp_weights(nb_r, p0),
                      nbar_data=nb_d, nbar_randoms=nb_r, p0=0.0)
    good = a.n_modes > 0
    assert np.isclose(a.i22, b.i22, rtol=1e-12)
    assert np.allclose(a.p[good], b.p[good], rtol=1e-6)
    # the weight formula itself
    assert np.allclose(fkp.fkp_weights(nb_d, p0), 1.0 / (1.0 + nb_d * p0))


def test_monopole_of_multipoles_matches_isotropic():
    data = _scatter_points(2500, seed=8)
    randoms = _scatter_points(9000, seed=9)
    iso = fkp.fkp_power(data, randoms, SPACING, SHAPE)
    mp = fkp.fkp_power_multipoles(data, randoms, SPACING, SHAPE,
                                  ells=(0, 2))
    good = iso.n_modes > 0
    assert np.allclose(mp.p[0][good], iso.p[good], rtol=1e-5,
                       atol=1e-6 * iso.shot_noise)
    assert np.isclose(mp.shot_noise, iso.shot_noise, rtol=1e-12)


def test_poisson_lognormal_recovery():
    """FKP of per-cell Poisson counts (data: lognormal intensity;
    randoms: dense uniform Poisson) tracks catalog_power of the same
    counts — the only difference is randoms noise + its shot term."""
    lg = ln.LognormalGenerator(*SHAPE, grid_spacing=SPACING)
    delta = lg.generate_delta_field(seed=11)
    nbar = 2e-3
    counts = np.asarray(zl.poisson_sample(delta, nbar, SPACING, seed=12),
                        np.float64)
    rand_counts = np.asarray(
        zl.poisson_sample(jnp.zeros(SHAPE, jnp.float32), 10 * nbar,
                          SPACING, seed=13), np.float64)
    lattice = _lattice()
    res = fkp.fkp_power(lattice, lattice, SPACING, SHAPE,
                        data_weights=counts.ravel(),
                        randoms_weights=rand_counts.ravel(),
                        data_are_counts=True, randoms_are_counts=True)
    k_c, p_c, n_c = zl.catalog_power(
        jnp.asarray(lattice), SPACING, shape=SHAPE,
        weights=jnp.asarray(counts.ravel(), jnp.float32))
    good = (res.n_modes > 8) & np.isfinite(p_c) & (res.k < np.pi / SPACING)
    # alpha^2 sum(w_r) / i22 randoms shot correctly split out
    assert res.shot_noise > VOLUME / counts.sum()
    p_ref = np.where(np.abs(p_c) > 0, p_c, 1.0)
    rel = np.abs(res.p[good] - p_c[good]) / np.abs(p_ref[good])
    assert np.median(rel) < 0.25


def test_input_validation():
    data = _scatter_points(100, seed=0)
    lattice = _lattice()
    with pytest.raises(ValueError):
        fkp.fkp_power(data[:2], lattice, SPACING, SHAPE)
    with pytest.raises(ValueError):
        fkp.fkp_power(data, lattice, SPACING, SHAPE, window="spline")
    with pytest.raises(ValueError):
        fkp.fkp_power(data, lattice, SPACING, SHAPE, data_weights=0.0)
    with pytest.raises(ValueError):
        fkp.fkp_weights(np.array([-1e-4]), 1e4)
