"""Direct unit tests of the statistics estimators."""

import jax.numpy as jnp
import numpy as np

from randomfield_tpu.validate import stats


def test_calculate_power_single_cosine():
    # delta = A cos(k0 x): c(k0) = A V/2 => per-mode P = |c|^2/V = A^2 V/4,
    # two modes (k0, -k0) fall in one bin with multiplicity handling
    n, spacing, amp = 32, 2.0, 0.7
    x = np.arange(n) * spacing
    k0 = 2 * np.pi / (n * spacing) * 5
    delta = np.broadcast_to(amp * np.cos(k0 * x)[:, None, None], (n, n, n))
    k, p, m = stats.calculate_power(jnp.asarray(delta, jnp.float32), spacing, nbins=16)
    volume = n**3 * spacing**3
    i = np.nanargmax(np.nan_to_num(p))
    assert abs(k[i] - k0) / k0 < 0.2
    # bin-average power: 2 modes carry A^2 V^2/4 / V each, spread over the
    # bin's mode count
    expected_sum = 2 * (amp * volume / 2) ** 2 / volume
    np.testing.assert_allclose(p[i] * m[i], expected_sum, rtol=1e-3)


def test_field_moments_accumulation_safe():
    rng = np.random.RandomState(0)
    x = rng.normal(loc=0.3, scale=2.0, size=(64, 64, 64)).astype(np.float32)
    mean, var = stats.field_moments(jnp.asarray(x))
    assert abs(mean - x.astype(np.float64).mean()) < 1e-5
    assert abs(var - x.astype(np.float64).var()) / x.var() < 1e-4


def test_field_moments_batched_scalar():
    x = jnp.zeros((8, 8, 8)) + 1.5
    mean, var = stats.field_moments(x)
    assert mean == 1.5 and var == 0.0


def test_spectrum_power_matches_field_power():
    from randomfield_tpu import Generator

    g = Generator(32, 32, 32, grid_spacing=4.0)
    seed = 7
    k0, p0, n0 = g.sample_power(seed, nbins=10)
    delta = g.generate_delta_field(seed, apply_lightcone=False)
    k1, p1, n1 = g.calculate_power(delta, nbins=10)
    np.testing.assert_allclose(n0, n1, rtol=1e-6)
    mask = n0 > 0
    np.testing.assert_allclose(p0[mask], p1[mask], rtol=1e-3)
    np.testing.assert_allclose(k0[mask], k1[mask], rtol=1e-4)


def test_spectrum_power_staged_pipeline():
    from randomfield_tpu import Generator

    g = Generator(16, 16, 16, grid_spacing=8.0, pipeline="staged")
    k0, p0, n0 = g.sample_power(3, nbins=8)
    delta = g.generate_delta_field(3, apply_lightcone=False)
    k1, p1, n1 = stats.calculate_power(delta, 8.0, nbins=8)
    mask = n0 > 0
    np.testing.assert_allclose(p0[mask], p1[mask], rtol=1e-3)


def test_spectrum_power_with_smoothing():
    from randomfield_tpu import Generator

    g = Generator(16, 16, 16, grid_spacing=8.0)
    k0, p_raw, _ = g.sample_power(0, nbins=6)
    _, p_sm, _ = g.sample_power(0, smoothing_length=16.0, nbins=6)
    mask = np.isfinite(p_raw) & (p_raw > 0)
    assert np.all(p_sm[mask] <= p_raw[mask] * 1.0001)


def test_staged_field_power_matches_oneshot():
    from randomfield_tpu import Generator

    g = Generator(32, 32, 32, grid_spacing=4.0)
    delta = g.generate_delta_field(5, apply_lightcone=False)
    k0, p0, n0 = stats.calculate_power(delta, 4.0, nbins=9)
    c1, ps1, ks1 = stats._staged_field_power(delta, (32, 32, 32), 4.0, 9, 4)
    import numpy as np

    n1 = np.asarray(c1, np.float64)
    p1 = np.asarray(ps1, np.float64) / n1
    k1 = np.asarray(ks1, np.float64) / n1
    mask = n0 > 0
    np.testing.assert_allclose(n1, n0, rtol=1e-6)
    np.testing.assert_allclose(p1[mask], p0[mask], rtol=2e-3)
    np.testing.assert_allclose(k1[mask], k0[mask], rtol=1e-4)


def test_field_pdf_matches_numpy_histogram():
    import numpy as np

    rng = np.random.RandomState(3)
    x = rng.normal(size=(8, 16, 16)).astype(np.float32)
    centers, density, counts = stats.field_pdf(x, nbins=20, vmin=-3.0,
                                               vmax=3.0)
    ref, edges = np.histogram(x, bins=20, range=(-3.0, 3.0))
    np.testing.assert_allclose(counts, ref, rtol=0, atol=0)
    width = edges[1] - edges[0]
    np.testing.assert_allclose(density, ref / (x.size * width), rtol=1e-6)
    m = counts > 0
    # per-bin mean value lies inside its bin
    assert (centers[m] >= edges[:-1][m] - 1e-6).all()
    assert (centers[m] <= edges[1:][m] + 1e-6).all()
    # default bounds include everything
    _, dens_all, cnt_all = stats.field_pdf(x, nbins=16)
    np.testing.assert_allclose(cnt_all.sum(), x.size, rtol=0)
    # exact-edge semantics match np.histogram: x == vmin lands in bin 0,
    # interior-edge values in their RIGHT bin, x == vmax in the last bin
    xe = np.array([0.0, 0.5, 1.0, 2.0, 4.0], np.float32)
    _, _, ce = stats.field_pdf(xe, nbins=4, vmin=0.0, vmax=4.0)
    ref_e, _ = np.histogram(xe, bins=4, range=(0.0, 4.0))
    np.testing.assert_array_equal(ce, ref_e)


def test_field_pdf_gaussian_field_is_normal():
    import numpy as np
    from randomfield_tpu import Generator

    n, spacing, nseeds = 32, 8.0, 4
    g = Generator(n, n, n, grid_spacing=spacing)
    var = g.predicted_variance()
    lim = 4.0 * np.sqrt(var)
    nbins = 24
    acc = np.zeros(nbins)
    for s in range(nseeds):
        d = g.generate_delta_field(s, apply_lightcone=False)
        centers, density, counts = stats.field_pdf(
            d, nbins=nbins, vmin=-lim, vmax=lim
        )
        acc += counts
    edges = np.linspace(-lim, lim, nbins + 1)
    width = edges[1] - edges[0]
    ncells = nseeds * n**3
    mids = 0.5 * (edges[:-1] + edges[1:])
    p_exp = (np.exp(-mids**2 / (2 * var)) / np.sqrt(2 * np.pi * var)
             * width * ncells)
    # multinomial noise + a few % for f32 / finite-bin-width systematics;
    # field values are correlated across cells, inflating the scatter —
    # gate only well-populated bins at 8 sigma with a 5% floor
    m = p_exp > 200
    resid = np.abs(acc - p_exp)[m]
    budget = 8.0 * np.sqrt(p_exp[m]) + 0.05 * p_exp[m]
    assert (resid < budget).all(), (resid / budget).max()


def test_field_pdf_lognormal_field():
    import numpy as np
    from randomfield_tpu.models.lognormal import LognormalGenerator

    n, spacing = 32, 8.0
    gen = LognormalGenerator(n, n, n, grid_spacing=spacing)
    sig2 = gen.sigma_g2
    d = np.asarray(gen.generate_delta_field(5, apply_lightcone=False))
    # log1p(delta) + sig2/2 should be ~ N(0, sig2): compare the measured
    # transformed PDF against the normal curve
    y = np.log1p(d) + 0.5 * sig2
    lim = 4.0 * np.sqrt(sig2)
    nbins = 16
    centers, density, counts = stats.field_pdf(
        y.astype(np.float32), nbins=nbins, vmin=-lim, vmax=lim
    )
    edges = np.linspace(-lim, lim, nbins + 1)
    width = edges[1] - edges[0]
    mids = 0.5 * (edges[:-1] + edges[1:])
    p_exp = (np.exp(-mids**2 / (2 * sig2)) / np.sqrt(2 * np.pi * sig2)
             * width * d.size)
    m = p_exp > 200
    resid = np.abs(counts - p_exp)[m]
    budget = 8.0 * np.sqrt(p_exp[m]) + 0.06 * p_exp[m]
    assert (resid < budget).all(), (resid / budget).max()


def test_mesh_power_multipoles_match_single_device():
    import numpy as np
    from randomfield_tpu import Generator
    from randomfield_tpu.parallel.mesh import make_mesh

    n, spacing, nbins = 16, 8.0, 8
    g_ref = Generator(n, n, n, grid_spacing=spacing)
    d_ref = g_ref.generate_delta_field(6, apply_lightcone=False)
    k0, p0, c0 = stats.calculate_power_multipoles(d_ref, spacing,
                                                  nbins=nbins)
    for data, space in ((1, 4), (2, 2)):
        mesh = make_mesh(data=data, space=space)
        g = Generator(n, n, n, grid_spacing=spacing, mesh=mesh)
        d = g.generate_delta_field(6, apply_lightcone=False)
        k, p, c = stats.calculate_power_multipoles(d, spacing, nbins=nbins,
                                                   mesh=mesh)
        np.testing.assert_allclose(c, c0, rtol=1e-6)
        m = c0 > 0
        np.testing.assert_allclose(k[m], k0[m], rtol=1e-5)
        scale = np.nanmax(np.abs(p0))
        np.testing.assert_allclose(p[:, m], p0[:, m], rtol=5e-3,
                                   atol=2e-5 * scale)
    # window deconvolution and interlacing compose with mesh= since
    # round 4 (parity in tests/test_paint_sharded.py)


def test_cell_variance_counts_in_cells():
    import numpy as np
    from randomfield_tpu import Generator
    from randomfield_tpu.validate import stats

    n, spacing, nseeds = 32, 8.0, 6
    g = Generator(n, n, n, grid_spacing=spacing)
    # m=1: expectation reduces to the engine's predicted variance
    v1 = stats.predicted_cell_variance(g.power, (n, n, n), spacing, 1)
    np.testing.assert_allclose(v1, g.predicted_variance(), rtol=2e-3)
    # block averaging damps variance monotonically
    preds = [stats.predicted_cell_variance(g.power, (n, n, n), spacing, m)
             for m in (1, 2, 4, 8)]
    assert all(a > b for a, b in zip(preds, preds[1:]))
    # measured block variance matches the Dirichlet-kernel expectation
    for m, pred in zip((2, 4), preds[1:3]):
        vs = []
        for s in range(nseeds):
            d = g.generate_delta_field(s, apply_lightcone=False)
            mean, var = stats.cell_variance(d, m)
            assert abs(mean) < 0.1
            vs.append(var)
        vm = np.mean(vs)
        sd = np.std(vs, ddof=1) / np.sqrt(nseeds)
        assert abs(vm - pred) < 5 * sd + 0.02 * pred, (m, vm, pred)
    # cell_variance(d, 1) == field_moments
    d = g.generate_delta_field(0, apply_lightcone=False)
    np.testing.assert_allclose(stats.cell_variance(d, 1)[1],
                               stats.field_moments(d)[1], rtol=1e-6)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divide"):
        stats.cell_variance(np.zeros((8, 8, 8), np.float32), 3)


def test_cell_counts_shot_plus_clustering():
    import numpy as np
    from randomfield_tpu.models.lognormal import LognormalGenerator
    from randomfield_tpu.models import zeldovich as zl
    from randomfield_tpu.validate import stats

    # Poisson tracers on a lognormal field: the variance of block-summed
    # counts is shot noise + clustering, Var = Nbar + Nbar^2 sigma_cell^2
    n, spacing, nbar, m, nseeds = 32, 8.0, 4e-3, 4, 5
    gen = LognormalGenerator(n, n, n, grid_spacing=spacing)
    vcell = (m * spacing) ** 3
    nbar_block = nbar * vcell
    sig2 = stats.predicted_cell_variance(gen.power, (n, n, n), spacing, m)
    expected = nbar_block + nbar_block**2 * sig2
    vs = []
    for s in range(nseeds):
        d = gen.generate_delta_field(s, apply_lightcone=False)
        counts = np.asarray(zl.poisson_sample(d, nbar, spacing, seed=s))
        blocks = counts.reshape(n // m, m, n // m, m, n // m, m).sum(
            axis=(1, 3, 5))
        vs.append(blocks.var())
    vm = np.mean(vs)
    sd = np.std(vs, ddof=1) / np.sqrt(nseeds)
    # lognormal xi is exp(xi_G)-1 ~ xi at this amplitude; allow a few %
    # systematic on top of seed scatter (few hundred blocks per seed)
    assert abs(vm - expected) < 5 * sd + 0.10 * expected, (vm, expected)


def test_masked_power_matches_window_convolved_prediction():
    # survey-masked pseudo-P(k): measured vs the exact
    # window-convolution expectation; mask=1 reduces to plain P(k)
    import numpy as np
    from randomfield_tpu import Generator
    from randomfield_tpu.validate import stats

    n, spacing, nseeds, nbins = 32, 8.0, 8, 8
    g = Generator(n, n, n, grid_spacing=spacing)

    # identity check: unit mask == plain estimator and prediction
    d = np.asarray(g.generate_delta_field(0, apply_lightcone=False))
    ones = np.ones((n, n, n), np.float32)
    k0, p0, c0 = stats.calculate_power(d, spacing, nbins=nbins)
    k1, p1, c1 = stats.calculate_masked_power(d, ones, spacing, nbins=nbins)
    np.testing.assert_allclose(p1, p0, rtol=1e-6, equal_nan=True)
    kp, pp, cp = stats.predicted_masked_power(g.power, ones, spacing,
                                              nbins=nbins)
    from randomfield_tpu.ops import power as rf_power
    from randomfield_tpu.ops import grid as rf_grid
    import jax.numpy as jnp

    kmag = rf_grid.kmag((n, n, n), spacing, jnp.float32)
    pgrid = rf_power.interpolate_power(g.power, kmag, "log10k")
    pgrid = jnp.where(kmag > 0, pgrid, 0.0)
    _, pp_plain, _ = stats.bin_power_grid(pgrid, (n, n, n), spacing,
                                          nbins=nbins)
    np.testing.assert_allclose(pp, pp_plain, rtol=2e-4, equal_nan=True)

    # a binary half-box survey mask (hard edge -> strong mode mixing)
    mask = np.zeros((n, n, n), np.float32)
    mask[: n // 2] = 1.0
    kp, pp, cp = stats.predicted_masked_power(g.power, mask, spacing,
                                              nbins=nbins)
    acc = []
    for s in range(nseeds):
        d = np.asarray(g.generate_delta_field(s, apply_lightcone=False))
        _, pm, _ = stats.calculate_masked_power(d, mask, spacing,
                                                nbins=nbins)
        acc.append(pm)
    p_hat = np.mean(acc, axis=0)
    good = cp > 8
    sig = pp[good] * np.sqrt(2.0 / (nseeds * cp[good]))
    resid = np.abs(p_hat[good] - pp[good])
    assert np.all(resid < 5 * sig + 0.05 * pp[good]), (p_hat[good],
                                                       pp[good])
    # the window mixes scales: prediction differs from unwindowed P
    assert np.max(np.abs(pp[good] / pp_plain[good] - 1.0)) > 0.02

    # validation
    import pytest as _pytest

    with _pytest.raises(ValueError, match="zero"):
        stats.calculate_masked_power(d, np.zeros_like(mask), spacing)
    with _pytest.raises(ValueError, match="mask shape"):
        stats.calculate_masked_power(d, np.ones((4, 4, 4)), spacing)
