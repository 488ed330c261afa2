"""Power tools tests (ref: test_powertools.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from randomfield_tpu.models.powerspec import make_power_table
from randomfield_tpu.ops import power


def test_validate_power_accepts_and_coerces():
    k = np.logspace(-3, 1, 50)
    pk = k**-1.5
    t1 = power.validate_power((k, pk))
    t2 = power.validate_power(np.column_stack([k, pk]))
    t3 = power.validate_power({"k": k, "Pk": pk})
    np.testing.assert_array_equal(t1.k, t2.k)
    np.testing.assert_array_equal(t1.Pk, t3.Pk)


def test_validate_power_rejects_malformed():
    k = np.logspace(-3, 1, 50)
    pk = k**-1.5
    with pytest.raises(ValueError):
        power.validate_power((k[::-1], pk))  # decreasing k
    with pytest.raises(ValueError):
        power.validate_power((k, -pk))  # negative P
    with pytest.raises(ValueError):
        power.validate_power((np.concatenate([[0.0], k[1:]]), pk))  # k=0
    bad = pk.copy()
    bad[3] = np.nan
    with pytest.raises(ValueError):
        power.validate_power((k, bad))
    with pytest.raises(ValueError):
        power.validate_power((k[:10], pk))  # length mismatch


def test_interpolation_reproduces_knots():
    k = np.logspace(-2, 1, 40)
    pk = 100.0 * k**-2.1
    table = power.validate_power((k, pk))
    for mode in ("log10k", "loglog"):
        out = np.asarray(
            power.interpolate_power(table, jnp.asarray(k, jnp.float32), mode)
        )
        np.testing.assert_allclose(out, pk, rtol=2e-4)


def test_loglog_exact_for_power_law():
    k = np.logspace(-2, 1, 10)  # coarse knots
    pk = 5.0 * k**-1.7
    table = power.validate_power((k, pk))
    kq = np.logspace(-1.9, 0.9, 57)
    out = np.asarray(
        power.interpolate_power(table, jnp.asarray(kq, jnp.float32), "loglog")
    )
    np.testing.assert_allclose(out, 5.0 * kq**-1.7, rtol=2e-3)


def test_tabulate_sigmas_values():
    shape, spacing = (8, 8, 8), 4.0
    k = np.logspace(-3, 2, 200)
    pk = 1000.0 * np.ones_like(k)  # white noise: P constant
    sig = np.asarray(power.tabulate_sigmas(shape, spacing, (k, pk)))
    volume = 8**3 * 4.0**3
    expected = np.sqrt(1000.0 / volume)
    assert sig[0, 0, 0] == 0.0  # DC
    mask = np.ones(sig.shape, bool)
    mask[0, 0, 0] = False
    np.testing.assert_allclose(sig[mask], expected, rtol=1e-5)


def test_tabulate_sigmas_requires_coverage():
    shape, spacing = (64, 64, 64), 1.0
    k = np.logspace(-1, 0, 20)  # misses both kmin and kmax of the grid
    with pytest.raises(ValueError, match="covers"):
        power.tabulate_sigmas(shape, spacing, (k, np.ones_like(k)))


def test_filter_modes_gaussian():
    shape, spacing = (8, 8, 8), 1.0
    c = jnp.ones(power._grid.half_shape(shape), jnp.complex64)
    s = 2.5
    out = np.asarray(power.filter_modes(c, shape, spacing, s))
    km = np.asarray(power._grid.kmag(shape, spacing))
    # atol floors the comparison above f32 subnormals (corner modes have
    # exp(-92) ~ 1e-41, below float32 range)
    np.testing.assert_allclose(
        out.real, np.exp(-0.5 * km**2 * s**2), rtol=2e-4, atol=1e-12
    )
    # zero smoothing is the identity
    out0 = np.asarray(power.filter_modes(c, shape, spacing, 0.0))
    np.testing.assert_array_equal(out0, np.asarray(c))


def test_sigma_r_known_integral():
    # white noise P(k) = A: sigma^2(R) = A/(2 pi^2) * int k^2 W^2(kR) dk
    # and int_0^inf x^2 W^2(x) dx = 3 pi / 2, so sigma(R) = sqrt(3A/(4 pi R^3))
    k = np.logspace(-6, 4, 4000)
    a = 7.0
    pw = np.full_like(k, a)
    for r in (2.0, 4.0, 8.0):
        expected = np.sqrt(3 * a / (4 * np.pi * r**3))
        assert np.isclose(power.sigma_r((k, pw), r), expected, rtol=2e-3), r


def test_sigma8_and_normalize():
    table = power.PowerTable(*make_power_table())
    s8 = power.sigma8(table)
    assert np.isclose(s8, 0.8288, rtol=1e-3)
    renorm = power.normalize_power(table, 0.5)
    assert np.isclose(power.sigma8(renorm), 0.5, rtol=1e-6)


def test_default_power_loads():
    t = power.load_default_power()
    assert t.k[0] <= 1e-3 and t.k[-1] >= 100
    assert np.all(t.Pk > 0)


# ---- power-spectrum model zoo ----------------------------------------------


def test_bbks_power_normalized_and_close_to_eh98():
    from randomfield_tpu.models import powerspec as ps
    from randomfield_tpu.models.cosmology import Planck13
    from randomfield_tpu.ops.power import sigma8 as sigma8_of

    k = np.logspace(-4, 2, 512)
    p_bbks = ps.bbks_power(None, k)
    assert np.all(p_bbks > 0) and np.all(np.isfinite(p_bbks))
    s8 = sigma8_of((k, p_bbks))
    assert s8 == pytest.approx(Planck13.sigma8, rel=1e-2)
    # same normalization, smooth-vs-BAO shapes: agree broadly at BAO scales
    p_eh = ps.eisenstein_hu_power(None, k)
    band = (k > 1e-2) & (k < 1.0)
    ratio = p_bbks[band] / p_eh[band]
    assert np.all((ratio > 0.6) & (ratio < 1.6))


def test_power_law_sigma8_exact():
    from randomfield_tpu.models import powerspec as ps
    from randomfield_tpu.ops.power import sigma8 as sigma8_of

    k = np.logspace(-4, 2, 2048)
    p = ps.power_law_power(k, ns=0.5, sigma8=0.7)
    assert sigma8_of((k, p)) == pytest.approx(0.7, rel=1e-2)
    with pytest.raises(ValueError, match="ns > -3"):
        ps.power_law_power(k, ns=-3.0)


def test_load_camb_power(tmp_path):
    from randomfield_tpu.models import powerspec as ps
    from randomfield_tpu.ops.power import validate_power

    f = tmp_path / "matterpower.dat"
    k = np.logspace(-3, 1, 32)
    pk = 1e4 * k / (1.0 + (k / 0.02) ** 3)
    extra = np.ones_like(k)  # CAMB files may carry extra columns
    np.savetxt(
        f, np.column_stack([k, pk, extra]),
        header="   k/h    P(k)   extra", comments="#",
    )
    k2, p2 = ps.load_camb_power(f)
    np.testing.assert_allclose(k2, k, rtol=1e-12)
    np.testing.assert_allclose(p2, pk, rtol=1e-12)
    validate_power((k2, p2))  # drops straight into the engine
    with pytest.raises(ValueError, match="pre-converted"):
        ps.load_camb_power(f, h_units=False)


def test_power_at_redshift_scales_by_growth_squared():
    from randomfield_tpu.models import powerspec as ps
    from randomfield_tpu.models.cosmology import Planck13

    k = np.logspace(-3, 1, 64)
    p0 = ps.eisenstein_hu_power(None, k)
    k1, p1 = ps.power_at_redshift((k, p0), None, 1.0)
    d = float(Planck13.growth_function(1.0))
    np.testing.assert_allclose(p1 / p0, d * d, rtol=1e-12)


def test_generator_named_power_models():
    from randomfield_tpu import Generator

    for name in ("default", "eh98", "bbks"):
        g = Generator(8, 8, 8, grid_spacing=32.0, power=name)
        d = np.asarray(g.generate_delta_field(seed=0))
        assert np.all(np.isfinite(d))
    with pytest.raises(ValueError, match="unknown power model"):
        Generator(8, 8, 8, grid_spacing=32.0, power="nope")
