"""Line-of-sight 1-D (skewer) power: exact per-mode expectation gates."""

import numpy as np

from randomfield_tpu import Generator
from randomfield_tpu.validate.stats import (
    calculate_power_1d,
    predicted_power_1d,
)


def test_p1d_matches_exact_expectation_all_axes():
    # 120 snapshot renders: per-mode residuals are pure sample noise on
    # every LOS axis (z exercises the packed plane sum; x/y the
    # multiplicity fold).
    n, spacing, nseeds = 16, 8.0, 120
    g = Generator(n, n, n, grid_spacing=spacing)
    fields = [np.asarray(g.generate_delta_field(s, apply_lightcone=False))
              for s in range(nseeds)]
    for axis in (0, 1, 2):
        kp, e1d = predicted_power_1d(g.power, (n, n, n), spacing,
                                     los_axis=axis)
        meas = np.stack([calculate_power_1d(f, spacing, los_axis=axis)[1]
                         for f in fields])
        mean = meas.mean(0)
        sem = meas.std(0, ddof=1) / np.sqrt(nseeds)
        z = (mean - e1d) / sem
        assert np.all(np.abs(z) < 5.0), (axis, z)
        # aggregate amplitude at the sub-percent level
        amp = np.sum(mean * e1d / sem**2) / np.sum(e1d**2 / sem**2)
        assert abs(amp - 1.0) < 0.02, (axis, amp)


def test_p1d_variance_identity():
    # sum_par mult_par E1D / L_par == predicted variance, exactly: the
    # 1-D prediction resums the full 3-D mode content.
    n, spacing = 18, 6.0  # even: exercises the Nyquist multiplicity
    g = Generator(n, n, 14, grid_spacing=spacing)
    for axis, n_par in ((0, n), (2, 14)):
        kp, e1d = predicted_power_1d(g.power, (n, n, 14), spacing,
                                     los_axis=axis)
        mult = np.full(n_par // 2 + 1, 2.0)
        mult[0] = 1.0
        if n_par % 2 == 0:
            mult[-1] = 1.0
        var = np.sum(mult * e1d) / (n_par * spacing)
        np.testing.assert_allclose(var, float(g.predicted_variance()),
                                   rtol=2e-5)


def test_p1d_kaiser_anisotropic():
    # The Kaiser (b + f mu^2)^2 expectation grid predicts the skewer
    # power of redshift-space renders along the distorted axis.
    n, spacing, nseeds = 16, 8.0, 100
    b, f = 1.3, 0.7
    g = Generator(n, n, n, grid_spacing=spacing)
    pgrid = g._kaiser_pgrid(0.0, b, f, 2, 0.0)
    kp, e1d = predicted_power_1d(None, (n, n, n), spacing, los_axis=2,
                                 pgrid=pgrid)
    _, e1d_iso = predicted_power_1d(g.power, (n, n, n), spacing, los_axis=2)
    assert e1d[3] > 1.3 * e1d_iso[3]  # RSD boosts line-of-sight power
    meas = np.stack([
        calculate_power_1d(
            np.asarray(g.generate_kaiser_field(s, bias=b, f=f)), spacing,
            los_axis=2)[1]
        for s in range(nseeds)
    ])
    mean = meas.mean(0)
    sem = meas.std(0, ddof=1) / np.sqrt(nseeds)
    z = (mean - e1d) / sem
    assert np.all(np.abs(z) < 5.0), z


def test_p1d_smoothing_consistency():
    # the smoothing kwarg matches an explicitly smoothed pgrid
    n, spacing = 12, 10.0
    g = Generator(n, n, n, grid_spacing=spacing)
    _, a = predicted_power_1d(g.power, (n, n, n), spacing,
                              smoothing_length=12.0)
    import jax.numpy as jnp

    from randomfield_tpu.ops import grid as _grid
    from randomfield_tpu.ops import power as _power

    km = _grid.kmag((n, n, n), spacing, jnp.float32)
    pg = _power.interpolate_power(g.power, km, "log10k")
    pg = jnp.where(km > 0, pg * jnp.exp(-(km * km) * 144.0), 0.0)
    _, bb = predicted_power_1d(None, (n, n, n), spacing, pgrid=pg)
    np.testing.assert_allclose(a, bb, rtol=1e-6)
