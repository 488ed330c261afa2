"""Minkowski functionals: estimator vs exact Gaussian (Tomita) theory.

The reference validates only two-point statistics and one-point moments
(SURVEY.md section 3.5); morphology is added capability, gated here the
same way — measured vs closed-form expectation with matched band-limited
mode statistics.
"""

import numpy as np

import randomfield_tpu as rf
from randomfield_tpu.validate import minkowski as mk


def _measure_avg(g, sm, seeds, s0, nbins=13, nu_max=3.0):
    accum = None
    for s in seeds:
        d = np.asarray(
            g.generate_delta_field(s, smoothing_length=sm,
                                   apply_lightcone=False)
        )
        nu, v0, v1, v2, v3 = g.calculate_minkowski(
            d, nbins=nbins, nu_max=nu_max, sigma0=s0
        )
        row = np.stack([v0, v1, v2, v3])
        accum = row if accum is None else accum + row
    return nu, accum / len(seeds)


def test_gaussian_minkowski_gate():
    """Measured v0..v3 of rendered fields match the Tomita closed forms
    with the exact band-limited spectral moments (no free parameters)."""
    n, sp, sm = 64, 4.0, 12.0
    g = rf.Generator(n, n, n, grid_spacing=sp)
    s0sq, s1sq = mk.spectral_moments(
        g.power, (n, n, n), sp, smoothing_length=sm
    )
    # sigma0^2 is the predicted render variance — same modes, same math
    np.testing.assert_allclose(
        s0sq, g.predicted_variance(smoothing_length=sm), rtol=1e-4
    )
    nu, meas = _measure_avg(g, sm, range(4), np.sqrt(s0sq))
    theory = np.stack(g.predicted_minkowski(nu, smoothing_length=sm))
    # v0/v1 are low-order and tight; the curvature functionals carry
    # sample noise + O(dnu^2) binning bias at this size (residuals
    # measured 1.1/2.3/7.7/8.2% at these exact settings)
    for k, tol in ((0, 0.03), (1, 0.06), (2, 0.15), (3, 0.18)):
        scale = np.abs(theory[k]).max()
        assert np.abs(meas[k] - theory[k]).max() < tol * scale, (
            k, np.abs(meas[k] - theory[k]).max() / scale
        )


def test_minkowski_qualitative_structure():
    """Signs and symmetries that do not depend on tolerances: v0 is a
    decreasing CDF-like curve, v1 > 0, v2 is odd around nu = 0, and the
    Euler density is negative at nu = 0 (sponge) and positive in the
    tails (isolated knots/voids)."""
    n, sp, sm = 48, 4.0, 10.0
    g = rf.Generator(n, n, n, grid_spacing=sp)
    d = np.asarray(
        g.generate_delta_field(0, smoothing_length=sm,
                               apply_lightcone=False)
    )
    nu, v0, v1, v2, v3 = g.calculate_minkowski(d, nbins=13, nu_max=2.5)
    assert np.all(np.diff(v0) <= 1e-12)
    assert v0[0] > 0.95 and v0[-1] < 0.05
    assert np.all(v1 > 0)
    mid = len(nu) // 2
    assert abs(v2[mid]) < 0.3 * np.abs(v2).max()
    assert v2[-2] > 0 and v2[1] < 0
    assert v3[mid] < 0 and v3[0] > 0 and v3[-1] > 0


def test_mesh_native_minkowski_matches_single_device():
    """The distributed measurement equals the single-device one (same
    spectral kernels, identical field, reductions differ only by f32
    ordering) on slab AND pencil meshes."""
    from randomfield_tpu.parallel.mesh import make_mesh
    from randomfield_tpu.parallel.pencil import make_pencil_mesh

    n, sp, sm = 16, 8.0, 16.0
    g0 = rf.Generator(n, n, n, grid_spacing=sp)
    d = np.asarray(
        g0.generate_delta_field(5, smoothing_length=sm,
                                apply_lightcone=False)
    )
    nu0, *ref = g0.calculate_minkowski(d, nbins=9, nu_max=2.0, sigma0=0.3)
    for mesh in (make_mesh(data=2, space=4),
                 make_pencil_mesh(data=2, spx=2, spy=2)):
        gm = rf.Generator(n, n, n, grid_spacing=sp, mesh=mesh)
        nu, *got = gm.calculate_minkowski(d, nbins=9, nu_max=2.0,
                                          sigma0=0.3)
        np.testing.assert_allclose(nu, nu0)
        for k in range(4):
            scale = np.abs(ref[k]).max() or 1.0
            np.testing.assert_allclose(
                got[k], ref[k], atol=1e-4 * scale, rtol=1e-3
            )


def test_minkowski_default_sigma0_and_units():
    """Default sigma0 (the field's own std) keeps v0(0) ~ 1/2, and the
    functional amplitudes scale with sigma1/sigma0 as the units demand:
    shrinking the grid spacing by 2x (same mode content) doubles k and
    so doubles v1 at fixed nu."""
    n, sm = 32, 8.0
    g1 = rf.Generator(n, n, n, grid_spacing=8.0)
    g2 = rf.Generator(n, n, n, grid_spacing=4.0)
    s1 = mk.spectral_moments(g1.power, (n, n, n), 8.0, smoothing_length=sm)
    s2 = mk.spectral_moments(g2.power, (n, n, n), 4.0, smoothing_length=sm / 2)
    lam1 = np.sqrt(s1[1] / s1[0])
    lam2 = np.sqrt(s2[1] / s2[0])
    # the spectra differ (different k coverage) but lam carries 1/length
    # units: same grid at half the spacing has lam ~2x IF the power at
    # the shared modes matches; assert the units direction only
    assert lam2 > lam1

    d = np.asarray(
        g1.generate_delta_field(3, smoothing_length=sm,
                                apply_lightcone=False)
    )
    nu, v0, _, _, _ = g1.calculate_minkowski(d, nbins=9, nu_max=2.0)
    assert abs(v0[len(nu) // 2] - 0.5) < 0.05
