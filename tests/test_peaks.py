"""BBKS peak statistics: lattice maxima vs the exact Gaussian theory.

The reference validates only two-point statistics and one-point moments
(SURVEY.md section 3.5); peak abundance is added capability, gated the
same way — measured counts vs the BBKS (1986) closed forms with matched
band-limited spectral moments.
"""

import numpy as np

import randomfield_tpu as rf
from randomfield_tpu.validate import peaks as pk


def test_bbks_total_matches_closed_form():
    """The numeric integral of the differential density over all
    heights equals the exact (29 - 6 sqrt 6) / (2 5^{3/2} (2 pi)^2
    R*^3) total — a no-free-parameter check of f(x) and G(gamma, x*)."""
    s0sq, s1sq, s2sq = 1.0, 2.0, 9.0  # gamma = 2/3
    nu = np.linspace(-8.0, 8.0, 3201)
    numeric = np.trapezoid(pk.bbks_peak_density(nu, s0sq, s1sq, s2sq), nu)
    closed = pk.bbks_total_density(s0sq, s1sq, s2sq)
    np.testing.assert_allclose(numeric, closed, rtol=1e-9)


def test_bbks_curvature_weight_asymptotics():
    """f(0) = 0 and f(x) -> x^3 - 3x for large x (BBKS A15)."""
    assert pk._f_curvature(0.0) == 0.0
    np.testing.assert_allclose(
        pk._f_curvature(6.0), 6.0**3 - 18.0, rtol=1e-4
    )
    # high-gamma fields peak at higher curvature: G grows with x*
    g = pk._G(0.7, np.array([0.0, 1.0, 3.0]))
    assert g[2] > g[1] > g[0] > 0


def test_peak_counts_gate():
    """Measured lattice peak counts on rendered fields match BBKS —
    total within 10% (Poisson ~4% over 4 seeds at ~160 peaks each,
    plus the documented few-% lattice discretization residual at
    R* ~ 4.5 cells) and every height bin within a Poisson + 12%
    systematic budget."""
    n, sp, sm = 96, 4.0, 14.0
    g = rf.Generator(n, n, n, grid_spacing=sp)
    s0sq, s1sq, s2sq = pk.bbks_moments(
        g.power, (n, n, n), sp, smoothing_length=sm
    )
    # sigma0^2 is the predicted render variance — same modes, same math
    np.testing.assert_allclose(
        s0sq, g.predicted_variance(smoothing_length=sm), rtol=1e-4
    )
    nu, exp_counts, exp_total = g.predicted_peaks(smoothing_length=sm)
    seeds = range(4)
    acc = None
    totals = []
    for s in seeds:
        d = np.asarray(
            g.generate_delta_field(s, smoothing_length=sm,
                                   apply_lightcone=False)
        )
        nu_m, counts, total = g.calculate_peaks(d, sigma0=np.sqrt(s0sq))
        totals.append(total)
        acc = counts if acc is None else acc + counts
    np.testing.assert_allclose(nu_m, nu)
    mean_total = np.mean(totals)
    assert abs(mean_total / exp_total - 1.0) < 0.10, (mean_total, exp_total)
    mean_bins = acc / len(list(seeds))
    budget = 4.0 * np.sqrt(np.maximum(exp_counts, 1.0) / 4.0) \
        + 0.12 * exp_counts
    assert np.all(np.abs(mean_bins - exp_counts) < budget), (
        mean_bins, exp_counts
    )


def test_mesh_native_peaks_matches_single_device():
    """The distributed measurement (halo-exchanged rolled max) equals
    the single-device one EXACTLY — integer counts, identical field —
    on slab AND pencil meshes."""
    from randomfield_tpu.parallel.mesh import make_mesh
    from randomfield_tpu.parallel.pencil import make_pencil_mesh

    n, sp, sm = 16, 8.0, 20.0
    g0 = rf.Generator(n, n, n, grid_spacing=sp)
    d = np.asarray(
        g0.generate_delta_field(7, smoothing_length=sm,
                                apply_lightcone=False)
    )
    nu0, c0, t0 = g0.calculate_peaks(d, nbins=9, sigma0=0.25)
    assert t0 > 0
    for mesh in (make_mesh(data=2, space=4),
                 make_pencil_mesh(data=2, spx=2, spy=2)):
        gm = rf.Generator(n, n, n, grid_spacing=sp, mesh=mesh)
        nu, c, t = gm.calculate_peaks(d, nbins=9, sigma0=0.25)
        np.testing.assert_allclose(nu, nu0)
        np.testing.assert_array_equal(c, c0)
        assert t == t0


def test_peak_statistics_defaults_and_units():
    """Default sigma0 (the field's own std) centers the histogram near
    nu ~ 1 (peaks sit above the mean), out-of-range peaks are counted
    in the total, and a pure single-mode field has the exact lattice
    count of one maximum per wavelength cube."""
    n, sp = 32, 1.0
    g = rf.Generator(n, n, n, grid_spacing=sp)
    d = np.asarray(
        g.generate_delta_field(1, smoothing_length=6.0,
                               apply_lightcone=False)
    )
    nu, counts, total = g.calculate_peaks(d)
    assert counts.sum() <= total
    heights = nu[np.argmax(counts)]
    assert 0.0 < heights < 3.0
    # cos(kx) + cos(ky) + cos(kz) with 4 periods per axis: exactly
    # 4^3 isolated lattice maxima (every cos at +1 simultaneously)
    x = np.arange(n)
    ph = 2.0 * np.pi * 4.0 / n
    c = np.cos(ph * x)
    wave = (
        c[:, None, None] + c[None, :, None] + c[None, None, :]
    ).astype(np.float32)
    _, _, t = pk.peak_statistics(wave, sp, sigma0=1.0)
    assert t == 64
