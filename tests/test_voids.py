"""Spherical-underdensity void finding: planted-void recovery and exact
Gaussian expectations.

The reference validates only two-point statistics and one-point moments
(SURVEY.md section 3.5); void statistics are added capability, gated the
same way the rest of the framework is — deterministic geometry against
analytic dilution radii, measured volume fractions against the exact
discrete normal-CDF expectation, and minima against an independent
brute-force lattice oracle.
"""

import numpy as np
import pytest

import randomfield_tpu as rf
from randomfield_tpu.models import voids


def _planted_field(n, spacing, center, r0, amp, eps=1e-3):
    """Periodic top-hat underdensity: -amp inside radius r0, 0 outside,
    with a one-voxel eps-deeper spike at the center so the R_v plateau
    has a unique, deterministic tie-broken maximum (the documented
    "ties broken toward deeper delta" rule)."""
    ax = (np.arange(n) + 0.5) * spacing
    dx = np.abs(ax[:, None, None] - center[0])
    dy = np.abs(ax[None, :, None] - center[1])
    dz = np.abs(ax[None, None, :] - center[2])
    box = n * spacing
    dx = np.minimum(dx, box - dx)
    dy = np.minimum(dy, box - dy)
    dz = np.minimum(dz, box - dz)
    r = np.sqrt(dx * dx + dy * dy + dz * dz)
    d = np.where(r < r0, -amp, 0.0).astype(np.float32)
    idx = tuple(int(c / spacing - 0.5) for c in center)
    d[idx] -= eps
    return d


def test_planted_void_recovered():
    """A planted spherical underdensity of amplitude -amp and radius R0
    dilutes as delta_bar(<R) = -amp (R0/R)^3 for R > R0, so the SO void
    radius at threshold t is analytically (amp/|t|)^(1/3) R0.  The
    finder must recover the exact planted center and that radius within
    one ladder step."""
    n, sp = 64, 1.0
    r0, amp, t = 6.0, 0.6, -0.2
    center = ((n // 2 + 0.5) * sp,) * 3
    d = _planted_field(n, sp, center, r0, amp)
    r_true = (amp / abs(t)) ** (1.0 / 3.0) * r0  # ~8.65
    radii = tuple(np.arange(2.0, 13.0, 0.75))
    pos, rv = voids.find_voids(d, sp, radii, threshold=t)
    assert pos.shape[0] >= 1
    # the deepest/largest void is the planted one, center exact
    np.testing.assert_allclose(pos[0], center, atol=1e-6)
    step = radii[1] - radii[0]
    assert abs(rv[0] - r_true) <= step + 1e-9
    # and no other comparably-sized void exists (spurious catalog)
    if pos.shape[0] > 1:
        assert rv[1:].max() < 0.6 * r_true


def test_void_radius_grid_validation():
    d = np.zeros((8, 8, 8), np.float32)
    with pytest.raises(ValueError):
        voids.void_radius_grid(d, 1.0, (3.0, 2.0), threshold=-0.4)
    with pytest.raises(ValueError):
        voids.void_radius_grid(d, 1.0, (), threshold=-0.4)
    with pytest.raises(ValueError):
        voids.void_radius_grid(d, 1.0, (2.0, 3.0), threshold=0.1)


def test_underdense_fraction_gate():
    """Measured volume fraction with delta_bar(<R) < t on Gaussian
    renders matches the EXACT discrete expectation Phi(t / sigma_R)
    with sigma_R the top-hat-filtered rms over this grid's modes.

    Error budget: the smoothed field decorrelates over ~R, so a 64^3
    box at spacing 4 holds ~(256/2R)^3 = 4096 quasi-independent
    patches; std of the fraction ~ sqrt(p(1-p)/4096) ~ 0.007 per seed,
    ~0.004 over 3 seeds -> gate at 0.02 (5 sigma)."""
    n, sp, R, t = 64, 4.0, 8.0, -0.4
    g = rf.Generator(n, n, n, grid_spacing=sp)
    pred = voids.predicted_underdense_fraction(
        g.power, (n, n, n), sp, R, t
    )
    assert 0.05 < pred < 0.95  # the gate must be in the testable regime
    meas = np.mean([
        voids.underdense_fraction(
            g.generate_delta_field(s, apply_lightcone=False), sp, R, t
        )
        for s in range(3)
    ])
    assert abs(meas - pred) < 0.02


def test_catalog_nonoverlapping():
    """Greedy acceptance guarantees every later center lies outside all
    earlier (larger) voids: periodic distance(i, j) >= r_i for i < j."""
    n, sp = 64, 4.0
    g = rf.Generator(n, n, n, grid_spacing=sp)
    d = g.generate_delta_field(7, apply_lightcone=False)
    radii = tuple(np.arange(6.0, 40.0, 4.0))
    pos, rv = voids.find_voids(d, sp, radii, threshold=-0.3)
    assert pos.shape[0] >= 3  # a real catalog, not a vacuous pass
    assert np.all(np.diff(rv) <= 1e-12)  # sorted descending
    box = n * sp
    for i in range(pos.shape[0]):
        for j in range(i + 1, pos.shape[0]):
            dv = np.abs(pos[i] - pos[j])
            dv = np.minimum(dv, box - dv)
            assert np.sqrt((dv**2).sum()) >= rv[i] - 1e-9


def test_void_size_function_counts():
    rv = np.array([3.0, 5.0, 5.5, 9.0])
    edges = np.array([2.0, 4.0, 8.0, 16.0])
    centers, dndlnr, counts = voids.void_size_function(rv, 1000.0, edges)
    np.testing.assert_array_equal(counts, [1, 2, 1])
    np.testing.assert_allclose(centers, np.sqrt(edges[:-1] * edges[1:]))
    np.testing.assert_allclose(
        dndlnr, counts / (1000.0 * np.diff(np.log(edges)))
    )


def test_minima_match_bruteforce_oracle():
    """minima_statistics totals equal an independent numpy brute-force
    count of 27-cube lattice minima, exactly; and by sign symmetry the
    minima total of delta equals the peaks total of -delta."""
    rng = np.random.default_rng(11)
    d = rng.standard_normal((24, 24, 24)).astype(np.float32)
    centers, counts, total = voids.minima_statistics(d, 1.0, sigma0=1.0)
    assert np.all(np.diff(centers) > 0)  # ascending nu, as documented
    neigh_min = np.full(d.shape, np.inf)
    for sx in (-1, 0, 1):
        for sy in (-1, 0, 1):
            for sz in (-1, 0, 1):
                if sx == sy == sz == 0:
                    continue
                np.minimum(
                    neigh_min,
                    np.roll(np.roll(np.roll(d, sx, 0), sy, 1), sz, 2),
                    out=neigh_min,
                )
    assert total == int(np.sum(d <= neigh_min))
    from randomfield_tpu.validate.peaks import peak_statistics

    _, counts_pk, total_pk = peak_statistics(-d, 1.0, sigma0=1.0)
    assert total == total_pk
    np.testing.assert_array_equal(counts, counts_pk[::-1])
    assert counts.sum() <= total


@pytest.mark.parametrize("family", ["slab", "pencil"])
def test_find_voids_mesh_matches_single_device(family):
    """Mesh-native find_voids (distributed R_v ladder + GSPMD 27-cube
    maxima + per-shard top-k compaction) returns the single-device
    catalog: same centers, same radii, same ordering-sensitive greedy
    acceptance."""
    if family == "slab":
        from randomfield_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=1, space=4)
    else:
        from randomfield_tpu.parallel.pencil import make_pencil_mesh

        mesh = make_pencil_mesh(data=1, spx=2, spy=2)
    n, spacing = 32, 4.0
    g = rf.Generator(n, n, n, grid_spacing=spacing)
    d = np.asarray(g.generate_delta_field(seed=7, apply_lightcone=False))
    radii = (6.0, 9.0, 12.0, 18.0)
    pos0, rv0 = voids.find_voids(d, spacing, radii, threshold=-0.2)
    pos1, rv1 = voids.find_voids(d, spacing, radii, threshold=-0.2,
                                 mesh=mesh)
    assert pos0.shape[0] > 0
    assert pos1.shape == pos0.shape
    np.testing.assert_allclose(pos1, pos0)
    np.testing.assert_allclose(rv1, rv0, rtol=1e-6)
    # the sharded R_v grid itself matches voxel for voxel
    rv_g0 = np.asarray(voids.void_radius_grid(d, spacing, radii, -0.2))
    rv_g1 = np.asarray(voids.void_radius_grid(d, spacing, radii, -0.2,
                                              mesh=mesh))
    assert (rv_g0 != rv_g1).mean() < 1e-4  # FFT-rounding near-ties only
