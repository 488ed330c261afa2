"""Pallas fused sampler tests.

The Mosaic interpreter stubs ``prng_random_bits`` to zeros (jax
interpret_pallas_call.py: "TODO: Implement this properly"), so the PRNG
path can only be validated on real TPU hardware:
``scripts/validate_pallas_sampler.py`` runs the statistical gate there
(per-mode variance, filter response, Hermitian-ness, determinism).  The
CPU suite checks what the interpreter can: tracing, shapes, the fused
sigma/filter amplitude algebra, and the Hermitian plane fixup.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from randomfield_tpu.ops import transform
from randomfield_tpu.ops.pallas_sampler import (
    SigmaTable,
    make_sigma_table,
    sample_spectrum_pallas,
    table_length,
)


def constant_table(shape, layout, sigma0):
    """Flat sigma table: interp returns sigma0 at every k (DC -> 0)."""
    from randomfield_tpu.ops.pallas_sampler import _segment_rows

    m, d2, n_knots = _segment_rows(shape, layout)
    return SigmaTable(
        -3.0, 6.0 / (n_knots - 1), jnp.full((m, d2), sigma0, jnp.float32)
    )


def _on_tpu():
    try:
        return jax.devices()[0].platform.startswith("tpu") or "TPU" in str(
            jax.devices()[0]
        )
    except Exception:
        return False


@pytest.mark.parametrize("layout", ["xyz", "xzy"])
@pytest.mark.parametrize("smoothing", [0.0, 2.0])
def test_amplitude_algebra_under_stubbed_prng(layout, smoothing):
    # interpreter PRNG yields all-zero bits => u1 = 2^-25, theta = 0, so
    # every mode gets the SAME deterministic draw r = sqrt(50 ln 2) on the
    # real axis — which pins the fused sigma * filter * 1/sqrt(2) * k^2
    # amplitude path exactly against a closed form
    shape = (8, 8, 8)
    spacing = 1.3
    nzh = 5
    sigma0 = 1.3
    sig_shape = (8, 8, nzh) if layout == "xyz" else (8, nzh, 8)
    tab = constant_table(shape, layout, sigma0)
    c = sample_spectrum_pallas(
        7, tab, shape, spacing, smoothing_length=smoothing, layout=layout,
        interpret=True,
    )
    assert c.shape == sig_shape
    assert c.dtype == jnp.complex64

    from randomfield_tpu.ops import grid

    km = np.asarray(grid.kmag(shape, spacing), np.float64)
    r = np.sqrt(50 * np.log(2.0))
    # the fused kernel zeroes the DC amplitude (sigma(0) = 0 upstream)
    base = np.where(km > 0, sigma0, 0.0) * np.exp(
        -0.5 * (km * smoothing) ** 2
    ) / np.sqrt(2.0) * r
    want = np.asarray(
        transform.symmetrize_with_shape(
            jnp.asarray(base, jnp.complex64), nz=8, scale_self_conjugate=True
        )
    )
    got = np.asarray(c.real) + 1j * np.asarray(c.imag)
    if layout == "xzy":
        got = got.transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-6)


@pytest.mark.parametrize("layout", ["xyz", "xzy"])
def test_fused_sigma_interpolation_matches_tabulation(layout):
    # under the stubbed PRNG every mode draws the same real value r, so
    # c.real / r == sigma(k) / sqrt(2) — pinning the in-kernel uniform
    # log10-k table interpolation against powertools' tabulate_sigmas
    # (the reference interpolant) over a REAL power table
    from randomfield_tpu.ops import power as pw
    from randomfield_tpu.ops import grid

    shape, spacing = (16, 16, 16), 8.0
    table = pw.load_default_power()
    tab = make_sigma_table(table, shape, spacing, layout=layout)
    c = sample_spectrum_pallas(3, tab, shape, spacing, layout=layout,
                               interpret=True)
    r = np.sqrt(50 * np.log(2.0))
    got = np.asarray(c.real) * np.sqrt(2.0) / r
    want = np.asarray(pw.tabulate_sigmas(shape, spacing, table, layout=layout))
    # undo the self-conjugate-plane sqrt(2) rescale to compare raw sigma
    z = jnp.asarray(want, jnp.complex64)
    want_sym = np.asarray(
        transform.symmetrize_with_shape(z, nz=16, scale_self_conjugate=True).real
        if layout == "xyz" else want  # xzy checked off-plane below
    )
    if layout == "xyz":
        # symmetrize averages conjugate pairs of the (here, real and
        # k-symmetric) sigma values -> equals sigma itself on those
        # planes up to the sqrt(2) factor applied to both
        np.testing.assert_allclose(got, want_sym, rtol=2e-3, atol=1e-8)
    else:
        # compare away from the self-conjugate kz planes (fixed up with
        # pair averaging post-kernel)
        interior = np.s_[:, 1:-1, :]
        np.testing.assert_allclose(
            got[interior], want[interior], rtol=2e-3, atol=1e-8
        )


def test_make_sigma_table_requires_coverage():
    from randomfield_tpu.ops.power import PowerTable

    bad = PowerTable(np.array([0.1, 0.2]), np.array([1.0, 1.0]))
    with pytest.raises(ValueError, match="covers"):
        make_sigma_table(bad, (16, 16, 16), 8.0)


def test_table_length_mismatch_raises():
    tab = constant_table((16, 16, 16), "xyz", 1.0)
    with pytest.raises(ValueError, match="sigma table shape"):
        sample_spectrum_pallas(0, tab, (32, 32, 32), 8.0, interpret=True)


@pytest.mark.skipif(not _on_tpu(), reason="hardware PRNG requires a real TPU")
def test_statistics_on_tpu():
    from scripts.validate_pallas_sampler import run_checks

    run_checks(n_seeds=100, shape=(16, 16, 16))


def test_reim_sampler_matches_complex_xzy():
    # under the stubbed interpreter PRNG both paths are deterministic;
    # the re/im path must be bit-identical to the complex path's parts
    from randomfield_tpu.ops.pallas_sampler import sample_spectrum_pallas_reim

    shape, spacing = (8, 8, 8), 1.3
    tab = constant_table(shape, "xzy", 1.7)
    c = sample_spectrum_pallas(3, tab, shape, spacing, smoothing_length=2.0,
                               layout="xzy", interpret=True)
    re, im = sample_spectrum_pallas_reim(3, tab, shape, spacing,
                                         smoothing_length=2.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(re), np.asarray(c.real))
    np.testing.assert_array_equal(np.asarray(im), np.asarray(c.imag))


@pytest.mark.parametrize("shape", [(16, 16, 16), (8, 12, 10), (16, 16, 15)])
@pytest.mark.parametrize("smoothing", [0.0, 4.0])
def test_in_kernel_binned_sample_power_matches_materialized(shape, smoothing):
    # under the stubbed interpreter PRNG the draws are deterministic (and
    # nonzero: u1 = 2^-25 => r = sqrt(50 ln 2)), so the in-kernel binned
    # path (bins= mode + outside plane fixup, engine/staged.py:
    # _sample_power_v3) is pinned against sampling re/im and binning the
    # materialized spectrum: counts exactly, power/k sums to f32 rounding
    from randomfield_tpu.engine.staged import _sample_power_v3
    from randomfield_tpu.ops import pallas_sampler as ps
    from randomfield_tpu.ops.power import load_default_power
    from randomfield_tpu.validate.stats import _binned_spectrum_reim

    spacing, nbins = 8.0, 6
    assert ps.can_bin_sample(shape, nbins)
    table = make_sigma_table(load_default_power(), shape, spacing,
                             layout="xzy")
    lk0, dlk, stab = table
    args = (
        jnp.uint32(7), jnp.float32(smoothing), jnp.float32(lk0),
        jnp.float32(1.0 / dlk), jnp.asarray(stab),
    )

    re, im = ps._sample_jit_reim(*args, shape, spacing, "xzy", True)
    c_ref, p_ref, k_ref = [
        np.asarray(x, np.float64)
        for x in _binned_spectrum_reim(re, im, shape, spacing, nbins, "xzy")
    ]

    # the staged fn uses the compiled kernel; rebuild its binned body in
    # interpret mode by monkeypatching is heavier than re-deriving — call
    # the same public pieces it calls, with interpret=True
    from randomfield_tpu.ops import grid as _grid
    from randomfield_tpu.ops import transform as _tr
    from randomfield_tpu.validate.stats import _bin_setup, _masked_bins

    edges, _m = _bin_setup(shape, spacing, nbins)
    ledges = np.log10(edges)
    acc, pre, pim = ps.sample_power_bins_reim(
        *args, shape, spacing, nbins, float(ledges[0]),
        float(nbins / (ledges[-1] - ledges[0])), interpret=True,
    )
    nx, ny, nz = shape
    counts = np.asarray(acc[0, :nbins], np.float64)
    psum = np.asarray(acc[1, :nbins], np.float64)
    ksum = np.asarray(acc[2, :nbins], np.float64)
    volume = nx * ny * nz * spacing**3
    two_pi = 2.0 * np.pi
    kx2 = jnp.asarray((two_pi * np.fft.fftfreq(nx, d=spacing)) ** 2,
                      jnp.float32)
    ky2 = jnp.asarray((two_pi * np.fft.fftfreq(ny, d=spacing)) ** 2,
                      jnp.float32)
    edges_j = jnp.asarray(edges, jnp.float32)
    for pi, p in enumerate(_grid.self_conjugate_kz_planes(nz)):
        kzv = (two_pi / (nz * spacing)) * p
        fre, fim = _tr._symmetrize_plane_reim(pre[:, pi, :], pim[:, pi, :],
                                              True)
        km = jnp.sqrt(kx2[:, None] + ky2[None, :] + jnp.float32(kzv * kzv))
        pval = (fre * fre + fim * fim) * jnp.float32(volume)
        c2, p2, k2 = _masked_bins(km, jnp.float32(1.0), pval, edges_j,
                                  nbins, per_slab=False)
        counts += np.asarray(c2, np.float64)
        psum += np.asarray(p2, np.float64)
        ksum += np.asarray(k2, np.float64)

    np.testing.assert_array_equal(counts, c_ref)
    np.testing.assert_allclose(psum, p_ref, rtol=3e-5)
    np.testing.assert_allclose(ksum, k_ref, rtol=3e-5)
