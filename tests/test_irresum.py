"""Gates for models/irresum.py: wiggle split, Sigma^2, IR resummation.

Every gate is either an exact identity (series coefficients, ks=0
reduction, counterterm linearity, growth scaling, damping bound,
out-of-band equality) or a physical expectation with a measured
margin (wiggle frequency = sound horizon, sigma8 preservation,
xi(r) BAO peak suppression).
"""

import numpy as np
import pytest

from randomfield_tpu.models import irresum as ir
from randomfield_tpu.models.powerspec import (
    _sigma_r_unnormalized,
    bbks_power,
    power_law_power,
)
from randomfield_tpu.models.spt import oneloop_terms
from randomfield_tpu.ops.fftlog import xi_from_power
from randomfield_tpu.ops.power import load_default_power, validate_power


@pytest.fixture(scope="module")
def default_table():
    return validate_power(load_default_power())


@pytest.fixture(scope="module")
def nw(default_table):
    return ir.nowiggle_power(default_table)


def test_bracket_series_and_limits():
    # exact small-x series 1 - j0 + 2 j2 = (3/10) x^2 - x^4/56 + x^6/2160
    x = np.array([1e-4, 1e-3, 1e-2])
    np.testing.assert_allclose(
        ir._bracket(x), 0.3 * x**2 - x**4 / 56.0 + x**6 / 2160.0, rtol=1e-12
    )
    # direct branch agrees with the exact series just past the switch
    x0 = np.array([0.036])
    series = 0.3 * x0**2 - x0**4 / 56.0 + x0**6 / 2160.0
    np.testing.assert_allclose(ir._bracket(x0), series, rtol=1e-8)
    # j's decay: bracket -> 1 at large argument
    np.testing.assert_allclose(ir._bracket(np.array([1e4])), 1.0, atol=1e-3)


def test_sound_horizon_value():
    # EH98 exact-integral s for the default cosmology: ~100 Mpc/h class
    s = ir.sound_horizon()
    assert 90.0 < s < 115.0


def test_sigma2_limits_and_convergence(nw):
    assert ir.bao_damping_sigma2(nw, ks=0.0) == 0.0
    # r_bao -> 0: the bracket vanishes like (3/10)(q r)^2
    assert ir.bao_damping_sigma2(nw, r_bao=1e-6) < 1e-10
    # r_bao -> inf: bracket -> 1, Sigma^2 -> (1/6 pi^2) Int_0^ks P dq
    k, p = nw
    q = np.geomspace(1e-6, 0.2, 20001)
    pq = np.interp(np.log(q), np.log(k), p)  # fine grid; table is dense
    direct = np.trapezoid(pq * q, np.log(q)) / (6.0 * np.pi**2)
    big = ir.bao_damping_sigma2(nw, r_bao=1e6, nq=20001)
    np.testing.assert_allclose(big, direct, rtol=2e-2)
    # quadrature self-convergence
    a = ir.bao_damping_sigma2(nw, nq=2048)
    b = ir.bao_damping_sigma2(nw, nq=4096)
    np.testing.assert_allclose(a, b, rtol=1e-3)
    # canonical magnitude at z=0, ks=0.2: Sigma ~ 5-6 Mpc/h
    assert 4.0 < np.sqrt(a) < 7.0


def test_nowiggle_exact_for_power_laws():
    k = np.logspace(-4, 3, 800)
    for ns in (1.0, 0.5, -1.0, -2.0):
        p = power_law_power(k, ns)
        nwx = ir.nowiggle_power((k, p))
        sel = (k > 0.005) & (k < 0.5)
        np.testing.assert_allclose(nwx.Pk[sel], p[sel], rtol=1e-10)


def test_nowiggle_near_identity_for_smooth_lcdm_shape():
    k = np.logspace(-4, 3, 800)
    p = bbks_power(None, k)
    nwx = ir.nowiggle_power((k, p))
    sel = (k > 0.005) & (k < 0.5)
    assert np.abs(nwx.Pk[sel] / p[sel] - 1.0).max() < 0.03


def test_nowiggle_default_table(default_table, nw):
    k, p = default_table
    w = p / nw.Pk - 1.0
    band = (k > 0.05) & (k < 0.35)
    rms = float(np.std(w[band]))
    # wiggles exist at the EH98 few-percent level and average to zero
    assert 0.01 < rms < 0.08
    assert abs(float(np.mean(w[band]))) < 0.2 * rms
    # broadband (sigma8) preserved
    np.testing.assert_allclose(
        _sigma_r_unnormalized(nw.k, nw.Pk), _sigma_r_unnormalized(k, p), rtol=1e-3
    )
    # exactly equal to the input outside the wiggle band
    out = (k < 8e-3 * 0.4) | (k > 1.0 * 2.5)
    assert out.sum() > 100
    np.testing.assert_array_equal(nw.Pk[out], p[out])
    # the extracted wiggle oscillates at the sound-horizon frequency
    ku = np.linspace(0.02, 0.4, 2048)
    wu = np.interp(ku, k, w)
    freqs = np.fft.rfftfreq(ku.size, ku[1] - ku[0]) * 2.0 * np.pi
    amp = np.abs(np.fft.rfft(wu * np.hanning(ku.size)))
    dominant = freqs[5 + np.argmax(amp[5:])]
    np.testing.assert_allclose(dominant, ir.sound_horizon(), rtol=0.10)


def test_lo_damping_bound(default_table):
    res = ir.ir_resummed_terms(default_table, order="lo")
    # E in (0, 1]: the resummed wiggle never exceeds the linear one
    assert np.all(np.abs(res.p_lo - res.p_nw) <= np.abs(res.p_w) + 1e-12)
    assert np.all(res.p_w_extra == 0.0)
    assert np.all(res.p22 == 0.0) and np.all(res.p13 == 0.0)


def test_reduces_to_plain_oneloop_at_sigma_zero(default_table):
    k = np.logspace(-2.3, np.log10(0.4), 48)
    res = ir.ir_resummed_terms(default_table, order="oneloop", ks=0.0, k=k)
    plain = oneloop_terms(default_table, k=k)
    assert res.sigma2 == 0.0
    np.testing.assert_allclose(res.total, plain.total, rtol=1e-12)


def test_counterterm_exact_linearity(default_table):
    k = np.logspace(-2, np.log10(0.3), 32)
    a = ir.ir_resummed_terms(default_table, order="lo", cs2=1.5, k=k)
    b = ir.ir_resummed_terms(default_table, order="lo", cs2=0.0, k=k)
    np.testing.assert_allclose(a.total - b.total, -2.0 * 1.5 * k**2 * b.p_lo,
                               rtol=1e-10)


def test_growth_scaling_exact(default_table):
    from randomfield_tpu.models.cosmology import create_cosmology

    cosmo = create_cosmology(None)
    k = np.logspace(-2, np.log10(0.3), 32)
    r0 = ir.ir_resummed_terms(default_table, order="oneloop", k=k)
    rz = ir.ir_resummed_terms(default_table, order="oneloop", k=k, z=0.5,
                              cosmology=cosmo)
    d = float(cosmo.growth_function(0.5))
    np.testing.assert_allclose(rz.p_nw, d * d * r0.p_nw, rtol=1e-10)
    np.testing.assert_allclose(rz.sigma2, d * d * r0.sigma2, rtol=1e-10)
    # loops are quadratic functionals of the (damped) input table; the
    # damping factor itself changes with Sigma^2(z), so compare the loop
    # of the z-scaled LO table directly
    lo_z = ir.ir_resummed_terms(default_table, order="lo", z=0.5,
                                cosmology=cosmo, k=k)
    assert np.all(np.abs(lo_z.p_lo - d * d * r0.p_lo) / (d * d * r0.p_lo) < 0.05)


def test_oneloop_wiggle_correction_identity(default_table):
    k = np.logspace(-2.3, np.log10(0.4), 48)
    res = ir.ir_resummed_terms(default_table, order="oneloop", k=k)
    expect = np.exp(-k * k * res.sigma2) * k * k * res.sigma2 * res.p_w
    np.testing.assert_allclose(res.p_w_extra, expect, rtol=1e-12)
    assert np.all(res.total > 0)


def test_bao_peak_suppressed_in_xi(default_table, nw):
    res = ir.ir_resummed_terms(default_table, order="lo")
    r_l, xi_l = xi_from_power(default_table, rmin=80, rmax=125)
    r_n, xi_n = xi_from_power(nw, rmin=80, rmax=125)
    r_i, xi_i = xi_from_power((res.k, res.total), rmin=80, rmax=125)
    peak_lin = float((xi_l - np.interp(r_l, r_n, xi_n)).max())
    peak_ir = float((np.interp(r_l, r_i, xi_i) - np.interp(r_l, r_n, xi_n)).max())
    assert 0.0 < peak_ir < peak_lin  # damped, not erased


def test_power_table_output_and_uv_guard(default_table):
    t = ir.ir_resummed_power(default_table, order="oneloop",
                             k=np.logspace(-2.3, np.log10(0.4), 48))
    validate_power(t)  # feedable back into Generator(power=...)
    with pytest.raises(ValueError, match="non-positive"):
        # the default k grid reaches deep UV where SPT loops overwhelm
        ir.ir_resummed_power(default_table, order="oneloop")


def test_input_validation(default_table):
    with pytest.raises(ValueError, match="order"):
        ir.ir_resummed_terms(default_table, order="nlo2")
    with pytest.raises(ValueError, match="ks"):
        ir.bao_damping_sigma2(default_table, ks=-0.1)
    with pytest.raises(ValueError, match="cosmology"):
        ir.ir_resummed_terms(default_table, z=1.0)
    with pytest.raises(ValueError, match="positive"):
        ir.ir_resummed_terms(default_table, k=np.array([-0.1, 0.2]))
