"""Fused sample+xFFT kernel (ops/pallas_genfft.py) — interpret tests.

The TPU interpreter's hardware-PRNG stub returns ZERO bits (as in
test_pallas_sampler), which makes every bulk draw the deterministic
amplitude r0 = sqrt(-2 ln(2^-25)) at phase 0 — so the kernel's sigma
interpolation, plane routing, and CT transform wiring are all testable
EXACTLY against numpy on CPU.  Real-stream statistics are a hardware
concern (validated by scripts/validate_tpu.py and the bench gate;
bulk power ratio 0.9994 measured at 256^3).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from randomfield_tpu.ops import pallas_genfft as gf
from randomfield_tpu.ops import pallas_sampler as ps
from randomfield_tpu.ops.pallas_fft import digit_perm
from randomfield_tpu.ops.power import load_default_power

SHAPE = (128, 128, 64)
SPACING = 16.0
R_STUB = np.sqrt(-2.0 * np.log(2.0 ** -25))  # zero-bit Box-Muller radius


@pytest.fixture(scope="module")
def table():
    return ps.make_sigma_table(
        load_default_power(), SHAPE, SPACING, "log10k", layout="xzy"
    )


@pytest.fixture(scope="module")
def output(table):
    re, im = gf.sample_fftx_pallas(7, table, SHAPE, SPACING, interpret=True)
    return np.asarray(re), np.asarray(im)


def _sigma_np(table, ksq):
    lk0, dlk, stab = table
    rows = np.asarray(stab)
    knots = (rows[0] if rows.shape[0] == 1 else
             np.concatenate([rows[0]] + [r[1:] for r in rows[1:]]))
    nk = len(knots)
    lk = 0.5 * np.log10(np.maximum(ksq, 1e-300))
    t = np.clip((lk - lk0) / dlk, 0, nk - 1)
    i0 = np.minimum(t.astype(int), nk - 2)
    fr = t - i0
    return np.where(ksq > 0, knots[i0] * (1 - fr) + knots[i0 + 1] * fr, 0.0)


def test_plane_rows_are_transformed_plane_spectra(table, output):
    re, im = output
    nx, ny, nz = SHAPE
    pre, pim = gf.plane_spectra(7, table, SHAPE, SPACING)
    pre, pim = np.asarray(pre), np.asarray(pim)
    perm = digit_perm(nx)
    m = nz // 2
    for rows, prow in ((slice(0, ny), slice(0, ny)),
                       (slice(m * ny, (m + 1) * ny), slice(ny, 2 * ny))):
        zin = pre[prow] + 1j * pim[prow]
        ref = np.fft.ifft(zin, axis=-1, norm="forward")
        got = (re[rows] + 1j * im[rows])[:, perm]
        err = np.abs(got - ref).max() / np.abs(ref).max()
        assert err < 2e-6, err


def test_bulk_rows_match_stub_amplitudes(table, output):
    # zero-bit stub: every bulk mode is sigma * r0/sqrt(2) + 0j, so the
    # output rows are exactly the x-iFFT of the sigma profile
    re, im = output
    nx, ny, nz = SHAPE
    nzh = nz // 2 + 1
    dk = 2 * np.pi / SPACING
    ax = np.arange(nx)
    kx = (dk / nx) * np.where(ax <= nx // 2, ax, ax - nx)
    ay = np.arange(ny)
    ky = (dk / ny) * np.where(ay <= ny // 2, ay, ay - ny)
    perm = digit_perm(nx)
    for kzi, y in ((1, 3), (nzh - 2, 120), (5, 64)):
        kzv = (dk / nz) * kzi
        ksq = kx * kx + ky[y] ** 2 + kzv * kzv
        c = _sigma_np(table, ksq) * (R_STUB / np.sqrt(2.0))
        ref = np.fft.ifft(c, norm="forward")
        row = kzi * ny + y
        got = (re[row] + 1j * im[row])[perm]
        err = np.abs(got - ref).max() / np.abs(ref).max()
        assert err < 2e-5, (kzi, y, err)


def test_deterministic(table):
    re1, im1 = gf.sample_fftx_pallas(3, table, SHAPE, SPACING, interpret=True)
    re2, im2 = gf.sample_fftx_pallas(3, table, SHAPE, SPACING, interpret=True)
    np.testing.assert_array_equal(np.asarray(re1), np.asarray(re2))
    np.testing.assert_array_equal(np.asarray(im1), np.asarray(im2))


def test_smoothing_filters_bulk_and_planes(table):
    nx, ny, nz = SHAPE
    sl = 2.0 * SPACING
    re0, im0 = gf.sample_fftx_pallas(5, table, SHAPE, SPACING,
                                     interpret=True)
    res, ims = gf.sample_fftx_pallas(5, table, SHAPE, SPACING,
                                     smoothing_length=sl, interpret=True)
    p0 = np.asarray(re0) ** 2 + np.asarray(im0) ** 2
    pss = np.asarray(res) ** 2 + np.asarray(ims) ** 2
    assert pss.sum() < 0.7 * p0.sum()  # high-k power suppressed


def test_can_genfft():
    assert gf.can_genfft((128, 128, 64))
    assert gf.can_genfft((1024, 1024, 1024))
    assert not gf.can_genfft((96, 128, 64))    # nx not CT-able
    assert not gf.can_genfft((128, 120, 64))   # ny not a block multiple
    assert not gf.can_genfft((128, 128, 63))   # odd nz


def test_bad_shape_raises(table):
    with pytest.raises(ValueError, match="unsupported"):
        gf.sample_fftx_pallas(0, table, (96, 128, 64), SPACING,
                              interpret=True)
