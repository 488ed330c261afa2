"""Fused Pallas kernel: PRNG sampling + the x-axis inverse FFT, one pass.

The staged pipeline's first two stages used to be

    sampler kernel   -> write (nx, nzh, ny) re/im    8.6 GB HBM write
    transpose pair   -> (nzh, ny, nx)                17.2 GB
    minor-axis CT    -> (nzh, ny, nx^G)              17.2 GB

This kernel generates each (kz, y-row-block) x-line block DIRECTLY in
VMEM — hardware PRNG, Box-Muller, inline sigma(|k|) interpolation and
the optional Gaussian filter, exactly the fused sampler's math
(ops/pallas_sampler.py) — and immediately runs the shared CT inverse
transform over the x lanes (ops/pallas_fft.py:_ct_core), writing the
transformed block in raw digit order.  The sampler write, the
transpose pair, and the transform read all disappear: first-stage HBM
traffic drops from 43 GB to the 8.6 GB output write.

Hermitian self-conjugate planes (kz = 0 and kz = nz/2): their
conjugate-pair coupling spans the whole plane, which a streamed
per-block PRNG cannot regenerate locally.  They are precomputed OUTSIDE
the kernel (:func:`plane_spectra`: Threefry draws + the same sigma
interpolation + ``symmetrize``, all O(N^2) XLA on a 2-plane array) and
fed in as an input the kernel passes through the same CT path via
``pl.when`` — plane row-blocks transform the loaded spectrum instead
of generating one.

Stream: deterministic per (seed, shape, TPU generation) but a DIFFERENT
realization family than the (x, kz, y)-tiled sampler (engine/staged.py
documents the flavors; ``STREAM = 'zyx-genfft-v1'``).  Validated
statistically like every other sampler flavor (variance, P(k),
Hermitian structure — SURVEY.md section 4's strategy).

Reference parity: randomfield/generate.py's sample step + the x-axis
portion of the in-place c2r FFTW plan (transform.py:Plan), fused.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from randomfield_tpu.ops import pallas_fft as _pf
from randomfield_tpu.ops import pallas_sampler as _ps
from randomfield_tpu.ops import transform as _transform

__all__ = ["sample_fftx_pallas", "plane_spectra", "can_genfft", "STREAM"]

STREAM = "zyx-genfft-v1"

_TWO_PI = 6.283185307179586
_INV_SQRT2 = 0.7071067811865476
_INV_2_24 = float(1.0 / (1 << 24))
_HALF_INV_LN10 = float(0.5 / np.log(10.0))
_LANES = 128
_BLKM = 128  # row-block: one kernel step transforms 128 (kz,y) x-lines


def can_genfft(shape) -> bool:
    """nx CT-transformable; ny a multiple of the row block; even nz."""
    nx, ny, nz = shape
    return (
        _pf.can_pallas_fft(nx) and ny % _BLKM == 0 and ny >= _LANES
        and nz % 2 == 0
    )


def _signed(idx, n):
    return jnp.where(idx <= n // 2, idx, idx - n)


def _make_genfft_kernel(shape, spacing):
    nx, ny, nz = shape
    nzh = nz // 2 + 1
    m_z = nz // 2
    blocks_per_kz = ny // _BLKM
    m_seg, width, n_knots = _ps._segment_rows(shape, "xzy")
    if width != _LANES:
        raise ValueError("genfft needs a 128-wide sigma table (ny >= 128)")
    dk = _TWO_PI / spacing
    nxv = nx // _LANES  # x lane-blocks (also the CT digit count A)

    def kernel(seed_ref, smooth_ref, lk0_ref, inv_dlk_ref, stab_ref,
               pre_ref, pim_ref, twre_ref, twim_ref, vre_ref, vim_ref,
               ore_ref, oim_ref, sre_ref, sim_ref):
        g = pl.program_id(0)
        kzi = g // blocks_per_kz
        yblk = g % blocks_per_kz
        is_plane = jnp.logical_or(kzi == 0, kzi == m_z)
        pltpu.prng_seed(seed_ref[0], g)
        # draw OUTSIDE pl.when: predicated regions do not thread the
        # PRNG state (interpret mode returns zeros inside them)
        b1 = pltpu.bitcast(pltpu.prng_random_bits((_BLKM, nx)), jnp.uint32)
        b2 = pltpu.bitcast(pltpu.prng_random_bits((_BLKM, nx)), jnp.uint32)

        @pl.when(is_plane)
        def _():
            sre_ref[...] = pre_ref[...]
            sim_ref[...] = pim_ref[...]

        @pl.when(jnp.logical_not(is_plane))
        def _():
            # |k|^2 of this block: kz fixed, ky over rows, kx over lanes
            rows = jax.lax.broadcasted_iota(jnp.int32, (_BLKM, nx), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (_BLKM, nx), 1)
            ky = (dk / ny) * _signed(yblk * _BLKM + rows, ny).astype(
                jnp.float32
            )
            kx = (dk / nx) * _signed(cols, nx).astype(jnp.float32)
            kzv = (dk / nz) * kzi.astype(jnp.float32)
            ksq = kx * kx + ky * ky + kzv * kzv

            # sigma(|k|): same uniform log10-k segmented-table interp as
            # the fused sampler, done per 128-lane sub-block (Mosaic's
            # lane gather reads within one vreg)
            lk = _HALF_INV_LN10 * jnp.log(jnp.where(ksq > 0, ksq, 1.0))
            t = (lk - lk0_ref[0]) * inv_dlk_ref[0]
            t = jnp.clip(t, 0.0, float(n_knots - 1))
            i0f = jnp.minimum(t.astype(jnp.int32), n_knots - 2)
            frac = t - i0f.astype(jnp.float32)
            sig_cols = []
            for b in range(nxv):
                i0 = i0f[:, b * _LANES:(b + 1) * _LANES]
                if m_seg == 1:
                    tab = jnp.broadcast_to(
                        stab_ref[0][None, :], (_BLKM, _LANES)
                    )
                    s0 = jnp.take_along_axis(tab, i0, axis=1)
                    s1 = jnp.take_along_axis(tab, i0 + 1, axis=1)
                else:
                    seg = i0 // (width - 1)
                    loc0 = i0 - seg * (width - 1)
                    s0 = jnp.zeros((_BLKM, _LANES), jnp.float32)
                    s1 = jnp.zeros((_BLKM, _LANES), jnp.float32)
                    for k in range(m_seg):
                        tab_k = jnp.broadcast_to(
                            stab_ref[k][None, :], (_BLKM, _LANES)
                        )
                        g0 = jnp.take_along_axis(tab_k, loc0, axis=1)
                        g1 = jnp.take_along_axis(tab_k, loc0 + 1, axis=1)
                        in_k = seg == k
                        s0 = jnp.where(in_k, g0, s0)
                        s1 = jnp.where(in_k, g1, s1)
                sig_cols.append(
                    s0 * (1.0 - frac[:, b * _LANES:(b + 1) * _LANES])
                    + s1 * frac[:, b * _LANES:(b + 1) * _LANES]
                )
            sig = jnp.concatenate(sig_cols, axis=-1)

            # Box-Muller (bulk blocks contain no DC/self-conjugate mode)
            u1 = (b1 >> 8).astype(jnp.int32).astype(jnp.float32) * _INV_2_24 + (
                0.5 * _INV_2_24
            )
            u2 = (b2 >> 8).astype(jnp.int32).astype(jnp.float32) * _INV_2_24
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            theta = _TWO_PI * u2

            s = smooth_ref[0]
            amp = sig * _INV_SQRT2
            sre_ref[...] = amp * (r * jnp.cos(theta))
            sim_ref[...] = amp * (r * jnp.sin(theta))

            @pl.when(s != 0.0)
            def _():
                filt = jnp.exp(-0.5 * ksq * s * s)
                sre_ref[...] = sre_ref[...] * filt
                sim_ref[...] = sim_ref[...] * filt

        # shared CT inverse over the x lanes, raw digit order out
        gre, gim = _pf._ct_core(
            sre_ref[...], sim_ref[...], nx,
            twre_ref[...], twim_ref[...], vre_ref[...], vim_ref[...],
        )
        for c in range(nxv):
            ore_ref[:, c * _LANES:(c + 1) * _LANES] = gre[c]
            oim_ref[:, c * _LANES:(c + 1) * _LANES] = gim[c]

    return kernel, blocks_per_kz, m_z


@functools.partial(
    jax.jit, static_argnames=("shape", "spacing", "interpret")
)
def _genfft_jit(seed, smoothing_length, lk0, inv_dlk, stab, pre, pim,
                shape, spacing, interpret):
    nx, ny, nz = shape
    nzh = nz // 2 + 1
    kernel, blocks_per_kz, m_z = _make_genfft_kernel(shape, spacing)
    _, _, twre, twim, vre, vim = _pf._constants_np(nx)
    grid = (nzh * ny // _BLKM,)

    def plane_map(gi, B=blocks_per_kz):
        kzi = gi // B
        return (
            jnp.where(kzi == 0, gi % B,
                      jnp.where(kzi == m_z, B + gi % B, 0)),
            0,
        )

    io_spec = pl.BlockSpec(
        (_BLKM, nx), lambda gi: (gi, 0), memory_space=pltpu.VMEM
    )
    plane_spec = pl.BlockSpec(
        (_BLKM, nx), plane_map, memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((nzh * ny, nx), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem, smem, smem, smem, const, plane_spec, plane_spec,
                  const, const, const, const],
        out_specs=(io_spec, io_spec),
        out_shape=(out, out),
        scratch_shapes=[
            pltpu.VMEM((_BLKM, nx), jnp.float32),
            pltpu.VMEM((_BLKM, nx), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray([seed], jnp.int32).ravel(),
        jnp.asarray([smoothing_length], jnp.float32).ravel(),
        jnp.asarray([lk0], jnp.float32).ravel(),
        jnp.asarray([inv_dlk], jnp.float32).ravel(),
        stab, pre, pim,
        jnp.asarray(twre), jnp.asarray(twim), jnp.asarray(vre),
        jnp.asarray(vim),
    )


def _flat_knots(stab):
    """Rebuild the 1-D knot array from overlapping (m, w) segment rows.

    jnp ops on a possibly-traced ``stab`` (the segment count is static),
    so it works inside the fused render program.
    """
    rows = jnp.asarray(stab)
    if rows.shape[0] == 1:
        return rows[0]
    return jnp.concatenate([rows[0]] + [rows[k][1:]
                                        for k in range(1, rows.shape[0])])


def plane_spectra(seed, table, shape, spacing, smoothing_length=0.0):
    """Symmetrized (2*ny, nx) re/im spectra of the kz=0 / Nyquist planes.

    Threefry draws (deterministic per seed, independent of the bulk's
    hardware-PRNG stream), scaled by the SAME uniform-log10k sigma
    interpolant the kernel uses, Gaussian-filtered, then Hermitian
    plane symmetrization (ops/transform.py:_symmetrize_plane_reim —
    identical math to every other pipeline's fixup).  Row-major (y, x)
    to match the kernel's (kz, y) row blocks.
    """
    nx, ny, nz = shape
    lk0, dlk, stab = table
    knots = _flat_knots(stab)
    n_knots = knots.shape[0]
    dk = _TWO_PI / float(spacing)
    key = jax.random.fold_in(
        jax.random.key(jnp.asarray(seed, jnp.uint32) & 0x7FFFFFFF),
        0x9E3779B9,
    )
    draws = jax.random.normal(key, (2, 2, ny, nx), jnp.float32)

    ky = (dk / ny) * _signed(jnp.arange(ny), ny).astype(jnp.float32)
    kx = (dk / nx) * _signed(jnp.arange(nx), nx).astype(jnp.float32)
    kzv = jnp.asarray([0.0, (dk / nz) * (nz // 2)], jnp.float32)
    ksq = (
        kzv[:, None, None] ** 2
        + (ky * ky)[None, :, None]
        + (kx * kx)[None, None, :]
    )
    lk = _HALF_INV_LN10 * jnp.log(jnp.where(ksq > 0, ksq, 1.0))
    t = jnp.clip((lk - lk0) * (1.0 / dlk), 0.0, float(n_knots - 1))
    i0 = jnp.minimum(t.astype(jnp.int32), n_knots - 2)
    frac = t - i0.astype(jnp.float32)
    sig = knots[i0] * (1.0 - frac) + knots[i0 + 1] * frac
    sig = jnp.where(ksq > 0, sig, 0.0)
    s = jnp.float32(smoothing_length)
    amp = sig * jnp.exp(-0.5 * ksq * s * s) * _INV_SQRT2

    re = amp * draws[0]
    im = amp * draws[1]
    outs = []
    for p in range(2):
        fre, fim = _transform._symmetrize_plane_reim(re[p], im[p], True)
        outs.append((fre, fim))
    pre = jnp.concatenate([outs[0][0], outs[1][0]], axis=0)
    pim = jnp.concatenate([outs[0][1], outs[1][1]], axis=0)
    return pre, pim


def sample_fftx_pallas(seed, table, shape, spacing, smoothing_length=0.0,
                       interpret=False):
    """Sampled spectrum with the x-axis ALREADY inverse-transformed.

    Returns (re, im) float32 (nzh*ny, nx) — rows are (kz, y) pairs, the
    x lanes carry the unnormalized inverse transform in RAW DIGIT order
    (fold ``pallas_fft.digit_perm(nx)`` into a downstream movement).
    Equivalent to sample -> transpose -> minor-axis CT, in one HBM
    write.  Stream flavor :data:`STREAM`.
    """
    shape = tuple(int(s) for s in shape)
    if not can_genfft(shape):
        raise ValueError(f"shape {shape} unsupported by genfft")
    lk0, dlk, stab = table
    pre, pim = plane_spectra(seed, table, shape, spacing, smoothing_length)
    return _genfft_jit(
        int(seed) & 0x7FFFFFFF, float(smoothing_length), float(lk0),
        1.0 / float(dlk), jnp.asarray(stab), pre, pim, shape,
        float(spacing), bool(interpret),
    )
