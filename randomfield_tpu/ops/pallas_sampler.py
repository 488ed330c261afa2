"""Fused Pallas TPU kernel: PRNG -> Box-Muller -> sigma(k) interp -> filter.

North-star component (BASELINE.json): "Hermitian-symmetric complex mode
sampling becomes a Pallas PRNG kernel writing the packed c2r
half-spectrum in place", with powertools' log10(k) power interpolation
AND mode filtering fused in.

What the kernel fuses, per VMEM tile of the half-spectrum:

1. seed the on-core hardware PRNG from (user seed, tile id) — distinct
   streams per tile, deterministic per (seed, grid shape);
2. draw two uint32 lattices -> uniforms -> Box-Muller -> a complex
   standard normal z with <|z|^2> = 1;
3. compute |k|^2 of each mode inline from the tile's grid position
   (broadcasted iota — no k-mesh input array);
4. evaluate sigma(|k|) by linear interpolation in log10 k over a small
   UNIFORM table resident in VMEM (two ``tpu.dynamic_gather`` lane
   lookups) — the round-2 version read a precomputed (nx, ny, nzh)
   sigma grid from HBM instead: 2.15 GB of traffic + resident footprint
   at 1024^3, both gone now;
5. scale by the Gaussian smoothing filter exp(-k^2 s^2 / 2) and write
   the real and imaginary parts (DC mode: exactly zero, matching
   tabulate_sigmas' sigma(0) = 0).

The kernel's only HBM traffic is writing the two output lattices.  The
Hermitian fixup of the kz = 0 / Nyquist planes remains an O(N^2) XLA
post-op on the output (conjugate pairs live in distant tiles; the
hardware PRNG is streamed per tile, not counter-addressable by logical
index, so partners cannot be regenerated locally).

The sigma table (:func:`make_sigma_table`) resamples the scene's P(k)
interpolant onto a uniform log10-k grid with exactly d2 entries (the
tile minor-axis length — Mosaic's gather constraint: operand shape must
equal index shape, so the lookup axis matches the lane axis).  At real
workloads d2 >= 513, well past the source table's information content;
resampling error is orders of magnitude below the statistical gate's
sampling noise.

Determinism: per (seed, shape) on a given TPU generation.  The stream
differs from jax.random's Threefry, so the engine treats this sampler
as its own flavor (``sampler='pallas'``), validated statistically
(realized P(k), variance, Hermitian structure) the same way the
reference validates itself (SURVEY.md section 4).

Reference parity: the mode sampler inside randomfield/generate.py
(RandomState.normal over the packed buffer) + powertools'
tabulate_sigmas interpolation + filter_modes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from randomfield_tpu.ops import transform as _transform

__all__ = [
    "sample_spectrum_pallas",
    "sample_spectrum_pallas_reim",
    "scale_spectrum_pallas_reim",
    "make_sigma_table",
    "SigmaTable",
]

_TWO_PI = 6.283185307179586
_INV_SQRT2 = 0.7071067811865476
_INV_2_24 = float(1.0 / (1 << 24))
_HALF_INV_LN10 = float(0.5 / np.log(10.0))


class SigmaTable(tuple):
    """(lk0, dlk, values) — uniform-in-log10(k) sigma lookup table.

    ``values`` has shape (m, d2): m overlapping segment rows of the
    kernel's gather width d2 (Mosaic's lane gather reads within one row,
    so row k holds knots [k*(d2-1), k*(d2-1) + d2 - 1] — consecutive
    rows share one knot).  Total distinct knots: m*(d2-1) + 1.
    """

    __slots__ = ()

    def __new__(cls, lk0, dlk, values):
        return super().__new__(cls, (float(lk0), float(dlk), values))

    @property
    def lk0(self):
        return self[0]

    @property
    def dlk(self):
        return self[1]

    @property
    def values(self):
        return self[2]


def table_length(shape, layout="xyz") -> int:
    """Gather width = the kernel tile's lane count (minor axis, <= 128).

    Mosaic's lane gather (``tpu.dynamic_gather``) requires the gather
    dimension to fit a single vreg — 128 f32 lanes — so tiles are cut to
    128 lanes and the table rows match that width.
    """
    nx, ny, nz = shape
    nzh = nz // 2 + 1
    d2 = nzh if layout == "xyz" else ny
    return min(d2, 128)


_MIN_KNOTS = 513  # >= the default table's information content


def _segment_rows(shape, layout):
    """(m, width, n_knots) for a segmented table of >= _MIN_KNOTS knots."""
    w = table_length(shape, layout)
    m = max(1, -(-(_MIN_KNOTS - 1) // (w - 1)))
    return m, w, m * (w - 1) + 1


def make_sigma_table(power, shape, spacing, interpolation="log10k",
                     layout="xyz") -> SigmaTable:
    """Resample sigma(k) = sqrt(P(k)/V) onto a uniform log10-k grid.

    Host float64 evaluation of the scene's own interpolant (P linear in
    log10 k, or log-log), spanning exactly the grid's [k_min, k_max]
    (ops/grid.py:get_k_bounds — k_max is the corner-mode magnitude, so
    every sampled mode interpolates, never extrapolates).  At least
    ``_MIN_KNOTS`` uniform knots regardless of grid size, stored as
    overlapping (m, d2) segment rows for the kernel's lane gather.
    """
    from randomfield_tpu.ops import grid as _grid
    from randomfield_tpu.ops import power as _power

    table = _power.validate_power(power)
    _power.require_coverage(table, shape, spacing)
    m, d2, n_knots = _segment_rows(shape, layout)
    nx, ny, nz = shape
    volume = nx * ny * nz * float(spacing) ** 3
    kmin, kmax = _grid.get_k_bounds(shape, spacing)
    lk0 = np.log10(kmin) - 1e-4
    lk1 = np.log10(kmax) + 1e-4
    lk = np.linspace(lk0, lk1, n_knots)
    lk_tab = np.log10(table.k)
    if interpolation == "log10k":
        pk = np.interp(lk, lk_tab, table.Pk)
    elif interpolation == "loglog":
        if np.any(table.Pk <= 0):
            raise ValueError("loglog interpolation requires strictly positive P(k)")
        pk = 10.0 ** np.interp(lk, lk_tab, np.log10(table.Pk))
    else:
        raise ValueError(f"unknown interpolation {interpolation!r}")
    sig = np.sqrt(pk / volume).astype(np.float32)
    rows = np.stack([sig[k * (d2 - 1): k * (d2 - 1) + d2] for k in range(m)])
    return SigmaTable(lk[0], lk[1] - lk[0], rows)


def _signed_index(idx, n):
    """fft frequency index: i for i < n/2(+1), i - n above."""
    return jnp.where(idx <= n // 2, idx, idx - n)


def _tile_geometry(shape, layout):
    """(d1, d2, d2t, blk1, n1_tiles, n2_tiles) for the sampler kernels.

    Lane tiles are cut to 128 (one f32 vreg) so the sigma-table gather
    is legal (Mosaic: single source vreg along the gather dimension);
    the middle axis is tiled so all VMEM-resident lattices (two bit
    lattices, re/im outputs, gather temps, the table rows) stay well
    under the ~16 MB budget.
    """
    nx, ny, nz = shape
    nzh = nz // 2 + 1
    d1, d2 = (ny, nzh) if layout == "xyz" else (nzh, ny)
    d2t = min(d2, 128)
    n2_tiles = pl.cdiv(d2, d2t)
    blk1 = d1
    while blk1 * d2t * 4 * 7 > 10 * 2**20:
        blk1 = (blk1 + 1) // 2
    if blk1 != d1:
        blk1 = max(8, ((blk1 + 7) // 8) * 8)  # sublane-divisible tiles
    n1_tiles = pl.cdiv(d1, blk1)
    return d1, d2, d2t, blk1, n1_tiles, n2_tiles


def can_bin_sample(shape, nbins, layout="xzy"):
    """True when the in-kernel binned sampler supports this workload.

    Requires the whole kz axis in one middle-axis tile (true for every
    nz <= ~5800 under the VMEM budget) and nbins <= 128 lanes.
    """
    if layout != "xzy" or nbins > 128:
        return False
    _, _, _, _, n1_tiles, _ = _tile_geometry(shape, layout)
    return n1_tiles == 1


def _interp_sigma_tile(lk, ksq, lk0_ref, inv_dlk_ref, stab_ref,
                       m_seg, width, n_knots, blk1, d2t):
    """sigma(|k|) for one VMEM tile: linear interp over the uniform
    log10-k table.

    The table is stored as m overlapping width-wide segment rows
    (width == d2t == the lane count — Mosaic's lane gather reads within
    one row): a static loop selects each mode's segment with one in-row
    lane gather per segment.  The DC entry (ksq = 0) is guarded through
    a positive dummy in ``lk`` by the caller and zeroed here
    (sigma(0) = 0: zero-mean field).
    """
    t = (lk - lk0_ref[0]) * inv_dlk_ref[0]
    t = jnp.clip(t, 0.0, float(n_knots - 1))
    i0 = jnp.minimum(t.astype(jnp.int32), n_knots - 2)
    frac = t - i0.astype(jnp.float32)
    if m_seg == 1:
        tab = jnp.broadcast_to(stab_ref[0][None, :], (blk1, d2t))
        s0 = jnp.take_along_axis(tab, i0, axis=1)
        s1 = jnp.take_along_axis(tab, i0 + 1, axis=1)
    else:
        seg = i0 // (width - 1)
        loc0 = i0 - seg * (width - 1)  # in [0, w-2]; loc0+1 stays in-row
        s0 = jnp.zeros((blk1, d2t), jnp.float32)
        s1 = jnp.zeros((blk1, d2t), jnp.float32)
        for k in range(m_seg):
            tab_k = jnp.broadcast_to(stab_ref[k][None, :], (blk1, d2t))
            g0 = jnp.take_along_axis(tab_k, loc0, axis=1)
            g1 = jnp.take_along_axis(tab_k, loc0 + 1, axis=1)
            in_k = seg == k
            s0 = jnp.where(in_k, g0, s0)
            s1 = jnp.where(in_k, g1, s1)
    sig = s0 * (1.0 - frac) + s1 * frac
    return jnp.where(ksq > 0, sig, 0.0)


def _make_kernel(shape, spacing, layout, bins=None, shard_lanes=None):
    """Kernel closure for a (d0, d1, d2) half-spectrum tile row.

    ``layout`` maps array axes to physical axes: 'xyz' = (x, y, kz) with
    kz packed on the minor axis; 'xzy' = (x, kz, y) (the staged
    pipeline's padding-free order).

    ``shard_lanes`` (xzy, bins=None only): emit a SHARD of the global
    stream — the kernel covers only ``shard_lanes`` lanes of the y axis
    starting at a runtime lane-tile offset (an extra SMEM scalar ref
    after the table), but seeds tiles by their GLOBAL ids and computes k
    from global indices.  Tile geometry (blk1, n1/n2 tile counts) stays
    that of the full ``shape``, so the union of all shards is
    bit-identical to the single-device 'xzy' stream for any shard count
    with shard_lanes % 128 == 0 — the mesh sampler equals the
    single-device ``sampler='pallas'`` realization exactly.

    ``bins=(nbins, le0, inv_dle)`` switches the kernel from writing the
    re/im lattices to accumulating the binned power statistics of the
    sampled spectrum in place (the config-4 ``sample_power`` workload):
    per tile it reuses the already-computed log10|k| for an affine bin
    index (the estimator's edges are uniform in log10 k), reduces
    (sum w, sum w*|c|^2 V, sum w*|k|) per bin with the interior
    Hermitian multiplicity w = 2, and adds them into a single (8, 128)
    accumulator that lives across the whole grid.  The self-conjugate
    kz = 0 / Nyquist planes (multiplicity 1, and coupled by the
    Hermitian fixup that runs outside the kernel) are NOT binned;
    instead their raw draws are emitted as small (nx, n_planes, ny)
    side outputs so the caller can fix them up and bin them exactly as
    the materialized path does.  The draw stream is identical to the
    re/im kernel's (same tile ids, same bit order), so the planes — and
    hence the binned spectrum — belong to the same realization a render
    of this seed produces.  The 8.6 GB spectrum write disappears: the
    kernel's HBM traffic is O(N^2).
    """
    nx, ny, nz = shape
    nzh = nz // 2 + 1
    d1, d2, d2t, blk1, n1_tiles, n2_tiles = _tile_geometry(shape, layout)
    m_seg, width, n_knots = _segment_rows(shape, layout)
    if shard_lanes is not None:
        if layout != "xzy" or bins is not None:
            raise ValueError("shard sampling is xzy/bins-free only")
        if d2t != 128 or shard_lanes % 128 != 0:
            raise ValueError(
                f"shard sampling needs 128-lane tiles; got d2t={d2t}, "
                f"shard_lanes={shard_lanes}"
            )
    if bins is not None:
        if layout != "xzy":
            raise ValueError("binned sampling is staged-only (layout 'xzy')")
        if n1_tiles != 1:
            raise ValueError(
                "binned sampling needs the whole kz axis in one tile"
            )
        if bins[0] > 128:
            raise ValueError("binned sampling supports nbins <= 128")
    dk = _TWO_PI / spacing  # per-axis scale is dk / n_axis

    def kernel(seed_ref, smooth_ref, lk0_ref, inv_dlk_ref, stab_ref,
               *out_refs):
        i = pl.program_id(0)
        j1 = pl.program_id(1)
        j2 = pl.program_id(2)
        if shard_lanes is not None:
            off_ref, *out_refs = out_refs
            i = i + off_ref[0]
            j2 = j2 + off_ref[1]
        # hardware seeding accepts at most 2 values: fold the 3-D tile
        # coordinate into one stream index (GLOBAL coordinates in shard
        # mode — shard unions reproduce the single-device stream)
        pltpu.prng_seed(seed_ref[0], (i * n1_tiles + j1) * n2_tiles + j2)

        # |k|^2 for this tile: axis 0 index is i, axes 1-2 via iota (+ tile
        # offsets along the tiled axes)
        a1 = jax.lax.broadcasted_iota(jnp.int32, (blk1, d2t), 0) + j1 * blk1
        a2 = jax.lax.broadcasted_iota(jnp.int32, (blk1, d2t), 1) + j2 * d2t
        kx = (dk / nx) * _signed_index(i, nx).astype(jnp.float32)
        if layout == "xyz":
            k1 = (dk / ny) * _signed_index(a1, ny).astype(jnp.float32)
            k2 = (dk / nz) * a2.astype(jnp.float32)  # rfft axis: 0..nzh-1
        else:
            k1 = (dk / nz) * a1.astype(jnp.float32)
            k2 = (dk / ny) * _signed_index(a2, ny).astype(jnp.float32)
        ksq = kx * kx + k1 * k1 + k2 * k2

        # sigma(|k|) via the shared in-VMEM table interp; lk is reused by
        # the binned variant's affine bin index below
        lk = _HALF_INV_LN10 * jnp.log(jnp.where(ksq > 0, ksq, 1.0))
        sig = _interp_sigma_tile(
            lk, ksq, lk0_ref, inv_dlk_ref, stab_ref,
            m_seg, width, n_knots, blk1, d2t,
        )

        # Box-Muller from two independent uint32 lattices
        b1 = pltpu.bitcast(pltpu.prng_random_bits((blk1, d2t)), jnp.uint32)
        b2 = pltpu.bitcast(pltpu.prng_random_bits((blk1, d2t)), jnp.uint32)
        # >> 8 leaves 24 bits, so the int32 round-trip is exact (Mosaic
        # has no direct uint32 -> float32 cast)
        u1 = (b1 >> 8).astype(jnp.int32).astype(jnp.float32) * _INV_2_24 + (
            0.5 * _INV_2_24
        )
        u2 = (b2 >> 8).astype(jnp.int32).astype(jnp.float32) * _INV_2_24
        s = smooth_ref[0]
        base = sig * _INV_SQRT2

        if bins is None:
            re_ref, im_ref = out_refs
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            theta = _TWO_PI * u2
            zre = r * jnp.cos(theta)
            zim = r * jnp.sin(theta)

            # exp(0) == 1 exactly, so branching on s == 0 is
            # bit-identical to always applying the filter — it just
            # skips one transcendental per mode in the (common)
            # unsmoothed case
            @pl.when(s == 0.0)
            def _():
                re_ref[0] = base * zre
                im_ref[0] = base * zim

            @pl.when(s != 0.0)
            def _():
                amp = base * jnp.exp(-0.5 * ksq * s * s)
                re_ref[0] = amp * zre
                im_ref[0] = amp * zim

            return

        acc_ref, pre_ref, pim_ref = out_refs
        nb, le0, inv_dle = bins
        vol = float(nx) * float(ny) * float(nz) * float(spacing) ** 3
        # |c|^2 needs no angle: |z|^2 = r^2 = -2 ln u1 — the full-tile
        # trig of the re/im tail is skipped entirely
        r2 = -2.0 * jnp.log(u1)
        amp = base * jnp.exp(-0.5 * ksq * s * s)  # == base at s == 0
        pv = (amp * amp) * r2 * vol
        # affine bin index: the estimator's edges are uniform in
        # log10 k (validate/stats._bin_setup) and lk is already here
        t_b = (lk - le0) * inv_dle
        idx = t_b.astype(jnp.int32)  # trunc == floor for t_b >= 0
        is_plane = a1 == 0
        if nz % 2 == 0:
            is_plane = is_plane | (a1 == nz // 2)
        valid = (
            (t_b >= 0.0) & (idx < nb)
            & jnp.logical_not(is_plane) & (ksq > 0.0)
        )
        w = jnp.where(valid, 2.0, 0.0)  # interior Hermitian multiplicity
        wp = w * pv
        wk = w * jnp.sqrt(ksq)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        row8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        upd = jnp.zeros((8, 128), jnp.float32)
        for b in range(nb):
            m = idx == b
            sw = jnp.sum(jnp.where(m, w, 0.0))
            sp = jnp.sum(jnp.where(m, wp, 0.0))
            sk = jnp.sum(jnp.where(m, wk, 0.0))
            vals = jnp.where(
                row8 == 0, sw,
                jnp.where(row8 == 1, sp, jnp.where(row8 == 2, sk, 0.0)),
            )
            upd = upd + jnp.where(lane8 == b, vals, 0.0)
        first = (
            (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
            & (pl.program_id(2) == 0)
        )

        @pl.when(first)
        def _():
            acc_ref[...] = upd

        @pl.when(jnp.logical_not(first))
        def _():
            acc_ref[...] = acc_ref[...] + upd

        # raw draws of the self-conjugate planes for the caller's
        # Hermitian fixup + binning (same values the re/im tail writes:
        # same stream, same op association)
        rows_re = []
        rows_im = []
        for prow in ((0, nz // 2) if nz % 2 == 0 else (0,)):
            u1p = u1[prow:prow + 1, :]
            u2p = u2[prow:prow + 1, :]
            ap = amp[prow:prow + 1, :]
            rp = jnp.sqrt(-2.0 * jnp.log(u1p))
            thp = _TWO_PI * u2p
            rows_re.append(ap * (rp * jnp.cos(thp)))
            rows_im.append(ap * (rp * jnp.sin(thp)))
        pre_ref[0] = jnp.concatenate(rows_re, axis=0)
        pim_ref[0] = jnp.concatenate(rows_im, axis=0)

    return kernel, (nx, d1, d2, blk1, d2t, n1_tiles, n2_tiles)


@functools.partial(
    jax.jit, static_argnames=("shape", "spacing", "layout", "interpret")
)
def _sample_jit_reim(seed, smoothing_length, lk0, inv_dlk, stab, shape,
                     spacing, layout, interpret):
    """Kernel + Hermitian fixup entirely on re/im lattices ('xzy' only).

    Same draws and same fixup math as :func:`_sample_jit` (asserted in
    tests), but no complex array is ever formed — the entry stage of the
    re/im-native staged pipeline (engine/staged.py v3).
    """
    if layout != "xzy":
        raise ValueError("the re/im sampling path is staged-only (xzy)")
    kernel, (nx, d1, d2, blk1, d2t, n1_tiles, n2_tiles) = _make_kernel(
        shape, spacing, layout
    )
    out = jax.ShapeDtypeStruct((nx, d1, d2), stab.dtype)
    row = pl.BlockSpec(
        (1, blk1, d2t), lambda i, j1, j2: (i, j1, j2), memory_space=pltpu.VMEM
    )
    re, im = pl.pallas_call(
        kernel,
        grid=(nx, n1_tiles, n2_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(row, row),
        out_shape=(out, out),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray([seed], jnp.int32).ravel(),
        jnp.asarray([smoothing_length], stab.dtype).ravel(),
        jnp.asarray([lk0], stab.dtype).ravel(),
        jnp.asarray([inv_dlk], stab.dtype).ravel(),
        stab,
    )
    nz = shape[2]
    from randomfield_tpu.ops import grid as _grid

    for p in _grid.self_conjugate_kz_planes(nz):
        fre, fim = _transform._symmetrize_plane_reim(
            re[:, p, :], im[:, p, :], True
        )
        re = re.at[:, p, :].set(fre)
        im = im.at[:, p, :].set(fim)
    return re, im


@functools.partial(
    jax.jit, static_argnames=("shape", "spacing", "interpret"),
    donate_argnums=(0, 1),
)
def _scale_jit_reim(re, im, smoothing_length, lk0, inv_dlk, stab, shape,
                    spacing, interpret):
    """Multiply (re, im) 'xzy' lattices by sigma(|k|) * filter, in place.

    The sigma-interp half of the sampling kernel without the PRNG: used
    by the Threefry staged pipeline, whose draws come from jax.random
    (the canonical chunked stream) rather than the hardware PRNG.  The
    kernel's HBM traffic is one read + one aliased write per lattice —
    no materialized sigma grid exists (the round-3 Threefry staged path
    kept a 2 GiB resident (nx, nzh, ny) grid at 1024^3 and read it every
    render).  PRNG-free, so Mosaic interpret mode exercises the real
    arithmetic on CPU (unlike the sampling kernels, whose interpreted
    prng_random_bits is stubbed to zeros).
    """
    nx, ny, nz = shape
    nzh = nz // 2 + 1
    d1, d2, d2t, blk1, n1_tiles, n2_tiles = _tile_geometry(shape, "xzy")
    m_seg, width, n_knots = _segment_rows(shape, "xzy")
    dk = _TWO_PI / spacing

    def kernel(smooth_ref, lk0_ref, inv_dlk_ref, stab_ref, re_ref, im_ref,
               ore_ref, oim_ref):
        i = pl.program_id(0)
        j1 = pl.program_id(1)
        j2 = pl.program_id(2)
        a1 = jax.lax.broadcasted_iota(jnp.int32, (blk1, d2t), 0) + j1 * blk1
        a2 = jax.lax.broadcasted_iota(jnp.int32, (blk1, d2t), 1) + j2 * d2t
        kx = (dk / nx) * _signed_index(i, nx).astype(jnp.float32)
        k1 = (dk / nz) * a1.astype(jnp.float32)  # rfft axis: 0..nzh-1
        k2 = (dk / ny) * _signed_index(a2, ny).astype(jnp.float32)
        ksq = kx * kx + k1 * k1 + k2 * k2
        lk = _HALF_INV_LN10 * jnp.log(jnp.where(ksq > 0, ksq, 1.0))
        sig = _interp_sigma_tile(
            lk, ksq, lk0_ref, inv_dlk_ref, stab_ref,
            m_seg, width, n_knots, blk1, d2t,
        )
        s = smooth_ref[0]

        @pl.when(s == 0.0)
        def _():
            ore_ref[0] = sig * re_ref[0]
            oim_ref[0] = sig * im_ref[0]

        @pl.when(s != 0.0)
        def _():
            amp = sig * jnp.exp(-0.5 * ksq * s * s)
            ore_ref[0] = amp * re_ref[0]
            oim_ref[0] = amp * im_ref[0]

    out = jax.ShapeDtypeStruct((nx, d1, d2), stab.dtype)
    row = pl.BlockSpec(
        (1, blk1, d2t), lambda i, j1, j2: (i, j1, j2), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(nx, n1_tiles, n2_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            row,
            row,
        ],
        out_specs=(row, row),
        out_shape=(out, out),
        input_output_aliases={4: 0, 5: 1},
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray([smoothing_length], stab.dtype).ravel(),
        jnp.asarray([lk0], stab.dtype).ravel(),
        jnp.asarray([inv_dlk], stab.dtype).ravel(),
        stab,
        re,
        im,
    )


@functools.partial(
    jax.jit, static_argnames=("shape", "spacing", "interpret"),
    donate_argnums=(0, 1),
)
def scale_shard_pallas_reim(re, im, smoothing_length, lk0, inv_dlk, stab,
                            x_off, y_off, shape, spacing, interpret=False):
    """Shard-local sigma(|k|) * filter scale of 'xyz'-layout re/im blocks.

    ``re``/``im``: (nx_loc, ny_loc, nzh) blocks of the global 'xyz'
    half-spectrum covering x rows [x_off, x_off + nx_loc) and y rows
    [y_off, y_off + ny_loc); the multipliers are evaluated from GLOBAL
    indices, so the union over shards equals the single-device scale
    exactly — this is the :func:`_scale_jit_reim` arithmetic running
    per mesh shard (parallel/render.py), replacing the materialized
    sharded sigma grid the round-4 mesh Threefry programs read
    (VERDICT r4 item 3: ~2 GiB resident + one read per render at
    1024^3; the pure-jnp inline interpolation alternative measured
    ~7 s/render under GSPMD).  ``x_off``/``y_off`` are runtime scalars
    (``jax.lax.axis_index`` products inside shard_map).  ``stab`` is a
    layout='xyz' SigmaTable's segment-row array.  PRNG-free, so Mosaic
    interpret mode exercises the real arithmetic on CPU meshes.
    """
    nx, ny, nz = shape
    nzh = nz // 2 + 1
    d0l, d1l = int(re.shape[0]), int(re.shape[1])
    d2 = nzh
    d2t = min(d2, 128)
    n2_tiles = pl.cdiv(d2, d2t)
    pad = n2_tiles * d2t - d2
    if pad and interpret:
        # the Mosaic interpreter cannot mask a ragged lane edge (the
        # compiled kernel does, like the 'xyz' sampling kernel's);
        # pad/slice only in the CPU-test configuration
        re = jnp.pad(re, ((0, 0), (0, 0), (0, pad)))
        im = jnp.pad(im, ((0, 0), (0, 0), (0, pad)))
        d2 = d2 + pad
    blk1 = d1l
    while blk1 * d2t * 4 * 7 > 10 * 2**20:
        blk1 = (blk1 + 1) // 2
    if blk1 != d1l:
        blk1 = max(8, ((blk1 + 7) // 8) * 8)
    n1_tiles = pl.cdiv(d1l, blk1)
    m_seg, width, n_knots = _segment_rows(shape, "xyz")
    if stab.shape != (m_seg, width):
        raise ValueError(
            f"sigma table shape {stab.shape} != required {(m_seg, width)} "
            f"for shape {shape}, layout 'xyz'"
        )
    dk = _TWO_PI / spacing

    def kernel(smooth_ref, lk0_ref, inv_dlk_ref, off_ref, stab_ref,
               re_ref, im_ref, ore_ref, oim_ref):
        i = pl.program_id(0) + off_ref[0]
        j1 = pl.program_id(1)
        j2 = pl.program_id(2)
        a1 = (jax.lax.broadcasted_iota(jnp.int32, (blk1, d2t), 0)
              + j1 * blk1 + off_ref[1])
        a2 = jax.lax.broadcasted_iota(jnp.int32, (blk1, d2t), 1) + j2 * d2t
        kx = (dk / nx) * _signed_index(i, nx).astype(jnp.float32)
        k1 = (dk / ny) * _signed_index(a1, ny).astype(jnp.float32)
        k2 = (dk / nz) * a2.astype(jnp.float32)  # rfft axis: 0..nzh-1
        ksq = kx * kx + k1 * k1 + k2 * k2
        lk = _HALF_INV_LN10 * jnp.log(jnp.where(ksq > 0, ksq, 1.0))
        sig = _interp_sigma_tile(
            lk, ksq, lk0_ref, inv_dlk_ref, stab_ref,
            m_seg, width, n_knots, blk1, d2t,
        )
        s = smooth_ref[0]

        @pl.when(s == 0.0)
        def _():
            ore_ref[0] = sig * re_ref[0]
            oim_ref[0] = sig * im_ref[0]

        @pl.when(s != 0.0)
        def _():
            amp = sig * jnp.exp(-0.5 * ksq * s * s)
            ore_ref[0] = amp * re_ref[0]
            oim_ref[0] = amp * im_ref[0]

    out = jax.ShapeDtypeStruct((d0l, d1l, d2), stab.dtype)
    row = pl.BlockSpec(
        (1, blk1, d2t), lambda i, j1, j2: (i, j1, j2), memory_space=pltpu.VMEM
    )
    ore, oim = pl.pallas_call(
        kernel,
        grid=(d0l, n1_tiles, n2_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            row,
            row,
        ],
        out_specs=(row, row),
        out_shape=(out, out),
        input_output_aliases={5: 0, 6: 1},
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray([smoothing_length], stab.dtype).ravel(),
        jnp.asarray([lk0], stab.dtype).ravel(),
        jnp.asarray([inv_dlk], stab.dtype).ravel(),
        jnp.stack([jnp.asarray(x_off, jnp.int32),
                   jnp.asarray(y_off, jnp.int32)]),
        stab,
        re,
        im,
    )
    if pad and interpret:
        ore = ore[..., :nzh]
        oim = oim[..., :nzh]
    return ore, oim


def sample_shard_pallas_reim(seed, smoothing_length, lk0, inv_dlk, stab,
                             tile_offset, shape, spacing, shard_lanes,
                             interpret=False, row_offset=0,
                             shard_rows=None):
    """One shard of the global 'xzy' hardware-PRNG sampled spectrum.

    Returns UNSYMMETRIZED (shard_rows, nzh, shard_lanes) re/im f32
    lattices covering x rows [row_offset, row_offset + shard_rows)
    (default: all of x — the slab case) and y lanes
    [tile_offset*128, tile_offset*128 + shard_lanes): draws, sigma
    interp and filter are the sampling kernel's, seeded and indexed by
    GLOBAL tile coordinates, so the union over shards is bit-identical
    to ``sample_spectrum_pallas_reim`` minus its Hermitian fixup
    (which the mesh caller applies at the jit level — the
    conjugate-partner flips are cross-shard collectives).
    ``tile_offset`` (128-lane tile units) and ``row_offset`` are
    runtime scalars: inside shard_map they come from
    ``jax.lax.axis_index``.
    """
    nx, ny, nz = shape
    rows = nx if shard_rows is None else int(shard_rows)
    kernel, (_, d1, _, blk1, d2t, n1_tiles, _) = _make_kernel(
        shape, spacing, "xzy", shard_lanes=int(shard_lanes)
    )
    out = jax.ShapeDtypeStruct((rows, d1, int(shard_lanes)), stab.dtype)
    row = pl.BlockSpec(
        (1, blk1, d2t), lambda i, j1, j2: (i, j1, j2), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(rows, n1_tiles, int(shard_lanes) // 128),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(row, row),
        out_shape=(out, out),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(smoothing_length, stab.dtype).reshape(1),
        jnp.asarray(lk0, stab.dtype).reshape(1),
        jnp.asarray(inv_dlk, stab.dtype).reshape(1),
        stab,
        jnp.stack([
            jnp.asarray(row_offset, jnp.int32).reshape(()),
            jnp.asarray(tile_offset, jnp.int32).reshape(()),
        ]),
    )


def scale_spectrum_pallas_reim(re, im, table, shape, spacing,
                               smoothing_length=0.0, interpret=False):
    """sigma(|k|) * Gaussian-filter scale of 'xzy' re/im lattices.

    ``re``/``im`` are DONATED (the kernel writes through aliased
    buffers).  ``table`` is a :class:`SigmaTable` built with
    layout='xzy'.  Reference parity: powertools' tabulate_sigmas
    interpolation + filter_modes applied as one in-place pass.
    """
    lk0, dlk, stab = table
    stab = jnp.asarray(stab)
    m, d2, _ = _segment_rows(shape, "xzy")
    if stab.shape != (m, d2):
        raise ValueError(
            f"sigma table shape {stab.shape} != required {(m, d2)} for "
            f"shape {shape}, layout 'xzy'"
        )
    return _scale_jit_reim(
        re, im, smoothing_length, float(lk0), 1.0 / float(dlk), stab,
        tuple(int(s) for s in shape), float(spacing), bool(interpret)
    )


def sample_spectrum_pallas_reim(seed, table, shape, spacing,
                                smoothing_length=0.0, interpret=False):
    """Sampled spectrum as (re, im) float32 lattices, layout 'xzy'.

    Same stream, scaling, filtering and Hermitian fixup as
    :func:`sample_spectrum_pallas` — the complex array is simply never
    formed (the v3 staged pipeline consumes re/im directly).
    """
    lk0, dlk, stab = table
    stab = jnp.asarray(stab)
    m, d2, _ = _segment_rows(shape, "xzy")
    if stab.shape != (m, d2):
        raise ValueError(
            f"sigma table shape {stab.shape} != required {(m, d2)} for "
            f"shape {shape}, layout 'xzy'"
        )
    return _sample_jit_reim(
        int(seed) & 0x7FFFFFFF, smoothing_length, float(lk0),
        1.0 / float(dlk), stab,
        tuple(int(s) for s in shape), float(spacing), "xzy", bool(interpret)
    )


def sample_power_bins_reim(seed, smoothing_length, lk0, inv_dlk, stab,
                           shape, spacing, nbins, le0, inv_dle,
                           interpret=False):
    """Traceable core of the in-kernel binned ``sample_power``.

    Returns ``(acc, plane_re, plane_im)``: ``acc`` is an (8, 128) f32
    block whose rows 0..2 hold the interior modes' per-bin
    (sum w, sum w |c|^2 V, sum w |k|) in lanes [0, nbins); ``plane_re``
    / ``plane_im`` are the raw (nx, n_planes, ny) draws of the
    self-conjugate kz planes (kz = 0, and Nyquist for even nz), to be
    Hermitian-fixed and binned by the caller (engine/staged.py:
    _sample_power_v3).  ``le0`` / ``inv_dle`` are the log10-k offset
    and inverse step of the estimator's uniform-in-log10 bin edges.
    Check :func:`can_bin_sample` first.
    """
    shape = tuple(int(s) for s in shape)
    kernel, (nx, d1, d2, blk1, d2t, n1_tiles, n2_tiles) = _make_kernel(
        shape, float(spacing), "xzy",
        bins=(int(nbins), float(le0), float(inv_dle)),
    )
    nz = shape[2]
    n_planes = 2 if nz % 2 == 0 else 1
    acc_shape = jax.ShapeDtypeStruct((8, 128), jnp.float32)
    plane_shape = jax.ShapeDtypeStruct((nx, n_planes, d2), stab.dtype)
    acc_spec = pl.BlockSpec(
        (8, 128), lambda i, j1, j2: (0, 0), memory_space=pltpu.VMEM
    )
    plane_spec = pl.BlockSpec(
        (1, n_planes, d2t), lambda i, j1, j2: (i, 0, j2),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(nx, n1_tiles, n2_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(acc_spec, plane_spec, plane_spec),
        out_shape=(acc_shape, plane_shape, plane_shape),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray([seed], jnp.int32).ravel(),
        jnp.asarray([smoothing_length], stab.dtype).ravel(),
        jnp.asarray([lk0], stab.dtype).ravel(),
        jnp.asarray([inv_dlk], stab.dtype).ravel(),
        stab,
    )


@functools.partial(
    jax.jit, static_argnames=("shape", "spacing", "layout", "interpret")
)
def _sample_jit(seed, smoothing_length, lk0, inv_dlk, stab, shape, spacing,
                layout, interpret):
    kernel, (nx, d1, d2, blk1, d2t, n1_tiles, n2_tiles) = _make_kernel(
        shape, spacing, layout
    )
    out = jax.ShapeDtypeStruct((nx, d1, d2), stab.dtype)
    row = pl.BlockSpec(
        (1, blk1, d2t), lambda i, j1, j2: (i, j1, j2), memory_space=pltpu.VMEM
    )
    re, im = pl.pallas_call(
        kernel,
        grid=(nx, n1_tiles, n2_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # (m, d2) table rows
        ],
        out_specs=(row, row),
        out_shape=(out, out),
        # the TPU-flavored interpreter understands pltpu prng primitives
        # on CPU (the plain HLO interpreter does not)
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray([seed], jnp.int32).ravel(),
        jnp.asarray([smoothing_length], stab.dtype).ravel(),
        jnp.asarray([lk0], stab.dtype).ravel(),
        jnp.asarray([inv_dlk], stab.dtype).ravel(),
        stab,
    )
    # complex formation + Hermitian plane fixup stay inside this jit: the
    # axon runtime cannot execute eager complex ops or transfer complex
    # arrays across the host boundary
    z = jax.lax.complex(re, im)
    nz = shape[2]
    if layout == "xyz":
        return _transform.symmetrize_with_shape(z, nz=nz, scale_self_conjugate=True)
    from randomfield_tpu.ops import grid as _grid

    for p in _grid.self_conjugate_kz_planes(nz):
        fixed = _transform._symmetrize_plane(z[:, p, :], True)
        z = z.at[:, p, :].set(fixed)
    return z


def sample_spectrum_pallas(seed, table, shape, spacing, smoothing_length=0.0,
                           layout="xyz", interpret=False):
    """Packed spectrum c_k with per-mode std sigma(k) * filter, via Pallas.

    Drop-in alternative to ``sample.sample_spectrum`` +
    ``power.filter_modes`` (different, hardware-PRNG random stream).
    ``seed``: python/int32 scalar.  ``table``: a :class:`SigmaTable`
    from :func:`make_sigma_table` (length must be
    ``table_length(shape, layout)``).  Returns complex64 with the
    Hermitian planes fixed up.
    """
    lk0, dlk, stab = table
    stab = jnp.asarray(stab)
    m, d2, _ = _segment_rows(shape, layout)
    if stab.shape != (m, d2):
        raise ValueError(
            f"sigma table shape {stab.shape} != required {(m, d2)} for "
            f"shape {shape}, layout {layout!r} (build it with "
            f"make_sigma_table)"
        )
    return _sample_jit(
        int(seed) & 0x7FFFFFFF, smoothing_length, float(lk0),
        1.0 / float(dlk), stab,
        tuple(int(s) for s in shape), float(spacing), layout, bool(interpret)
    )
