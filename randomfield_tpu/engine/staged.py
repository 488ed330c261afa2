"""HBM-lean staged render for grids near the single-chip memory ceiling.

A 1024^3 render needs ~4.3 GB per live full-size buffer; the monolithic
jitted render (engine/generator.py) lets XLA schedule the whole 3-D FFT
in one program, whose simultaneous temporaries overflow a 16 GB chip at
that size.  This pipeline makes two structural changes:

1. **(x, kz, y) internal layout.**  TPU arrays tile the last two axes to
   (8, 128); a packed spectrum stored as (nx, ny, nz/2+1) has a 2^k + 1
   minor axis that pads to the next multiple of 128 — a ~25% HBM and
   bandwidth tax on EVERY spectrum buffer at power-of-two grids.  Storing
   spectra as (nx, nzh, ny) puts a 128-multiple on the minor axis (zero
   padding) and the odd kz axis in the sublane dimension (pads 513 -> 520,
   1.4%).  The real-space result transposes back to (nx, ny, nz) chunk by
   chunk, fused with the lightcone weighting.

2. **Separately-jitted stages with donated buffers** so at most two
   full-size arrays (plus one chunk-size temporary) are live at once:

       P1a  unit Hermitian noise (counter-based PRNG)       -> z
       P1b  sigma-scale + Gaussian filter (donates z)        -> c
       P2   complex ifft along x (donates c, aliases in/out) -> c
       P34  per-x-slab: ifft along y + c2r irfft along kz +
            lightcone weighting + transpose to (x, y, z),
            sequenced by lax.map                             -> field

Peak ~= c + field + sigma + chunk temps ~= 11 GB at 1024^3 float32.

This is the single-chip analog of the reference's in-place pyfftw plan
(randomfield/transform.py:Plan); XLA buffer donation is the TPU-native
equivalent of FFTW's in-place transforms.

The staged pipeline's chunked (x, kz, y) draw order IS the canonical
Threefry stream (ops/sample.py:unit_draws): since round 4 the fused and
mesh pipelines draw the same chunked stream and transpose, so one seed
is one realization on every Threefry pipeline (equal to f32 rounding —
sigma scaling and symmetrization apply in different orders).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from randomfield_tpu.ops import grid as _grid
from randomfield_tpu.ops import transform as _transform

__all__ = ["staged_render", "finish_staged", "pick_pipeline", "AUTO_STAGED_THRESHOLD"]

_INV_SQRT2 = 0.7071067811865476

# grids with more cells than this render through the staged pipeline when
# pipeline='auto' (512^3 fits monolithically on a 16 GB chip; 1024^3 does
# not)
AUTO_STAGED_THRESHOLD = 256 * 1024 * 1024


def _pick_chunks(n: int, target: int = 8) -> int:
    """Largest divisor of n that is <= target."""
    for c in range(min(target, n), 0, -1):
        if n % c == 0:
            return c
    return 1


@functools.lru_cache(maxsize=16)
def _stage_p1(shape, spacing, dtype_name):
    """Sampling stage: unit Hermitian noise * sigma * filter, (x, kz, y).

    Shared by the v1 and v2 pipelines so both render the SAME
    realization for a given seed (the staged stream is defined by this
    stage alone).
    """
    from randomfield_tpu.ops.sample import canonical_chunks

    nx, ny, nz = shape
    nzh = nz // 2 + 1
    dtype = jnp.dtype(dtype_name)
    # the ONE chunk definition shared with ops/sample.py:unit_draws —
    # this stage defines the canonical Threefry realization family
    chunks = canonical_chunks(nx)
    planes = _grid.self_conjugate_kz_planes(nz)

    @jax.jit
    def p1(key, sigmas_xzy, smoothing_length, kx, kz, ky):
        # sample + sigma-scale + filter, fully chunked over x-slabs: the
        # only full-size buffer is the output spectrum.  Each slab draws
        # from its own fold_in-derived key (the staged pipeline's stream;
        # deterministic per (seed, shape), distinct from the fused path).
        # k vectors arrive as runtime args: baking k^2 in as a constant
        # would embed a full-grid array in the executable (resident HBM).
        s = jnp.asarray(smoothing_length, dtype)
        cx = nx // chunks
        kx_c = kx.reshape(chunks, cx)
        sig_c = sigmas_xzy.reshape(chunks, cx, nzh, ny)

        def one(args):
            i, kxs, sig = args
            draws = jax.random.normal(
                jax.random.fold_in(key, i), (2, cx, nzh, ny), dtype
            )
            z = jax.lax.complex(draws[0], draws[1]) * jnp.asarray(
                _INV_SQRT2, dtype
            )
            k2 = (
                (kxs * kxs)[:, None, None]
                + (kz * kz)[None, :, None]
                + (ky * ky)[None, None, :]
            )
            return z * (sig * jnp.exp(-0.5 * k2 * s * s)).astype(dtype)

        idx = jnp.arange(chunks, dtype=jnp.uint32)
        c = jax.lax.map(one, (idx, kx_c, sig_c)).reshape(nx, nzh, ny)
        # Hermitian fixup of the self-conjugate kz planes (cross-slab
        # conjugate pairs regenerate cheaply at O(N^2))
        for p in planes:
            fixed = _transform._symmetrize_plane(c[:, p, :], True)
            c = c.at[:, p, :].set(fixed)
        return c

    return p1


@functools.lru_cache(maxsize=16)
def _stage_p1_reim(shape, spacing, dtype_name):
    """:func:`_stage_p1` emitting separate re/im f32 lattices.

    Identical draws, scaling and symmetrization (the canonical chunked
    Threefry stream), but no complex array is ever formed — the output
    feeds :func:`finish_staged_reim` (the v3 Pallas-CT transform path)
    directly.  Two f32 lattices in flight instead of one complex64 also
    lowers the peak by keeping every later stage's donate-in/out pairs
    half-sized, which is what lets a 1024^3 render complete while the
    caller still holds a previous 4 GiB field (the v2 complex path OOMs
    there — round-4 measurement: ~12.5 GiB pipeline peak vs ~8.5 GiB
    for this one on a 16 GiB chip).
    """
    from randomfield_tpu.ops.sample import canonical_chunks

    nx, ny, nz = shape
    nzh = nz // 2 + 1
    dtype = jnp.dtype(dtype_name)
    chunks = canonical_chunks(nx)
    planes = _grid.self_conjugate_kz_planes(nz)

    @jax.jit
    def p1(key, sigmas_xzy, smoothing_length, kx, kz, ky):
        s = jnp.asarray(smoothing_length, dtype)
        cx = nx // chunks
        kx_c = kx.reshape(chunks, cx)
        sig_c = sigmas_xzy.reshape(chunks, cx, nzh, ny)

        def one(args):
            i, kxs, sig = args
            draws = jax.random.normal(
                jax.random.fold_in(key, i), (2, cx, nzh, ny), dtype
            )
            k2 = (
                (kxs * kxs)[:, None, None]
                + (kz * kz)[None, :, None]
                + (ky * ky)[None, None, :]
            )
            amp = (
                jnp.asarray(_INV_SQRT2, dtype)
                * (sig * jnp.exp(-0.5 * k2 * s * s)).astype(dtype)
            )
            return draws[0] * amp, draws[1] * amp

        idx = jnp.arange(chunks, dtype=jnp.uint32)
        re, im = jax.lax.map(one, (idx, kx_c, sig_c))
        re = re.reshape(nx, nzh, ny)
        im = im.reshape(nx, nzh, ny)
        for p in planes:
            fre, fim = _transform._symmetrize_plane_reim(
                re[:, p, :], im[:, p, :], True
            )
            re = re.at[:, p, :].set(fre)
            im = im.at[:, p, :].set(fim)
        return re, im

    return p1


@functools.lru_cache(maxsize=16)
def _stage_p1_unit(shape, dtype_name):
    """Canonical chunked UNIT draws as re/im lattices, symmetrized.

    The sigma * filter scaling is deliberately absent: it is applied by
    the in-place Pallas table-interp kernel
    (ops/pallas_sampler.py:scale_spectrum_pallas_reim), so no sigma grid
    is ever tabulated or resident.  Scaling after symmetrization equals
    scaling before it: sigma and the Gaussian filter depend only on
    |k|^2, which is bit-identical between Hermitian partners (signed
    index negation squares away in f32).
    """
    from randomfield_tpu.ops.sample import canonical_chunks

    nx, ny, nz = shape
    nzh = nz // 2 + 1
    dtype = jnp.dtype(dtype_name)
    chunks = canonical_chunks(nx)
    planes = _grid.self_conjugate_kz_planes(nz)

    @jax.jit
    def p1(key):
        cx = nx // chunks
        inv = jnp.asarray(_INV_SQRT2, dtype)

        def one(i):
            draws = jax.random.normal(
                jax.random.fold_in(key, i), (2, cx, nzh, ny), dtype
            )
            return draws[0] * inv, draws[1] * inv

        idx = jnp.arange(chunks, dtype=jnp.uint32)
        re, im = jax.lax.map(one, idx)
        re = re.reshape(nx, nzh, ny)
        im = im.reshape(nx, nzh, ny)
        for p in planes:
            fre, fim = _transform._symmetrize_plane_reim(
                re[:, p, :], im[:, p, :], True
            )
            re = re.at[:, p, :].set(fre)
            im = im.at[:, p, :].set(fim)
        return re, im

    return p1


def render_v3_threefry(key, table, shape, spacing, dtype_name, weights,
                       smoothing_length, interpret=False):
    """Threefry staged render with NO sigma grid: unit draws -> in-place
    Pallas sigma-interp scale -> v3 re/im transform stages.

    Same canonical realization stream as :func:`staged_render` (identical
    draws; sigma comes from the resampled uniform log10-k table instead
    of tabulate_sigmas — equal to well below the statistical gates, see
    ops/pallas_sampler.py:make_sigma_table).  Peak HBM = the two f32
    lattices plus stage temporaries: a 1024^3 render completes on a
    16 GiB chip while the caller holds a previous field, which the
    complex v2 path (~12.5 GiB peak + 2 GiB resident sigma grid) cannot.
    """
    from randomfield_tpu.ops import pallas_sampler as _ps

    shape = tuple(shape)
    p1 = _stage_p1_unit(shape, dtype_name)
    re, im = p1(key)
    re, im = _ps.scale_spectrum_pallas_reim(
        re, im, table, shape, float(spacing), smoothing_length,
        interpret=interpret,
    )
    return finish_staged_reim(re, im, weights, shape, spacing, dtype_name)


def _ifft_minor_fast(t):
    """Minor-axis inverse FFT; optionally the Pallas CT kernel on TPU.

    The Pallas kernel (ops/pallas_fft.py) wins the chained-marginal
    microbenchmark (~37 ms vs the native kernel's ~58 ms per 2.2 GB
    1024-pt pass on the v5e) but LOSES end-to-end inside p2/p3 at the
    1024^3 ceiling (721 ms vs 664 ms render): its complex->re/im split,
    digit-reorder, and re-complex passes add HBM traffic that the
    isolated chain amortizes.  Until the staged pipeline carries re/im
    lattices natively (which would also feed the sampler's output
    straight in), the native kernel stays the default; opt in with
    RF_PALLAS_FFT=1.  docs/performance.md has the full measurement.
    """
    from randomfield_tpu.ops import pallas_fft

    if (
        os.environ.get("RF_PALLAS_FFT", "0") == "1"
        and pallas_fft.can_pallas_fft(t.shape[-1])
    ):
        try:
            on_tpu = jax.devices()[0].platform != "cpu"
        except Exception:
            on_tpu = False
        if on_tpu:
            return pallas_fft.ifft_minor_pallas(t)
    return _transform.ifft_minor(t)


@functools.lru_cache(maxsize=16)
def _stages(shape, spacing, dtype_name):
    nx, ny, nz = shape
    nzh = nz // 2 + 1
    # the c2r tail's DFT temporaries are the tightest allocation at the
    # 16 GB ceiling — use finer slabs there
    tail_chunks = _pick_chunks(nx, 64 if nx * ny * nz > AUTO_STAGED_THRESHOLD else 8)

    p1 = _stage_p1(shape, spacing, dtype_name)

    _B = jax.lax.optimization_barrier

    @functools.partial(jax.jit, donate_argnums=0)
    def p2(c):
        # ifft along x via a barrier-pinned physical transpose, on the
        # fastest correct minor-axis kernel (see _ifft_minor_fast)
        t = _B(jnp.transpose(c, (1, 2, 0)))  # (nzh, ny, nx)
        return _ifft_minor_fast(t)

    @functools.partial(jax.jit, donate_argnums=0)
    def p3(a):
        # ifft along y, then restore the x-major order the tail maps over
        t = _B(jnp.transpose(a, (0, 2, 1)))  # (nzh, nx, ny)
        t = _ifft_minor_fast(t)
        return _B(jnp.transpose(t, (1, 0, 2)))  # (nx, nzh, ny)

    @functools.partial(jax.jit, donate_argnums=0)
    def p4(c, weights):
        # per x-slab: c2r along kz via Hermitian extension on the minor
        # axis + lightcone weighting; lax.map sequences chunk temporaries
        ck = c.reshape(tail_chunks, nx // tail_chunks, nzh, ny)

        def one(chunk):
            t = _B(jnp.transpose(chunk, (0, 2, 1)))  # (cx, ny, nzh)
            f = _transform.irfft_minor(t, nz)  # (cx, ny, nz) real
            return f * weights[None, None, :]

        return jax.lax.map(one, ck).reshape(nx, ny, nz)

    return p1, p2, p3, p4


def _can_v2(shape) -> bool:
    """v2 needs composite nx/ny and an even nz with composite nz/2."""
    from randomfield_tpu.ops.ctfft import can_ct

    nx, ny, nz = shape
    return (
        can_ct(nx) and can_ct(ny) and nz % 2 == 0
        and (nz // 2 == 1 or can_ct(nz // 2))
    )


def _pipeline_version(shape) -> str:
    env = os.environ.get("RF_STAGED_PIPELINE", "")
    if env in ("v1", "v2"):
        return env
    return "v2" if _can_v2(tuple(shape)) else "v1"


@functools.lru_cache(maxsize=16)
def _stages_v2(shape, spacing, dtype_name):
    """v2 = v1 with the c2r tail upgraded to the half-length pack.

    Measured reality on the axon v5e (documented in
    docs/performance.md): every extra program boundary costs ~30-60 ms
    of dispatch/sync, and fused transpose+einsum programs at 1024^3
    OOM (a transpose's donation is never usable, so such a program
    holds three full-size buffers plus the complex einsum's real/imag
    decomposition temporaries).  A full "CT-einsum everywhere,
    transpose-free" pipeline was built and benchmarked at 1.11 s vs
    v1's 0.82 s — the boundary overhead ate the kernel gains.

    What survives is the one upgrade with NO new boundaries: p4's c2r
    runs per x-slab as the half-length complex pack
    (ops/ctfft.py:irfft_half_axis) — an nz/2-point CT einsum inverse
    replaces the Hermitian extension + nz-point native inverse (4x
    less matmul work, half the intermediate bytes), inside the same
    chunked lax.map program shape as v1.
    """
    from randomfield_tpu.ops import ctfft

    nx, ny, nz = shape
    nzh = nz // 2 + 1
    tail_chunks = _pick_chunks(nx, 64 if nx * ny * nz > AUTO_STAGED_THRESHOLD else 8)
    _Bar = jax.lax.optimization_barrier

    _, p2, p3, _ = _stages(shape, spacing, dtype_name)

    @jax.jit
    def p4(c, weights):
        # no donate: a real output cannot alias a complex input, and
        # marking it only emits the XLA "not usable" warning
        ck = c.reshape(tail_chunks, nx // tail_chunks, nzh, ny)

        def one(chunk):
            f = ctfft.irfft_half_axis(chunk, nz, 1)  # (cx, nz, ny) real
            f = _Bar(jnp.transpose(f, (0, 2, 1)))    # (cx, ny, nz)
            return f * weights[None, None, :]

        return jax.lax.map(one, ck).reshape(nx, ny, nz)

    return p2, p3, p4


def can_v3(shape) -> bool:
    """v3 (re/im-native + Pallas CT transforms) shape support."""
    from randomfield_tpu.ops.ctfft import can_ct
    from randomfield_tpu.ops.pallas_fft import can_pallas_fft

    nx, ny, nz = shape
    return (
        can_pallas_fft(nx) and can_pallas_fft(ny)
        and nz % 2 == 0 and (nz // 2 == 1 or can_ct(nz // 2))
    )


def _use_v3(shape) -> bool:
    env = os.environ.get("RF_STAGED_PIPELINE", "")
    if env in ("v1", "v2"):
        return False
    if not can_v3(tuple(shape)):
        return False
    try:
        return jax.devices()[0].platform != "cpu"  # Pallas compiled path
    except Exception:
        return False


@functools.lru_cache(maxsize=16)
def _stages_v3_merged(shape, spacing, dtype_name):
    """Experimental p2+p3 fusion with folded digit permutations.

    One program runs both complex transform passes; the kernels emit
    raw digit order (reorder=False) and the permutations ride existing
    data movements: x's inside the closing transpose-gather, y's inside
    p4's per-chunk transpose-gather.  Select with RF_STAGED_V3_MERGE=1.
    """
    from randomfield_tpu.ops import ctfft, pallas_fft

    nx, ny, nz = shape
    nzh = nz // 2 + 1
    tail_chunks = _pick_chunks(nx, 64 if nx * ny * nz > AUTO_STAGED_THRESHOLD else 8)
    _Bar = jax.lax.optimization_barrier
    permx = pallas_fft.digit_perm(nx)
    permy = pallas_fft.digit_perm(ny)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def p23(re, im):
        tre = _Bar(jnp.transpose(re, (1, 2, 0)))   # (nzh, ny, nx)
        tim = _Bar(jnp.transpose(im, (1, 2, 0)))
        gre, gim = pallas_fft.ifft_minor_pallas_reim(tre, tim, reorder=False)
        tre = _Bar(jnp.transpose(gre, (0, 2, 1)))  # (nzh, x^G, ny)
        tim = _Bar(jnp.transpose(gim, (0, 2, 1)))
        gre, gim = pallas_fft.ifft_minor_pallas_reim(tre, tim, reorder=False)
        px = jnp.asarray(permx)
        outre = _Bar(jnp.take(jnp.transpose(gre, (1, 0, 2)), px, axis=0))
        outim = _Bar(jnp.take(jnp.transpose(gim, (1, 0, 2)), px, axis=0))
        return outre, outim                        # (nx, nzh, y^G)

    m_len = nz // 2
    use_pallas_tail = pallas_fft.can_pallas_fft(m_len)
    theta = 2.0 * np.pi * np.arange(m_len) / nz
    wr_np = np.cos(theta).astype(np.float32)
    wi_np = np.sin(theta).astype(np.float32)

    @jax.jit
    def p4(re, im, weights):
        ck_re = re.reshape(tail_chunks, nx // tail_chunks, nzh, ny)
        ck_im = im.reshape(tail_chunks, nx // tail_chunks, nzh, ny)
        py = jnp.asarray(permy)

        def one_pallas(args):
            cr, ci = args
            # transpose + y digit-fix in one gather pass each
            cr = _Bar(jnp.take(jnp.transpose(cr, (0, 2, 1)), py, axis=1))
            ci = _Bar(jnp.take(jnp.transpose(ci, (0, 2, 1)), py, axis=1))
            head_re = cr[..., :m_len]
            head_im = ci[..., :m_len]
            rev_re = cr[..., 1:m_len + 1][..., ::-1]
            rev_im = ci[..., 1:m_len + 1][..., ::-1]
            er = head_re + rev_re
            ei = head_im - rev_im
            orr = head_re - rev_re
            oi = head_im + rev_im
            wr = jnp.asarray(wr_np)[None, None, :]
            wi = jnp.asarray(wi_np)[None, None, :]
            g_re = er - (wr * oi + wi * orr)
            g_im = ei + (wr * orr - wi * oi)
            zre, zim = pallas_fft.ifft_minor_pallas_reim(g_re, g_im)
            pair = jnp.stack([zre, zim], axis=-1)
            f = pair.reshape(*zre.shape[:-1], nz)
            return f * weights[None, None, :]

        def one_einsum(args):
            cr, ci = args
            f = ctfft.irfft_half_axis_reim(cr, ci, nz, 1)
            f = _Bar(jnp.take(jnp.transpose(f, (0, 2, 1)), py, axis=1))
            return f * weights[None, None, :]

        one = one_pallas if use_pallas_tail else one_einsum
        return jax.lax.map(one, (ck_re, ck_im)).reshape(nx, ny, nz)

    return p23, p4


@functools.lru_cache(maxsize=16)
def _stages_v3(shape, spacing, dtype_name):
    """v3 = the re/im-native pipeline: Pallas CT transforms, no complex.

    Between sampling and the c2r tail every array is a separate re/im
    float32 lattice: the Pallas sampler already *produces* re/im, the
    Pallas CT FFT (ops/pallas_fft.py) consumes and emits re/im, and the
    half-pack c2r tail decomposes internally — so the complex
    formation/decomposition HBM passes that made the complex-wrapped
    Pallas FFT a net loss (docs/performance.md) never exist.  Measured:
    1024^3 render 0.664 s (v2+Pallas sampler) -> see docs/performance.md
    for the v3 number.
    """
    from randomfield_tpu.ops import ctfft, pallas_fft

    nx, ny, nz = shape
    nzh = nz // 2 + 1
    tail_chunks = _pick_chunks(nx, 64 if nx * ny * nz > AUTO_STAGED_THRESHOLD else 8)
    _Bar = jax.lax.optimization_barrier

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def p2(re, im):
        # (nx, nzh, ny) -> (nzh, ny, nx), transform over x on the minor
        tre = _Bar(jnp.transpose(re, (1, 2, 0)))
        tim = _Bar(jnp.transpose(im, (1, 2, 0)))
        return pallas_fft.ifft_minor_pallas_reim(tre, tim)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def p3(re, im):
        # transform over y on the minor, back to x-major for the tail
        tre = _Bar(jnp.transpose(re, (0, 2, 1)))  # (nzh, nx, ny)
        tim = _Bar(jnp.transpose(im, (0, 2, 1)))
        gre, gim = pallas_fft.ifft_minor_pallas_reim(tre, tim)
        return (
            _Bar(jnp.transpose(gre, (1, 0, 2))),  # (nx, nzh, ny)
            _Bar(jnp.transpose(gim, (1, 0, 2))),
        )

    m_len = nz // 2
    use_pallas_tail = pallas_fft.can_pallas_fft(m_len)
    theta = 2.0 * np.pi * np.arange(m_len) / nz
    wr_np = np.cos(theta).astype(np.float32)
    wi_np = np.sin(theta).astype(np.float32)

    @jax.jit
    def p4(re, im, weights):
        ck_re = re.reshape(tail_chunks, nx // tail_chunks, nzh, ny)
        ck_im = im.reshape(tail_chunks, nx // tail_chunks, nzh, ny)

        def one_einsum(args):
            cr, ci = args
            f = ctfft.irfft_half_axis_reim(cr, ci, nz, 1)  # (cx, nz, ny)
            f = _Bar(jnp.transpose(f, (0, 2, 1)))          # (cx, ny, nz)
            return f * weights[None, None, :]

        def one_pallas(args):
            # half-pack c2r on the MINOR axis: transpose the chunk once,
            # build the packed G on real minor-axis lattices, run the
            # Pallas CT m-point inverse, interleave even/odd — every
            # step a single pass over chunk-sized data (the einsum tail
            # round-trips HBM per CT stage)
            cr, ci = args
            cr = _Bar(jnp.transpose(cr, (0, 2, 1)))  # (cx, ny, nzh)
            ci = _Bar(jnp.transpose(ci, (0, 2, 1)))
            head_re = cr[..., :m_len]
            head_im = ci[..., :m_len]
            rev_re = cr[..., 1:m_len + 1][..., ::-1]
            rev_im = ci[..., 1:m_len + 1][..., ::-1]
            er = head_re + rev_re
            ei = head_im - rev_im
            orr = head_re - rev_re
            oi = head_im + rev_im
            wr = jnp.asarray(wr_np)[None, None, :]
            wi = jnp.asarray(wi_np)[None, None, :]
            g_re = er - (wr * oi + wi * orr)
            g_im = ei + (wr * orr - wi * oi)
            zre, zim = pallas_fft.ifft_minor_pallas_reim(g_re, g_im)
            # interleave: x[..., 2j] = Re z[j], x[..., 2j+1] = Im z[j]
            pair = jnp.stack([zre, zim], axis=-1)  # (cx, ny, m, 2)
            f = pair.reshape(*zre.shape[:-1], nz)
            return f * weights[None, None, :]

        one = one_pallas if use_pallas_tail else one_einsum
        return jax.lax.map(one, (ck_re, ck_im)).reshape(nx, ny, nz)

    return p2, p3, p4


@functools.lru_cache(maxsize=16)
def _stages_v4(shape, spacing, dtype_name):
    """v4 = v3 with ZERO full-size transposes around the transforms.

    The sublane-FFT kernel (ops/pallas_fft.py:ifft_sublane_pallas_reim)
    transforms the SUBLANE axis of a 2-D view and emits a rotated
    output block, so "physical transpose + minor-axis FFT" collapses
    into one HBM pass:

        sample   (nx, nzh, ny)           re/im lattices
        x-pass   view (nx, nzh*ny)   ->  (nzh*ny, nx^G)   one pass
        y-pass   rows grouped by kz  ->  (nzh*nx^G, ny^G) one pass
        x-fix    take+leading-swap   ->  (nx, nzh, ny^G)  ~copy-speed
        p4       unchanged (_stages_v3_merged.p4: per-chunk transpose
                 folds y's digit perm; half-pack c2r; weights)

    MEASURED NEGATIVE RESULT (kept as an opt-in, not the default): at
    1024^3 the fused v4 render is 0.350 s vs fused v3's 0.333 s, and
    the isolated p23 sections time IDENTICALLY (168 ms both, same
    program harness).  The sublane kernel's strided column-slab reads
    sustain only ~171 GB/s effective (invariant to lane-block size
    256/512/1024, so not DMA-burst-bound), which exactly cancels the
    two eliminated transpose passes.  Select with
    ``RF_STAGED_PIPELINE=v4``; bit-identical output to v3 (asserted
    in tests and verified on hardware at 256^3 and 1024^3).
    """
    from randomfield_tpu.ops import pallas_fft

    nx, ny, nz = shape
    nzh = nz // 2 + 1
    _Bar = jax.lax.optimization_barrier
    permx = pallas_fft.digit_perm(nx)
    _, p4 = _stages_v3_merged(shape, float(spacing), dtype_name)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def p23(re, im):
        # x over sublanes of the (nx, nzh*ny) view -> (nzh*ny, nx^G)
        gre, gim = pallas_fft.ifft_sublane_pallas_reim(
            re.reshape(nx, nzh * ny), im.reshape(nx, nzh * ny), nx
        )
        # y over sublanes, one group per (kz, x) plane -> (nzh*nx, ny^G)
        gre, gim = pallas_fft.ifft_sublane_pallas_reim(gre, gim, ny)
        # undo x's digit order and bring x leading for the tail — a
        # leading-dim gather over contiguous ny rows (~copy speed)
        px = jnp.asarray(permx)
        outre = _Bar(
            jnp.take(gre.reshape(nzh, nx, ny), px, axis=1).transpose(1, 0, 2)
        )
        outim = _Bar(
            jnp.take(gim.reshape(nzh, nx, ny), px, axis=1).transpose(1, 0, 2)
        )
        return outre, outim  # (nx, nzh, ny^G)

    return p23, p4


def can_v4(shape) -> bool:
    """v4 shape support: v3 plus the sublane kernel's column rule."""
    nx, ny, nz = shape
    nzh = nz // 2 + 1
    return can_v3(shape) and (nzh * ny) % 128 == 0 and nx % 128 == 0


def can_v5(shape) -> bool:
    """v5 needs Pallas-transformable nx/ny and a half-pack-able nz."""
    from randomfield_tpu.ops.pallas_fft import can_pallas_fft

    nx, ny, nz = shape
    return (
        can_pallas_fft(nx) and can_pallas_fft(ny)
        and nz % 2 == 0 and can_pallas_fft(nz // 2)
    )


@functools.lru_cache(maxsize=16)
def _stages_v5(shape, spacing, dtype_name):
    """v5 = v3 transforms + the fused c2r tail MEGAKERNEL.

    Two structural upgrades over v3 (measured at 1024^3):

    1. The closing digit-permutation gathers collapse into ONE pure
       transpose per lattice: a digit-order axis D[c*128 + d] is the
       natural axis X[c + A*d], so "fix x digits, fix y digits, bring
       kz minor" is a single 5-D reshape/transpose XLA executes as one
       copy pass, emitting (nx, ny, nzh) in natural order everywhere.

    2. p4's chunked 3-pass tail (transpose-gather, G-build, m-point
       kernel, interleave — each materialized per chunk) becomes ONE
       Pallas kernel (ops/pallas_fft.py:irfft_tail_pallas): half-pack
       G-build, CT inverse, digit-fix + even/odd interleave and the
       lightcone z-weights all in VMEM.  HBM traffic drops to exactly
       read(spectrum) + write(field): measured 38 ms vs p4's 116 ms.
    """
    from randomfield_tpu.ops import pallas_fft

    nx, ny, nz = shape
    nzh = nz // 2 + 1
    _Bar = jax.lax.optimization_barrier
    ax = nx // 128
    ay = ny // 128

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def p23(re, im):
        tre = _Bar(jnp.transpose(re, (1, 2, 0)))   # (nzh, ny, nx)
        tim = _Bar(jnp.transpose(im, (1, 2, 0)))
        gre, gim = pallas_fft.ifft_minor_pallas_reim(tre, tim, reorder=False)
        tre = _Bar(jnp.transpose(gre, (0, 2, 1)))  # (nzh, x^G, ny)
        tim = _Bar(jnp.transpose(gim, (0, 2, 1)))
        gre, gim = pallas_fft.ifft_minor_pallas_reim(tre, tim, reorder=False)

        def close(g):
            # digit order D[c*128+d] = X[c + A*d]: natural x/y are the
            # (d, c) dim orders, so both digit fixes + the kz-minor
            # rotation are ONE transpose
            g5 = g.reshape(nzh, ax, 128, ay, 128)
            return _Bar(g5.transpose(2, 1, 4, 3, 0).reshape(nx, ny, nzh))

        return close(gre), close(gim)              # natural (nx, ny, nzh)

    @jax.jit
    def p4(re, im, weights):
        return pallas_fft.irfft_tail_pallas(re, im, nz, weights)

    return p23, p4


def can_v6(shape) -> bool:
    """v6 = v5 plus the fused generate+x-FFT kernel's shape rules."""
    from randomfield_tpu.ops.pallas_genfft import can_genfft

    return can_v5(shape) and can_genfft(shape)


@functools.lru_cache(maxsize=16)
def _stages_v6(shape, spacing, dtype_name):
    """v6 = v5 with sampling FUSED into the x transform.

    The first three data movements of v5 — the sampler's full-spectrum
    write, the (x -> minor) transpose pair, and the x-transform's read
    — collapse into ONE kernel that generates each (kz, y-block)
    x-line block in VMEM and transforms it before it ever touches HBM
    (ops/pallas_genfft.py).  First-stage HBM traffic: 43 GB -> 8.6 GB
    at 1024^3.

    MEASURED NEGATIVE RESULT (kept as an opt-in, not the default): at
    1024^3 the fused v6 render is 0.210 s vs v5's 0.201-0.207 — a
    wash.  The pipeline is COMPUTE-bound by this point: the fused
    kernel times at 113 ms vs ~126 ms for sampler+transpose+K1,
    because generation compute (~60 ms of transcendentals) and CT
    compute (~30 ms of HIGHEST-precision MXU + VPU stage 1) simply add
    — the HBM traffic it eliminates was already hidden behind compute.
    (Mosaic offers no intermediate matmul precision here: HIGH is
    unsupported in-kernel, DEFAULT hits an UNIMPLEMENTED backend
    error, so the CT compute floor stands.)

    STREAM CHANGE: v6 draws a different (still deterministic)
    realization family than v3/v4/v5 for the same seed — the PRNG is
    streamed per (kz, y-block) row block instead of per (x, kz, y)
    tile, and the self-conjugate planes come from a Threefry
    pre-sample (pallas_genfft.STREAM records the flavor).  Validated
    statistically on hardware like every sampler flavor (bulk power
    ratio 0.9994 at 256^3).
    """
    from randomfield_tpu.ops import pallas_fft, pallas_genfft

    nx, ny, nz = shape
    nzh = nz // 2 + 1
    _Bar = jax.lax.optimization_barrier
    ax = nx // 128
    ay = ny // 128

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def p23(re, im):
        # x already transformed (digit order) by the genfft kernel
        tre = _Bar(jnp.transpose(re.reshape(nzh, ny, nx), (0, 2, 1)))
        tim = _Bar(jnp.transpose(im.reshape(nzh, ny, nx), (0, 2, 1)))
        gre, gim = pallas_fft.ifft_minor_pallas_reim(tre, tim, reorder=False)

        def close(g):
            g5 = g.reshape(nzh, ax, 128, ay, 128)
            return _Bar(g5.transpose(2, 1, 4, 3, 0).reshape(nx, ny, nzh))

        return close(gre), close(gim)

    @jax.jit
    def p4(re, im, weights):
        return pallas_fft.irfft_tail_pallas(re, im, nz, weights)

    return p23, p4


@functools.lru_cache(maxsize=16)
def _render_v6_single(shape, spacing, dtype_name):
    """ONE jitted program, v6 flavor: fused sample+xFFT entry stage."""
    from randomfield_tpu.ops import pallas_genfft as gf

    p23, p4 = _stages_v6(shape, float(spacing), dtype_name)

    @jax.jit
    def fn(seed, smoothing, lk0, inv_dlk, stab, weights):
        table = (lk0, 1.0 / inv_dlk, stab)
        pre, pim = gf.plane_spectra(
            seed, table, shape, float(spacing), smoothing
        )
        re, im = gf._genfft_jit(
            seed, smoothing, lk0, inv_dlk, stab, pre, pim, shape,
            float(spacing), False,
        )
        re, im = p23(re, im)
        return p4(re, im, weights)

    return fn


@functools.lru_cache(maxsize=16)
def _render_v5_single(shape, spacing, dtype_name):
    """ONE jitted program, v5 flavor: megakernel c2r tail."""
    from randomfield_tpu.ops import pallas_sampler as ps

    p23, p4 = _stages_v5(shape, float(spacing), dtype_name)

    @jax.jit
    def fn(seed, smoothing, lk0, inv_dlk, stab, weights):
        re, im = ps._sample_jit_reim(
            seed, smoothing, lk0, inv_dlk, stab, shape, float(spacing),
            "xzy", False,
        )
        re, im = p23(re, im)
        return p4(re, im, weights)

    return fn


@functools.lru_cache(maxsize=16)
def _render_v4_single(shape, spacing, dtype_name):
    """ONE jitted program, v4 flavor: zero full-size transposes."""
    from randomfield_tpu.ops import pallas_sampler as ps

    p23, p4 = _stages_v4(shape, float(spacing), dtype_name)

    @jax.jit
    def fn(seed, smoothing, lk0, inv_dlk, stab, weights):
        re, im = ps._sample_jit_reim(
            seed, smoothing, lk0, inv_dlk, stab, shape, float(spacing),
            "xzy", False,
        )
        re, im = p23(re, im)
        return p4(re, im, weights)

    return fn


@functools.lru_cache(maxsize=16)
def _render_v3_single(shape, spacing, dtype_name):
    """ONE jitted program: Pallas sample -> transforms -> weighted field.

    With every stage on re/im lattices and the Pallas kernels' VMEM
    residency, the whole 1024^3 render fits a single XLA program on
    16 GB (the round-2 monolithic attempt OOM'd because the native FFT
    custom-calls held full-size workspaces) — no inter-stage syncs, no
    inter-program allocation overlap: measured 0.407 s (3 programs) ->
    0.329 s (this), vs 0.741 s at round-3 start.
    """
    from randomfield_tpu.ops import pallas_sampler as ps

    p23, p4 = _stages_v3_merged(shape, float(spacing), dtype_name)

    @jax.jit
    def fn(seed, smoothing, lk0, inv_dlk, stab, weights):
        re, im = ps._sample_jit_reim(
            seed, smoothing, lk0, inv_dlk, stab, shape, float(spacing),
            "xzy", False,
        )
        re, im = p23(re, im)
        return p4(re, im, weights)

    return fn


def render_v3(seed, table, shape, spacing, dtype_name, weights,
              smoothing_length=0.0):
    """Full staged render for the Pallas sampler.

    Default: the single fused v5 program (:func:`_render_v5_single` —
    megakernel c2r tail) where shapes allow, else v3.
    ``RF_STAGED_PIPELINE`` selects a variant: ``v3`` (chunked tail),
    ``v4`` (sublane-FFT transforms, measured a wash), ``v6`` (fused
    sample+xFFT entry, measured a wash AND a different stream — see
    :func:`_stages_v6`).  ``RF_STAGED_V3_MERGE=0`` falls back to the
    separately-jitted 3-program v3 pipeline (memory-safety escape
    hatch).

    Streams: v3/v4/v5 draw ONE family (bit-identical outputs,
    asserted in tests); v6 (opt-in) is its OWN deterministic family
    (pallas_genfft.STREAM).
    """
    from randomfield_tpu.ops import pallas_sampler as ps

    shape = tuple(shape)
    lk0, dlk, stab = table
    if os.environ.get("RF_STAGED_V3_MERGE", "1") != "0":
        env = os.environ.get("RF_STAGED_PIPELINE", "")
        if env == "v4" and can_v4(shape):
            build = _render_v4_single
        elif env == "v6" and can_v6(shape):
            build = _render_v6_single
        elif env != "v3" and can_v5(shape):
            build = _render_v5_single
        else:
            build = _render_v3_single
        fn = build(shape, float(spacing), dtype_name)
        return fn(
            jnp.uint32(int(seed) & 0x7FFFFFFF),
            jnp.float32(smoothing_length),
            jnp.float32(lk0), jnp.float32(1.0 / float(dlk)),
            jnp.asarray(stab), weights,
        )
    re, im = ps.sample_spectrum_pallas_reim(
        seed, table, shape, spacing, smoothing_length
    )
    return finish_staged_reim(re, im, weights, shape, spacing, dtype_name)


def _select_build(shape):
    """The single-seed program builder render_v3's env logic selects."""
    env = os.environ.get("RF_STAGED_PIPELINE", "")
    if env == "v4" and can_v4(shape):
        return _render_v4_single
    if env == "v6" and can_v6(shape):
        return _render_v6_single
    if env != "v3" and can_v5(shape):
        return _render_v5_single
    return _render_v3_single


# in-program seed batches: cap the resident output stack (the staged
# pipeline's working set is ~3 field-sized buffers; outputs add b more)
BATCH_BUDGET_BYTES = 12 * 1024**3


def can_batch_staged(shape, batch) -> bool:
    nx, ny, nz = shape
    field = 4 * nx * ny * nz
    return (batch + 3) * field <= BATCH_BUDGET_BYTES


@functools.lru_cache(maxsize=16)
def _render_batch_program(shape, spacing, dtype_name, batch):
    build = _select_build(shape)
    fn = build(shape, float(spacing), dtype_name)

    @jax.jit
    def bfn(seeds, smoothing, lk0, inv_dlk, stab, weights):
        def one(s):
            return fn(s, smoothing, lk0, inv_dlk, stab, weights)

        return jax.lax.map(one, seeds)

    return bfn


def render_v3_batch(seeds, table, shape, spacing, dtype_name, weights,
                    smoothing_length=0.0):
    """A seed batch through ONE program (lax.map over the fused render).

    Per-seed outputs are BIT-IDENTICAL to :func:`render_v3` — the
    stream depends only on the seed scalar, so mapping over seeds
    in-program just amortizes the per-dispatch sync (~30 ms on this
    runtime) across the batch.  Caller must check
    :func:`can_batch_staged` (the output stack is resident).
    """
    shape = tuple(shape)
    seeds = jnp.asarray(
        [int(s) & 0x7FFFFFFF for s in np.asarray(seeds)], jnp.uint32
    )
    lk0, dlk, stab = table
    bfn = _render_batch_program(
        shape, float(spacing), dtype_name, int(seeds.shape[0])
    )
    return bfn(
        seeds, jnp.float32(smoothing_length), jnp.float32(lk0),
        jnp.float32(1.0 / float(dlk)), jnp.asarray(stab), weights,
    )


def _pallas_compiled() -> bool:
    """True when Pallas kernels run compiled (i.e. not the CPU tests)."""
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


@functools.lru_cache(maxsize=16)
def _sample_power_v3(shape, spacing, nbins, dtype_name):
    """ONE jitted program: Pallas sample -> binned |c|^2 V.

    The config-4 workload with no FFT, no complex spectrum, and no
    intermediate program boundary.  Where the in-kernel binned sampler
    applies (every practical size), the interior modes are histogrammed
    INSIDE the sampling kernel (ops/pallas_sampler.py, ``bins=`` mode)
    so the 2 x half-spectrum HBM round-trip disappears — only the two
    self-conjugate kz planes come back (O(N^2)), get the Hermitian
    fixup, and are binned here exactly as the materialized path bins
    them (multiplicity 1).  Fallback: sample re/im then bin (still one
    program).
    """
    from randomfield_tpu.ops import grid as _grid
    from randomfield_tpu.ops import pallas_sampler as ps
    from randomfield_tpu.ops import transform as _tr
    from randomfield_tpu.validate.stats import (
        _bin_setup, _binned_spectrum_reim, _masked_bins,
    )

    if not ps.can_bin_sample(shape, nbins):
        @jax.jit
        def fn(seed, smoothing, lk0, inv_dlk, stab):
            re, im = ps._sample_jit_reim(
                seed, smoothing, lk0, inv_dlk, stab, shape, float(spacing),
                "xzy", False,
            )
            return _binned_spectrum_reim(
                re, im, shape, float(spacing), nbins, "xzy"
            )

        return fn

    nx, ny, nz = shape
    edges, _mult = _bin_setup(shape, spacing, nbins)
    ledges = np.log10(edges)
    le0 = float(ledges[0])
    inv_dle = float(nbins / (ledges[-1] - ledges[0]))
    volume = nx * ny * nz * float(spacing) ** 3
    two_pi = 2.0 * np.pi
    kx_sq = (two_pi * np.fft.fftfreq(nx, d=spacing)) ** 2
    ky_sq = (two_pi * np.fft.fftfreq(ny, d=spacing)) ** 2
    kz_of = [
        float((two_pi / (nz * spacing)) * p)
        for p in _grid.self_conjugate_kz_planes(nz)
    ]

    @jax.jit
    def fn(seed, smoothing, lk0, inv_dlk, stab):
        acc, pre, pim = ps.sample_power_bins_reim(
            seed, smoothing, lk0, inv_dlk, stab, shape, float(spacing),
            nbins, le0, inv_dle,
        )
        counts = acc[0, :nbins]
        psum = acc[1, :nbins]
        ksum = acc[2, :nbins]
        edges_j = jnp.asarray(edges, jnp.float32)
        kx2 = jnp.asarray(kx_sq, jnp.float32)
        ky2 = jnp.asarray(ky_sq, jnp.float32)
        for pi, kzv in enumerate(kz_of):
            fre, fim = _tr._symmetrize_plane_reim(
                pre[:, pi, :], pim[:, pi, :], True
            )
            km = jnp.sqrt(
                kx2[:, None] + ky2[None, :] + jnp.float32(kzv * kzv)
            )
            p = (fre * fre + fim * fim) * jnp.float32(volume)
            c2, p2, k2 = _masked_bins(
                km, jnp.float32(1.0), p, edges_j, nbins, per_slab=False
            )
            counts = counts + c2
            psum = psum + p2
            ksum = ksum + k2
        return counts, psum, ksum

    return fn


def sample_power_v3(seed, table, shape, spacing, nbins, smoothing_length=0.0):
    """(counts, power_sum, k_sum) for a seed via the fused program."""
    lk0, dlk, stab = table
    fn = _sample_power_v3(tuple(shape), float(spacing), int(nbins), "float32")
    return fn(
        jnp.uint32(int(seed) & 0x7FFFFFFF), jnp.float32(smoothing_length),
        jnp.float32(lk0), jnp.float32(1.0 / float(dlk)), jnp.asarray(stab),
    )


@functools.lru_cache(maxsize=16)
def _sample_power_v3_batch(shape, spacing, nbins, dtype_name):
    base = _sample_power_v3(shape, spacing, nbins, dtype_name)

    @jax.jit
    def bfn(seeds, smoothing, lk0, inv_dlk, stab):
        return jax.lax.map(
            lambda s: base(s, smoothing, lk0, inv_dlk, stab), seeds
        )

    return bfn


def sample_power_v3_batch(seeds, table, shape, spacing, nbins,
                          smoothing_length=0.0):
    """A seed batch of binned spectra through ONE program.

    ``lax.map`` over :func:`sample_power_v3`'s body: per-seed results
    are identical to the single-seed program (the stream depends only
    on the seed scalar); the per-dispatch host sync (~30 ms) — now a
    third of the 1024^3 per-seed cost after the in-kernel binning — is
    paid once per batch.  Returns stacked (counts, power_sum, k_sum)
    with a leading seed axis.
    """
    lk0, dlk, stab = table
    seeds = jnp.asarray(
        [int(s) & 0x7FFFFFFF for s in np.asarray(seeds).ravel()], jnp.uint32
    )
    bfn = _sample_power_v3_batch(
        tuple(shape), float(spacing), int(nbins), "float32"
    )
    return bfn(
        seeds, jnp.float32(smoothing_length), jnp.float32(lk0),
        jnp.float32(1.0 / float(dlk)), jnp.asarray(stab),
    )


def finish_staged_reim(re, im, weights, shape, spacing, dtype_name):
    """v3 inverse-transform + weight from (re, im) spectrum lattices."""
    shape = tuple(shape)
    if os.environ.get("RF_STAGED_V3_MERGE", "1") != "0":
        p23, p4 = _stages_v3_merged(shape, float(spacing), dtype_name)
        re.block_until_ready()
        re, im = p23(re, im)
        re.block_until_ready()
        return p4(re, im, weights)
    p2, p3, p4 = _stages_v3(shape, float(spacing), dtype_name)
    re.block_until_ready()
    re, im = p2(re, im)
    re.block_until_ready()
    re, im = p3(re, im)
    re.block_until_ready()
    return p4(re, im, weights)


def finish_staged(c, weights, shape, spacing, dtype_name):
    """Inverse-transform + weight a sampled (nx, nzh, ny) spectrum.

    The post-sampling half of the staged pipeline, shared by the
    Threefry path (:func:`staged_render`) and the Pallas-sampler path
    (engine/generator.py).  Blocks between programs: async dispatch lets
    consecutive programs' allocations overlap, and at the HBM ceiling
    that union OOMs even though each stage fits on its own.
    """
    shape = tuple(shape)
    if _pipeline_version(shape) == "v2":
        p2, p3, p4 = _stages_v2(shape, float(spacing), dtype_name)
        c.block_until_ready()
        c = p2(c)
        c.block_until_ready()
        c = p3(c)
        c.block_until_ready()
        return p4(c, weights)
    _, p2, p3, p4 = _stages(shape, float(spacing), dtype_name)
    c.block_until_ready()
    c = p2(c)
    c.block_until_ready()
    c = p3(c)
    c.block_until_ready()
    return p4(c, weights)


def staged_render(key, sigmas_xzy, weights, smoothing_length, shape, spacing):
    """Render one realization through the staged donated pipeline.

    ``sigmas_xzy`` must be in (nx, nzh, ny) layout
    (``tabulate_sigmas(..., layout='xzy')``).

    On TPU for v3-capable shapes the render runs re/im-native end to
    end: the canonical Threefry draws go straight into f32 lattices
    (:func:`_stage_p1_reim`) and through the Pallas-CT transform stages
    (:func:`finish_staged_reim`) — same realization as the complex v1/v2
    path (identical draws; FFT kernels agree to ~1e-6 relative), ~2x
    faster and ~4 GiB lower peak at the 1024^3 HBM ceiling.
    RF_STAGED_PIPELINE=v1/v2 pins the complex path.
    """
    shape = tuple(shape)
    dtype_name = str(sigmas_xzy.dtype)
    kx, ky, kz = _grid.kvectors(shape, float(spacing), sigmas_xzy.dtype)
    if _use_v3(shape):
        p1 = _stage_p1_reim(shape, float(spacing), dtype_name)
        re, im = p1(key, sigmas_xzy, smoothing_length, kx, kz, ky)
        return finish_staged_reim(re, im, weights, shape, spacing, dtype_name)
    p1 = _stage_p1(shape, float(spacing), dtype_name)
    c = p1(key, sigmas_xzy, smoothing_length, kx, kz, ky)
    return finish_staged(c, weights, shape, spacing, dtype_name)


def pick_pipeline(shape, pipeline: str) -> str:
    if pipeline == "auto":
        n = shape[0] * shape[1] * shape[2]
        return "staged" if n > AUTO_STAGED_THRESHOLD else "fused"
    if pipeline not in ("fused", "staged"):
        raise ValueError(f"unknown pipeline {pipeline!r}")
    return pipeline
