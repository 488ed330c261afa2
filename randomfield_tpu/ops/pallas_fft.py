"""Pallas TPU inverse FFT along the minor axis: one HBM pass, not five.

Why: on this runtime the native minor-axis FFT kernel sustains only
~75 GB/s effective (measured via chained-marginal probes), while a
plain HBM copy sustains ~650 GB/s — the FFT custom-call is multi-pass /
poorly pipelined, NOT bandwidth-bound.  The XLA Cooley-Tukey einsum
(ops/ctfft.py) is no better end-to-end because its stage intermediates
round-trip through HBM.  This kernel keeps the whole factorized
transform in VMEM per tile, so its HBM traffic is exactly read + write.

Factorization (inverse, unnormalized: X[j] = sum_k x[k] e^{+2 pi i jk/n})
chosen for Mosaic's layout rules — n = A * 128 with the length-128
factor on the LANE axis:

    k = a*128 + b     (a in [0,A): vreg-group index, b in [0,128): lane)
    j = c + A*d       (c in [0,A), d in [0,128))

    S1[c,b] = sum_a W_A^{ac} x[a*128 + b]      A vreg-group combines (VPU)
    M [c,b] = S1[c,b] * W_n^{cb}               tiny twiddle multiply
    X[c+Ad] = sum_b V[b,d] M[c,b],  V[b,d] = W_128^{bd}
                                               (blkM,128)@(128,128) MXU
                                               matmuls, 4 per c (complex)

The kernel writes G[:, c*128 + d] = X[:, c + A*d]; the caller undoes the
digit permutation with one reshape/transpose pass that XLA executes at
copy speed (or fuses into the consumer).  Complex data travels as
separate re/im float32 lattices (this runtime cannot move complex64
across some boundaries, and separate lattices give Mosaic clean (8,128)
tiles).

Accuracy: two-stage CT in f32 with float64-built constants — same class
as ops/ctfft.py (~1e-6 relative, tested against numpy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "ifft_minor_pallas",
    "ifft_minor_pallas_reim",
    "fft_minor_pallas_reim",
    "ifft_sublane_pallas_reim",
    "can_pallas_fft",
]

_LANES = 128


def can_pallas_fft(n: int) -> bool:
    """n = A*128 with A in [1, 16] (A=1 would just be one matmul)."""
    return n % _LANES == 0 and 1 <= n // _LANES <= 16


@functools.lru_cache(maxsize=32)
def _constants_np(n: int):
    """(w8re, w8im, twre, twim, vre, vim) float32 stage constants."""
    A = n // _LANES
    a = np.arange(A)
    c = np.arange(A)
    # W_A^{ac}
    wa = np.exp(2j * np.pi * np.outer(a, c) / A)
    # twiddle W_n^{cb}: (A, 128)
    b = np.arange(_LANES)
    tw = np.exp(2j * np.pi * np.outer(c, b) / n)
    # V[b, d] = W_128^{bd}: (128, 128) symmetric
    v = np.exp(2j * np.pi * np.outer(b, b) / _LANES)
    return (
        wa.real.astype(np.float32), wa.imag.astype(np.float32),
        tw.real.astype(np.float32), tw.imag.astype(np.float32),
        v.real.astype(np.float32), v.imag.astype(np.float32),
    )


def _ct_core(xre, xim, n, twre, twim, vre, vim):
    """Shared in-VMEM CT inverse-FFT math on (rows, n) value arrays.

    Returns (gre, gim) with G[:, c*128 + d] = X[:, c + A*d] (raw digit
    order).  ``twre``/``twim``: (A, 128) twiddles; ``vre``/``vim``:
    (128, 128) stage-2 DFT matrix — all from :func:`_constants_np`.
    Used by the minor-axis kernel, and callable from OTHER kernels
    (e.g. the fused c2r tail) on VMEM-resident blocks.
    """
    A = n // _LANES
    w8re, w8im, _, _, _, _ = _constants_np(n)
    rows = xre.shape[0]
    gre_parts = []
    gim_parts = []
    for c in range(A):
        s1re = jnp.zeros((rows, _LANES), jnp.float32)
        s1im = jnp.zeros((rows, _LANES), jnp.float32)
        for a in range(A):
            xr = xre[:, a * _LANES:(a + 1) * _LANES]
            xi = xim[:, a * _LANES:(a + 1) * _LANES]
            wr = float(w8re[a, c])
            wi = float(w8im[a, c])
            s1re = s1re + (wr * xr - wi * xi)
            s1im = s1im + (wr * xi + wi * xr)
        # twiddle W_n^{cb} over lanes
        tr = twre[c][None, :]
        ti = twim[c][None, :]
        mre = s1re * tr - s1im * ti
        mim = s1re * ti + s1im * tr
        # stage 2: X_c = M_c @ V (complex, 4 real MXU matmuls)
        dot = functools.partial(
            jax.lax.dot, precision=jax.lax.Precision.HIGHEST
        )
        gre_parts.append(dot(mre, vre) - dot(mim, vim))
        gim_parts.append(dot(mre, vim) + dot(mim, vre))
    return gre_parts, gim_parts


def _make_kernel(n: int, blkm: int):
    def kernel(xre_ref, xim_ref, twre_ref, twim_ref, vre_ref, vim_ref,
               ore_ref, oim_ref):
        gre, gim = _ct_core(
            xre_ref[...], xim_ref[...], n,
            twre_ref[...], twim_ref[...], vre_ref[...], vim_ref[...],
        )
        A = n // _LANES
        for c in range(A):
            ore_ref[:, c * _LANES:(c + 1) * _LANES] = gre[c]
            oim_ref[:, c * _LANES:(c + 1) * _LANES] = gim[c]

    return kernel


@functools.partial(jax.jit, static_argnames=("n", "interpret", "reorder"))
def _ifft2d(xre, xim, n, interpret, reorder=True):
    m = xre.shape[0]
    # VMEM stack per block: 2*(in + out) blocks of blkm x n plus the
    # unrolled A^2-stage temporaries (A = n/128), which grow FASTER
    # than linear in n — measured against the v5p compile target
    # (scripts/aot_config5.py): 256 rows fits through n = 1024 (A = 8),
    # n = 2048 (A = 16) needs 64 (128 still OOMs Mosaic's stack)
    blkm = 256 if n <= 1024 else 64
    grid = (pl.cdiv(m, blkm),)
    kernel = _make_kernel(n, blkm)
    _, _, twre, twim, vre, vim = _constants_np(n)
    spec = pl.BlockSpec((blkm, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((m, n), jnp.float32)
    gre, gim = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, const, const, const, const],
        out_specs=(spec, spec),
        out_shape=(out, out),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(xre, xim, jnp.asarray(twre), jnp.asarray(twim),
      jnp.asarray(vre), jnp.asarray(vim))
    # undo the digit permutation: G[:, c*128+d] -> X[:, c+A*d]
    A = n // _LANES
    if A > 1 and reorder:
        gre = gre.reshape(m, A, _LANES).transpose(0, 2, 1).reshape(m, n)
        gim = gim.reshape(m, A, _LANES).transpose(0, 2, 1).reshape(m, n)
    return gre, gim


@functools.lru_cache(maxsize=32)
def digit_perm(n: int) -> np.ndarray:
    """perm with X_true[..., j] == G[..., perm[j]] for the raw kernel
    output G[..., c*128 + d] = X[..., c + A*d]."""
    A = n // _LANES
    j = np.arange(n)
    return ((j % A) * _LANES + j // A).astype(np.int32)


def ifft_minor_pallas_reim(xre, xim, interpret=False, reorder=True):
    """Unnormalized minor-axis inverse FFT on separate re/im lattices.

    The native interface for the re/im-native staged pipeline
    (engine/staged.py v3): no complex array is formed anywhere, so the
    complex<->re/im HBM passes that sank the complex wrapper's
    end-to-end numbers (docs/performance.md) never exist.

    ``reorder=False`` skips the digit-permutation pass and returns the
    kernel's raw order (undo with ``take(g, digit_perm(n), axis=-1)``)
    — pipelines fold the permutation into an adjacent transpose/gather
    instead of paying a dedicated pass.
    """
    n = xre.shape[-1]
    if not can_pallas_fft(n):
        raise ValueError(f"n={n} unsupported (need a multiple of 128, A<=16)")
    lead = xre.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    gre, gim = _ifft2d(
        xre.reshape(m, n), xim.reshape(m, n), n, bool(interpret),
        reorder=bool(reorder),
    )
    return gre.reshape(*lead, n), gim.reshape(*lead, n)


def fft_minor_pallas_reim(xre, xim, interpret=False, reorder=True):
    """Unnormalized minor-axis FORWARD FFT on separate re/im lattices.

    The conjugation identity ``DFT(x) = conj(IDFT(conj(x)))`` run
    through the inverse CT kernels: negate the imaginary lattice in and
    out (both negations fuse into adjacent elementwise ops — no extra
    HBM pass).  Exact forward DFT, no scaling, same shape rules as
    :func:`ifft_minor_pallas_reim`.
    """
    gre, gim = ifft_minor_pallas_reim(
        xre, -xim, interpret=interpret, reorder=reorder
    )
    return gre, -gim


def _make_sublane_kernel(n: int, blkl: int):
    """Kernel: inverse FFT over the SUBLANE axis, rotated output block.

    Input block (n, blkl) with the transform axis on sublanes; output
    block (blkl, n) — the transformed axis lands on LANES in raw digit
    order.  One pallas pass therefore computes what otherwise costs a
    minor-axis-changing physical transpose PLUS a minor-axis FFT pass:
    the rotation rides the stage-2 matmul's free choice of output
    orientation (contract M's sublane dim against V's rows and the
    result comes out (cols, lanes) already rotated).
    """
    A = n // _LANES
    w8re, w8im, _, _, _, _ = _constants_np(n)
    dg = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )

    def kernel(xre_ref, xim_ref, twre_ref, twim_ref, vre_ref, vim_ref,
               ore_ref, oim_ref):
        # (n, blkl) -> (A, 128, blkl): a = untiled digit, b = sublanes
        xre = xre_ref[...].reshape(A, _LANES, blkl)
        xim = xim_ref[...].reshape(A, _LANES, blkl)
        vre = vre_ref[...]
        vim = vim_ref[...]
        for c in range(A):
            s1re = jnp.zeros((_LANES, blkl), jnp.float32)
            s1im = jnp.zeros((_LANES, blkl), jnp.float32)
            for a in range(A):
                wr = float(w8re[a, c])
                wi = float(w8im[a, c])
                s1re = s1re + (wr * xre[a] - wi * xim[a])
                s1im = s1im + (wr * xim[a] + wi * xre[a])
            # twiddle W_n^{cb} varies along sublanes: (128, 1) columns
            tr = twre_ref[:, c:c + 1]
            ti = twim_ref[:, c:c + 1]
            mre = s1re * tr - s1im * ti
            mim = s1re * ti + s1im * tr
            # stage 2 rotated: out[col, d] = sum_b M[b, col] V[b, d]
            ore = dg(mre, vre) - dg(mim, vim)
            oim = dg(mre, vim) + dg(mim, vre)
            ore_ref[:, c * _LANES:(c + 1) * _LANES] = ore
            oim_ref[:, c * _LANES:(c + 1) * _LANES] = oim

    return kernel


def _pick_blkl(cols: int, n: int) -> int:
    """Largest lane-block that keeps the kernel inside scoped VMEM.

    Live block bytes ~= 2x(in re+im) + 2x(out re+im) double-buffered =
    2 * 4 * (n * blkl * 4); the 16 MB scoped-vmem limit (measured OOM:
    n=1024, blkl=512 wanted 25.87M) gives blkl <= ~4 MiB / (16 n)."""
    for b in (512, 256, 128):
        if cols % b == 0 and 16 * n * b <= 4 * 1024 * 1024:
            return b
    if cols % 128 == 0:
        return 128
    raise ValueError(f"column count {cols} not a multiple of 128")


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def _ifft_sublane2d(xre, xim, n, interpret):
    rows, cols = xre.shape
    groups = rows // n
    blkl = _pick_blkl(cols, n)
    lane_blocks = cols // blkl
    kernel = _make_sublane_kernel(n, blkl)
    _, _, twre, twim, vre, vim = _constants_np(n)
    in_spec = pl.BlockSpec(
        (n, blkl), lambda g, j: (g, j), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (blkl, n), lambda g, j, L=lane_blocks: (g * L + j, 0),
        memory_space=pltpu.VMEM,
    )
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((groups * cols, n), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(groups, lane_blocks),
        in_specs=[in_spec, in_spec, const, const, const, const],
        out_specs=(out_spec, out_spec),
        out_shape=(out, out),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(xre, xim, jnp.asarray(twre.T.copy()), jnp.asarray(twim.T.copy()),
      jnp.asarray(vre), jnp.asarray(vim))


def ifft_sublane_pallas_reim(xre, xim, n, interpret=False):
    """Unnormalized inverse FFT over grouped ROWS, output rotated.

    ``xre``/``xim``: float32 (groups * n, cols) — each consecutive row
    block of n rows is one transform group (a batch of independent
    length-n signals living down the columns).  Returns float32
    (groups * cols, n): row g*cols + col holds the transform of input
    column col of group g, along lanes in the kernel's RAW DIGIT order
    (undo with ``take(out, digit_perm(n), axis=-1)`` or fold the
    permutation into a downstream gather, exactly as with
    ``ifft_minor_pallas_reim(reorder=False)``).

    This is "physical transpose + minor-axis FFT" in ONE HBM pass: use
    it to transform a non-minor axis without paying the transpose.  The
    staged v4 pipeline (engine/staged.py) chains two of these to run
    the x and y transforms of an (x, kz, y) spectrum with zero
    full-size transposes.
    """
    if not can_pallas_fft(n):
        raise ValueError(f"n={n} unsupported (need a multiple of 128, A<=16)")
    rows, cols = xre.shape
    if rows % n:
        raise ValueError(f"rows {rows} not a multiple of the group length {n}")
    return _ifft_sublane2d(xre, xim, n, bool(interpret))


def _flip_gather(block, t):
    """Reverse the 128 lanes of ``block`` via one in-vreg gather."""
    return jnp.take_along_axis(
        block, jnp.broadcast_to(127 - t, block.shape), axis=-1
    )


def _make_c2r_kernel(nz: int, by: int, nzh: int):
    """Fused half-pack c2r + interleave + z-weights kernel body.

    Per (x, y-block) grid step, entirely in VMEM:

        load (by, nzh) re/im     packed rfft spectrum along minor kz
        G-build                  half-pack: G[j] combines c[j], c*[m-j]
                                 (the lane REVERSAL decomposes into
                                 static 128-slices + in-vreg gathers —
                                 Mosaic has no `rev`)
        m-point CT inverse       shared _ct_core (VPU stage 1, MXU
                                 stage 2), raw digit order
        digit-fix + interleave   out[2j] = Re z[j], out[2j+1] = Im z[j]
                                 with j natural — ONE combined lane
                                 permutation built from A in-vreg
                                 gathers per output 128-block
        x weights[z]             lightcone weighting
        store (by, nz)           the final real-space (y, z) tile

    This replaces the staged pipeline's p4 (chunked transpose + G pass
    + minor-FFT pass + interleave pass, each materialized in HBM) with
    exactly one read of the spectrum and one write of the field.
    """
    m = nz // 2
    A = m // _LANES

    def kernel(cr_ref, ci_ref, wpre_ref, wpim_ref, twre_ref, twim_ref,
               vre_ref, vim_ref, wz_ref, out_ref):
        cr = cr_ref[...].reshape(by, nzh)
        ci = ci_ref[...].reshape(by, nzh)
        t = jax.lax.broadcasted_iota(jnp.int32, (by, _LANES), 1)
        head_re = cr[:, :m]
        head_im = ci[:, :m]

        # rev[j] = c[m - j], j in [0, m): block k takes lane m-128k at
        # t=0 (a 1-lane slice, broadcast) and lanes 128-t of aligned
        # block A-1-k for t >= 1 (one in-vreg gather)
        def reverse(x):
            parts = []
            idx = jnp.broadcast_to((128 - t) % 128, (by, _LANES))
            for k in range(A):
                edge = jnp.broadcast_to(
                    x[:, m - 128 * k:m - 128 * k + 1], (by, _LANES)
                )
                blk = x[:, (A - 1 - k) * _LANES:(A - k) * _LANES]
                parts.append(
                    jnp.where(t == 0, edge,
                              jnp.take_along_axis(blk, idx, axis=-1))
                )
            return jnp.concatenate(parts, axis=-1)

        rev_re = reverse(cr)
        rev_im = reverse(ci)
        er = head_re + rev_re
        ei = head_im - rev_im
        orr = head_re - rev_re
        oi = head_im + rev_im
        wr = wpre_ref[...]
        wi = wpim_ref[...]
        g_re = er - (wr * oi + wi * orr)
        g_im = ei + (wr * orr - wi * oi)

        zre, zim = _ct_core(
            g_re, g_im, m,
            twre_ref[...], twim_ref[...], vre_ref[...], vim_ref[...],
        )  # A digit-order blocks each

        # combined digit-fix + even/odd interleave + weights: output
        # lane z = 128k + t holds (t%2 ? Im : Re) z[(128k+t)//2] with
        # z natural; natural j lives at digit block q=(t//2)%A, lane
        # j//A = 64k//A + (t//2)//A
        q = (t // 2) % A
        for k in range(nz // _LANES):
            idx = jnp.broadcast_to((64 * k) // A + (t // 2) // A,
                                   (by, _LANES))
            acc = jnp.zeros((by, _LANES), jnp.float32)
            for qq in range(A):
                vre_g = jnp.take_along_axis(zre[qq], idx, axis=-1)
                vim_g = jnp.take_along_axis(zim[qq], idx, axis=-1)
                val = jnp.where(t % 2 == 0, vre_g, vim_g)
                acc = jnp.where(q == qq, val, acc)
            out_ref[0, :, k * _LANES:(k + 1) * _LANES] = (
                acc * wz_ref[:, k * _LANES:(k + 1) * _LANES]
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("nz", "interpret"))
def _irfft_tail2d(cr, ci, weights, nz, interpret):
    nx, ny, nzh = cr.shape
    m = nz // 2
    # row cap scales down with the CT radix A = m/128: the G-build +
    # unrolled CT temporaries grow faster than linear in m (same Mosaic
    # stack budget as _ifft2d; measured against the v5p compile-only
    # target at nz = 2048, where 256 rows OOMs VMEM)
    by_cap = 256 if m <= 512 else 64
    by = ny
    while by > by_cap or (ny % by):
        by //= 2
    by = max(8, by)
    kernel = _make_c2r_kernel(nz, by, nzh)
    _, _, twre, twim, vre, vim = _constants_np(m)
    theta = 2.0 * np.pi * np.arange(m) / nz
    wpre = np.cos(theta).astype(np.float32)[None, :]
    wpim = np.sin(theta).astype(np.float32)[None, :]
    in_spec = pl.BlockSpec(
        (1, by, nzh), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, by, nz), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((nx, ny, nz), jnp.float32)
    wz = jnp.broadcast_to(weights.astype(jnp.float32)[None, :], (by, nz))
    return pl.pallas_call(
        kernel,
        grid=(nx, ny // by),
        in_specs=[in_spec, in_spec, const, const, const, const, const,
                  const, const],
        out_specs=out_spec,
        out_shape=out,
        interpret=pltpu.InterpretParams() if interpret else False,
    )(cr, ci, jnp.asarray(wpre), jnp.asarray(wpim),
      jnp.asarray(twre), jnp.asarray(twim), jnp.asarray(vre),
      jnp.asarray(vim), wz)


def irfft_tail_pallas(cr, ci, nz, weights, interpret=False):
    """Fused half-pack c2r along the MINOR axis + z-weights, one pass.

    ``cr``/``ci``: float32 (nx, ny, nzh) packed rfft spectrum (natural
    order on every axis, kz minor, nzh = nz//2 + 1).  ``weights``:
    (nz,) per-z-plane multipliers (lightcone growth weighting; pass
    ones to disable).  Returns float32 (nx, ny, nz), the unnormalized
    ("forward"-convention) inverse real transform along kz times
    ``weights`` — HBM traffic is exactly read(spectrum) +
    write(field), vs the 3 materialized passes of the chunked XLA
    tail it replaces (engine/staged.py p4).

    Requires even nz with nz//2 = A*128, A <= 16 (can_pallas_fft).
    """
    nx, ny, nzh = cr.shape
    m = nz // 2
    if not can_pallas_fft(m):
        raise ValueError(f"nz={nz}: nz//2 must be a multiple of 128, A<=16")
    if nzh != m + 1:
        raise ValueError(f"minor axis {nzh} != nz//2 + 1 = {m + 1}")
    return _irfft_tail2d(cr, ci, jnp.asarray(weights), int(nz),
                         bool(interpret))


def rfft_minor_half_reim(x, interpret=False):
    """r2c along the minor axis via the half-length complex pack.

    Standard real-FFT folding: pack z[j] = x[2j] + i x[2j+1], run ONE
    m = n/2 point complex forward transform (the Pallas CT kernel on
    re/im lattices), and unfold

        A[k] = (Z[k] + Z*[m-k]) / 2,  B[k] = -i (Z[k] - Z*[m-k]) / 2,
        X[k] = A[k] + W_n^{-k} B[k],  k = 0..m  (Z[m] := Z[0])

    — the forward mirror of the c2r tail's half-pack G-build.  Returns
    (re, im) float32 lattices of the packed rfft spectrum
    (..., n/2 + 1).  Replaces the native head's "cast to complex +
    FULL-length FFT + slice" (2x the transform work and the dominant
    workspace of the distributed forward transforms: the 2048^3 AOT
    compile measured 16 GiB of temp against this head).  Requires
    ``can_pallas_fft(n // 2)``.
    """
    n = int(x.shape[-1])
    m = n // 2
    if n % 2 or not can_pallas_fft(m):
        raise ValueError(f"n={n}: n/2 must be a multiple of 128, A<=16")
    pair = x.reshape(*x.shape[:-1], m, 2)
    xe = pair[..., 0]
    xo = pair[..., 1]
    zre, zim = fft_minor_pallas_reim(xe, xo, interpret=interpret)
    # Z*[m-k]: index-reversed with wraparound (k=0 -> Z[0])
    rev = lambda g: jnp.concatenate(
        [g[..., :1], g[..., 1:][..., ::-1]], axis=-1
    )
    zre_r = rev(zre)
    zim_r = rev(zim)
    a_re = 0.5 * (zre + zre_r)
    a_im = 0.5 * (zim - zim_r)
    b_re = 0.5 * (zim + zim_r)
    b_im = -0.5 * (zre - zre_r)
    theta = -2.0 * np.pi * np.arange(m) / n
    wre = jnp.asarray(np.cos(theta).astype(np.float32))
    wim = jnp.asarray(np.sin(theta).astype(np.float32))
    out_re = a_re + (wre * b_re - wim * b_im)
    out_im = a_im + (wre * b_im + wim * b_re)
    # X[m] = A[0] - B[0] = Re Z[0] - Im Z[0], imaginary part zero
    tail_re = (zre[..., :1] - zim[..., :1])
    tail_im = jnp.zeros_like(tail_re)
    return (
        jnp.concatenate([out_re, tail_re], axis=-1),
        jnp.concatenate([out_im, tail_im], axis=-1),
    )


def ifft_minor_pallas(x, interpret=False):
    """Unnormalized inverse FFT along the minor axis (complex in/out).

    Drop-in for ``jnp.fft.ifft(x, axis=-1, norm='forward')`` when
    ``can_pallas_fft(x.shape[-1])``.  One HBM pass through the Pallas CT
    kernel plus one copy-speed digit-reorder pass (plus the complex
    decompose/re-form passes — prefer :func:`ifft_minor_pallas_reim`
    in pipelines that can carry re/im).
    """
    gre, gim = ifft_minor_pallas_reim(
        jnp.real(x), jnp.imag(x), interpret=interpret
    )
    return jax.lax.complex(gre, gim)
