"""Fused Pallas TPU kernel: PRNG -> Box-Muller -> sigma scale -> filter.

North-star component (BASELINE.json): "Hermitian-symmetric complex mode
sampling becomes a Pallas PRNG kernel writing the packed c2r
half-spectrum in place", with powertools' mode filtering fused in.

What the kernel fuses, per VMEM tile of the half-spectrum:

1. seed the on-core hardware PRNG from (user seed, tile id) — distinct
   streams per tile, deterministic per (seed, grid shape);
2. draw two uint32 lattices -> uniforms -> Box-Muller -> a complex
   standard normal z with <|z|^2> = 1;
3. compute |k|^2 of each mode inline from the tile's grid position
   (broadcasted iota — no k-mesh input array);
4. scale by the sigma(k) tile and the Gaussian smoothing filter
   exp(-k^2 s^2 / 2);
5. write the real and imaginary parts.

The kernel's only HBM traffic is reading sigma and writing the two
output lattices — the Threefry path's separate draws buffer disappears.
The Hermitian fixup of the kz = 0 / Nyquist planes remains an O(N^2)
XLA post-op on the output (conjugate pairs live in distant tiles; the
hardware PRNG is streamed per tile, not counter-addressable by logical
index, so partners cannot be regenerated locally).

Determinism: per (seed, shape) on a given TPU generation.  The stream
differs from jax.random's Threefry, so the engine treats this sampler
as its own flavor (``sampler='pallas'``), validated statistically
(realized P(k), variance, Hermitian structure) the same way the
reference validates itself (SURVEY.md section 4).

Reference parity: the mode sampler inside randomfield/generate.py
(RandomState.normal over the packed buffer) + powertools.filter_modes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from randomfield_tpu.ops import transform as _transform

__all__ = ["sample_spectrum_pallas"]

_TWO_PI = 6.283185307179586
_INV_SQRT2 = 0.7071067811865476
_INV_2_24 = float(1.0 / (1 << 24))


def _signed_index(idx, n):
    """fft frequency index: i for i < n/2(+1), i - n above."""
    return jnp.where(idx <= n // 2, idx, idx - n)


def _make_kernel(shape, spacing, layout):
    """Kernel closure for a (d0, d1, d2) half-spectrum tile row.

    ``layout`` maps array axes to physical axes: 'xyz' = (x, y, kz) with
    kz packed on the minor axis; 'xzy' = (x, kz, y) (the staged
    pipeline's padding-free order).
    """
    nx, ny, nz = shape
    nzh = nz // 2 + 1
    d1, d2 = (ny, nzh) if layout == "xyz" else (nzh, ny)
    # tile the middle axis so all VMEM-resident lattices (sigma, two bit
    # lattices, re/im outputs, temps) stay well under the ~16 MB budget
    blk1 = d1
    while blk1 * d2 * 4 * 7 > 10 * 2**20:
        blk1 = (blk1 + 1) // 2
    if blk1 != d1:
        blk1 = max(8, ((blk1 + 7) // 8) * 8)  # sublane-divisible tiles
    n1_tiles = pl.cdiv(d1, blk1)
    dk = _TWO_PI / spacing  # per-axis scale is dk / n_axis

    def kernel(seed_ref, smooth_ref, sig_ref, re_ref, im_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        # hardware seeding accepts at most 2 values: fold the 2-D tile
        # coordinate into one stream index
        pltpu.prng_seed(seed_ref[0], i * n1_tiles + j)

        # |k|^2 for this tile: axis 0 index is i, axes 1-2 via iota (+ tile
        # offset along the tiled middle axis)
        a1 = jax.lax.broadcasted_iota(jnp.int32, (blk1, d2), 0) + j * blk1
        a2 = jax.lax.broadcasted_iota(jnp.int32, (blk1, d2), 1)
        kx = (dk / nx) * _signed_index(i, nx).astype(jnp.float32)
        if layout == "xyz":
            k1 = (dk / ny) * _signed_index(a1, ny).astype(jnp.float32)
            k2 = (dk / nz) * a2.astype(jnp.float32)  # rfft axis: 0..nzh-1
        else:
            k1 = (dk / nz) * a1.astype(jnp.float32)
            k2 = (dk / ny) * _signed_index(a2, ny).astype(jnp.float32)
        ksq = kx * kx + k1 * k1 + k2 * k2

        # Box-Muller from two independent uint32 lattices
        b1 = pltpu.bitcast(pltpu.prng_random_bits((blk1, d2)), jnp.uint32)
        b2 = pltpu.bitcast(pltpu.prng_random_bits((blk1, d2)), jnp.uint32)
        # >> 8 leaves 24 bits, so the int32 round-trip is exact (Mosaic
        # has no direct uint32 -> float32 cast)
        u1 = (b1 >> 8).astype(jnp.int32).astype(jnp.float32) * _INV_2_24 + (
            0.5 * _INV_2_24
        )
        u2 = (b2 >> 8).astype(jnp.int32).astype(jnp.float32) * _INV_2_24
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        theta = _TWO_PI * u2

        s = smooth_ref[0]
        amp = sig_ref[0] * jnp.exp(-0.5 * ksq * s * s) * _INV_SQRT2
        re_ref[0] = amp * (r * jnp.cos(theta))
        im_ref[0] = amp * (r * jnp.sin(theta))

    return kernel, (nx, d1, d2, blk1, n1_tiles)


@functools.partial(
    jax.jit, static_argnames=("shape", "spacing", "layout", "interpret")
)
def _sample_jit(seed, smoothing_length, sigmas, shape, spacing, layout,
                interpret):
    kernel, (nx, d1, d2, blk1, n1_tiles) = _make_kernel(shape, spacing, layout)
    out = jax.ShapeDtypeStruct((nx, d1, d2), sigmas.dtype)
    row = pl.BlockSpec(
        (1, blk1, d2), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    re, im = pl.pallas_call(
        kernel,
        grid=(nx, n1_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row,
        ],
        out_specs=(row, row),
        out_shape=(out, out),
        # the TPU-flavored interpreter understands pltpu prng primitives
        # on CPU (the plain HLO interpreter does not)
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray([seed], jnp.int32).ravel(),
        jnp.asarray([smoothing_length], sigmas.dtype).ravel(),
        sigmas,
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


def sample_spectrum_pallas(seed, sigmas, shape, spacing, smoothing_length=0.0,
                           layout="xyz", interpret=False):
    """Packed spectrum c_k with per-mode std sigma(k) * filter, via Pallas.

    Drop-in alternative to ``sample.sample_spectrum`` +
    ``power.filter_modes`` (different, hardware-PRNG random stream).
    ``seed``: python/int32 scalar.  Returns complex64 with the Hermitian
    planes fixed up.
    """
    return _sample_jit(
        int(seed) & 0x7FFFFFFF, smoothing_length, sigmas,
        tuple(int(s) for s in shape), float(spacing), layout, bool(interpret)
    )
