"""Distributed packed FFTs: slab decomposition + all-to-all transposes.

The TPU-native replacement for the reference's pyfftw plans at scales
beyond one chip's HBM (SURVEY.md section 5, "long-context analog"; the
AccFFT slab pattern, PAPERS.md).  One transpose per direction:

inverse (k -> x), input sharded along ky over the 'space' axis:

    1. local complex ifft along x        (x is unsharded in k-layout)
    2. all_to_all: reshard ky-slabs -> x-slabs  (THE collective, over ICI)
    3. local complex ifft along y        (y now unsharded)
    4. local c2r irfft along z           (z always unsharded)

    output: real field sharded along x.

forward (x -> k) is the exact reverse; both use ``shard_map`` so XLA can
never silently fall back to an all-gather (SURVEY.md hard part #1 — with
pjit alone the FFT op would gather the full grid onto every chip).

The c2r axis (z) is deliberately never sharded: packing/unpacking the
Hermitian half-spectrum stays local, and the all-to-all moves the packed
(half) representation — half the bytes of a full complex cube.

Correctness of the unnormalized-inverse convention: ``norm='forward'``
sub-transforms compose into exactly ``irfftn(c, norm='forward')``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from randomfield_tpu.ops import transform as _transform
from randomfield_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS

__all__ = ["irfftn_slab", "irfftn_slab_reim", "rfftn_slab",
           "can_pallas_slab"]

_B = jax.lax.optimization_barrier


def can_pallas_slab(shape) -> bool:
    """Shapes whose slab-local transforms can run the Pallas CT kernels."""
    from randomfield_tpu.ops.pallas_fft import can_pallas_fft

    nx, ny, nz = shape
    return (
        can_pallas_fft(nx) and can_pallas_fft(ny)
        and nz % 2 == 0 and can_pallas_fft(nz // 2)
    )


def _pallas_interpret() -> bool:
    # RF_PALLAS_INTERPRET=0/1 overrides (the AOT config-5 lowering runs
    # on a CPU host but targets a TPU topology descriptor, where the
    # kernels must compile for Mosaic, not the interpreter)
    env = os.environ.get("RF_PALLAS_INTERPRET", "")
    if env in ("0", "1"):
        return env == "1"
    try:
        return jax.devices()[0].platform == "cpu"
    except Exception:
        return True


def use_pallas_local(shape) -> bool:
    """Default ON for capable shapes on TPU; RF_MESH_PALLAS=0/1 overrides.

    RF_MESH_PALLAS=1 forces the path on CPU too (Mosaic interpreter) —
    how the parity tests drive it on the 8-virtual-device mesh.
    CAUTION (CPU interpreter only): the interpreter executes kernels via
    host callbacks, which DEADLOCK inside shard_map when the mesh has an
    axis the in_specs never mention (e.g. an idle 'data' axis on an
    unbatched call) — parity tests must size their meshes so every axis
    is mentioned.  Compiled TPU kernels have no callback and no such
    restriction.
    """
    env = os.environ.get("RF_MESH_PALLAS", "")
    if env == "0":
        return False
    if not can_pallas_slab(shape):
        return False
    if env == "1":
        return True
    return not _pallas_interpret()


def _ifft_axis(x, axis):
    """Local unnormalized inverse FFT along ``axis`` via the minor axis.

    Same discipline as ops/transform.py's safe backend: the TPU runtime
    in this sandbox miscomputes non-minor-axis FFTs, so transform on the
    minor axis with barrier-pinned physical transposes.  Identical
    results (and passing tests) on CPU.
    """
    if axis == x.ndim - 1 or axis == -1:
        return _transform.ifft_minor(x)
    perm = list(range(x.ndim))
    perm[axis], perm[-1] = perm[-1], perm[axis]
    t = _B(jnp.transpose(x, perm))
    t = _transform.ifft_minor(t)
    return _B(jnp.transpose(t, perm))


def _fft_axis(x, axis):
    """Local unnormalized forward FFT along ``axis`` via the minor axis."""
    cdtype = jnp.complex64 if x.dtype in (jnp.float32, jnp.complex64) else jnp.complex128
    x = x.astype(cdtype)
    if axis == x.ndim - 1 or axis == -1:
        return jnp.fft.fft(x, axis=-1, norm="backward")
    perm = list(range(x.ndim))
    perm[axis], perm[-1] = perm[-1], perm[axis]
    t = _B(jnp.transpose(x, perm))
    t = jnp.fft.fft(t, axis=-1, norm="backward")
    return _B(jnp.transpose(t, perm))


def _irfft_last(x, n, assume_hermitian=False):
    """Local c2r along the last axis (ops/transform.py:irfft_minor)."""
    return _transform.irfft_minor(x, n, assume_hermitian)


def _rfft_last(x):
    """Local r2c along the last axis via complex FFT + slice."""
    nzh = x.shape[-1] // 2 + 1
    c = _fft_axis(x, x.ndim - 1)
    return _B(c[..., :nzh])


def _check_divisible(shape, n_space):
    nx, ny, _ = shape
    if nx % n_space or ny % n_space:
        raise ValueError(
            f"slab decomposition needs nx ({nx}) and ny ({ny}) divisible by "
            f"the 'space' mesh axis size ({n_space})"
        )


def _specs(mesh, batched, k_axis, x_axis):
    """(in_spec, out_spec) with optional leading batch axis over 'data'."""
    data = DATA_AXIS if (batched and DATA_AXIS in mesh.shape) else None
    k = [None, None, None]
    k[k_axis] = SPACE_AXIS
    x = [None, None, None]
    x[x_axis] = SPACE_AXIS
    if batched:
        return P(data, *k), P(data, *x)
    return P(*k), P(*x)


def irfftn_slab(c, shape, mesh: Mesh, batched=False, assume_hermitian=False,
                weights=None):
    """Distributed inverse c2r FFT (norm='forward', i.e. pure mode sum).

    ``c``: packed half-spectrum (..., nx, ny, nz//2+1), sharded along ky
    over the mesh's 'space' axis (and optionally a leading batch axis over
    'data').  Returns the real field (..., nx, ny, nz) sharded along x.
    ``assume_hermitian=True`` (render paths, symmetrized spectra) uses
    the faster half-pack c2r tail (see transform.irfft_minor).

    ``weights``: optional (nz,) per-z-plane multipliers (lightcone
    weighting) applied to the output — on the Pallas path they are fused
    into the c2r megakernel's single output pass, so passing them here
    instead of multiplying afterwards saves one full read+write of the
    field at scale.

    Local transforms: on TPU, Hermitian inputs of capable shapes
    (:func:`can_pallas_slab`) run the Pallas CT kernel family
    (ops/pallas_fft.py) — measured ~3x the effective bandwidth of the
    native minor-axis FFT custom-call on this runtime — via the v5-style
    schedule (digit-order kernels, one combined digit-fix transpose, the
    fused half-pack c2r + weights megakernel).  RF_MESH_PALLAS=0 forces
    the safe native path; =1 forces Pallas (Mosaic interpreter on CPU —
    the parity-test configuration).
    """
    nx, ny, nz = shape
    n_space = mesh.shape[SPACE_AXIS]
    _check_divisible(shape, n_space)
    if assume_hermitian and use_pallas_local(shape):
        return _irfftn_slab_pallas(c, shape, mesh, batched, weights)
    in_spec, out_spec = _specs(mesh, batched, k_axis=1, x_axis=0)
    off = 1 if batched else 0
    have_w = weights is not None
    w = jnp.ones((1,), jnp.float32) if not have_w else weights

    def local(cl, wl):
        cl = _ifft_axis(cl, cl.ndim - 3)
        if n_space > 1:
            cl = jax.lax.all_to_all(
                cl, SPACE_AXIS, split_axis=off, concat_axis=off + 1, tiled=True
            )
        cl = _ifft_axis(cl, cl.ndim - 2)
        out = _irfft_last(cl, nz, assume_hermitian)
        if have_w:
            out = out * wl[None, None, :].astype(out.dtype)
        return out

    return jax.shard_map(
        local, mesh=mesh, in_specs=(in_spec, P(None)), out_specs=out_spec,
        check_vma=False,
    )(c, w)


def _irfftn_slab_pallas(c, shape, mesh: Mesh, batched, weights):
    """Slab inverse on the Pallas CT kernels, v5-style schedule.

    Per shard (engine/staged.py:_stages_v5 adapted to the slab layout;
    one all-to-all between the two complex passes):

        split      complex (.., nx, nyl, nzh) -> re/im f32 lattices
        x-pass     transpose to minor + CT kernel (natural order out)
        all2all    split x -> concat y (the slab collective, unchanged)
        y-pass     transpose to minor + CT kernel, RAW digit order
        close      ONE transpose fixing y digits + rotating kz minor
        tail       fused half-pack c2r + z-weights megakernel

    The kernels are exact drop-ins (~1e-6 relative vs the native FFT,
    same class as ops/ctfft.py); parity with the native slab path is
    asserted on the CPU mesh in tests/test_parallel.py.
    """
    from randomfield_tpu.ops import pallas_fft as pf

    nx, ny, nz = shape
    nzh = nz // 2 + 1
    n_space = mesh.shape[SPACE_AXIS]
    interp = _pallas_interpret()
    in_spec, out_spec = _specs(mesh, batched, k_axis=1, x_axis=0)
    off = 1 if batched else 0
    ay = ny // 128
    w = (jnp.ones((nz,), jnp.float32) if weights is None
         else jnp.asarray(weights, jnp.float32))

    def local(cl, wl):
        return _slab_pallas_local(
            jnp.real(cl), jnp.imag(cl), wl, shape, n_space, off, ay, interp
        )

    return jax.shard_map(
        local, mesh=mesh, in_specs=(in_spec, P(None)), out_specs=out_spec,
        check_vma=False,
    )(c, w)


def irfftn_slab_reim(re, im, shape, mesh: Mesh, batched=False, weights=None):
    """:func:`irfftn_slab` (Hermitian inputs) on separate re/im lattices.

    The complex pack is never formed — the sampler's re/im outputs feed
    the shard-local Pallas schedule directly (at the 1-device 1024^3
    ceiling the pack + its split inside the transform cost 8.6 GB of
    pure copies).  Falls back to packing per shard + the native
    minor-axis path on shapes/platforms the kernels don't cover.
    """
    nx, ny, nz = shape
    nzh = nz // 2 + 1
    n_space = mesh.shape[SPACE_AXIS]
    _check_divisible(shape, n_space)
    in_spec, out_spec = _specs(mesh, batched, k_axis=1, x_axis=0)
    off = 1 if batched else 0
    w = (jnp.ones((nz,), jnp.float32) if weights is None
         else jnp.asarray(weights, jnp.float32))
    if use_pallas_local(shape):
        interp = _pallas_interpret()
        ay = ny // 128

        def local(rel, iml, wl):
            return _slab_pallas_local(
                rel, iml, wl, shape, n_space, off, ay, interp
            )

        return jax.shard_map(
            local, mesh=mesh, in_specs=(in_spec, in_spec, P(None)),
            out_specs=out_spec, check_vma=False,
        )(re, im, w)

    def local(rel, iml, wl):
        cl = jax.lax.complex(rel, iml)
        cl = _ifft_axis(cl, cl.ndim - 3)
        if n_space > 1:
            cl = jax.lax.all_to_all(
                cl, SPACE_AXIS, split_axis=off, concat_axis=off + 1, tiled=True
            )
        cl = _ifft_axis(cl, cl.ndim - 2)
        out = _irfft_last(cl, nz, True)
        if weights is not None:
            out = out * wl[None, None, :].astype(out.dtype)
        return out

    return jax.shard_map(
        local, mesh=mesh, in_specs=(in_spec, in_spec, P(None)),
        out_specs=out_spec, check_vma=False,
    )(re, im, w)


def irfftn_slab_reim_xzy(re, im, shape, mesh: Mesh, batched=False,
                         weights=None):
    """Hermitian slab inverse from 'xzy'-layout re/im lattices.

    ``re``/``im``: (.., nx, nzh, ny) sharded along y (the Pallas mesh
    sampler's output layout — no re-layout pass between sampling and
    transform).  Pallas-capable shapes only (callers gate on
    :func:`can_pallas_slab`).  Returns the field sharded along x.
    """
    nx, ny, nz = shape
    n_space = mesh.shape[SPACE_AXIS]
    _check_divisible(shape, n_space)
    if not can_pallas_slab(shape):
        raise ValueError(f"shape {shape} not Pallas-transformable")
    off = 1 if batched else 0
    data = DATA_AXIS if (batched and DATA_AXIS in mesh.shape) else None
    in_spec = (P(data, None, None, SPACE_AXIS) if batched
               else P(None, None, SPACE_AXIS))
    _, out_spec = _specs(mesh, batched, k_axis=1, x_axis=0)
    interp = _pallas_interpret()
    ay = ny // 128
    w = (jnp.ones((nz,), jnp.float32) if weights is None
         else jnp.asarray(weights, jnp.float32))

    def local(rel, iml, wl):
        return _slab_pallas_local(
            rel, iml, wl, shape, n_space, off, ay, interp, xzy=True
        )

    return jax.shard_map(
        local, mesh=mesh, in_specs=(in_spec, in_spec, P(None)),
        out_specs=out_spec, check_vma=False,
    )(re, im, w)


def _slab_pallas_local(re, im, wl, shape, n_space, off, ay, interp,
                       xzy=False):
    """Shard-local body of the Pallas slab inverse (re/im in, field out).

    ``xzy=False``: input (.., nx, nyl, nzh) — the canonical slab
    spectrum layout.  ``xzy=True``: input (.., nx, nzh, nyl) — the
    staged sampler's padding-free order (the mesh Pallas-sampler path
    feeds its kernel output straight in; only the all-to-all concat
    axis and one transpose differ, the kernels and the closing
    digit-fix/tail are shared).

    Both complex passes emit RAW digit order (reorder=False) and the
    closing transpose fixes BOTH digit axes at once (the v5 close),
    eliminating the x-pass's separate digit-reorder HBM pass — measured
    as the entire 1-device-mesh overhead vs the single-chip v5 program
    (scripts/profile_mesh.py, round 5).  This works THROUGH the
    all-to-all because the kernel's digit order is lane-major: raw
    position c*128 + d holds natural x = c + ax*d (ax = nx/128), so a
    contiguous range of the LANE digit d is exactly a natural
    contiguous x slab — splitting the a2a along the d axis (whenever
    n_space divides 128) hands every shard its natural x block, still
    in shard-local digit order (x_loc = c + ax*d'), which the close
    transpose fixes for free.  Shapes with n_space not dividing 128
    fall back to the natural-order x-pass + plain a2a.
    """
    from randomfield_tpu.ops import pallas_fft as pf

    nx, ny, nz = shape
    nzh = nz // 2 + 1
    ax = nx // 128
    lead = re.shape[:off]
    digit_a2a = n_space == 1 or 128 % n_space == 0
    # x-pass on the minor axis:
    #   xyz: (.., nx, nyl, nzh) -> (.., nyl, nzh, nx)
    #   xzy: (.., nx, nzh, nyl) -> (.., nzh, nyl, nx)
    perm = tuple(range(off)) + (off + 1, off + 2, off)
    tre = _B(jnp.transpose(re, perm))
    tim = _B(jnp.transpose(im, perm))
    gre, gim = pf.ifft_minor_pallas_reim(
        tre, tim, reorder=not digit_a2a, interpret=interp
    )
    concat = off + 1 if xzy else off
    if digit_a2a:
        L = 128 // n_space
        if n_space > 1:
            def a2a(g):
                # split the lane digit: block s of d is natural x slab s
                g = g.reshape(*g.shape[:-1], ax, 128)
                return jax.lax.all_to_all(
                    g, SPACE_AXIS, split_axis=off + 3, concat_axis=concat,
                    tiled=True,
                )

            gre, gim = a2a(gre), a2a(gim)
            # xyz: (.., ny, nzh, ax, L) / xzy: (.., nzh, ny, ax, L);
            # y-pass needs (.., nzh, nxl^G', ny) with the shard-local
            # x digit order q = c*L + d'  (x_loc = c + ax*d')
            perm2 = (tuple(range(off)) + (off, off + 2, off + 3, off + 1)
                     if xzy
                     else tuple(range(off)) + (off + 1, off + 2, off + 3, off))
            tre = _B(jnp.transpose(gre, perm2).reshape(*lead, nzh, ax * L, ny))
            tim = _B(jnp.transpose(gim, perm2).reshape(*lead, nzh, ax * L, ny))
        else:
            perm2 = (tuple(range(off)) + (off, off + 2, off + 1) if xzy
                     else tuple(range(off)) + (off + 1, off + 2, off))
            tre = _B(jnp.transpose(gre, perm2))  # (.., nzh, nx^G, ny)
            tim = _B(jnp.transpose(gim, perm2))
        nxl = ax * L
        gre, gim = pf.ifft_minor_pallas_reim(
            tre, tim, reorder=False, interpret=interp
        )

        def close(g):
            # both digit fixes (x: (c, d') -> (d', c); y: (c, d) ->
            # (d, c)) + the kz-minor rotation in ONE transpose
            g6 = g.reshape(*lead, nzh, ax, L, ay, 128)
            permc = tuple(range(off)) + (
                off + 2, off + 1, off + 4, off + 3, off
            )
            return _B(jnp.transpose(g6, permc).reshape(*lead, nxl, ny, nzh))
    else:
        if n_space > 1:
            gre = jax.lax.all_to_all(
                gre, SPACE_AXIS, split_axis=off + 2, concat_axis=concat,
                tiled=True,
            )
            gim = jax.lax.all_to_all(
                gim, SPACE_AXIS, split_axis=off + 2, concat_axis=concat,
                tiled=True,
            )
        # now xyz: (.., ny, nzh, nxl) / xzy: (.., nzh, ny, nxl); the
        # y-pass needs (.., nzh, nxl, ny)
        nxl = gre.shape[off + 2]
        perm2 = (tuple(range(off)) + (off, off + 2, off + 1) if xzy
                 else tuple(range(off)) + (off + 1, off + 2, off))
        tre = _B(jnp.transpose(gre, perm2))  # (.., nzh, nxl, ny)
        tim = _B(jnp.transpose(gim, perm2))
        gre, gim = pf.ifft_minor_pallas_reim(
            tre, tim, reorder=False, interpret=interp
        )

        def close(g):
            # y digit fix (c, d) -> (d, c) + kz-minor rotation in ONE
            # transpose (engine/staged.py:_stages_v5 close)
            g5 = g.reshape(*lead, nzh, nxl, ay, 128)
            permc = tuple(range(off)) + (off + 1, off + 3, off + 2, off)
            return _B(jnp.transpose(g5, permc).reshape(*lead, nxl, ny, nzh))

    cr = close(gre).reshape(-1, ny, nzh)
    ci = close(gim).reshape(-1, ny, nzh)
    f = pf.irfft_tail_pallas(cr, ci, nz, wl, interpret=interp)
    return f.reshape(*lead, nxl, ny, nz)


def rfftn_slab(x, shape, mesh: Mesh, batched=False):
    """Distributed forward r2c FFT (norm='backward': plain sum, no scaling).

    ``x``: real field sharded along x over 'space'; returns the packed
    half-spectrum sharded along ky.  Inverse layout of :func:`irfftn_slab`.

    Local transforms: the two complex passes run the Pallas CT kernels
    (forward via the conjugation identity,
    ops/pallas_fft.py:fft_minor_pallas_reim) on capable shapes/TPU —
    one transpose per pass on re/im lattices instead of the native
    path's transpose pairs around each complex FFT; the r2c head stays
    the native minor-axis kernel.  RF_MESH_PALLAS overrides as in
    :func:`irfftn_slab`.
    """
    nx, ny, nz = shape
    n_space = mesh.shape[SPACE_AXIS]
    _check_divisible(shape, n_space)
    out_spec, in_spec = _specs(mesh, batched, k_axis=1, x_axis=0)
    off = 1 if batched else 0
    if use_pallas_local(shape):
        return jax.shard_map(
            lambda xl: _slab_pallas_forward_local(xl, shape, n_space, off),
            mesh=mesh, in_specs=in_spec, out_specs=out_spec, check_vma=False,
        )(x)

    def local(xl):
        cl = _rfft_last(xl)
        cl = _fft_axis(cl, cl.ndim - 2)
        if n_space > 1:
            cl = jax.lax.all_to_all(
                cl, SPACE_AXIS, split_axis=off + 1, concat_axis=off, tiled=True
            )
        return _fft_axis(cl, cl.ndim - 3)

    return jax.shard_map(
        local, mesh=mesh, in_specs=in_spec, out_specs=out_spec, check_vma=False
    )(x)


def _slab_pallas_forward_local(xl, shape, n_space, off):
    """Shard-local body of the Pallas forward slab transform.

    Schedule (mirror of :func:`_slab_pallas_local`, including the
    round-5 digit-split all-to-all — both complex passes emit RAW digit
    order, the a2a splits the ky LANE digit (a contiguous lane-digit
    range is a natural ky slab), and the single closing transpose fixes
    the kx and local-ky digits together; shapes with n_space not
    dividing 128 fall back to natural-order kernels):

        head    native r2c on the minor kz axis, split re/im
        y-pass  transpose to y minor + forward CT kernel (raw digits)
        a2a     split ky lane digit -> concat x (the slab collective)
        x-pass  transpose to x minor + forward CT kernel (raw digits)
        close   ONE transpose back to (.., nx, nyl, nzh), re-pack
    """
    from randomfield_tpu.ops import pallas_fft as pf

    nx, ny, nz = shape
    ax, ay = nx // 128, ny // 128
    interp = _pallas_interpret()
    digit_a2a = n_space == 1 or 128 % n_space == 0
    # r2c head via the half-length pack (pf.rfft_minor_half_reim): one
    # m = nz/2 point kernel pass instead of the native full-nz complex
    # FFT + slice (can_pallas_slab guarantees the m-point kernel)
    re, im = pf.rfft_minor_half_reim(xl, interpret=interp)
    permy = tuple(range(off)) + (off, off + 2, off + 1)
    tre = _B(jnp.transpose(re, permy))  # (.., nxl, nzh, ny)
    tim = _B(jnp.transpose(im, permy))
    gre, gim = pf.fft_minor_pallas_reim(
        tre, tim, interpret=interp, reorder=not digit_a2a
    )
    if digit_a2a:
        L = 128 // n_space
        if n_space > 1:
            def a2a(g):
                g = g.reshape(*g.shape[:-1], ay, 128)
                return jax.lax.all_to_all(
                    g, SPACE_AXIS, split_axis=off + 3, concat_axis=off,
                    tiled=True,
                )

            gre, gim = a2a(gre), a2a(gim)
            # (.., nx, nzh, ay, L) -> x-pass needs (.., nzh, nyl^G', nx)
            permx = tuple(range(off)) + (off + 1, off + 2, off + 3, off)
            nzh = gre.shape[off + 1]
            tre = _B(jnp.transpose(gre, permx).reshape(
                *gre.shape[:off], nzh, ay * L, nx))
            tim = _B(jnp.transpose(gim, permx).reshape(
                *gim.shape[:off], nzh, ay * L, nx))
        else:
            permx = tuple(range(off)) + (off + 1, off + 2, off)
            tre = _B(jnp.transpose(gre, permx))  # (.., nzh, ny^G, nx)
            tim = _B(jnp.transpose(gim, permx))
        gre, gim = pf.fft_minor_pallas_reim(
            tre, tim, interpret=interp, reorder=False
        )

        def close(g):
            # kx digits (c, d) -> (d, c), local-ky digits (c, d') ->
            # (d', c), kz back to minor: ONE transpose
            lead = g.shape[:off]
            nzh = g.shape[off]
            g6 = g.reshape(*lead, nzh, ay, L, ax, 128)
            permc = tuple(range(off)) + (
                off + 4, off + 3, off + 2, off + 1, off
            )
            return _B(jnp.transpose(g6, permc).reshape(
                *lead, nx, ay * L, nzh))

        return jax.lax.complex(close(gre), close(gim))
    if n_space > 1:
        gre = jax.lax.all_to_all(
            gre, SPACE_AXIS, split_axis=off + 2, concat_axis=off, tiled=True
        )
        gim = jax.lax.all_to_all(
            gim, SPACE_AXIS, split_axis=off + 2, concat_axis=off, tiled=True
        )
    # now (.., nx, nzh, nyl); x-pass needs x minor
    permx = tuple(range(off)) + (off + 1, off + 2, off)
    tre = _B(jnp.transpose(gre, permx))  # (.., nzh, nyl, nx)
    tim = _B(jnp.transpose(gim, permx))
    gre, gim = pf.fft_minor_pallas_reim(tre, tim, interpret=interp)
    permc = tuple(range(off)) + (off + 2, off + 1, off)
    cre = _B(jnp.transpose(gre, permc))  # (.., nx, nyl, nzh)
    cim = _B(jnp.transpose(gim, permc))
    return jax.lax.complex(cre, cim)
