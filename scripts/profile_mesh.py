#!/usr/bin/env python
"""Stage attribution of the mesh-pallas render vs the single-chip v5 program.

VERDICT r4 item 1: the 1-device-mesh 1024^3 render is 1.40x the
single-chip program (283 vs 202 ms) and the overhead was unattributed.
This script times chained partial programs of the mesh path
(parallel/render.py:make_sharded_render_pallas) so each stage's marginal
cost is measured, same discipline as docs/performance.md's staged-path
budget:

    sample      shard_map Pallas sampler only
    sym         + jit-level Hermitian fixup (symmetrize_xzy_reim)
    full        + shard_map slab transform (irfftn_slab_reim_xzy)
    xfold       full, but the x-pass runs reorder=False and the close
                transpose fixes BOTH digit axes (the v5 close) — valid
                whenever the all-to-all is absent (n_space == 1) or the
                a2a is taught to carry digit-blocked x (see notes)
    tr_only     transform alone on pre-materialized inputs

Reference points: the single-chip v5 program and its sampler stage.

Run:  python scripts/profile_mesh.py [N]
"""

import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

import randomfield_tpu as rf
from randomfield_tpu.engine import staged as _staged
from randomfield_tpu.ops import pallas_fft as pf
from randomfield_tpu.ops import pallas_sampler as ps
from randomfield_tpu.ops import transform as _transform
from randomfield_tpu.parallel import dfft
from randomfield_tpu.parallel.mesh import SPACE_AXIS, make_mesh
from randomfield_tpu.parallel.render import _mesh_specs


def _force(out):
    # axon dispatch is async and block_until_ready does not block; a
    # host scalar fetch does (same discipline as bench.py)
    for leaf in jax.tree_util.tree_leaves(out):
        _ = float(leaf.ravel()[0])


def timeit(f, *args, iters=5):
    out = f(*args)
    _force(out)
    ts = []
    for _ in range(iters):
        del out
        t0 = time.perf_counter()
        out = f(*args)
        _force(out)
        ts.append(time.perf_counter() - t0)
    del out
    return min(ts), statistics.median(ts)


_B = jax.lax.optimization_barrier


def build_mesh_partial(mesh, shape, spacing, upto):
    """Truncated copies of make_sharded_render_pallas's program."""
    nx, ny, nz = shape
    n_space = mesh.shape[SPACE_AXIS]
    nyl = ny // n_space
    interp = False
    _, _, out_shard = _mesh_specs(mesh, batched=False)
    spec_sharding = NamedSharding(mesh, P(None, None, SPACE_AXIS))

    def sample_local(seed, sm, lk0, inv_dlk, stab):
        toff = jax.lax.axis_index(SPACE_AXIS) * (nyl // 128)
        return ps.sample_shard_pallas_reim(
            seed[0], sm[0], lk0[0], inv_dlk[0], stab, toff,
            shape, spacing, nyl, interpret=interp,
            row_offset=jnp.int32(0), shard_rows=nx,
        )

    def fn(seed, smoothing_length, lk0, inv_dlk, stab, weights):
        re, im = jax.shard_map(
            sample_local, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P()),
            out_specs=(spec_sharding.spec, spec_sharding.spec),
            check_vma=False,
        )(
            jnp.asarray(seed, jnp.int32).reshape(1),
            jnp.asarray(smoothing_length, jnp.float32).reshape(1),
            jnp.asarray(lk0, jnp.float32).reshape(1),
            jnp.asarray(inv_dlk, jnp.float32).reshape(1),
            stab,
        )
        re = jax.lax.with_sharding_constraint(re, spec_sharding)
        im = jax.lax.with_sharding_constraint(im, spec_sharding)
        if upto == "sample":
            return re, im
        re, im = _transform.symmetrize_xzy_reim(re, im, nz)
        if upto == "sym":
            return re, im
        return dfft.irfftn_slab_reim_xzy(
            re, im, shape, mesh, batched=False, weights=weights
        )

    if upto == "full":
        return jax.jit(fn, out_shardings=out_shard)
    return jax.jit(fn)


def build_mesh_xfold(mesh, shape, spacing):
    """Mesh program with the v5-style close: x-pass reorder=False, both
    digit fixes in the close transpose.  n_space == 1 only (no a2a)."""
    nx, ny, nz = shape
    nzh = nz // 2 + 1
    n_space = mesh.shape[SPACE_AXIS]
    assert n_space == 1
    nyl = ny
    ax, ay = nx // 128, ny // 128
    _, _, out_shard = _mesh_specs(mesh, batched=False)
    spec_sharding = NamedSharding(mesh, P(None, None, SPACE_AXIS))

    def sample_local(seed, sm, lk0, inv_dlk, stab):
        toff = jax.lax.axis_index(SPACE_AXIS) * (nyl // 128)
        return ps.sample_shard_pallas_reim(
            seed[0], sm[0], lk0[0], inv_dlk[0], stab, toff,
            shape, spacing, nyl, interpret=False,
            row_offset=jnp.int32(0), shard_rows=nx,
        )

    def local_transform(rel, iml, wl):
        # v5 schedule verbatim (engine/staged.py:_stages_v5) from the
        # xzy layout: (nx, nzh, ny) -> transpose -> K1(raw) -> transpose
        # -> K2(raw) -> ONE close transpose fixing both digit axes
        tre = _B(jnp.transpose(rel, (1, 2, 0)))   # (nzh, ny, nx)
        tim = _B(jnp.transpose(iml, (1, 2, 0)))
        gre, gim = pf.ifft_minor_pallas_reim(tre, tim, reorder=False)
        tre = _B(jnp.transpose(gre, (0, 2, 1)))   # (nzh, x^G, ny)
        tim = _B(jnp.transpose(gim, (0, 2, 1)))
        gre, gim = pf.ifft_minor_pallas_reim(tre, tim, reorder=False)

        def close(g):
            g5 = g.reshape(nzh, ax, 128, ay, 128)
            return _B(g5.transpose(2, 1, 4, 3, 0).reshape(nx, ny, nzh))

        return pf.irfft_tail_pallas(close(gre), close(gim), nz, wl)

    def fn(seed, smoothing_length, lk0, inv_dlk, stab, weights):
        re, im = jax.shard_map(
            sample_local, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P()),
            out_specs=(spec_sharding.spec, spec_sharding.spec),
            check_vma=False,
        )(
            jnp.asarray(seed, jnp.int32).reshape(1),
            jnp.asarray(smoothing_length, jnp.float32).reshape(1),
            jnp.asarray(lk0, jnp.float32).reshape(1),
            jnp.asarray(inv_dlk, jnp.float32).reshape(1),
            stab,
        )
        re = jax.lax.with_sharding_constraint(re, spec_sharding)
        im = jax.lax.with_sharding_constraint(im, spec_sharding)
        re, im = _transform.symmetrize_xzy_reim(re, im, nz)
        w = jnp.asarray(weights, jnp.float32)
        return jax.shard_map(
            local_transform, mesh=mesh,
            in_specs=(spec_sharding.spec, spec_sharding.spec, P(None)),
            out_specs=P(SPACE_AXIS, None, None), check_vma=False,
        )(re, im, w)

    return jax.jit(fn, out_shardings=out_shard)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    shape = (n, n, n)
    spacing = 2048.0 / n
    g = rf.Generator(n, n, n, grid_spacing=spacing, sampler="pallas")
    lk0, dlk, stab = g._pallas_table
    stab = jnp.asarray(stab)
    weights = g._weights(True)
    args = (7, 0.0, lk0, 1.0 / dlk, stab, weights)

    print(f"== {n}^3 stage attribution ==")

    def want(name):
        return only is None or name in only

    marks = {}
    base_single = None
    if want("single"):
        fused = _staged._render_v5_single(shape, spacing, "float32")
        t, med = timeit(
            fused, jnp.uint32(7), jnp.float32(0.0), jnp.float32(lk0),
            jnp.float32(1.0 / dlk), stab, weights,
        )
        print(f"single v5 full        : {t*1e3:8.1f} ms (median {med*1e3:.1f})")
        base_single = t

    if want("ssample"):
        samp = jax.jit(
            lambda s, sm, a, b, st: ps._sample_jit_reim(
                s, sm, a, b, st, shape, spacing, "xzy", False
            )
        )
        t, med = timeit(
            samp, jnp.uint32(7), jnp.float32(0.0), jnp.float32(lk0),
            jnp.float32(1.0 / dlk), stab,
        )
        print(f"single sampler+fixup  : {t*1e3:8.1f} ms (median {med*1e3:.1f})")

    mesh = make_mesh(data=1, space=1)
    for upto in ("sample", "sym", "full"):
        if not want(upto):
            continue
        fn = build_mesh_partial(mesh, shape, spacing, upto)
        t, med = timeit(fn, *args)
        marks[upto] = t
        print(f"mesh upto {upto:<12}: {t*1e3:8.1f} ms (median {med*1e3:.1f})")

    if want("xfold"):
        fn = build_mesh_xfold(mesh, shape, spacing)
        t, med = timeit(fn, *args)
        marks["xfold"] = t
        print(f"mesh xfold (v5 close) : {t*1e3:8.1f} ms (median {med*1e3:.1f})")

    if base_single:
        for k in ("full", "xfold"):
            if k in marks:
                print(f"{k} vs single: {marks[k]/base_single:8.3f}x")


if __name__ == "__main__":
    main()
