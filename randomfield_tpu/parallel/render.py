"""Sharded render programs: DP ensembles x spatial slab decomposition.

Composition strategy (SURVEY.md section 7, milestone C/D):

* Sampling, symmetrization, sigma-scaling and filtering run as *global*
  jit-level ops with sharding constraints.  JAX's partitionable Threefry
  means ``normal(key, global_shape)`` yields identical values per logical
  index under ANY sharding — so a sharded render equals the single-device
  render without per-shard key bookkeeping, and the Hermitian fixup's
  cross-shard conjugate pairs (hard part #2) lower to two small collective
  permutes on the kz = 0 / Nyquist planes, handled by XLA.
* Only the FFT goes through ``shard_map`` (parallel/dfft.py) — the one
  place where XLA's data-flow sharding would otherwise insert a full
  gather.

Per-(mesh, scene) compiled programs are cached process-wide.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from randomfield_tpu.ops import power as _power
from randomfield_tpu.ops import transform as _transform
from randomfield_tpu.parallel import dfft
from randomfield_tpu.parallel import pencil as _pencil
from randomfield_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS, field_sharding

__all__ = ["make_sharded_render", "make_sharded_render_batch"]

_INV_SQRT2 = 0.7071067811865476


def _core(draws, sigmas, weights, smoothing_length, shape, spacing, mesh, batched):
    nx, ny, nz = shape
    real_dtype = draws.dtype
    re = draws[..., 0, :, :, :] if batched else draws[0]
    im = draws[..., 1, :, :, :] if batched else draws[1]
    z = jax.lax.complex(re, im) * jnp.asarray(_INV_SQRT2, real_dtype)
    z = _transform.symmetrize_with_shape(z, nz=nz, scale_self_conjugate=True)
    c = z * sigmas.astype(real_dtype)
    c = _power.filter_modes(c, shape, spacing, smoothing_length)
    if _pencil.is_pencil_mesh(mesh):
        delta = _pencil.irfftn_pencil(
            c, shape, mesh, batched=batched, assume_hermitian=True
        )
    else:
        delta = dfft.irfftn_slab(
            c, shape, mesh, batched=batched, assume_hermitian=True
        )
    return delta * weights[None, None, :]


@functools.lru_cache(maxsize=32)
def make_sharded_render(mesh: Mesh, shape, spacing, from_seed=False):
    """Compile a single-realization spatially-sharded render for a mesh.

    ``from_seed=True`` makes the program take a uint32 seed scalar and
    derive the PRNG key *inside* jit — required on multi-host meshes,
    where a key committed to one process's local device cannot enter a
    global program (parallel/multihost.py).  Identical draws either way
    (the key value is the same).
    """
    nx, ny, nz = shape
    if _pencil.is_pencil_mesh(mesh):
        # kz stays unsharded here (nzh rarely divides 'spy'); the
        # transform pads kz and reshards inside (pencil_sigma_sharding)
        draws_sharding = NamedSharding(
            mesh, P(None, None, _pencil.SPX_AXIS, None)
        )
        out = _pencil.pencil_field_sharding(mesh)
    else:
        draws_sharding = NamedSharding(mesh, P(None, None, SPACE_AXIS, None))
        out = field_sharding(mesh)

    def fn(key, sigmas, weights, smoothing_length):
        if from_seed:
            key = jax.random.key(key)
        draws = jax.random.normal(key, (2, nx, ny, nz // 2 + 1), sigmas.dtype)
        draws = jax.lax.with_sharding_constraint(draws, draws_sharding)
        return _core(
            draws, sigmas, weights, smoothing_length, shape, spacing, mesh, False
        )

    return jax.jit(fn, out_shardings=out)


@functools.lru_cache(maxsize=32)
def make_sharded_render_batch(mesh: Mesh, shape, spacing, from_seed=False):
    """Compile a seed-batched render: batch over 'data', slabs over 'space'."""
    nx, ny, nz = shape
    data = DATA_AXIS if DATA_AXIS in mesh.shape else None
    if _pencil.is_pencil_mesh(mesh):
        draws_sharding = NamedSharding(
            mesh, P(data, None, None, _pencil.SPX_AXIS, None)
        )
        out = _pencil.pencil_field_sharding(mesh, batched=True)
    else:
        draws_sharding = NamedSharding(
            mesh, P(data, None, None, SPACE_AXIS, None)
        )
        out = field_sharding(mesh, batched=True)

    def fn(keys, sigmas, weights, smoothing_length):
        if from_seed:
            keys = jax.vmap(jax.random.key)(keys)
        draws = jax.vmap(
            lambda k: jax.random.normal(k, (2, nx, ny, nz // 2 + 1), sigmas.dtype)
        )(keys)
        draws = jax.lax.with_sharding_constraint(draws, draws_sharding)
        return _core(
            draws, sigmas, weights, smoothing_length, shape, spacing, mesh, True
        )

    return jax.jit(fn, out_shardings=out)
