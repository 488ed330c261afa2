"""Field + scene serialization.

The reference has no IO layer (fields are regenerated from integer
seeds — SURVEY.md section 5, checkpoint/resume); that philosophy is
kept: the durable artifact is the *scene spec + seed*, which this module
round-trips as JSON, while rendered fields can optionally be exported to
compressed ``.npz`` with full provenance metadata for downstream
analysis pipelines.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pathlib

import numpy as np

__all__ = [
    "save_field",
    "load_field",
    "save_field_sharded",
    "load_field_sharded",
    "scene_to_json",
    "scene_from_json",
]

_FORMAT_VERSION = 1


def save_field(path, delta, generator=None, seed=None, extra=None):
    """Write a rendered field to ``.npz`` with provenance metadata.

    ``generator`` (optional) contributes the scene spec, power table and
    evolution arrays so the file is self-describing; ``seed`` records
    how to regenerate the field exactly.
    """
    path = pathlib.Path(path)
    payload = {"delta": np.asarray(delta), "format_version": _FORMAT_VERSION}
    meta = {"seed": seed}
    if generator is not None:
        meta["scene"] = json.loads(scene_to_json(generator.scene))
        meta["pipeline"] = generator.pipeline
        meta["sampler"] = generator.sampler
        payload["power_k"] = np.asarray(generator.power.k)
        payload["power_pk"] = np.asarray(generator.power.Pk)
        payload["redshifts"] = np.asarray(generator.redshifts)
        payload["growth"] = np.asarray(generator.growth_function)
    if extra:
        meta["extra"] = extra
    payload["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **payload)
    return path


def load_field(path):
    """Read a field written by :func:`save_field` -> (delta, meta dict)."""
    with np.load(path, allow_pickle=False) as f:
        delta = f["delta"]
        meta = json.loads(bytes(f["meta_json"]).decode()) if "meta_json" in f else {}
        for key in ("power_k", "power_pk", "redshifts", "growth"):
            if key in f:
                meta[key] = f[key]
    return delta, meta


def _index_key(index, shape):
    """Stable chunk filename stem from a global index tuple."""
    starts = [
        (sl.start or 0) if isinstance(sl, slice) else int(sl)
        for sl in index
    ]
    return "chunk_" + "_".join(f"{s:08d}" for s in starts)


def save_field_sharded(dirpath, delta, generator=None, seed=None, extra=None):
    """Write a (possibly multi-process) sharded field as per-shard chunks.

    Config-5-scale fields (2048^3 ~ 34 GB float32) must never gather to
    one host; each process writes exactly the blocks it holds to
    ``dirpath/chunk_<x>_<y>_<z>.npz`` (named by global start coordinates,
    so replicated shards — e.g. the 'data' rows of a ('data','space')
    mesh — collide onto one file and are written once, atomically).
    Process 0 (or the only process) writes ``manifest.npz`` with the
    global shape/dtype + the same provenance :func:`save_field` records.

    Works on single-device arrays too (one chunk).
    """
    import jax

    dirpath = pathlib.Path(dirpath)
    dirpath.mkdir(parents=True, exist_ok=True)

    if isinstance(delta, jax.Array):
        shards = [(s.index, np.asarray(s.data)) for s in delta.addressable_shards]
    else:
        arr = np.asarray(delta)
        shards = [(tuple(slice(0, n) for n in arr.shape), arr)]
    gshape = tuple(int(n) for n in delta.shape)

    written = set()
    for index, block in shards:
        stem = _index_key(index, gshape)
        if stem in written:
            continue  # replica within this process
        written.add(stem)
        final = dirpath / f"{stem}.npz"
        # tmp name must be unique ACROSS processes: replicas of the same
        # chunk (e.g. 'data'-axis copies) may be written concurrently by
        # different workers, and only the rename may collide
        tmp = dirpath / f".{stem}.tmp.{os.getpid()}.npz"
        starts = np.asarray(
            [(sl.start or 0) for sl in index], np.int64
        )
        np.savez_compressed(tmp, block=block, starts=starts)
        tmp.replace(final)  # atomic: cross-process replicas write same bytes

    process_index = getattr(jax, "process_index", lambda: 0)()
    if process_index == 0:
        meta = {"seed": seed, "global_shape": list(gshape),
                "dtype": str(np.dtype(delta.dtype))}
        payload = {"format_version": _FORMAT_VERSION}
        if generator is not None:
            meta["scene"] = json.loads(scene_to_json(generator.scene))
            meta["pipeline"] = generator.pipeline
            meta["sampler"] = generator.sampler
            payload["power_k"] = np.asarray(generator.power.k)
            payload["power_pk"] = np.asarray(generator.power.Pk)
            payload["redshifts"] = np.asarray(generator.redshifts)
            payload["growth"] = np.asarray(generator.growth_function)
        if extra:
            meta["extra"] = extra
        payload["meta_json"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )
        # tmp + rename, mirroring the chunk writes above: a crash
        # mid-write must not leave a truncated manifest next to valid
        # chunks (ADVICE r02)
        tmp = dirpath / f".manifest.tmp.{os.getpid()}.npz"
        np.savez_compressed(tmp, **payload)
        tmp.replace(dirpath / "manifest.npz")
    return dirpath


def load_field_sharded(dirpath, sharding=None):
    """Reassemble a field written by :func:`save_field_sharded`.

    With ``sharding=None`` returns the full host array + meta dict.  With
    a ``jax.sharding.NamedSharding``, builds a global device array chunk
    by chunk via ``jax.make_array_from_callback`` — each process reads
    only the file regions its shards cover, so no host ever holds the
    full field.
    """
    dirpath = pathlib.Path(dirpath)
    with np.load(dirpath / "manifest.npz", allow_pickle=False) as f:
        meta = json.loads(bytes(f["meta_json"]).decode()) if "meta_json" in f else {}
        for key in ("power_k", "power_pk", "redshifts", "growth"):
            if key in f:
                meta[key] = f[key]
    gshape = tuple(meta["global_shape"])
    dtype = np.dtype(meta["dtype"])

    paths = sorted(dirpath.glob("chunk_*.npz"))

    def read(p):
        with np.load(p, allow_pickle=False) as f:
            return tuple(f["starts"].tolist()), f["block"]

    if sharding is None:
        out = np.empty(gshape, dtype)
        covered = np.zeros(gshape, bool)
        for p in paths:
            starts, block = read(p)
            sl = tuple(slice(s, s + n) for s, n in zip(starts, block.shape))
            out[sl] = block
            covered[sl] = True
        if not covered.all():
            raise ValueError(f"chunks in {dirpath} do not cover the field")
        return out, meta

    import jax

    # chunk extents without reading payloads: start coords come from the
    # filename, the block shape from the manifest-global shape lattice of
    # start coordinates (chunks tile the grid on a regular lattice)
    starts_all = sorted({
        tuple(int(s) for s in p.stem.split("_")[1:]) for p in paths
    })
    by_start = {tuple(int(s) for s in p.stem.split("_")[1:]): p for p in paths}
    axis_starts = [sorted({s[ax] for s in starts_all}) for ax in range(len(gshape))]
    def extent(start):
        shape = []
        for ax, s in enumerate(start):
            nxt = [v for v in axis_starts[ax] if v > s]
            shape.append((nxt[0] if nxt else gshape[ax]) - s)
        return tuple(shape)

    def make(index):
        lo = [sl.start or 0 for sl in index]
        hi = [sl.stop if sl.stop is not None else n
              for sl, n in zip(index, gshape)]
        block = np.empty([h - l for l, h in zip(lo, hi)], dtype)
        hit = np.zeros(block.shape, bool)
        for starts in starts_all:
            cshape = extent(starts)
            if any(max(lo[ax], starts[ax]) >=
                   min(hi[ax], starts[ax] + cshape[ax])
                   for ax in range(len(gshape))):
                continue  # no overlap: never read this chunk
            _, data = read(by_start[starts])
            isl, osl = [], []
            for ax, (s, n) in enumerate(zip(starts, data.shape)):
                a = max(lo[ax], s)
                b = min(hi[ax], s + n)
                isl.append(slice(a - lo[ax], b - lo[ax]))
                osl.append(slice(a - s, b - s))
            block[tuple(isl)] = data[tuple(osl)]
            hit[tuple(isl)] = True
        if not hit.all():
            raise ValueError(f"chunks in {dirpath} do not cover shard {index}")
        return block

    arr = jax.make_array_from_callback(gshape, sharding, make)
    return arr, meta


def scene_to_json(scene) -> str:
    """Serialize a Scene (including cosmology) to JSON."""
    d = dataclasses.asdict(scene)
    d["dtype"] = np.dtype(scene.dtype).name
    d["cosmology"] = dataclasses.asdict(scene.cosmology)
    return json.dumps(d, indent=2, sort_keys=True)


def scene_from_json(text):
    """Inverse of :func:`scene_to_json`."""
    import jax.numpy as jnp

    from randomfield_tpu.engine.scene import Scene
    from randomfield_tpu.models.cosmology import Cosmology

    d = json.loads(text)
    d["cosmology"] = Cosmology(**d["cosmology"])
    d["dtype"] = jnp.dtype(d["dtype"])
    return Scene(**d)
