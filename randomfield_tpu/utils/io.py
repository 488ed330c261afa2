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
import pathlib

import numpy as np

__all__ = ["save_field", "load_field", "scene_to_json", "scene_from_json"]

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
