#!/usr/bin/env python
"""AOT-compile config 5 — 2048^3 sharded renders — for a v5p-16 topology.

BASELINE.json config 5 ("2048^3 single field sharded across v5p-16")
has never existed at size on real hardware in this sandbox (one v5e
chip).  This script closes the compile half of that gap (VERDICT r4
item 2): it lowers and compiles the production mesh programs against a
**libtpu compile-only topology descriptor** — real Mosaic kernels, real
GSPMD partitioning, real memory budgeting for the target chip — and
records per-device memory analysis plus the collective operations found
in the optimized HLO.

    v5p-16 = a 2x2x2 chip slice = 8 megacore JAX devices ("TPU v5",
    95 GiB HBM/chip).  jax.experimental.topologies resolves it via
    topology name "v5p:2x2x2" without any TPU attached.

Programs compiled (the production builders, not reimplementations):
  * slab render, hardware-PRNG sampler  (parallel/render.py:
    make_sharded_render_pallas, space=8)
  * slab render, Threefry + per-shard Pallas sigma scale
    (make_sharded_render, scale_kernel=True)
  * pencil render, hardware-PRNG sampler (spx=4, spy=2)
  * forward transform (parallel/dfft.py:rfftn_slab) — the P(k)
    estimator's distributed FFT
  * spectrum-space sample_power bins (make_sharded_spectrum_bins)

Run (CPU host; kernels compile for the TPU target, not the interpreter):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    RF_MESH_PALLAS=1 RF_PALLAS_INTERPRET=0 \
    python scripts/aot_config5.py [--grid 2048] [--topology v5p:2x2x2] \
        [--out docs/config5_aot.json]

Writes one JSON artifact with, per program: per-device argument /
output / temp / peak bytes from XLA's memory analysis, and a table of
collectives (op kind, result shape, bytes) parsed from the optimized
HLO.  Execution is impossible on compile-only devices by construction —
this artifact is evidence of *compilability and memory fit*, paired
with the numerically-verified execution of the same program builders on
the 8-device CPU mesh (tests) and the real chip (bench).
"""

import argparse
import json
import os
import pathlib
import re
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

os.environ.setdefault("RF_MESH_PALLAS", "1")
os.environ.setdefault("RF_PALLAS_INTERPRET", "0")

import jax
import jax.numpy as jnp
import numpy as np

_COLLECTIVE_RE = re.compile(
    r"=\s+((?:\([^)]*\)|\S+))\s+"
    r"(all-to-all|all-reduce|collective-permute|all-gather|reduce-scatter)"
    r"(?:-start)?\("
)
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1,
    "c64": 8, "c128": 16,
}


def _shape_bytes(shape_str):
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def collective_stats(hlo_text):
    """[{kind, shape, bytes, count}] aggregated over the optimized HLO."""
    agg = {}
    for m in _COLLECTIVE_RE.finditer(hlo_text):
        shape_str, kind = m.group(1), m.group(2)
        key = (kind, shape_str)
        if key not in agg:
            agg[key] = {
                "kind": kind, "result_shape": shape_str,
                "result_bytes_per_device": _shape_bytes(shape_str),
                "count": 0,
            }
        agg[key]["count"] += 1
    return sorted(
        agg.values(),
        key=lambda r: -r["result_bytes_per_device"] * r["count"],
    )


def memory_report(compiled):
    ma = compiled.memory_analysis()
    out = {}
    for k in (
        "argument_size_in_bytes", "output_size_in_bytes",
        "temp_size_in_bytes", "alias_size_in_bytes",
        "generated_code_size_in_bytes",
    ):
        v = getattr(ma, k, None)
        if v is not None:
            out[k] = int(v)
    args = out.get("argument_size_in_bytes", 0)
    alias = out.get("alias_size_in_bytes", 0)
    out["peak_estimate_bytes"] = (
        args + out.get("output_size_in_bytes", 0)
        + out.get("temp_size_in_bytes", 0) - alias
    )
    out["peak_estimate_gib"] = round(out["peak_estimate_bytes"] / 2**30, 3)
    return out


def compile_one(name, fn, args, results, hbm_gib):
    t0 = time.perf_counter()
    try:
        lowered = fn.lower(*args)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        rep = memory_report(compiled)
        cols = collective_stats(compiled.as_text())
        fits = rep["peak_estimate_gib"] < hbm_gib
        results[name] = {
            "ok": True,
            "lower_s": round(t_lower, 1),
            "compile_s": round(t_compile, 1),
            "memory_per_device": rep,
            "fits_hbm": fits,
            "collectives": cols[:12],
            "n_collective_kinds": len(cols),
        }
        print(f"  {name}: compiled in {t_compile:.0f}s, per-device peak "
              f"~{rep['peak_estimate_gib']} GiB, "
              f"{sum(c['count'] for c in cols)} collectives", flush=True)
    except Exception as e:
        results[name] = {
            "ok": False, "error": f"{type(e).__name__}: {str(e)[:500]}"
        }
        print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=2048)
    ap.add_argument("--topology", default="v5p:2x2x2")
    ap.add_argument("--hbm-gib", type=float, default=95.0,
                    help="per-device HBM of the target (v5p: 95 GiB)")
    ap.add_argument("--out", default="docs/config5_aot.json")
    args = ap.parse_args()

    from jax.experimental import topologies

    import randomfield_tpu  # noqa: F401  (path setup)
    from randomfield_tpu.ops import power as _power
    from randomfield_tpu.ops.pallas_sampler import make_sigma_table
    from randomfield_tpu.parallel import dfft
    from randomfield_tpu.parallel import render as prender
    from randomfield_tpu.parallel.mesh import SPACE_AXIS, make_mesh
    from randomfield_tpu.parallel.pencil import make_pencil_mesh

    n = args.grid
    shape = (n, n, n)
    spacing = 2048.0 * 4.0 / n  # ~4 Mpc/h cells at 2048^3
    topo = topologies.get_topology_desc(args.topology, platform="tpu")
    devs = topo.devices
    nd = len(devs)
    print(f"topology {args.topology}: {nd} devices, kind "
          f"{devs[0].device_kind!r}", flush=True)

    results = {
        "topology": args.topology,
        "n_devices": nd,
        "device_kind": str(devs[0].device_kind),
        "grid": n,
        "spacing": spacing,
        "hbm_gib_per_device": args.hbm_gib,
        "date": time.strftime("%Y-%m-%d"),
        "jax": jax.__version__,
        "programs": {},
    }
    progs = results["programs"]

    table = _power.load_default_power()
    tab_xzy = make_sigma_table(table, shape, spacing, layout="xzy")
    tab_xyz = make_sigma_table(table, shape, spacing, layout="xyz")
    weights = np.ones((n,), np.float32)
    lk, val, _logv = _power.table_arrays_host(table, "log10k", jnp.float32)

    # --- slab, hardware-PRNG sampler ---
    mesh = make_mesh(data=1, space=nd, devices=devs)
    lk0, dlk, stab = tab_xzy
    if prender.can_mesh_pallas(mesh, shape):
        fn = prender.make_sharded_render_pallas(mesh, shape, spacing)
        compile_one(
            f"slab_space{nd}_pallas_render", fn,
            (np.int32(0), np.float32(0.0), np.float32(lk0),
             np.float32(1.0 / dlk), np.asarray(stab), weights),
            progs, args.hbm_gib,
        )
    else:
        progs[f"slab_space{nd}_pallas_render"] = {
            "ok": False, "error": "shape not mesh-pallas-capable at this "
            "grid/space (ny % (128*space) != 0)"}

    # --- slab, Threefry + per-shard Pallas sigma scale ---
    fn = prender.make_sharded_render(mesh, shape, spacing,
                                     scale_kernel=True)
    lk0x, dlkx, stabx = tab_xyz
    compile_one(
        f"slab_space{nd}_threefry_render", fn,
        (jax.random.key(0),
         np.asarray(lk), np.asarray(val),
         (np.float32(lk0x), np.float32(1.0 / dlkx), np.asarray(stabx)),
         weights, np.float32(0.0)),
        progs, args.hbm_gib,
    )

    # --- pencil, hardware-PRNG sampler ---
    px = max(2, nd // 2)
    py = nd // px
    pmesh = make_pencil_mesh(data=1, spx=px, spy=py, devices=devs)
    if prender.can_mesh_pallas(pmesh, shape):
        fnp = prender.make_sharded_render_pallas(pmesh, shape, spacing)
        compile_one(
            f"pencil_{px}x{py}_pallas_render", fnp,
            (np.int32(0), np.float32(0.0), np.float32(lk0),
             np.float32(1.0 / dlk), np.asarray(stab), weights),
            progs, args.hbm_gib,
        )
    else:
        progs[f"pencil_{px}x{py}_pallas_render"] = {
            "ok": False, "error": "shape not mesh-pallas-capable"}

    # --- forward transform (the P(k) estimator's distributed FFT) ---
    from jax.sharding import NamedSharding, PartitionSpec as P

    fwd = jax.jit(lambda x: dfft.rfftn_slab(x, shape, mesh))
    # field enters sharded along x (the render output layout)
    xs = jax.ShapeDtypeStruct(
        shape, jnp.float32,
        sharding=NamedSharding(mesh, P(SPACE_AXIS, None, None)),
    )
    compile_one(f"rfftn_slab_space{nd}", fwd, (xs,), progs, args.hbm_gib)

    # --- spectrum-space sample_power (config 4 on the mesh) ---
    # the production TPU default: per-shard Pallas sigma scale kernel
    # (no sigma grid input)
    fsp = prender.make_sharded_spectrum_bins(mesh, shape, spacing,
                                             nbins=32, scale_kernel=True)
    compile_one(
        f"sample_power_bins_space{nd}", fsp,
        (jax.random.key(0), np.asarray(lk), np.asarray(val),
         (np.float32(lk0x), np.float32(1.0 / dlkx), np.asarray(stabx)),
         np.float32(0.0)),
        progs, args.hbm_gib,
    )

    ok = all(p.get("ok") for p in progs.values())
    results["all_ok"] = ok
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out} (all_ok={ok})", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
