#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line to stdout.

Headline metric (BASELINE.md): single-chip Gaussian-random-field render
throughput (sample + Hermitian symmetrize + sigma scale + inverse c2r FFT
+ lightcone weighting) in Gcells/s, at the largest grid that fits the
chip; vs_baseline is the speedup over the reference's CPU conditions
(numpy float64 — pyfftw is unavailable in this sandbox; the substitution
is recorded per BASELINE.md): the FASTEST of 5 iterations at 256^3 with
the real growth-function lightcone weights (this VM's CPU throughput
swings 20-70x, so the minimum is the conservative anchor — the
reference's best observed conditions; medians and spreads for 256^3 and
512^3 are recorded in detail).

Diagnostics go to stderr; the LAST stdout line is the JSON contract:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import statistics
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _enable_compile_cache():
    """Compile times through the axon tunnel vary 20 s - 7 min for the
    same program; a persistent cache makes the bench re-runnable."""
    import os

    import jax

    path = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as e:
        log(f"compile cache unavailable: {e}")


def _stats(ts):
    return {
        "median_s": round(statistics.median(ts), 4),
        "min_s": round(min(ts), 4),
        "max_s": round(max(ts), 4),
        "n_iters": len(ts),
    }


def time_tpu_render(n, iters=6):
    """Steady-state seconds per render at n^3 (scene setup amortized)."""
    import randomfield_tpu as rf

    g = rf.Generator(n, n, n, grid_spacing=2048.0 / n)
    d = g.generate_delta_field(0)
    _ = float(d[0, 0, 0])  # force completion (axon dispatch is async)
    ts = []
    for i in range(iters):
        del d
        t0 = time.perf_counter()
        d = g.generate_delta_field(i + 1)
        _ = float(d[0, 0, 0])
        ts.append(time.perf_counter() - t0)
    from randomfield_tpu.validate.stats import field_moments

    var, pred = field_moments(d)[1], g.predicted_variance()
    growth_sq = float(np.mean(np.asarray(g.growth_function) ** 2))
    log(f"  {n}^3: {[round(t * 1e3) for t in ts]} ms; var/pred/<D^2> "
        f"{var:.3f}/{pred:.3f}/{growth_sq:.3f}")
    return statistics.median(ts), ts


def time_cpu_render(n, iters=5):
    """Reference CPU conditions: numpy float64, sigma grid + growth
    weights precomputed (exactly what the reference's Generator caches)."""
    from randomfield_tpu.models.cosmology import (
        Planck13, get_growth_function, get_redshifts,
    )
    from randomfield_tpu.ops.power import load_default_power
    from randomfield_tpu.validate import oracle

    table = load_default_power()
    shape = (n, n, n)
    spacing = 2048.0 / n
    sig = oracle.oracle_sigmas(shape, spacing, (table.k, table.Pk))
    redshifts = get_redshifts(Planck13, n, spacing, scaled_by_h=True)
    weights = np.asarray(get_growth_function(Planck13, redshifts), np.float64)
    nzh = n // 2 + 1
    ts = []
    rng = np.random.RandomState(0)
    for _ in range(iters):
        t0 = time.perf_counter()
        z = (rng.normal(size=(n, n, nzh)) + 1j * rng.normal(size=(n, n, nzh))) / np.sqrt(2)
        z = oracle.oracle_symmetrize(z, nz=n)
        c = z * sig
        field = np.fft.irfftn(c, s=shape, axes=(0, 1, 2), norm="forward")
        field *= weights[None, None, :]
        ts.append(time.perf_counter() - t0)
    log(f"  cpu {n}^3 f64: {[round(t * 1e3) for t in ts]} ms")
    return statistics.median(ts), ts


def time_sample_power(n=1024, seeds=3):
    """Config-4 workload: FFT-free spectrum-space P(k) per seed at n^3."""
    import randomfield_tpu as rf

    g = rf.Generator(n, n, n, grid_spacing=2048.0 / n)
    g.sample_power(0)  # compile + warm
    ts = []
    for s in range(1, seeds + 1):
        t0 = time.perf_counter()
        g.sample_power(s)
        ts.append(time.perf_counter() - t0)
    log(f"  {n}^3 sample_power: {[round(t * 1e3) for t in ts]} ms/seed")
    return statistics.median(ts), ts


def pallas_gate():
    """Standing per-round hardware check of the Pallas sampler stream."""
    import pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "scripts"))
    try:
        from validate_pallas_sampler import run_checks

        run_checks(n_seeds=100, shape=(16, 16, 16), layout="xyz")
        run_checks(n_seeds=50, shape=(16, 16, 16), layout="xzy")
        return {"ok": True}
    except Exception as e:  # never fail the bench contract on the gate
        log(f"  pallas gate FAILED: {type(e).__name__}: {str(e)[:200]}")
        return {"ok": False, "error": f"{type(e).__name__}: {str(e)[:200]}"}


def main():
    detail = {}
    _enable_compile_cache()

    log("CPU float64 baseline (reference conditions; numpy.fft for pyfftw):")
    t_cpu = time.perf_counter()
    _, ts = time_cpu_render(256, iters=5)
    # conservative anchor: the FASTEST iteration, i.e. the reference's
    # best observed conditions on this VM (its CPU throughput swings
    # 20-70x; the median would flatter vs_baseline in a slow phase)
    cpu_gcells = 256**3 / min(ts) / 1e9
    detail["cpu_f64_256"] = dict(_stats(ts), gcells_per_s=round(cpu_gcells, 4))
    elapsed = time.perf_counter() - t_cpu
    if elapsed < 180.0:
        dt, ts = time_cpu_render(512, iters=2)
        detail["cpu_f64_512"] = dict(
            _stats(ts), gcells_per_s=round(512**3 / dt / 1e9, 4)
        )
    else:
        # this VM's CPU throughput swings ~20-70x (noisy neighbors /
        # steal); in a slow phase the 512^3 f64 point alone would take
        # tens of minutes and endanger the whole artifact
        detail["cpu_f64_512"] = {
            "skipped": f"cpu slow phase ({elapsed:.0f}s for the 256^3 run)"
        }

    log("TPU renders:")
    headline_n, headline_dt = None, None
    for n in (512, 1024):
        try:
            dt, ts = time_tpu_render(n)
            detail[f"tpu_{n}"] = dict(
                _stats(ts), gcells_per_s=round(n**3 / dt / 1e9, 2)
            )
            headline_n, headline_dt = n, dt
        except Exception as e:  # 1024^3 sits at the 16 GB HBM boundary
            log(f"  {n}^3 failed: {type(e).__name__}: {str(e)[:120]}")
            detail[f"tpu_{n}"] = {"error": type(e).__name__}
            break

    if headline_n == 1024:
        try:
            log("Config-4 ensemble rate (FFT-free spectrum-space P(k)):")
            dt, ts = time_sample_power(1024)
            detail["tpu_1024_sample_power"] = dict(
                _stats(ts), seeds_per_s=round(1.0 / dt, 2)
            )
        except Exception as e:
            detail["tpu_1024_sample_power"] = {"error": type(e).__name__}
            log(f"  sample_power failed: {type(e).__name__}: {str(e)[:120]}")

    log("Pallas sampler hardware gate:")
    detail["pallas_gate"] = pallas_gate()
    log(f"  pallas gate: {detail['pallas_gate']}")

    if headline_n is None:
        print(json.dumps({"metric": "render_throughput_single_chip",
                          "value": 0.0, "unit": "Gcells/s",
                          "vs_baseline": 0.0, "detail": detail}))
        return

    gcells = headline_n**3 / headline_dt / 1e9
    out = {
        "metric": f"{headline_n}^3 render (sample+irfftn+lightcone), single chip",
        "value": round(gcells, 3),
        "unit": "Gcells/s",
        "vs_baseline": round(gcells / cpu_gcells, 1),
        "detail": detail,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    import pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    main()
