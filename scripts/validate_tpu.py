"""On-hardware fidelity gate: render statistics across grid sizes.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/validate_tpu.py
     [--staged]   # additionally gate the 1024^3 staged pipeline

For each size: field variance vs the float64 oracle prediction (must
agree to f32/sampling tolerance) and realized binned P(k) vs the input
table.  This caught the platform FFT defect (see ops/transform.py
"FFT backend selection") — keep running it after any compute-path or
runtime change.  ``--staged`` adds the HBM-ceiling check: one 1024^3
staged render (v2, half-pack c2r) gated on variance, plus the
field-space P(k) against the FFT-free spectrum-space measurement of the
same seed — the full transform machinery validated at scale.
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np

os.makedirs("/tmp/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp  # noqa: E402


def main(sizes=((128, 16.0), (256, 8.0), (512, 4.0))):
    import randomfield_tpu as rf
    from randomfield_tpu.ops.power import interpolate_power
    from randomfield_tpu.ops.transform import fft_backend
    from randomfield_tpu.validate.stats import calculate_power, field_moments

    print(f"fft backend: {fft_backend()}")
    failures = 0
    for n, sp in sizes:
        g = rf.Generator(n, n, n, grid_spacing=sp)
        d = g.generate_delta_field(0, apply_lightcone=False)
        mean, var = field_moments(d)
        ratio = var / g.predicted_variance()
        k, ph, nm = calculate_power(d, sp, nbins=12)
        mask = nm > 1000
        pt = np.asarray(interpolate_power(g.power, jnp.asarray(k[mask], jnp.float32)))
        max_resid = float(np.abs(ph[mask] / pt - 1).max())
        ts = []
        for i in range(3):
            del d
            t0 = time.perf_counter()
            d = g.generate_delta_field(i + 1, apply_lightcone=False)
            _ = float(d[0, 0, 0])
            ts.append(time.perf_counter() - t0)
        ok = abs(ratio - 1) < 0.05 and max_resid < 0.15
        failures += not ok
        print(
            f"{'OK ' if ok else 'FAIL'} {n}^3: var/pred={ratio:.4f} "
            f"max|P resid|={max_resid:.3f} render={min(ts) * 1e3:.0f} ms "
            f"({n**3 / min(ts) / 1e9:.2f} Gcells/s)"
        )
        del g, d
    if failures:
        raise SystemExit(f"{failures} size(s) FAILED the fidelity gate")
    print("fidelity gate PASSED")


def staged_gate(n=1024, sp=2.0, seed=3, sampler="threefry"):
    """1024^3 staged-pipeline check: variance + field-vs-spectrum P(k).

    ``sampler='pallas'`` gates the benchmark headline configuration
    (fused hardware-PRNG sampling kernel with in-VMEM sigma
    interpolation) through the same statistics.
    """
    import randomfield_tpu as rf
    from randomfield_tpu.validate.stats import calculate_power, field_moments

    g = rf.Generator(n, n, n, grid_spacing=sp, sampler=sampler)
    assert g.pipeline == "staged", g.pipeline
    t0 = time.perf_counter()
    d = g.generate_delta_field(seed, apply_lightcone=False)
    _ = float(d[0, 0, 0])
    dt = time.perf_counter() - t0
    mean, var = field_moments(d)
    ratio = var / g.predicted_variance()
    kf, pf, nf = calculate_power(d, sp, nbins=16)
    del d
    ks, ps, ns = g.sample_power(seed, nbins=16)
    mask = nf > 0
    max_dev = float(np.abs(pf[mask] / ps[mask] - 1).max())
    ok = abs(ratio - 1) < 0.05 and max_dev < 2e-3
    print(
        f"{'OK ' if ok else 'FAIL'} staged {n}^3 ({sampler}): "
        f"var/pred={ratio:.4f} "
        f"max|field/spectrum P - 1|={max_dev:.2e} render={dt:.2f} s"
    )
    if not ok:
        raise SystemExit(f"staged 1024^3 ({sampler}) gate FAILED")


def nested_gate(n=256, box=2048.0, seed=5):
    """Nested-sampler hardware gate: statistics + zoom matching on chip.

    Checks the resolution-nested stream renders with the predicted
    variance AND that a half-resolution render of the same box shares
    its low-k spectrum (the zoom contract), both on the real device.
    """
    import randomfield_tpu as rf
    from randomfield_tpu.validate.stats import field_moments

    g_hi = rf.Generator(n, n, n, grid_spacing=box / n, sampler="nested")
    d_hi = g_hi.generate_delta_field(seed, apply_lightcone=False)
    _, var = field_moments(d_hi)
    ratio = var / g_hi.predicted_variance()
    m = n // 2
    g_lo = rf.Generator(m, m, m, grid_spacing=box / m, sampler="nested")
    d_lo = g_lo.generate_delta_field(seed, apply_lightcone=False)
    c_lo = np.fft.rfftn(np.asarray(d_lo, np.float64), norm="forward")
    c_hi = np.fft.rfftn(np.asarray(d_hi, np.float64), norm="forward")
    q = min(8, m // 2 - 1)
    sl = np.r_[0:q, -q:0]  # low |k| rows shared by both grids
    dev = np.abs(c_lo[np.ix_(sl, sl, np.arange(q))]
                 - c_hi[np.ix_(sl, sl, np.arange(q))])
    scale = np.abs(c_lo[np.ix_(sl, sl, np.arange(q))]).max()
    max_dev = float(dev.max() / scale)
    ok = abs(ratio - 1) < 0.05 and max_dev < 1e-3
    print(
        f"{'OK ' if ok else 'FAIL'} nested {n}^3: var/pred={ratio:.4f} "
        f"zoom max|dc|/scale={max_dev:.2e}"
    )
    if not ok:
        raise SystemExit("nested sampler gate FAILED")


if __name__ == "__main__":
    main()
    if "--staged" in sys.argv:
        staged_gate()
    if "--pallas" in sys.argv:
        staged_gate(sampler="pallas")
    if "--nested" in sys.argv:
        nested_gate()
