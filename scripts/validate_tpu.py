"""On-hardware fidelity gate: render statistics across grid sizes.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/validate_tpu.py

For each size: field variance vs the float64 oracle prediction (must
agree to f32/sampling tolerance) and realized binned P(k) vs the input
table.  This caught the platform FFT defect (see ops/transform.py
"FFT backend selection") — keep running it after any compute-path or
runtime change.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np


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


if __name__ == "__main__":
    main()
