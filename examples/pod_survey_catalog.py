"""Pod-scale survey workflow: sharded mocks -> sharded painting -> FKP.

Everything stays mesh-sharded end to end — the density field, the
painted survey grids and the estimator's spectrum never gather to one
device.  Scaled down here (a virtual CPU mesh works:
``XLA_FLAGS=--xla_force_host_platform_device_count=8``); on a pod the
same code spans real chips (docs/parallelism.md).

Pipeline:
1. a biased lognormal tracer intensity from a sharded render
   (models/halos.py HaloGenerator with mesh= — the counts cube is
   bit-identical to the single-device one),
2. a host-side compaction to (3, N) positions,
3. sharded TSC painting + FKP against a uniform randoms catalog
   (parallel/paint.py; validate/fkp.py with mesh=),
4. the deconvolved, shot-subtracted P(k) vs the halo model expectation.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from randomfield_tpu.models.halos import HaloGenerator
from randomfield_tpu.parallel.mesh import make_mesh
from randomfield_tpu.validate.fkp import fkp_power

n, spacing = 64, 8.0
mesh = make_mesh(data=1, space=2)
box = n * spacing

hg = HaloGenerator(n, n, n, grid_spacing=spacing, mmin=1e13, mmax=1e15,
                   nbins_mass=2, fit="st", mesh=mesh)
positions, masses = hg.generate_halo_catalog(seed=1)
print(f"catalog: {len(masses)} halos "
      f"(expected {hg.expected_counts().sum():.0f}), "
      f"biases {np.round(hg.bias, 2)}")

rng = np.random.RandomState(99)
randoms = rng.uniform(0, box, size=(3, 20 * len(masses))).astype(np.float32)

est = fkp_power(
    positions.astype(np.float32).T, randoms, spacing, (n, n, n),
    nbins=10, window="tsc", mesh=mesh,
)
k_exp, p_exp, cnt = hg.predicted_combined_power(nbins=10, shot_noise=False)

print(f"alpha {est.alpha:.4f}, shot noise {est.shot_noise:.1f} (Mpc/h)^3")
print("bin  k          P_FKP        P_model")
for i in range(len(est.k)):
    if est.n_modes[i] > 0 and np.isfinite(est.p[i]):
        print(f"{i:3d}  {est.k[i]:8.4f}  {est.p[i]:11.1f}  {p_exp[i]:11.1f}")
