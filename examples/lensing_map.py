"""Weak-lensing convergence and shear from one lightcone render.

The engine's default render already carries D(z)/D(0) per plane, so the
Born convergence is a single weighted reduction along the line of sight.

Run: python examples/lensing_map.py
"""

import numpy as np

import randomfield_tpu as rf
from randomfield_tpu.models import lensing

# a 1.3 (Gpc/h)^3 lightcone box, 128^3
g = rf.Generator(128, 128, 128, grid_spacing=10.0)
delta = g.generate_delta_field(seed=42)

for z_source in (0.5, 1.0, 2.0):
    kappa = lensing.convergence_map(
        delta, g.cosmology, g.scene.grid_spacing, z_source=z_source
    )
    k = np.asarray(kappa)
    print(f"z_s = {z_source}: sigma_kappa = {k.std():.5f} "
          f"(mean {k.mean():+.2e})")

# flat-sky shear of the deepest map (Kaiser-Squires)
g1, g2 = lensing.convergence_to_shear(kappa, g.scene.grid_spacing)
g1, g2 = np.asarray(g1), np.asarray(g2)
print(f"shear: sigma_gamma1 = {g1.std():.5f}, sigma_gamma2 = {g2.std():.5f}")
print("E-mode consistency <|gamma|^2>/<kappa^2> =",
      round(float((g1.var() + g2.var()) / np.asarray(kappa).var()), 3))
