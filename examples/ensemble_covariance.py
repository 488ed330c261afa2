"""Ensemble P(k)/sigma(R) covariance (config 4 workload, scaled down).

64 seeded realizations rendered as one vmapped program; on a multi-chip
mesh pass ``mesh=make_mesh(data=N)`` to the Generator and the batch
shards over chips with zero render-time communication.
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import randomfield_tpu as rf
from randomfield_tpu.validate import ensemble

gen = rf.Generator(64, 64, 64, grid_spacing=4.0)
seeds = np.arange(64)
fields = gen.generate_delta_fields(seeds, apply_lightcone=False)

k, p_hat, n_modes = ensemble.ensemble_power(fields, gen.grid_spacing, nbins=12)
cov = ensemble.power_covariance(p_hat)
corr = cov / np.sqrt(np.outer(np.diag(cov), np.diag(cov)))

print("bin  k        <P^>        rel.err   (expected ~ sqrt(2/(n_modes*n_seeds)))")
for i in range(len(k)):
    if np.isfinite(p_hat[:, i]).all() and n_modes[i] > 0:
        rel = np.sqrt(cov[i, i]) / p_hat[:, i].mean() / np.sqrt(len(seeds))
        exp = np.sqrt(2.0 / (n_modes[i] * len(seeds)))
        print(f"{i:3d}  {k[i]:.4f}  {p_hat[:, i].mean():10.1f}  {rel:.4f}  ({exp:.4f})")

s8 = [ensemble.sigma_r_from_field(fields[i], gen.grid_spacing, 8.0)
      for i in range(8)]
print(f"\nsigma(8 Mpc/h) realized: {np.mean(s8):.4f} +- {np.std(s8):.4f}")

# For grids near the HBM ceiling, skip fields entirely: the sampled
# spectrum already determines P-hat (no FFT at all) —
k2, p2, n2 = ensemble.sample_power_ensemble(gen, seeds[:16], nbins=12)
print("\nFFT-free spectrum-space ensemble (16 seeds): "
      f"mean P ratio to field-space = "
      f"{np.nanmean(p2.mean(axis=0) / p_hat.mean(axis=0)):.4f}")

# Windowed footprints add super-sample covariance on top of the exact
# Gaussian block: the background mode sampled by the window modulates
# all measured bins coherently (rank-one, fully correlated).
from randomfield_tpu.models import ssc
from randomfield_tpu.ops.power import load_default_power
from randomfield_tpu.validate.ensemble import predicted_power_covariance

table = load_default_power()
mask = np.zeros(fields.shape[1:])
mask[:32, :32, :] = 1.0  # a quarter-box survey footprint
sigma_b = ssc.sigma_b_from_mask(mask, gen.grid_spacing, table)
# NOTE: the Gaussian block below is the FULL-box estimator's (all modes,
# no window convolution); a genuinely windowed P(k) estimate would have
# a different Gaussian block too (fewer modes — roughly the footprint
# volume fraction — plus window mode-coupling).  The printed diagonal
# boost is therefore illustrative of the SSC term's size, not a
# self-consistent windowed-estimator covariance (ADVICE r3).
gauss = predicted_power_covariance(table, fields.shape[1:],
                                   gen.grid_spacing, nbins=12)
total = gauss + ssc.ssc_covariance(table, k, sigma_b)
good = np.isfinite(np.diag(total)) & (np.diag(gauss) > 0)
boost = np.diag(total)[good] / np.diag(gauss)[good]
print(f"\nSSC (quarter-box footprint, sigma_b={sigma_b:.4f}): "
      f"diagonal boost x{boost.min():.3f}-x{boost.max():.3f}")
