"""Regenerate randomfield_tpu/data/default_power.dat.

The reference ships a CAMB-tabulated default linear P(k)
(randomfield/data/, SURVEY.md section 2); with no Boltzmann solver in this
environment the shipped table is the full Eisenstein-Hu 1998 fit at
Planck13, normalized to sigma8 = 0.8288.  Columns: k [h/Mpc], P [(Mpc/h)^3].
"""

import pathlib

import numpy as np

from randomfield_tpu.models.powerspec import make_power_table

out = pathlib.Path(__file__).resolve().parent.parent / "randomfield_tpu" / "data"
out.mkdir(exist_ok=True)
k, pk = make_power_table()
header = (
    "default linear matter power spectrum, Eisenstein & Hu 1998 (with BAO),\n"
    "Planck13 (H0=67.77, Om0=0.30712, Ob0=0.048252, ns=0.9611), sigma8=0.8288\n"
    "k [h/Mpc]    P(k) [(Mpc/h)^3]"
)
np.savetxt(out / "default_power.dat", np.column_stack([k, pk]), header=header)
print(f"wrote {out / 'default_power.dat'} ({k.size} rows)")
