"""Statistical validation of the Pallas fused sampler on real TPU.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/validate_pallas_sampler.py

Checks (the reference's own gate style, SURVEY.md section 4):
  * determinism: same seed -> identical spectrum; different seed differs
  * Hermitian structure of the kz = 0 / Nyquist planes
  * per-mode <|c|^2> matches sigma^2 * exp(-k^2 s^2) within sampling noise
  * per-mode mean ~ 0
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np


def run_checks(n_seeds=200, shape=(16, 16, 16), layout="xyz", interpret=False):
    from randomfield_tpu.ops import grid, transform
    from randomfield_tpu.ops.pallas_sampler import (
        SigmaTable, _segment_rows, sample_spectrum_pallas,
    )

    nx, ny, nz = shape
    nzh = nz // 2 + 1
    sigma0, smoothing, spacing = 2.0, 1.5, 1.0
    # flat sigma table: interp returns sigma0 at every k; the kernel
    # zeroes the DC amplitude itself (sigma(0) = 0 convention)
    m, d2, n_knots = _segment_rows(shape, layout)
    sig = SigmaTable(
        -3.0, 6.0 / (n_knots - 1), jnp.full((m, d2), sigma0, jnp.float32)
    )

    a = sample_spectrum_pallas(7, sig, shape, spacing, layout=layout,
                               interpret=interpret)
    b = sample_spectrum_pallas(7, sig, shape, spacing, layout=layout,
                               interpret=interpret)
    c = sample_spectrum_pallas(8, sig, shape, spacing, layout=layout,
                               interpret=interpret)
    a_h, b_h = np.asarray(a.real) + 1j * np.asarray(a.imag), np.asarray(
        b.real
    ) + 1j * np.asarray(b.imag)
    c_h = np.asarray(c.real) + 1j * np.asarray(c.imag)
    assert np.array_equal(a_h, b_h), "same seed must reproduce"
    assert not np.allclose(a_h, c_h), "different seeds must differ"
    z = a_h if layout == "xyz" else a_h.transpose(0, 2, 1)
    # Hermitian check on host (complex arrays cannot transfer to axon)
    from randomfield_tpu.validate import oracle

    proj = oracle.oracle_symmetrize(z, nz=nz, scale_self_conjugate=False)
    assert np.allclose(z, proj, rtol=1e-5, atol=1e-6), "Hermitian planes"

    acc = 0.0
    mean = 0.0
    for s in range(n_seeds):
        v = sample_spectrum_pallas(s, sig, shape, spacing,
                                   smoothing_length=smoothing, layout=layout,
                                   interpret=interpret)
        vn = np.asarray(v.real) + 1j * np.asarray(v.imag)
        acc = acc + np.abs(vn) ** 2
        mean = mean + vn
    var = acc / n_seeds
    mean = mean / n_seeds
    if layout == "xzy":
        var, mean = var.transpose(0, 2, 1), mean.transpose(0, 2, 1)
    km = np.asarray(grid.kmag(shape, spacing))
    expected = np.where(km > 0, sigma0**2, 0.0) * np.exp(
        -((km * smoothing) ** 2)
    )
    assert np.abs(var[km == 0]).max() == 0.0, "DC must be exactly zero"
    mask = expected > 1e-10 * sigma0**2
    rel = var[mask] / expected[mask] - 1
    tol = 6.0 * np.sqrt(2.0 / n_seeds) + 0.05
    assert np.abs(rel).max() < tol, (np.abs(rel).max(), tol)
    assert np.abs(mean).max() < 6 * sigma0 / np.sqrt(n_seeds)
    print(
        f"pallas sampler OK ({layout}): max |var/expected - 1| = "
        f"{np.abs(rel).max():.3f} (tol {tol:.3f}) over {n_seeds} seeds"
    )


if __name__ == "__main__":
    run_checks()
    run_checks(layout="xzy")
