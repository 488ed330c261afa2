"""Statistical validation of the Pallas fused sampler on real TPU.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/validate_pallas_sampler.py

Checks (the reference's own gate style, SURVEY.md section 4):
  * determinism: same seed -> identical spectrum; different seed differs
  * Hermitian structure of the kz = 0 / Nyquist planes
  * per-mode <|c|^2> matches sigma^2 * exp(-k^2 s^2) within sampling
    noise (tol ~ 6 sqrt(2/n): a doubled-variance mode CANNOT pass at the
    default n_seeds = 2000, unlike the round-3 gate's n = 100)
  * POOLED per-|k|-shell variance ratio at percent-level tolerance
    (catches small but coherent biases that per-mode noise hides)
  * third/fourth standardized moments of the re/im components pooled
    over interior modes (Box-Muller Gaussianity: a uniform-bit or
    correlated-tile bug shifts kurtosis far outside the band)
  * per-mode mean ~ 0

All n_seeds draws accumulate ON DEVICE through one lax.scan program
(one host transfer of eight 16^3 moment lattices), so the default
2000-seed gate costs seconds of hardware time, not minutes.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _moment_scan(seeds, sig, shape, spacing, smoothing, layout, interpret):
    """Σ re, Σ im, Σ re^2, Σ im^2, Σ re^3+im^3, Σ re^4+im^4 per mode."""
    from randomfield_tpu.ops.pallas_sampler import _sample_jit_reim, _sample_jit

    lk0, dlk, stab = sig
    inv_dlk = 1.0 / float(dlk)

    def draw(s):
        if layout == "xzy":
            re, im = _sample_jit_reim(
                s, smoothing, float(lk0), inv_dlk, stab, shape,
                float(spacing), layout, interpret,
            )
        else:
            c = _sample_jit(
                s, smoothing, float(lk0), inv_dlk, stab, shape,
                float(spacing), layout, interpret,
            )
            re, im = jnp.real(c), jnp.imag(c)
        return re, im

    @jax.jit
    def run(seeds):
        def body(acc, s):
            re, im = draw(s)
            re2, im2 = re * re, im * im
            return (
                acc[0] + re, acc[1] + im, acc[2] + re2, acc[3] + im2,
                acc[4] + re2 * re + im2 * im,
                acc[5] + re2 * re2 + im2 * im2,
            ), None

        d1 = shape[1] if layout == "xyz" else shape[2] // 2 + 1
        d2 = shape[2] // 2 + 1 if layout == "xyz" else shape[1]
        z = jnp.zeros((shape[0], d1, d2), jnp.float32)
        acc, _ = jax.lax.scan(body, (z, z, z, z, z, z), seeds)
        return acc

    return [np.asarray(a, np.float64) for a in run(seeds)]


def run_checks(n_seeds=2000, shape=(16, 16, 16), layout="xyz",
               interpret=False):
    from randomfield_tpu.ops import grid
    from randomfield_tpu.ops.pallas_sampler import (
        SigmaTable, _segment_rows, sample_spectrum_pallas,
    )
    from randomfield_tpu.validate import oracle

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
    a_h = np.asarray(a.real) + 1j * np.asarray(a.imag)
    b_h = np.asarray(b.real) + 1j * np.asarray(b.imag)
    c_h = np.asarray(c.real) + 1j * np.asarray(c.imag)
    assert np.array_equal(a_h, b_h), "same seed must reproduce"
    assert not np.allclose(a_h, c_h), "different seeds must differ"
    z = a_h if layout == "xyz" else a_h.transpose(0, 2, 1)
    # Hermitian check on host (complex arrays cannot transfer to axon)
    proj = oracle.oracle_symmetrize(z, nz=nz, scale_self_conjugate=False)
    assert np.allclose(z, proj, rtol=1e-5, atol=1e-6), "Hermitian planes"

    seeds = jnp.arange(n_seeds, dtype=jnp.int32)
    s1r, s1i, s2r, s2i, s3, s4 = _moment_scan(
        seeds, sig, shape, spacing, smoothing, layout, interpret
    )
    if layout == "xzy":
        s1r, s1i, s2r, s2i, s3, s4 = (
            t.transpose(0, 2, 1) for t in (s1r, s1i, s2r, s2i, s3, s4)
        )
    n = float(n_seeds)
    var = (s2r + s2i) / n
    mean = np.abs(s1r + 1j * s1i) / n

    km = np.asarray(grid.kmag(shape, spacing))
    expected = np.where(km > 0, sigma0**2, 0.0) * np.exp(
        -((km * smoothing) ** 2)
    )
    assert np.abs(var[km == 0]).max() == 0.0, "DC must be exactly zero"
    mask = expected > 1e-10 * sigma0**2
    rel = var[mask] / expected[mask] - 1
    # per-mode: |c|^2/sigma^2 has unit relative std per draw (complex);
    # 0.02 margin absorbs the (here ~0) table-interp error
    tol = 6.0 * np.sqrt(2.0 / n) + 0.02
    assert np.abs(rel).max() < tol, (np.abs(rel).max(), tol)
    assert mean[mask].max() < 6 * sigma0 / np.sqrt(n)

    # pooled per-|k|-shell variance ratio: percent-level power check
    ratio = np.zeros_like(var)
    ratio[mask] = var[mask] / expected[mask]
    edges = np.linspace(km[mask].min(), km.max() * (1 + 1e-6), 9)
    shell_rel = []
    for lo, hi in zip(edges[:-1], edges[1:]):
        sel = mask & (km >= lo) & (km < hi)
        M = int(sel.sum())
        if M == 0:
            continue
        r = ratio[sel].mean() - 1.0
        stol = 6.0 / np.sqrt(M * n) + 0.01
        assert abs(r) < stol, (lo, hi, M, r, stol)
        shell_rel.append(abs(r))
    pooled = max(shell_rel)

    # Box-Muller Gaussianity: standardized 3rd/4th moments of the re/im
    # components pooled over interior (complex, non-self-conjugate)
    # modes.  Per component sigma_c^2 = sigma^2 f / 2.
    planes = list(grid.self_conjugate_kz_planes(nz))
    kz_idx = np.broadcast_to(np.arange(nzh)[None, None, :], km.shape)
    interior = mask & ~np.isin(kz_idx, planes)
    var_c = expected[interior] / 2.0
    ncomp = 2.0 * interior.sum() * n  # re and im of every interior mode
    # per-mode standardized component moments, averaged (the /2 folds
    # the two summed components into a per-component mean)
    skew = ((s3[interior] / n) / var_c**1.5).mean() / 2.0
    kurt = ((s4[interior] / n) / var_c**2).mean() / 2.0
    skew_tol = 6.0 * np.sqrt(15.0 / ncomp) + 0.01
    kurt_tol = 6.0 * np.sqrt(96.0 / ncomp) + 0.05
    assert abs(skew) < skew_tol, (skew, skew_tol)
    assert abs(kurt - 3.0) < kurt_tol, (kurt, kurt_tol)

    print(
        f"pallas sampler OK ({layout}): per-mode max |var/exp - 1| = "
        f"{np.abs(rel).max():.3f} (tol {tol:.3f}), pooled shell "
        f"{pooled:.4f}, skew {skew:+.4f}, kurtosis {kurt:.3f}, "
        f"{n_seeds} seeds"
    )
    return {
        "per_mode_max": float(np.abs(rel).max()), "per_mode_tol": float(tol),
        "pooled_shell_max": float(pooled), "skew": float(skew),
        "kurtosis": float(kurt), "n_seeds": int(n_seeds),
    }


if __name__ == "__main__":
    run_checks()
    run_checks(layout="xzy")
