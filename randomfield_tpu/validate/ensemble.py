"""Ensemble statistics: P(k) covariance and sigma(R) across seed batches.

The reference generates one realization at a time and leaves ensemble
statistics to user code (SURVEY.md section 0); here covariance studies
are a first-class, device-resident workflow (BASELINE.json config 4:
"1024^3 ensemble: 64 seeded realizations vmapped over DP mesh for
P(k)/sigma(R) covariance").  All reductions run under jit, so with a
'data'-sharded field batch XLA inserts the cross-device psums.
"""

from __future__ import annotations

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

from randomfield_tpu.validate import stats as _stats

__all__ = [
    "ensemble_power",
    "sample_power_ensemble",
    "power_covariance",
    "predicted_power_covariance",
    "predicted_multipole_covariance",
    "sigma_r_from_field",
]


def _scene_fingerprint(generator, smoothing_length, nbins):
    """Hashable compatibility descriptor for an ensemble checkpoint.

    Any field that changes the meaning of a binned spectrum row is
    included: grid shape, spacing, the power table itself (hashed),
    interpolation flavor, smoothing and binning (ADVICE r02: shape /
    spacing / power mismatches must be rejected on resume, not mixed).
    """
    import hashlib

    t = generator.power
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(t.k).tobytes())
    h.update(np.ascontiguousarray(t.Pk).tobytes())
    return json.dumps({
        "shape": list(generator.shape),
        "grid_spacing": float(generator.grid_spacing),
        "power_sha256": h.hexdigest()[:16],
        "interpolation": generator.scene.interpolation,
        "smoothing_length": float(smoothing_length),
        "nbins": int(nbins),
    }, sort_keys=True)


def sample_power_ensemble(generator, seeds, smoothing_length=0.0, nbins=32,
                          checkpoint_path=None, checkpoint_every=16):
    """Streaming P(k) ensemble with O(1) memory — no fields, no FFTs.

    Uses ``Generator.sample_power`` per seed: the sampled spectrum is
    binned directly, so 1024^3-class covariance studies (BASELINE
    config 4) run on a single 16 GB chip, one spectrum at a time.
    Returns host float64 ``(k_mean, p_hat[nseeds, nbins], n_modes)``.

    ``checkpoint_path`` makes long runs restartable (the failure-recovery
    analog of SURVEY.md section 5 for this workflow; the durable state
    is tiny — nbins floats per seed — because fields regenerate from
    seeds): accumulated results are written atomically to ``<path>``
    (.npz) every ``checkpoint_every`` new seeds and at the end — at most
    that many seeds are recomputed after a crash, and long ensembles
    avoid the O(n^2) rewrite bytes of per-seed flushing.  Rerunning the
    same call skips seeds already recorded and returns the union in
    ``seeds`` order.  Seeds not in ``seeds`` are kept in the file but
    not returned, so a checkpoint can serve overlapping studies.  The
    checkpoint records a scene fingerprint (grid shape, spacing, power
    table hash, smoothing, nbins) and refuses to resume under a
    mismatched Generator.
    """
    seeds_list = [int(s) for s in np.asarray(seeds).ravel()]
    fingerprint = _scene_fingerprint(generator, smoothing_length, nbins)
    done = {}
    ks = ms = None
    if checkpoint_path is not None:
        import pathlib

        checkpoint_path = pathlib.Path(checkpoint_path)
        if checkpoint_path.exists():
            with np.load(checkpoint_path, allow_pickle=False) as f:
                if "fingerprint" in f:
                    ck_fp, expected = bytes(f["fingerprint"]).decode(), fingerprint
                else:  # round-2 format: smoothing/nbins only
                    ck_fp = json.dumps({
                        "smoothing_length": float(f["smoothing_length"]),
                        "nbins": int(f["nbins"]),
                    }, sort_keys=True)
                    expected = json.dumps({
                        "smoothing_length": float(smoothing_length),
                        "nbins": int(nbins),
                    }, sort_keys=True)
                if ck_fp != expected:
                    raise ValueError(
                        f"checkpoint {checkpoint_path} was written for a "
                        f"different scene/binning ({ck_fp}); this call "
                        f"uses {fingerprint} — resuming would silently "
                        "mix incompatible spectra. Use a different "
                        "checkpoint path."
                    )
                ks, ms = f["k_mean"], f["n_modes"]
                for s, row in zip(f["seeds"].tolist(), f["p_hat"]):
                    done[int(s)] = row

    def _write():
        order = sorted(done)
        tmp = checkpoint_path.with_suffix(".tmp.npz")
        np.savez(
            tmp, seeds=np.asarray(order, np.int64),
            p_hat=np.asarray([done[s] for s in order]),
            k_mean=ks, n_modes=ms,
            smoothing_length=float(smoothing_length), nbins=int(nbins),
            fingerprint=np.frombuffer(fingerprint.encode(), dtype=np.uint8),
        )
        tmp.replace(checkpoint_path)

    todo = [s for s in seeds_list if s not in done]
    # chunks ride Generator.sample_power_batch (one program per chunk on
    # the Pallas path; per-seed fallback elsewhere), capped at the
    # checkpoint cadence so a crash still loses at most checkpoint_every
    # seeds
    batch = max(1, min(int(checkpoint_every), 16))
    pending = 0
    for i in range(0, len(todo), batch):
        chunk = todo[i:i + batch]
        k, p_rows, m = generator.sample_power_batch(
            chunk, smoothing_length=smoothing_length, nbins=nbins
        )
        ks, ms = k, m
        for s, row in zip(chunk, np.asarray(p_rows)):
            done[s] = row
        pending += len(chunk)
        if checkpoint_path is not None and pending >= int(checkpoint_every):
            _write()
            pending = 0
    if checkpoint_path is not None and pending:
        _write()
    return ks, np.asarray([done[s] for s in seeds_list]), ms


def ensemble_power(fields, spacing, nbins=32, mesh=None):
    """Per-seed binned P(k) for a (nseeds, nx, ny, nz) batch.

    Returns host float64 ``(k_mean, p_hat, n_modes)`` where ``p_hat`` has
    shape (nseeds, nbins).  k_mean and n_modes are seed-independent.
    Pass the generator's ``mesh`` for spatially sharded batches.
    """
    n = fields.shape[0]
    ks = ms = None
    ps = []
    for i in range(n):  # serial: each estimate is one full FFT
        k, p, m = _stats.calculate_power(fields[i], spacing, nbins, mesh=mesh)
        ks, ms = k, m
        ps.append(p)
    return ks, np.asarray(ps), ms


def power_covariance(p_hat):
    """Covariance matrix of binned P(k) estimates across seeds.

    ``p_hat``: (nseeds, nbins) from :func:`ensemble_power`.  Returns the
    (nbins, nbins) sample covariance (float64, NaN-bin safe).
    """
    p = np.asarray(p_hat, np.float64)
    valid = np.all(np.isfinite(p), axis=0)
    cov = np.full((p.shape[1], p.shape[1]), np.nan)
    pv = p[:, valid]
    c = np.cov(pv, rowvar=False)
    cov[np.ix_(valid, valid)] = c
    return cov


def predicted_power_covariance(power, shape, spacing, nbins=32,
                               smoothing_length=0.0,
                               interpolation="log10k"):
    """EXACT Gaussian covariance of the binned P(k) estimator.

    For a Gaussian field the binned estimates are independent across
    bins with per-bin variance set mode by mode by this grid's
    discrete spectrum:

        Var[P^_bin] = [ sum_paired 4 P_k^2 + sum_selfconj 2 P_k^2 ]
                      / ( sum_k mult_k )^2

    — each Hermitian pair is ONE complex draw (Var |c|^2 = P^2)
    carrying estimator weight mult = 2, and each self-conjugate mode
    (kz = 0 / Nyquist planes' real modes) is a real draw
    (Var = 2 P^2) with mult = 1.  The familiar 2 P_bar^2 / N_modes is
    the equal-P limit.  Returns the (nbins, nbins) diagonal matrix
    matching :func:`power_covariance` of an infinite seed ensemble
    (gated statistically in tests); empty bins get NaN.  Host float64,
    O(N^3) memory — validation-scale.
    """
    from randomfield_tpu.ops import grid as _grid
    from randomfield_tpu.ops import power as _power

    shape = tuple(int(s) for s in shape)
    spacing = float(spacing)
    table = _power.validate_power(power)
    _power.require_coverage(table, shape, spacing)
    km = np.asarray(
        _grid.kmag(shape, spacing, jnp.float32), np.float64)
    pg = np.asarray(
        _power.interpolate_power(table, jnp.asarray(km, jnp.float32),
                                 interpolation),
        np.float64,
    )
    if smoothing_length:
        pg = pg * np.exp(-((km * float(smoothing_length)) ** 2))
    pg[km == 0] = 0.0
    nz = shape[2]
    nzh = nz // 2 + 1
    mult = np.full(nzh, 2.0)
    mult[0] = 1.0
    if nz % 2 == 0:
        mult[-1] = 1.0
    mult3 = np.broadcast_to(mult[None, None, :], km.shape)
    # per-entry variance contribution: paired (mult 2) -> 4 P^2,
    # self-conjugate (mult 1) -> 2 P^2 == mult^2 + ... = 2*mult^... use
    # explicit values
    var_k = np.where(mult3 == 2.0, 4.0 * pg**2, 2.0 * pg**2)

    kmin, kmax = _grid.get_k_bounds(shape, spacing)
    edges = np.logspace(np.log10(kmin * 0.999), np.log10(kmax * 1.001),
                        int(nbins) + 1)
    idx = np.searchsorted(edges, km) - 1
    valid = (idx >= 0) & (idx < int(nbins)) & (km > 0)
    counts = np.bincount(idx[valid], weights=mult3[valid],
                         minlength=int(nbins))
    vsum = np.bincount(idx[valid], weights=var_k[valid],
                       minlength=int(nbins))
    with np.errstate(invalid="ignore", divide="ignore"):
        var = np.where(counts > 0, vsum / counts**2, np.nan)
    return np.diag(var)


def predicted_multipole_covariance(pgrid, shape, spacing, nbins=32,
                                   ells=(0, 2, 4), los_axis=2):
    """EXACT Gaussian covariance blocks of binned P_ell(k) estimates.

    The anisotropic companion of :func:`predicted_power_covariance`:
    for a Gaussian field whose per-mode expectation is ``pgrid`` (the
    ``E[P_hat(k)]`` half-grid — e.g. a Kaiser ``(b + f mu^2)^2 P(k)``
    from ``Generator._kaiser_pgrid``), the multipole estimates of
    ``validate.stats.calculate_power_multipoles`` covary within each
    |k| bin across ell (modes are independent, so different bins do
    not):

        Cov[P_ell(a), P_ell'(a)] =
            sum_{k in a} w_ell(k) w_ell'(k) v_k / N_a^2,

    with ``w_ell = (2 ell + 1) L_ell(mu)``, ``N_a = sum mult`` and the
    per-entry variance ``v_k = 4 P_k^2`` for Hermitian-paired entries
    (estimator weight 2, Var |c|^2 = P^2) or ``2 P_k^2`` for the
    self-conjugate real modes — identical bins, weights, masks and
    multiplicities to the estimator, so measured sample covariances
    are gated on pure chi-square scatter.  ``ells=(0,)`` with an
    isotropic grid reproduces :func:`predicted_power_covariance`'s
    diagonal exactly (gated).  Returns ``(nbins, nells, nells)``
    float64; empty bins are NaN.  Host numpy, validation-scale.
    """
    from randomfield_tpu.ops import grid as _grid

    shape = tuple(int(s) for s in shape)
    spacing = float(spacing)
    ells = tuple(int(e) for e in ells)
    p = np.asarray(pgrid, np.float64)
    km = np.asarray(_grid.kmag(shape, spacing, jnp.float32), np.float64)
    kv = _grid.kvectors(shape, spacing)
    k_los = np.asarray(kv[int(los_axis)], np.float64)
    bcast = [None, None, None]
    bcast[int(los_axis)] = slice(None)
    with np.errstate(invalid="ignore", divide="ignore"):
        mu2 = np.where(km > 0, (k_los[tuple(bcast)] / np.where(
            km > 0, km, 1.0)) ** 2, 0.0)
    mu2 = np.broadcast_to(mu2, p.shape)

    edges, mult = _stats._bin_setup(shape, spacing, int(nbins))
    mult3 = np.broadcast_to(
        np.asarray(mult, np.float64)[None, None, :], p.shape)
    var_k = np.where(mult3 == 2.0, 4.0 * p**2, 2.0 * p**2)

    idx = np.searchsorted(edges, km) - 1
    valid = (idx >= 0) & (idx < int(nbins)) & (km > 0)
    counts = np.bincount(idx[valid], weights=mult3[valid],
                         minlength=int(nbins))
    w = [(2.0 * ell + 1.0) * np.asarray(
        _stats._LEGENDRE_EVEN[ell](jnp.asarray(mu2)), np.float64)
        for ell in ells]
    ne = len(ells)
    cov = np.full((int(nbins), ne, ne), np.nan)
    good = counts > 0
    for i in range(ne):
        for j in range(i, ne):
            s = np.bincount(idx[valid],
                            weights=(w[i] * w[j] * var_k)[valid],
                            minlength=int(nbins))
            with np.errstate(invalid="ignore", divide="ignore"):
                cij = np.where(good, s / counts**2, np.nan)
            cov[:, i, j] = cij
            cov[:, j, i] = cij
    return cov


@functools.partial(jax.jit, static_argnames=("spacing", "r"))
def _sigma_r_sq_device(delta, spacing, r):
    from randomfield_tpu.ops import grid as _grid
    from randomfield_tpu.ops import transform as _transform

    shape = delta.shape[-3:]
    c = _transform.field_to_spectrum(delta, spacing)
    kmag = _grid.kmag(shape, spacing, delta.dtype)
    x = kmag * r
    w = jnp.where(
        x > 1e-4,
        3.0 * (jnp.sin(x) - x * jnp.cos(x)) / jnp.where(x > 0, x, 1.0) ** 3,
        1.0 - x * x / 10.0,
    )
    nx, ny, nz = shape
    volume = nx * ny * nz * spacing**3
    mult = jnp.full((kmag.shape[-1],), 2.0, delta.dtype)
    mult = mult.at[0].set(1.0)
    if nz % 2 == 0:
        mult = mult.at[-1].set(1.0)
    # sigma_R^2 = variance of the W-filtered field = sum |c_k W|^2 / V^2
    p = (c.real**2 + c.imag**2) * w * w * mult[None, None, :]
    return jnp.sum(p) / volume**2


def sigma_r_from_field(delta, spacing, r=8.0):
    """Realized sigma(R) of a rendered field (r in the grid's length unit).

    The top-hat window is applied in k-space, so this is the rms of the
    field smoothed on scale R — directly comparable to
    ``ops.power.sigma_r`` of the input spectrum for R well inside the
    resolved range.  Runs on device; returns a host float.
    """
    return float(jnp.sqrt(_sigma_r_sq_device(delta, float(spacing), float(r))))
