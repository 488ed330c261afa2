"""Ensemble statistics tests (config 4: P(k)/sigma(R) covariance)."""

import numpy as np

from randomfield_tpu import Generator
from randomfield_tpu.ops import power as pw
from randomfield_tpu.validate import ensemble


def test_ensemble_power_and_covariance():
    g = Generator(24, 24, 24, grid_spacing=6.0)
    fields = g.generate_delta_fields(np.arange(24), apply_lightcone=False)
    k, p_hat, n_modes = ensemble.ensemble_power(fields, g.grid_spacing, nbins=8)
    assert p_hat.shape == (24, 8)
    cov = ensemble.power_covariance(p_hat)
    assert cov.shape == (8, 8)
    valid = np.isfinite(cov).all(axis=0)
    # diagonal of a covariance is non-negative
    assert np.all(np.diag(cov)[valid] >= 0)
    # relative scatter in a well-populated bin ~ sqrt(2/n_modes)
    i = int(np.nanargmax(n_modes))
    rel = np.sqrt(cov[i, i]) / p_hat[:, i].mean()
    expected = np.sqrt(2.0 / n_modes[i])
    assert 0.3 * expected < rel < 3.0 * expected


def test_sigma_r_from_field_matches_input_spectrum():
    g = Generator(32, 32, 32, grid_spacing=4.0)
    nseeds = 16
    fields = g.generate_delta_fields(np.arange(nseeds), apply_lightcone=False)
    r = 12.0
    vals = [
        ensemble.sigma_r_from_field(fields[i], g.grid_spacing, r)
        for i in range(nseeds)
    ]
    realized = np.sqrt(np.mean(np.square(vals)))
    # the input-spectrum prediction, restricted to the band the grid
    # resolves, is approximated by the table integral; allow generous
    # tolerance for resolution effects at 32^3
    table = g.power
    predicted = pw.sigma_r((table.k, table.Pk), r)
    assert abs(realized - predicted) / predicted < 0.25, (realized, predicted)


def test_sample_power_ensemble_checkpoint_resume(tmp_path):
    # interrupt after 2 seeds; the resumed run skips them and the final
    # result equals a clean uncheckpointed run
    from randomfield_tpu.validate.ensemble import sample_power_ensemble

    g = Generator(16, 16, 16, grid_spacing=8.0)
    ckpt = tmp_path / "ens.npz"

    k0, p0, m0 = sample_power_ensemble(g, [3, 5, 7, 9], nbins=8)

    sample_power_ensemble(g, [3, 5], nbins=8, checkpoint_path=ckpt)
    assert ckpt.exists()

    calls = []
    orig = g.sample_power

    def counting(seed, **kw):
        calls.append(seed)
        return orig(seed, **kw)

    g.sample_power = counting
    k1, p1, m1 = sample_power_ensemble(g, [3, 5, 7, 9], nbins=8,
                                       checkpoint_path=ckpt)
    assert sorted(calls) == [7, 9]  # 3 and 5 came from the checkpoint
    np.testing.assert_allclose(p1, p0, rtol=1e-6)
    np.testing.assert_allclose(k1, k0)
    np.testing.assert_allclose(m1, m0)

    # a subset query returns rows in request order without recomputing
    calls.clear()
    k2, p2, _ = sample_power_ensemble(g, [9, 3], nbins=8, checkpoint_path=ckpt)
    assert calls == []
    np.testing.assert_allclose(p2, p0[[3, 0]], rtol=1e-6)


def test_sample_power_ensemble_checkpoint_rejects_mismatched_scene(tmp_path):
    # resuming under a different grid/spacing/power/binning must raise,
    # not silently mix incompatible P(k) rows (ADVICE r02)
    import pytest

    from randomfield_tpu.validate.ensemble import sample_power_ensemble

    ckpt = tmp_path / "ens.npz"
    g = Generator(16, 16, 16, grid_spacing=8.0)
    sample_power_ensemble(g, [1, 2], nbins=8, checkpoint_path=ckpt)

    for bad in (
        Generator(16, 16, 8, grid_spacing=8.0),       # shape
        Generator(16, 16, 16, grid_spacing=4.0),      # spacing
    ):
        with pytest.raises(ValueError, match="different scene"):
            sample_power_ensemble(bad, [1, 3], nbins=8, checkpoint_path=ckpt)
    with pytest.raises(ValueError, match="different scene"):
        sample_power_ensemble(g, [1, 3], nbins=4, checkpoint_path=ckpt)
    # different power table
    t = g.power
    g2 = Generator(16, 16, 16, grid_spacing=8.0, power=(t.k, t.Pk * 2.0))
    with pytest.raises(ValueError, match="different scene"):
        sample_power_ensemble(g2, [1, 3], nbins=8, checkpoint_path=ckpt)
    # the matching generator still resumes fine
    sample_power_ensemble(g, [1, 2, 3], nbins=8, checkpoint_path=ckpt)


def test_sample_power_ensemble_elastic_resume_across_topologies(tmp_path):
    # elastic recovery (SURVEY.md section 5): the durable state is
    # device-topology-free (host npz of binned spectra keyed by seed),
    # and sampling is partitionable-Threefry deterministic — so a run
    # interrupted on ONE topology resumes on ANOTHER (different device
    # count / mesh shape) and the union equals an uninterrupted run.
    from randomfield_tpu.parallel import mesh as M
    from randomfield_tpu.validate.ensemble import sample_power_ensemble

    ckpt = tmp_path / "elastic.npz"
    seeds = [2, 4, 6, 8]

    # uninterrupted single-device run = ground truth
    g1 = Generator(16, 16, 16, grid_spacing=8.0)
    k0, p0, m0 = sample_power_ensemble(g1, seeds, nbins=8)

    # phase 1: "job killed" after the first two seeds, single device
    sample_power_ensemble(g1, seeds[:2], nbins=8, checkpoint_path=ckpt)

    # phase 2: resume the SAME checkpoint on an 8-device slab mesh
    g8 = Generator(16, 16, 16, grid_spacing=8.0, mesh=M.make_mesh(data=2, space=4))
    calls = []
    orig = g8.sample_power

    def counting(seed, **kw):
        calls.append(seed)
        return orig(seed, **kw)

    g8.sample_power = counting
    k1, p1, m1 = sample_power_ensemble(g8, seeds, nbins=8,
                                       checkpoint_path=ckpt)
    assert sorted(calls) == seeds[2:]  # first two restored, not recomputed
    np.testing.assert_allclose(p1, p0, rtol=1e-4)
    np.testing.assert_allclose(k1, k0, rtol=1e-6)
    np.testing.assert_allclose(m1, m0)

    # phase 3: shrink back to one device; everything is already done
    calls2 = []
    orig1 = g1.sample_power
    g1.sample_power = lambda s, **kw: calls2.append(s) or orig1(s, **kw)
    k2, p2, _ = sample_power_ensemble(g1, seeds, nbins=8,
                                      checkpoint_path=ckpt)
    assert calls2 == []
    np.testing.assert_allclose(p2, p0, rtol=1e-4)


def test_sample_power_ensemble_checkpoint_every(tmp_path):
    # flush cadence: with checkpoint_every=2 the file sees intermediate
    # states, and a trailing partial batch is flushed at the end
    import numpy.lib.format  # noqa: F401  (np.load of tmp states)

    from randomfield_tpu.validate.ensemble import sample_power_ensemble

    ckpt = tmp_path / "ens.npz"
    g = Generator(16, 16, 16, grid_spacing=8.0)
    states = []
    orig = g.sample_power

    def spy(seed, **kw):
        if ckpt.exists():
            with np.load(ckpt, allow_pickle=False) as f:
                states.append(len(f["seeds"]))
        else:
            states.append(0)
        return orig(seed, **kw)

    g.sample_power = spy
    sample_power_ensemble(g, [1, 2, 3, 4, 5], nbins=8,
                          checkpoint_path=ckpt, checkpoint_every=2)
    # before seeds 1..5 run, the file held 0,0,2,2,4 entries
    assert states == [0, 0, 2, 2, 4]
    with np.load(ckpt, allow_pickle=False) as f:
        assert len(f["seeds"]) == 5


def test_predicted_power_covariance_matches_ensemble():
    # analytic Gaussian per-bin variance vs a 192-seed sample_power
    # ensemble: ratio within the chi-square scatter of a sample
    # variance; off-diagonals consistent with zero
    import numpy as np

    from randomfield_tpu import Generator
    from randomfield_tpu.validate.ensemble import (
        power_covariance,
        predicted_power_covariance,
    )

    n, spacing, nbins, nseeds = 16, 8.0, 6, 192
    g = Generator(n, n, n, grid_spacing=spacing)
    p_hat = np.stack([
        np.asarray(g.sample_power(s, nbins=nbins)[1]) for s in range(nseeds)
    ])
    cov_meas = power_covariance(p_hat)
    cov_pred = predicted_power_covariance(
        g.power, (n, n, n), spacing, nbins=nbins)
    d_meas = np.diag(cov_meas)
    d_pred = np.diag(cov_pred)
    ok = np.isfinite(d_pred) & (d_pred > 0) & np.isfinite(d_meas)
    assert ok.sum() >= 4
    ratio = d_meas[ok] / d_pred[ok]
    # sample variance of a variance: rel scatter ~ sqrt(2/(n-1)) ~ 0.10
    assert np.all(np.abs(ratio - 1.0) < 5.0 * np.sqrt(2.0 / (nseeds - 1))
                  + 0.05), ratio
    # cross-bin correlations consistent with zero (Gaussian field)
    corr = cov_meas[np.ix_(ok, ok)] / np.sqrt(
        np.outer(d_meas[ok], d_meas[ok]))
    off = corr[~np.eye(ok.sum(), dtype=bool)]
    assert np.all(np.abs(off) < 6.0 / np.sqrt(nseeds))


def test_multipole_covariance_isotropic_reduces_to_power_covariance():
    # ells=(0,) on an isotropic expectation grid is exactly the binned
    # P(k) covariance (same edges, masks, multiplicities).
    import numpy as np

    from randomfield_tpu import Generator
    from randomfield_tpu.validate.ensemble import (
        predicted_multipole_covariance,
        predicted_power_covariance,
    )

    n, spacing, nbins = 16, 8.0, 6
    g = Generator(n, n, n, grid_spacing=spacing)
    pgrid = g._kaiser_pgrid(0.0, 1.0, 0.0, 2, 0.0)  # f=0: plain P(k)
    cov_m = predicted_multipole_covariance(
        pgrid, (n, n, n), spacing, nbins=nbins, ells=(0,))
    cov_iso = predicted_power_covariance(
        g.power, (n, n, n), spacing, nbins=nbins)
    np.testing.assert_allclose(cov_m[:, 0, 0], np.diag(cov_iso),
                               rtol=1e-6)


def test_multipole_covariance_matches_kaiser_ensemble():
    # 192 Kaiser renders at 16^3: sample covariance of (P0, P2) per bin
    # vs the exact prediction — diagonals within chi-square scatter,
    # P0-P2 correlation coefficient within Monte-Carlo error.
    import numpy as np

    from randomfield_tpu import Generator
    from randomfield_tpu.validate.ensemble import (
        predicted_multipole_covariance,
    )
    from randomfield_tpu.validate.stats import calculate_power_multipoles

    n, spacing, nbins, nseeds = 16, 8.0, 5, 192
    b, f = 1.3, 0.6
    g = Generator(n, n, n, grid_spacing=spacing)
    ells = (0, 2)
    p_ell = np.stack([
        np.asarray(calculate_power_multipoles(
            g.generate_kaiser_field(s, bias=b, f=f), spacing,
            nbins=nbins, ells=ells)[1])
        for s in range(nseeds)
    ])  # (nseeds, 2, nbins)
    pgrid = g._kaiser_pgrid(0.0, b, f, 2, 0.0)
    cov_pred = predicted_multipole_covariance(
        pgrid, (n, n, n), spacing, nbins=nbins, ells=ells)

    tol = 5.0 * np.sqrt(2.0 / (nseeds - 1)) + 0.05
    checked = 0
    for a in range(nbins):
        if not np.all(np.isfinite(cov_pred[a])) or cov_pred[a, 0, 0] <= 0:
            continue
        sample = p_ell[:, :, a]
        if not np.all(np.isfinite(sample)):
            continue
        cm = np.cov(sample, rowvar=False)
        for i in range(2):
            ratio = cm[i, i] / cov_pred[a, i, i]
            assert abs(ratio - 1.0) < tol, (a, i, ratio)
        corr_m = cm[0, 1] / np.sqrt(cm[0, 0] * cm[1, 1])
        corr_p = cov_pred[a, 0, 1] / np.sqrt(
            cov_pred[a, 0, 0] * cov_pred[a, 1, 1])
        assert abs(corr_m - corr_p) < 0.3, (a, corr_m, corr_p)
        checked += 1
    assert checked >= 3
    # the generator wrapper is the same computation
    cov_g = g.predicted_kaiser_multipole_covariance(
        bias=b, f=f, nbins=nbins, ells=ells)
    np.testing.assert_allclose(cov_g, cov_pred, rtol=1e-12)
