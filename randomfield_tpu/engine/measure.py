"""Measurement & exact-prediction methods of the Generator (mixin).

Split out of engine/generator.py (round 4: the engine file had grown
past 1,900 lines).  Everything here is a thin, tested delegation to the
validate/ and models/ estimator modules — the Generator remains the
single user-facing object; this module only holds the methods.

Reference parity: the measurement surface extends randomfield's
powertools.calculate_power validation layer (SURVEY.md section 3.5).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from randomfield_tpu.ops import grid as _grid
from randomfield_tpu.ops import power as _power


class MeasurementMixin:
    """calculate_* / predicted_* statistics of rendered fields."""

    def calculate_power(self, delta, nbins=32):
        """Realized binned P(k) of a rendered field (validation helper)."""
        from randomfield_tpu.validate import stats

        return stats.calculate_power(
            delta, self.scene.grid_spacing, nbins, mesh=self.mesh
        )

    def calculate_minkowski(self, delta, nbins=24, nu_max=3.0,
                            sigma0=None):
        """Minkowski functional densities (v0..v3) of a rendered field.

        Morphological validation beyond two-point statistics: spectral
        derivatives + threshold binning (validate/minkowski.py); gate
        against :meth:`predicted_minkowski`.  Pass ``sigma0`` (e.g. the
        predicted one) so the threshold units are noise-free.  Mesh
        scenes run the fully distributed program (slab AND pencil).
        Returns ``(nu, v0, v1, v2, v3)``.
        """
        from randomfield_tpu.validate import minkowski as _mk

        return _mk.minkowski_functionals(
            delta, self.scene.grid_spacing, nbins=nbins, nu_max=nu_max,
            sigma0=sigma0, mesh=self.mesh,
        )

    def predicted_minkowski(self, nu, smoothing_length=0.0):
        """Exact Gaussian expectations of :meth:`calculate_minkowski`.

        Tomita closed forms with the band-limited spectral moments
        (sigma0, sigma1) computed from this scene's discrete modes with
        the same interpolation / smoothing / Nyquist-zeroed gradient
        vectors as the render and the estimator.  Returns
        ``(v0, v1, v2, v3)`` at thresholds ``nu``.
        """
        from randomfield_tpu.validate import minkowski as _mk

        s0sq, s1sq = _mk.spectral_moments(
            self._aux["power"], self.scene.shape, self.scene.grid_spacing,
            smoothing_length=smoothing_length,
            interpolation=self.scene.interpolation,
        )
        return _mk.gaussian_minkowski(nu, s0sq, s1sq)

    def calculate_peaks(self, delta, nbins=14, nu_min=-2.0, nu_max=5.0,
                        sigma0=None):
        """Lattice peak counts of a rendered field, binned by height.

        BBKS validation axis: local maxima of the 27-cube, heights in
        units of ``sigma0`` (pass the predicted one when gating against
        :meth:`predicted_peaks`).  Mesh scenes run fully distributed
        (rolled-max halo exchanges over the spatial axes; slab AND
        pencil).  Render with ``smoothing_length`` of ~3+ cells so
        lattice maxima track continuum maxima (validate/peaks.py).
        Returns ``(nu_centers, counts, total)``.
        """
        from randomfield_tpu.validate import peaks as _pk

        return _pk.peak_statistics(
            delta, self.scene.grid_spacing, nbins=nbins, nu_min=nu_min,
            nu_max=nu_max, sigma0=sigma0, mesh=self.mesh,
        )

    def predicted_peaks(self, nbins=14, nu_min=-2.0, nu_max=5.0,
                        smoothing_length=0.0):
        """BBKS expectations of :meth:`calculate_peaks`.

        Exact differential peak density (BBKS 1986 eqs. 4.3-4.5, A15)
        with spectral moments sigma0/sigma1/sigma2 from this scene's
        discrete modes (full |k|^{2j} weights — matched to neighbor
        comparison, see validate/peaks.py).  Returns ``(nu_centers,
        expected_counts, expected_total)``; the total integrates the
        closed form over ALL heights, not just the binned range.
        """
        from randomfield_tpu.validate import peaks as _pk

        moments = _pk.bbks_moments(
            self._aux["power"], self.scene.shape, self.scene.grid_spacing,
            smoothing_length=smoothing_length,
            interpolation=self.scene.interpolation,
        )
        edges = np.linspace(float(nu_min), float(nu_max), int(nbins) + 1)
        volume = (
            float(np.prod(self.scene.shape))
            * float(self.scene.grid_spacing) ** 3
        )
        counts, total = _pk.bbks_expected_counts(edges, volume, *moments)
        return 0.5 * (edges[:-1] + edges[1:]), counts, total

    def predicted_ng_bispectrum(self, fnl, kind="field",
                                smoothing_length=0.0, nbins=8,
                                kmin=None, kmax=None):
        """Exact binned tree-level bispectrum of a local-f_NL render.

        Same bins/triads as :meth:`calculate_bispectrum`; returns
        ``(k_centers, triples, B_pred, ntri)``.
        """
        from randomfield_tpu.models import nongaussian as _ng

        return _ng.predicted_ng_bispectrum(
            self._aux["power"], self.scene.shape, self.scene.grid_spacing,
            fnl, kind=kind, cosmology=self.cosmology,
            smoothing_length=smoothing_length, nbins=nbins, kmin=kmin,
            kmax=kmax, interpolation=self.scene.interpolation,
        )

    def calculate_stacked_profile(self, delta, weight, nbins=24):
        """Mean field value in radial shells around weighted positions.

        One FFT cross-correlation + the xi(r) minimum-image binning
        (validate/profiles.py).  ``weight`` is any non-negative
        selection field on the grid (height-band mask, peak indicator,
        tracer counts).  Returns ``(r_mean, profile, n_cells)``.
        """
        from randomfield_tpu.validate import profiles as _pf

        return _pf.stacked_profile(
            delta, weight, self.scene.grid_spacing, nbins=nbins,
            mesh=self.mesh,
        )

    def find_voids(self, delta, radii, threshold=-0.4,
                   candidate_budget=8192):
        """Non-overlapping SO void catalog of a rendered field.

        models/voids.py:find_voids on the scene's grid — mesh scenes
        run the R_v ladder, 27-cube maxima and candidate compaction
        fully distributed.  Returns ``(positions, radii_v)``.
        """
        from randomfield_tpu.models import voids as _voids

        return _voids.find_voids(
            delta, self.scene.grid_spacing, radii, threshold=threshold,
            mesh=self.mesh, candidate_budget=candidate_budget,
        )

    def calculate_knn_cdf(self, counts, radii, ks=(1, 2, 3)):
        """kNN-CDFs of an NGP tracer count grid on the scene's lattice.

        validate/knn.py:knn_cdf — distributed transforms on mesh
        scenes; exact-binomial companion ``random_knn_cdf``.
        """
        from randomfield_tpu.validate import knn as _knn

        return _knn.knn_cdf(
            counts, self.scene.grid_spacing, radii, ks=ks, mesh=self.mesh
        )

    def calculate_peak_profile(self, delta, nu_min=1.0, nu_max=None,
                               nbins=24, smoothing_length=0.0):
        """Stacked profile around lattice peaks in a height band.

        ``smoothing_length`` must match the render so the normalizing
        spectral moments are the field's own.  Returns ``(r_mean,
        profile, n_peaks, nu_bar, x_bar)``; feed the measured
        ``nu_bar``/``x_bar`` to :meth:`predicted_peak_profile`.
        """
        from randomfield_tpu.validate import peaks as _pk
        from randomfield_tpu.validate import profiles as _pf

        moments = _pk.bbks_moments(
            self._aux["power"], self.scene.shape, self.scene.grid_spacing,
            smoothing_length=smoothing_length,
            interpolation=self.scene.interpolation,
        )
        return _pf.peak_profile(
            delta, self.scene.grid_spacing, moments, nu_min=nu_min,
            nu_max=nu_max, nbins=nbins,
        )

    def predicted_peak_profile(self, nu_bar, x_bar=None, nbins=24,
                               smoothing_length=0.0):
        """Exact Gaussian expectation of a stacked profile.

        ``x_bar=None``: the value-selected conditional mean
        ``nu_bar sigma0 psi(r)`` (exact for any height-band mask).
        With ``x_bar``: the BBKS angle-averaged peak profile with the
        curvature term.  Binned identically to the estimator.  Returns
        ``(r_mean, profile)``.
        """
        from randomfield_tpu.validate import profiles as _pf

        return _pf.predicted_peak_profile(
            self._aux["power"], self.scene.shape, self.scene.grid_spacing,
            nu_bar, x_bar=x_bar, smoothing_length=smoothing_length,
            nbins=nbins, interpolation=self.scene.interpolation,
        )

    def calculate_bispectrum(self, delta, nbins=8, kmin=None, kmax=None):
        """Binned bispectrum of a rendered field (third-order gate).

        Zero in expectation for the Gaussian fields this Generator
        renders; nonzero for the nonlinear model generators (lognormal,
        Zel'dovich/2LPT) — see validate/bispectrum.py for conventions.
        Mesh scenes run the distributed shell estimator (shell fields
        stay sharded; nbins/P of the grid per device).
        """
        from randomfield_tpu.validate import bispectrum

        return bispectrum.calculate_bispectrum(
            delta, self.scene.grid_spacing, nbins, kmin=kmin, kmax=kmax,
            mesh=self.mesh,
        )

    def predicted_kaiser_multipoles(self, z=0.0, bias=1.0, f=None,
                                    los_axis=2, nbins=32, ells=(0, 2, 4),
                                    smoothing_length=0.0):
        """Exact per-bin expectation of a Kaiser render's P_ell(k).

        Interpolates P onto this grid's discrete modes (same
        interpolation and smoothing as the render), applies
        ``(b + f mu^2)^2`` per mode, and bins with exactly the Legendre
        weights, bins and masks of ``calculate_power_multipoles``
        (validate/stats.py:bin_power_multipoles_grid) — so
        measured-vs-predicted residuals on
        :meth:`generate_kaiser_field` renders are pure sample noise,
        including incomplete-shell mu-coverage effects the continuum
        Kaiser formula misses.  Returns ``(k_mean, p_ell, n_modes)``
        with ``p_ell`` shaped ``(len(ells), nbins)``.
        """
        from randomfield_tpu.validate import stats as _stats

        pgrid = self._kaiser_pgrid(z, bias, f, los_axis, smoothing_length)
        return _stats.bin_power_multipoles_grid(
            pgrid, self.scene.shape, self.scene.grid_spacing,
            nbins=nbins, ells=ells, los_axis=int(los_axis),
        )

    def _kaiser_pgrid(self, z, bias, f, los_axis, smoothing_length):
        """Per-mode ``(b + f mu^2)^2 P(k)`` expectation half-grid with
        the render's interpolation and smoothing."""
        b, fv = self._kaiser_bf(z, bias, f)
        shape, sp = self.scene.shape, self.scene.grid_spacing
        kmag = _grid.kmag(shape, sp, jnp.float32)
        pgrid = _power.interpolate_power(
            self.power, kmag, self.scene.interpolation
        )
        pgrid = jnp.where(kmag > 0, pgrid, 0.0)
        if smoothing_length:
            pgrid = pgrid * jnp.exp(-(kmag * float(smoothing_length)) ** 2)
        kv = _grid.kvectors(shape, sp)
        k_los = jnp.asarray(kv[int(los_axis)], jnp.float32)
        bcast = [None, None, None]
        bcast[int(los_axis)] = slice(None)
        k2 = kmag * kmag
        inv = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
        mu2 = (k_los * k_los)[tuple(bcast)] * inv
        return pgrid * (b + fv * mu2) ** 2

    def predicted_kaiser_multipole_covariance(self, z=0.0, bias=1.0,
                                              f=None, los_axis=2, nbins=32,
                                              ells=(0, 2, 4),
                                              smoothing_length=0.0):
        """Exact Gaussian covariance blocks of a Kaiser render's P_ell.

        Companion of :meth:`predicted_kaiser_multipoles`: the same
        per-mode expectation grid pushed through
        ``validate.ensemble.predicted_multipole_covariance`` — the
        (nbins, nells, nells) within-bin covariance across multipoles
        of :meth:`generate_kaiser_field` +
        ``calculate_power_multipoles`` estimates, exact mode by mode
        for this grid (survey-forecast normal-equations input; see
        also models/fisher.py for the derivative side).
        """
        from randomfield_tpu.validate import ensemble as _ensemble

        pgrid = self._kaiser_pgrid(z, bias, f, los_axis, smoothing_length)
        return _ensemble.predicted_multipole_covariance(
            pgrid, self.scene.shape, self.scene.grid_spacing,
            nbins=nbins, ells=ells, los_axis=int(los_axis),
        )

    def predicted_kaiser_wedges(self, z=0.0, bias=1.0, f=None, los_axis=2,
                                nbins=32, nmu=4, smoothing_length=0.0):
        """Exact per-bin expectation of a Kaiser render's P(k, mu) wedges.

        The clustering-wedge companion of
        :meth:`predicted_kaiser_multipoles`: the same per-mode
        ``(b + f mu^2)^2 P(k)`` expectation binned with exactly the
        joint (|k|, |mu|) bins, multiplicities and masks of
        ``validate.stats.calculate_power_wedges`` — residuals on
        :meth:`generate_kaiser_field` renders are pure sample noise.
        Returns ``(k_mean, p, n_modes)`` with ``p``/``n_modes`` shaped
        ``(nbins, nmu)``.
        """
        from randomfield_tpu.validate import stats as _stats

        pgrid = self._kaiser_pgrid(z, bias, f, los_axis, smoothing_length)
        return _stats.bin_power_wedges_grid(
            pgrid, self.scene.shape, self.scene.grid_spacing,
            nbins=nbins, nmu=nmu, los_axis=int(los_axis),
        )

    def predicted_derived_power(self, kind="delta", component=2, z=0.0,
                                nbins=32, smoothing_length=0.0):
        """Exact per-bin expectation of a derived field's auto-spectrum.

        ``kind``: 'delta' (the input P(k) itself on this grid's modes),
        'potential' (``pref^2 / k^4 P``, the Poisson prefactor of
        :meth:`generate_potential`), 'displacement' (``k_i^2/k^4 P`` for
        ``component`` i, order 1), or 'velocity' (the displacement
        expectation times ``(a H f / h)^2``).  Uses the SAME
        Nyquist-zeroed gradient vectors, interpolation, smoothing and
        estimator bins as the render + :meth:`calculate_power` pair, so
        measured-vs-predicted residuals are pure sample noise.  Returns
        ``(k_mean, p, n_modes)``.
        """
        from randomfield_tpu.ops import derived as _derived
        from randomfield_tpu.validate import stats as _stats

        kinds = ("delta", "potential", "displacement", "velocity")
        if kind not in kinds:
            raise ValueError(f"kind must be one of {kinds}, got {kind!r}")
        shape, sp = self.scene.shape, self.scene.grid_spacing
        kmag = _grid.kmag(shape, sp, jnp.float32)
        pgrid = _power.interpolate_power(
            self.power, kmag, self.scene.interpolation
        )
        pgrid = jnp.where(kmag > 0, pgrid, 0.0)
        if smoothing_length:
            pgrid = pgrid * jnp.exp(-(kmag * float(smoothing_length)) ** 2)
        if kind != "delta":
            k2 = kmag * kmag
            inv = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
            if kind == "potential":
                pref = (-1.5 * self.cosmology.Om0 * (1.0 + float(z))
                        / _derived.D_H_MPC_H**2)
                pgrid = pgrid * (pref * inv) ** 2
            else:
                gx, gy, gz = _derived._layout_k(
                    shape, sp, jnp.float32, "xyz", grad=True
                )
                kvec = (gx, gy, gz)[int(component)]
                bcast = [None, None, None]
                bcast[int(component)] = slice(None)
                pref = 1.0
                if kind == "velocity":
                    a = 1.0 / (1.0 + float(z))
                    H = self.cosmology.H0 * float(self.cosmology.efunc(float(z)))
                    pref = a * H * float(self.cosmology.growth_rate(float(z))) \
                        / self.cosmology.h
                pgrid = pgrid * (pref * kvec[tuple(bcast)] * inv) ** 2
        return _stats.bin_power_grid(pgrid, shape, sp, nbins=nbins)


