"""Correlated multi-tracer Gaussian fields with exact cross-spectra.

Two tracers of the same survey volume (galaxies x quasars, galaxies x
lensing, tracer x matter) are only PARTIALLY correlated: their
cross-spectrum is ``P_12(k) = r(k) sqrt(P_1 P_2)`` with a stochasticity
coefficient ``|r(k)| <= 1`` that deterministic bias models (e.g.
``LognormalGenerator.generate_biased_field``, where r = 1 identically)
cannot represent.  This module renders tracer PAIRS with exact
prescribed auto- AND cross-spectra by mixing unit noise streams per
mode (the 2x2 Cholesky factor of the correlation matrix):

    u_1 = n_1
    u_2 = r(k) n_1 + sqrt(1 - r(k)^2) n_2

with ``n_1, n_2`` independent unit Hermitian draws of the same seed
(Threefry streams folded on the tracer index), then rendering each
``u_i`` through its own Generator's oracle-pinned noise path
(``generate_from_noise``: symmetrize -> sigma_i(k) -> filter ->
irfftn -> lightcone).  E[c_1 c_2*] = sigma_1 sigma_2 r(k) exactly —
the binned expectation is :meth:`predicted_cross_power`, gated
statistically in tests/test_multitracer.py.

The mixing matrix is real and even in k, so Hermitian symmetry (and
hence field reality) survives; r may be a scalar or a tabulated
``(k, r)`` curve interpolated in log10(k) like every spectrum here.
Single-device fused scenes (the noise-interchange contract,
engine/generator.py:generate_from_noise).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from randomfield_tpu.ops import grid as _grid

__all__ = ["MultiTracerGenerator"]


class MultiTracerGenerator:
    """Render correlated tracer pairs with exact P_1, P_2 and r(k).

    ``power1`` / ``power2``: each tracer's target spectrum (any form
    `validate_power` accepts, or a model-zoo name); ``correlation``:
    scalar in [-1, 1] or a tabulated ``(k, r)`` pair.  Engine kwargs
    (cosmology=, interpolation=, ...) pass to both Generators; scenes
    are single-device fused (the noise-interchange contract).
    """

    def __init__(self, nx, ny, nz, grid_spacing, power1=None, power2=None,
                 correlation=0.5, cosmology=None, **kwargs):
        from randomfield_tpu.engine.generator import Generator

        self.g1 = Generator(nx, ny, nz, grid_spacing, cosmology=cosmology,
                            power=power1, **kwargs)
        self.g2 = Generator(nx, ny, nz, grid_spacing, cosmology=cosmology,
                            power=power2, **kwargs)
        shape = self.g1.scene.shape
        kmag = np.asarray(
            _grid.kmag(shape, float(grid_spacing), jnp.float32), np.float64)
        if np.isscalar(correlation) or np.ndim(correlation) == 0:
            r = float(correlation)
            if not -1.0 <= r <= 1.0:
                raise ValueError(f"correlation {r} outside [-1, 1]")
            rgrid = np.full(kmag.shape, r)
        else:
            from randomfield_tpu.ops.power import validate_power

            k_t, r_t = validate_power(
                (np.asarray(correlation[0], np.float64),
                 np.abs(np.asarray(correlation[1], np.float64)))
            )
            r_t = np.asarray(correlation[1], np.float64)
            if np.any(np.abs(r_t) > 1.0):
                raise ValueError("tabulated |r(k)| must be <= 1")
            lk = np.log10(np.maximum(kmag, k_t[0] * 1e-10))
            rgrid = np.interp(lk, np.log10(k_t), r_t)
        rgrid[kmag == 0] = 0.0
        self._r = jnp.asarray(rgrid, jnp.float32)
        self._mix = jax.jit(
            lambda n1, n2, r: (n1, r[None] * n1
                               + jnp.sqrt(1.0 - r[None] ** 2) * n2)
        )

    @property
    def correlation_grid(self):
        """The per-mode r(k) actually applied (DC forced to 0)."""
        return self._r

    def generate_fields(self, seed=0, smoothing_length=0.0,
                        apply_lightcone=True):
        """One correlated pair ``(delta_1, delta_2)`` for a seed.

        The same seed re-renders the same pair; tracer 1 alone is
        bit-identical to ``g1.generate_delta_field(seed)`` (the mixing
        leaves stream 1 untouched), asserted in tests.
        """
        n1 = self.g1.generate_noise(seed)
        n2 = self.g2.generate_noise((int(seed) ^ 0x4D545247) & 0xFFFFFFFF)
        u1, u2 = self._mix(n1, n2, self._r)
        d1 = self.g1.generate_from_noise(
            u1, smoothing_length=smoothing_length,
            apply_lightcone=apply_lightcone)
        d2 = self.g2.generate_from_noise(
            u2, smoothing_length=smoothing_length,
            apply_lightcone=apply_lightcone)
        return d1, d2

    def predicted_cross_power(self, nbins=32, smoothing_length=0.0):
        """Exact per-bin expectation of the measured cross-spectrum
        (``validate.stats.calculate_cross_power`` on snapshot fields):
        the grid spectrum ``r(k) sigma_1 sigma_2``-equivalent, binned
        with the estimator's own bins."""
        from randomfield_tpu.ops import power as _power
        from randomfield_tpu.validate import stats as _stats

        shape = self.g1.scene.shape
        spacing = self.g1.scene.grid_spacing
        kmag = _grid.kmag(shape, spacing, jnp.float32)
        p1 = _power.interpolate_power(self.g1.power, kmag,
                                      self.g1.scene.interpolation)
        p2 = _power.interpolate_power(self.g2.power, kmag,
                                      self.g2.scene.interpolation)
        pc = self._r * jnp.sqrt(jnp.maximum(p1 * p2, 0.0))
        if smoothing_length:
            pc = pc * jnp.exp(-((kmag * float(smoothing_length)) ** 2))
        pc = jnp.where(kmag > 0, pc, 0.0)
        return _stats.bin_power_grid(pc, shape, spacing, nbins=nbins)
