"""HOD galaxy mocks: occupy halo catalogs with central + satellite
galaxies.

The top layer of the mock-making chain (Gaussian field -> lognormal ->
halos -> GALAXIES): a halo occupation distribution (Zheng et al. 2005)
places

    N_cen | M  ~  Bernoulli( 0.5 [1 + erf((logM - logMmin)/sigma)] )
    N_sat | M  ~  Poisson( N_cen_mean * ((M - M0)/M1)^alpha ),  M > M0

centrals at the halo position and satellites NFW-distributed inside
r_200m (truncated inverse-CDF radii, isotropic directions, periodic
wrap).  Expectations are exact where it matters: the mean galaxy
density integrates (dn/dlnM)<N|M> over the mass function, and the
large-scale clustering inherits the lognormal halo machinery with the
galaxy-weighted effective bias — both gated statistically in
tests/test_hod.py.

Device/host split follows models/halos.py: the halo COUNT cubes render
on device in one jitted program; occupation and satellite placement
operate on the compacted (ragged) catalog on host — per-galaxy ragged
draws cannot live under jit, and this stage is O(N_halos), not
O(N_cells).
"""

from __future__ import annotations

import numpy as np

from randomfield_tpu.models import massfunction as _mf
from randomfield_tpu.models.halos import HaloGenerator
from randomfield_tpu.models.halomodel import concentration

__all__ = [
    "zheng05_occupation",
    "sample_nfw_radii",
    "virial_dispersion",
    "HODGenerator",
]

#: Newton's constant in (km/s)^2 Mpc / Msun — h cancels in h-units.
G_KMS = 4.30091e-9


def virial_dispersion(m, cosmology="Planck13", delta=200.0):
    """1-D virial velocity dispersion sigma_v(M) [km/s] (isothermal
    estimate ``sigma_v^2 = G M_Delta / (2 r_Delta)`` with the
    mean-density Delta definition; h-independent in h-units)."""
    from randomfield_tpu.models.cosmology import create_cosmology

    c = create_cosmology(cosmology)
    rho_m = c.Om0 * c.critical_density0 / c.h**2
    m = np.asarray(m, np.float64)
    r = (3.0 * m / (4.0 * np.pi * float(delta) * rho_m)) ** (1.0 / 3.0)
    return np.sqrt(G_KMS * m / (2.0 * r))


def zheng05_occupation(m, logmmin=13.0, sigma_logm=0.25, logm0=13.0,
                       logm1=14.0, alpha=1.0):
    """Zheng et al. 2005 five-parameter HOD: returns ``(n_cen, n_sat)``
    mean occupations at halo masses ``m`` [Msun/h].  ``n_sat`` already
    includes the central modulation (satellites require a central)."""
    from scipy.special import erf

    m = np.asarray(m, np.float64)
    n_cen = 0.5 * (1.0 + erf(
        (np.log10(m) - float(logmmin)) / float(sigma_logm)))
    dm = np.maximum(m - 10.0 ** float(logm0), 0.0)
    n_sat = n_cen * (dm / 10.0 ** float(logm1)) ** float(alpha)
    return n_cen, n_sat


def sample_nfw_radii(c, r_delta, rng):
    """Radii from the truncated NFW mass profile, one per halo entry.

    Inverse-CDF sampling of ``M(<r)/M(<r_delta)`` with
    ``M(<r) ~ ln(1 + c x) - c x/(1 + c x)``, x = r/r_delta; exactness
    gated against the analytic profile in tests.  ``c`` and
    ``r_delta`` are arrays of per-halo concentrations and radii.
    """
    c = np.atleast_1d(np.asarray(c, np.float64))
    x = np.linspace(0.0, 1.0, 512)[None, :]            # r / r_delta
    cx = c[:, None] * x
    cdf = np.log1p(cx) - cx / (1.0 + cx)
    cdf /= cdf[:, -1:]
    u = rng.random(c.shape[0])
    idx = np.arange(c.shape[0])
    hi = np.minimum((cdf < u[:, None]).sum(axis=1), 511)
    lo = np.maximum(hi - 1, 0)
    c_lo, c_hi = cdf[idx, lo], cdf[idx, hi]
    frac = np.where(c_hi > c_lo, (u - c_lo) / np.maximum(c_hi - c_lo, 1e-30),
                    0.0)
    return (x[0, lo] + frac * (x[0, hi] - x[0, lo])) * np.asarray(
        r_delta, np.float64)


class HODGenerator:
    """Generate galaxy mock catalogs: lognormal halos + Zheng05 HOD.

    ``hod`` is a dict of Zheng05 parameters (see
    :func:`zheng05_occupation`); the halo mass range defaults to
    bracketing the occupation (``logmmin - 3 sigma`` up to 1e16).
    Engine kwargs pass through to the underlying halo/Gaussian stack.
    """

    def __init__(self, nx, ny, nz, grid_spacing, cosmology=None, power=None,
                 hod=None, mmin=None, mmax=1e16, nbins_mass=6, fit="st",
                 z=0.0, **kwargs):
        self.hod = dict(logmmin=13.0, sigma_logm=0.25, logm0=13.0,
                        logm1=14.0, alpha=1.0)
        self.hod.update(hod or {})
        if mmin is None:
            mmin = 10.0 ** (self.hod["logmmin"]
                            - 3.0 * self.hod["sigma_logm"])
        self.halos = HaloGenerator(
            nx, ny, nz, grid_spacing, cosmology=cosmology, power=power,
            mmin=mmin, mmax=mmax, nbins_mass=nbins_mass, fit=fit, z=z,
            **kwargs,
        )
        self.z = float(z)

        # exact expectations: n_g and galaxy-weighted effective bias,
        # integrated bin-by-bin so they match the MOCK's bin-level
        # lognormal bias exactly
        edges = self.halos.mass_edges
        power_t = self.halos._power
        n_gi = []
        for lo, hi in zip(edges[:-1], edges[1:]):
            msub = np.geomspace(lo, hi, 64)
            lnm = np.log(msub)
            _, dn = _mf.mass_function(power_t, msub, self.halos.cosmology,
                                      z=0.0, fit=self.halos.fit)
            ncen, nsat = zheng05_occupation(msub, **self.hod)
            n_gi.append(np.trapezoid(dn * (ncen + nsat), lnm))
        #: expected galaxy density per halo mass bin [(Mpc/h)^-3]
        self.galaxy_density_bins = np.asarray(n_gi)
        n_g = float(self.galaxy_density_bins.sum())
        if n_g <= 0:
            raise ValueError("HOD occupies no halos in the mass range")
        #: expected comoving galaxy density [(Mpc/h)^-3]
        self.galaxy_density = n_g
        #: galaxy-number-weighted effective linear bias
        self.galaxy_bias = float(
            (self.galaxy_density_bins * self.halos.bias).sum() / n_g)

    @property
    def scene(self):
        return self.halos.scene

    @property
    def cosmology(self):
        return self.halos.cosmology

    def expected_galaxies(self):
        """Expected total galaxy count in the box."""
        shape = self.scene.shape
        vol = shape[0] * shape[1] * shape[2] * self.scene.grid_spacing**3
        return self.galaxy_density * vol

    def generate_galaxy_catalog(self, seed=0, smoothing_length=0.0,
                                rsd=False, los_axis=2):
        """One galaxy mock: ``(positions, is_central)`` on host.

        ``positions`` (N, 3) comoving Mpc/h (periodic box);
        ``is_central`` (N,) bool.  Same seed => same universe across
        halo and galaxy stages (independent numpy streams keyed off
        the seed for the occupation draws).

        With ``rsd=True`` positions move to REDSHIFT space along
        ``los_axis`` (plane-parallel): every galaxy inherits its halo's
        linear Kaiser displacement ``f(z) psi_los`` (the Zel'dovich
        displacement of the underlying Gaussian realization, NGP-read
        at the halo's cell — the standard lognormal-mock velocity
        approximation), and satellites add a Gaussian Finger-of-God
        scatter ``sigma_v(M) / (a H)`` from the parent's virial
        dispersion (:func:`virial_dispersion`).  Measure with
        ``zeldovich.catalog_power_multipoles``.
        """
        halo_pos, halo_mass = self.halos.generate_halo_catalog(
            seed, smoothing_length=smoothing_length)
        rng = np.random.default_rng([int(seed) & 0xFFFFFFFF, 0x484F44])
        ncen_p, nsat_mean = zheng05_occupation(halo_mass, **self.hod)
        spacing = self.scene.grid_spacing
        box = np.array(self.scene.shape, np.float64) * spacing
        los = int(los_axis)

        if rsd:
            f = float(self.cosmology.growth_rate(self.z))
            psi = np.asarray(self.halos.lognormal.gaussian
                             .generate_displacement(seed, component=los))
            cells = np.minimum(
                np.floor(halo_pos / spacing).astype(np.int64),
                np.asarray(self.scene.shape) - 1,
            )
            halo_shift = f * psi[tuple(cells.T)]
            # sigma_v [km/s] -> comoving Mpc/h: divide by a H(z) =
            # 100 a E(z) km/s per Mpc/h (h cancels)
            a = 1.0 / (1.0 + self.z)
            ah = 100.0 * a * float(self.cosmology.efunc(self.z))
            fog_scale = virial_dispersion(halo_mass, self.cosmology) / ah
        else:
            halo_shift = np.zeros(halo_mass.shape[0])
            fog_scale = None

        has_cen = rng.random(halo_mass.shape[0]) < ncen_p
        cen_pos = halo_pos[has_cen].copy()
        cen_pos[:, los] += halo_shift[has_cen]

        nsat = rng.poisson(nsat_mean)
        tot = int(nsat.sum())
        if tot:
            parents = np.repeat(np.arange(halo_mass.shape[0]), nsat)
            pm = halo_mass[parents]
            cosmo = self.cosmology
            rho_m = cosmo.Om0 * cosmo.critical_density0 / cosmo.h**2
            r200 = (3.0 * pm / (4.0 * np.pi * 200.0 * rho_m)) ** (1.0 / 3.0)
            conc = concentration(pm, z=self.z)
            radii = sample_nfw_radii(conc, r200, rng)
            # isotropic directions
            v = rng.normal(size=(tot, 3))
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            sat_pos = halo_pos[parents] + radii[:, None] * v
            sat_pos[:, los] += halo_shift[parents]
            if rsd:
                sat_pos[:, los] += fog_scale[parents] * rng.normal(size=tot)
        else:
            sat_pos = np.zeros((0, 3))

        positions = np.concatenate([cen_pos, sat_pos]) % box
        is_central = np.zeros(positions.shape[0], bool)
        is_central[: cen_pos.shape[0]] = True
        return positions, is_central

    def predicted_galaxy_power(self, nbins=32, shot_noise=True,
                               mixture=False):
        """Large-scale (2-halo) expectation of the galaxy spectrum:
        the lognormal tracer spectrum at the effective galaxy bias,
        plus ``1/n_g`` shot noise.  Valid on scales above the halo
        scale — the 1-halo satellite term adds power at high k (the
        analytic counterpart is models/halomodel.py).

        ``mixture=True`` returns instead the galaxy-weighted bin-pair
        mixture ``sum_ij wg_i wg_j (exp(b_i b_j xi_G) - 1)`` — the
        EXACT halo-level expectation, but a heavy-tailed one: with
        satellite-weighted high-mass bins (b_i b_j sigma_G^2 >> 1) it
        is dominated by ultra-rare close pairs that no realizable
        ensemble resolves, so prefer the default for comparisons with
        measured catalogs (the halo-only counterpart, where weights
        suppress the tail bins, is `HaloGenerator.
        predicted_combined_power`)."""
        if mixture:
            xi_g = self.halos.lognormal._xi_gaussian_grid(0.0)
            w = self.galaxy_density_bins / self.galaxy_density
            b = self.halos.bias
            xi_t = np.zeros_like(xi_g)
            for i in range(w.size):
                for j in range(w.size):
                    xi_t += w[i] * w[j] * np.expm1(b[i] * b[j] * xi_g)
            k, p, c = self.halos.lognormal._xi_to_binned_power(xi_t, nbins)
        else:
            k, p, c = self.halos.lognormal.predicted_biased_power(
                bias=self.galaxy_bias, nbins=nbins)
        if shot_noise:
            p = p + 1.0 / self.galaxy_density
        return k, p, c
