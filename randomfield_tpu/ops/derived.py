"""Derived fields: Newtonian potential, Zel'dovich displacement, velocity.

Spectral Poisson machinery on top of rendered density fields — the
products downstream pipelines (N-body initial conditions, weak-lensing
integrations) need from a Gaussian-field engine.  All pure jnp device
programs sharing the engine's Fourier conventions (ops/transform.py):

* potential:      Phi_k / c^2 = -(3/2) Om (1+z) delta_k / (k D_H)^2
                  (comoving Poisson eq., D_H = c/H0 = 2997.92 Mpc/h —
                  the h's cancel with k in h/Mpc)
* displacement:   psi_k = +i k / k^2 delta_k   (Zel'dovich; x = q + D psi)
* velocity:       v_k = i a H(a) f(a) delta_k k / k^2  [km/s]
                  (linear continuity eq.; f = dlnD/dlna)

DC modes are zero in all cases (sigma(0) = 0 upstream).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from randomfield_tpu.ops import grid as _grid
from randomfield_tpu.ops import transform as _transform

__all__ = [
    "delta_to_potential",
    "delta_to_displacement",
    "delta_to_displacement_2lpt",
    "delta_to_velocity",
    "delta_to_tidal",
    "TIDAL_PAIRS",
]

# component order of the packed symmetric tidal tensor: xx, yy, zz, xy, xz, yz
TIDAL_PAIRS = ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2))

D_H_MPC_H = 2997.92458  # Hubble distance in Mpc/h (c / (100 km/s/Mpc))


def _inv_ksq(shape, spacing, dtype):
    k2 = _grid.ksq(shape, spacing, dtype)
    return jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)


@functools.partial(jax.jit, static_argnames=("shape", "spacing", "prefactor"))
def _scalar_inverse_laplacian(delta, shape, spacing, prefactor):
    """irfftn( prefactor * delta_k / k^2 ) with the engine's conventions."""
    a = _transform.rfftn(delta, norm="forward")
    a = a * (jnp.asarray(prefactor, delta.dtype) * _inv_ksq(shape, spacing, delta.dtype))
    return _transform.irfftn(a, shape, norm="forward")


def _grad_kvectors(shape, spacing, dtype):
    """k vectors with Nyquist entries zeroed (even axes).

    An odd spectral derivative (factor i*k) of a Nyquist mode has no
    real-field representation — the packed c2r transform would silently
    truncate it and break identities like delta = -div(psi).  Zeroing
    the Nyquist gradient is the standard convention (the affected modes
    carry no phase information to differentiate anyway).
    """
    nx, ny, nz = shape
    out = []
    for n in (nx, ny):
        f = 2.0 * np.pi * np.fft.fftfreq(n, d=spacing)
        if n % 2 == 0:
            f[n // 2] = 0.0
        out.append(jnp.asarray(f, dtype))
    f = 2.0 * np.pi * np.fft.rfftfreq(nz, d=spacing)
    if nz % 2 == 0:
        f[-1] = 0.0
    out.append(jnp.asarray(f, dtype))
    return out


@functools.partial(jax.jit, static_argnames=("shape", "spacing", "prefactor"))
def _gradient_inverse_laplacian(delta, shape, spacing, prefactor):
    """irfftn( prefactor * i k delta_k / k^2 ) -> (3, nx, ny, nz)."""
    a = _transform.rfftn(delta, norm="forward")
    inv = _inv_ksq(shape, spacing, delta.dtype)
    kx, ky, kz = _grad_kvectors(shape, spacing, delta.dtype)
    comps = []
    for kvec, bcast in (
        (kx, (slice(None), None, None)),
        (ky, (None, slice(None), None)),
        (kz, (None, None, slice(None))),
    ):
        grad_k = a * (1j * kvec[bcast] * inv * jnp.asarray(prefactor, delta.dtype))
        comps.append(_transform.irfftn(grad_k, shape, norm="forward"))
    return jnp.stack(comps)


def delta_to_potential(delta, spacing, cosmology, z=0.0):
    """Dimensionless peculiar potential Phi/c^2 of a density field.

    Solves the comoving Poisson equation
    ``grad^2 Phi = (3/2) Om H0^2 (1+z) delta`` spectrally.
    """
    from randomfield_tpu.models.cosmology import create_cosmology

    cosmology = create_cosmology(cosmology)
    shape = tuple(int(s) for s in delta.shape[-3:])
    pref = -1.5 * cosmology.Om0 * (1.0 + float(z)) / D_H_MPC_H**2
    return _scalar_inverse_laplacian(delta, shape, float(spacing), pref)


def delta_to_displacement(delta, spacing):
    """Zel'dovich displacement field psi [Mpc/h], shape (3, nx, ny, nz).

    First-order Lagrangian displacement: ``psi_k = i k delta_k / k^2``;
    particles move as ``x = q + D(z) psi(q)`` — the standard N-body
    initial-conditions recipe from a linear density field.
    """
    shape = tuple(int(s) for s in delta.shape[-3:])
    # continuity: delta = -div(psi)  =>  psi_k = +i k/k^2 delta_k
    return _gradient_inverse_laplacian(delta, shape, float(spacing), 1.0)


@functools.partial(jax.jit, static_argnames=("shape", "spacing"))
def _second_order_displacement(delta, shape, spacing):
    """psi(2) from the 2LPT source (Scoccimarro 1998 conventions).

    With phi solving grad^2 phi = delta (so psi(1) = -grad phi =
    :func:`delta_to_displacement`), the second-order source is

        S2 = sum_{i<j} [ phi,ii phi,jj - (phi,ij)^2 ]

    and the net second-order displacement (the D2 = -(3/7) D^2 growth
    coefficient folded in, Einstein-de-Sitter; the Omega_m^(-1/143)
    correction is sub-percent for viable cosmologies and omitted)
    satisfies ``div psi(2) = -(3/7) S2`` — the same sign family as
    ``div psi(1) = -delta``.  Six tidal-tensor transforms + one forward
    + three gradient inverses: 11 FFTs total.
    """
    a = _transform.rfftn(delta, norm="forward")
    inv = _inv_ksq(shape, spacing, delta.dtype)
    kx, ky, kz = _grad_kvectors(shape, spacing, delta.dtype)
    kvecs = (
        (kx, (slice(None), None, None)),
        (ky, (None, slice(None), None)),
        (kz, (None, None, slice(None))),
    )

    def tidal(i, j):
        # phi,ij in k-space: +k_i k_j delta_k / k^2   (phi_k = -delta_k/k^2)
        ki = kvecs[i][0][kvecs[i][1]]
        kj = kvecs[j][0][kvecs[j][1]]
        return _transform.irfftn(a * (ki * kj * inv), shape, norm="forward")

    d00, d11, d22 = tidal(0, 0), tidal(1, 1), tidal(2, 2)
    d01, d02, d12 = tidal(0, 1), tidal(0, 2), tidal(1, 2)
    s2 = (
        d00 * d11 + d00 * d22 + d11 * d22
        - d01 * d01 - d02 * d02 - d12 * d12
    )
    b = _transform.rfftn(s2, norm="forward")
    # psi2_k = +(3/7) i k S2_k / k^2  =>  div psi2 = -(3/7) S2
    pref = jnp.asarray(3.0 / 7.0, delta.dtype)
    comps = [
        _transform.irfftn(
            b * (1j * kv[bc] * inv) * pref, shape, norm="forward"
        )
        for kv, bc in kvecs
    ]
    return jnp.stack(comps)


def delta_to_displacement_2lpt(delta, spacing):
    """Second-order (2LPT) displacement correction psi(2) [Mpc/h].

    Particles move as ``x = q + psi(1) + psi(2)`` where ``psi(1)`` is
    :func:`delta_to_displacement` of the SAME realization and ``delta``
    carries its full amplitude (snapshot convention — for initial
    conditions at growth factor D, psi(1) scales as D and psi(2) as
    D^2 automatically when delta is the D-scaled field).  Removes the
    leading transient of Zel'dovich-started simulations and tightens
    mock-catalog two-point statistics at mildly nonlinear amplitudes.
    """
    shape = tuple(int(s) for s in delta.shape[-3:])
    return _second_order_displacement(delta, shape, float(spacing))


@functools.partial(jax.jit, static_argnames=("shape", "spacing", "component"))
def _tidal_from_field(delta, shape, spacing, component):
    a = _transform.rfftn(delta, norm="forward")
    comps = [component] if component is not None else range(6)
    out = [
        _transform.irfftn(
            apply_kernel_inline(a, shape, spacing, "xyz", "tidal", c),
            shape, norm="forward",
        )
        for c in comps
    ]
    return out[0] if component is not None else jnp.stack(out)


def delta_to_tidal(delta, spacing, component=None):
    """Tidal (T-web) tensor T_ij = d_i d_j phi with grad^2 phi = delta.

    ``component`` indexes :data:`TIDAL_PAIRS` (xx, yy, zz, xy, xz, yz);
    None stacks all six as (6, nx, ny, nz).  The diagonal sums to delta
    exactly (the spectral kernels k_i k_j / k^2 sum to 1 per mode).
    Cosmic-web classification of the result lives in
    randomfield_tpu.models.web.
    """
    shape = tuple(int(s) for s in delta.shape[-3:])
    comp = None if component is None else int(component)
    return _tidal_from_field(delta, shape, float(spacing), comp)


def delta_to_velocity(delta, spacing, cosmology, z=0.0):
    """Linear peculiar velocity field [km/s], shape (3, nx, ny, nz).

    ``v = a H(a) f(a) psi`` with f the logarithmic growth rate.
    """
    from randomfield_tpu.models.cosmology import create_cosmology

    cosmology = create_cosmology(cosmology)
    z = float(z)
    a = 1.0 / (1.0 + z)
    H = cosmology.H0 * float(cosmology.efunc(z))  # km/s/Mpc
    f = cosmology.growth_rate(z)
    # psi in Mpc/h; v = a H f psi -> (km/s/Mpc) * Mpc/h = km/s / h... the
    # h cancels against H expressed per Mpc/h: use H in km/s/(Mpc/h) = H/h
    pref = a * H * f / cosmology.h
    shape = tuple(int(s) for s in delta.shape[-3:])
    return _gradient_inverse_laplacian(delta, shape, float(spacing), 1.0) * jnp.asarray(
        pref, delta.dtype
    )

# ---------------------------------------------------------------------------
# Seed-direct derived fields: kernels applied to the SAMPLED spectrum.
#
# delta_to_* above start from a rendered field and pay a forward rfftn —
# impossible at the HBM ceiling (1024^3 has no room for the full complex
# intermediate next to the field).  But the engine already holds the
# packed spectrum c_k right after sampling; a derived field is just an
# elementwise spectral kernel away:
#
#     potential:     Phi_k = g(k) c_k,          g real
#     displacement:  psi^i_k = i g_i(k) c_k,    g_i real (odd)
#
# so Generator.generate_{potential,displacement,velocity} (engine/
# generator.py) sample, multiply, and run the ordinary inverse pipeline
# (fused or staged) — no forward transform, no extra full-size buffers,
# exact at any size the plain render supports.
# ---------------------------------------------------------------------------


def _layout_k(shape, spacing, dtype, layout, grad=False):
    """(kx, kmid, klast) 1-D vectors in the spectrum's axis order."""
    if grad:
        kx, ky, kz = _grad_kvectors(shape, spacing, dtype)
    else:
        kx, ky, kz = _grid.kvectors(shape, spacing, dtype)
    if layout == "xzy":
        return kx, kz, ky
    return kx, ky, kz


def apply_kernel_inline(c, shape, spacing, layout, kind, component=0,
                        prefactor=1.0):
    """Apply a derived-field kernel to a packed spectrum, fused.

    Builds |k|^2 (and the differentiating k vector) from 1-D constants
    INSIDE the traced computation, so no full-size kernel array is ever
    materialized — at the HBM ceiling an explicit (nx, nzh, ny) float32
    kernel costs 2+ GB and an extra memory pass (measured OOM at
    1024^3).  ``prefactor`` may be a traced scalar.

    kind='scalar':  c_k -> prefactor / k^2 * c_k            (0 at DC)
    kind='kaiser':  c_k -> (b + f mu^2) * c_k with mu = k_los/|k| —
        the plane-parallel linear redshift-space kernel (Kaiser 1987)
        for a tracer of bias b; prefactor packs (b, f) as a length-2
        vector and component selects the physical LOS axis.  Even in
        every k component, so Hermitianity (and the half-pack c2r
        tail) is preserved exactly.
    kind='grad':    c_k -> i * prefactor * k_i / k^2 * c_k  (Nyquist-
        zeroed k_i: every self-conjugate mode maps to zero, so the
        output stays exactly Hermitian and the half-pack c2r applies).
    kind='tidal':   c_k -> prefactor * k_i k_j / k^2 * c_k, component
        indexing TIDAL_PAIRS — the T-web tensor T_ij = d_i d_j phi with
        grad^2 phi = delta.  Diagonal components use FULL k vectors (the
        kernel k_i^2 is even per axis, so Hermitianity is preserved and
        the diagonals sum to 1 on every non-DC mode: trace(T) = delta
        EXACTLY per voxel — the test gate).  Off-diagonal kernels are
        odd in EACH factor axis, so their Nyquist entries have no
        Hermitian-consistent packed representation — they use the
        Nyquist-zeroed gradient vectors, like kind='grad'.
    """
    dtype = c.real.dtype
    kx, kmid, klast = _layout_k(shape, spacing, dtype, layout)
    k2 = (
        (kx * kx)[:, None, None]
        + (kmid * kmid)[None, :, None]
        + (klast * klast)[None, None, :]
    )
    inv = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
    pref = jnp.asarray(prefactor, dtype)
    if kind == "scalar":
        return c * (pref * inv)
    axes = {"xyz": {0: 0, 1: 1, 2: 2}, "xzy": {0: 0, 1: 2, 2: 1}}[layout]
    if kind == "kaiser":
        # c -> (b + f mu^2) c with mu^2 = k_los^2 / k^2 — the linear
        # Kaiser redshift-space kernel for a tracer of bias b
        # (prefactor = (b, f) 2-vector, component = physical LOS axis).
        # k_los^2 is even in every axis, so FULL k vectors keep the
        # spectrum exactly Hermitian; the DC mode gets mu^2 = 0 (its
        # c(0) = 0 upstream anyway).
        bf = pref.reshape(-1)
        pos = axes[int(component)]
        kvec = (kx, kmid, klast)[pos]
        bcast = [None, None, None]
        bcast[pos] = slice(None)
        mu2 = (kvec * kvec)[tuple(bcast)] * inv
        return c * (bf[0] + bf[1] * mu2)
    if kind == "tidal":
        i, j = TIDAL_PAIRS[int(component)]
        if i == j:
            kvecs = (kx, kmid, klast)
        else:
            kvecs = _layout_k(shape, spacing, dtype, layout, grad=True)

        def axis_vec(phys_axis):
            pos = axes[phys_axis]
            bcast = [None, None, None]
            bcast[pos] = slice(None)
            return kvecs[pos][tuple(bcast)]

        g = pref * axis_vec(i) * axis_vec(j) * inv
        return c * g
    gx, gmid, glast = _layout_k(shape, spacing, dtype, layout, grad=True)
    pos = axes[int(component)]
    kvec = (gx, gmid, glast)[pos]
    bcast = [None, None, None]
    bcast[pos] = slice(None)
    g = pref * kvec[tuple(bcast)] * inv
    # i * g * c: (a + ib)(ig) = -b g + i a g
    return jax.lax.complex(-c.imag * g, c.real * g)
