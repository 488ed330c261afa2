"""Binned bispectrum estimator (FFT shell method).

Extends the reference's second-order validation surface
(``randomfield/powertools.py:calculate_power``, SURVEY.md section 3.5)
to third order: the leading non-Gaussian statistic of evolved /
transformed fields (lognormal mocks, Zel'dovich catalogs, quadratic
fields).  A Gaussian ``Generator`` field has B = 0 in expectation, which
makes this the natural "is it really Gaussian?" gate; the nonlinear
model generators have known tree-level predictions tested against it.

Method (Scoccimarro FFT estimator): cut the spectrum into |k| shells,
inverse-transform each shell once, and reduce triple products over the
grid — every closed triad (k1 + k2 + k3 = 0) with |k_i| in the chosen
bins is averaged in O(nbins * N^3 log N) instead of the O(N^6) direct
sum.  With this package's conventions (``ops/transform.py``):

    c_k     = a^3 sum_x delta(x) exp(-ik.x)        (field_to_spectrum)
    d_i(x)  = (1/V) sum_{k in S_i} c_k exp(ik.x)   (masked synthesis)
    u_i(x)  =       sum_{k in S_i} exp(ik.x)       (unit shell)
    <c1 c2 c3>_{closed} = V B(k1, k2, k3)

    sum_x d_i d_j d_l = (Ncells / V^3) sum_{closed} c1 c2 c3
    sum_x u_i u_j u_l =  Ncells * Ntri(i, j, l)

    =>  B_hat(i,j,l) = V^2 * sum_x d_i d_j d_l / sum_x u_i u_j u_l

an exact per-triad average (no thin-shell approximation), verified
against a direct O(N^6) float64 triad sum in tests/test_bispectrum.py.

Everything runs as one jitted device program per field; the
geometry-only denominator is cached per (shape, spacing, edges).
Memory: nbins simultaneous real fields (nbins * Ncells * 4 bytes) —
validation-scale grids (up to ~512^3 with nbins<=8 on 16 GB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from randomfield_tpu.ops import grid as _grid
from randomfield_tpu.ops import transform as _transform

__all__ = ["bispectrum_bins", "calculate_bispectrum", "reduced_bispectrum"]


def bispectrum_bins(shape, spacing, nbins=8, kmin=None, kmax=None):
    """Linear |k| shell edges and the closure-compatible bin triples.

    Returns ``(edges, triples)``: ``edges`` has ``nbins + 1`` entries
    from ``kmin`` (default: the fundamental mode) to ``kmax`` (default:
    the smallest axis Nyquist); ``triples`` is an ``(T, 3)`` int array
    of bin indices ``i <= j <= l`` whose shells can host closed
    triangles (triangle inequality with the full bin widths:
    ``lo_l < hi_i + hi_j``).  Linear bins are the bispectrum
    convention — shells a few fundamental modes wide populate triads
    quickly.
    """
    kf, kny = _grid.get_k_bounds(shape, spacing)
    lo = kf * 0.999 if kmin is None else float(kmin)
    hi = kny * 1.001 if kmax is None else float(kmax)
    edges = np.linspace(lo, hi, int(nbins) + 1)
    triples = [
        (i, j, l)
        for i in range(nbins)
        for j in range(i, nbins)
        for l in range(j, nbins)
        if edges[l] < edges[i + 1] + edges[j + 1]
    ]
    return edges, np.asarray(triples, np.int32)


@functools.partial(
    jax.jit, static_argnames=("shape", "spacing", "edges", "triples")
)
def _triple_sums(delta, shape, spacing, edges, triples):
    """sum_x d_i d_j d_l for every bin triple, in one program."""
    kmag = _grid.kmag(shape, spacing, jnp.float32)
    # delta=None (an empty pytree under jit) selects the geometry
    # denominator: unit shells u_i = irfftn(mask)
    c = None if delta is None else _transform.field_to_spectrum(delta, spacing)
    shells = []
    for b in range(len(edges) - 1):
        mask = (kmag >= edges[b]) & (kmag < edges[b + 1]) & (kmag > 0)
        if c is None:
            spec = mask.astype(jnp.complex64)
        else:
            spec = jnp.where(mask, c, jnp.zeros((), c.dtype))
        shells.append(
            _transform.irfftn(spec, shape, assume_hermitian=True)
        )
    # pairwise products are shared across triples with a common (i, j);
    # group by that prefix so each d_i * d_j is formed once.
    sums = []
    prod_cache = {}
    for (i, j, l) in triples:
        if (i, j) not in prod_cache:
            prod_cache[(i, j)] = shells[i] * shells[j]
        # slab-wise f32 sums stay short enough for accumulation safety
        s = jnp.sum(
            jnp.sum(prod_cache[(i, j)] * shells[l], axis=(1, 2)), axis=0
        )
        sums.append(s)
    return jnp.stack(sums)


@functools.lru_cache(maxsize=8)
def _triangle_counts(shape, spacing, edges, triples):
    """Cached geometry denominator: sum_x u_i u_j u_l per triple."""
    return np.asarray(
        _triple_sums(None, shape, spacing, edges, triples), np.float64
    )


@functools.lru_cache(maxsize=8)
def _make_mesh_triple_sums(mesh, shape, spacing, edges, triples,
                           with_field):
    """Distributed shell synthesis + triple reductions on a mesh.

    Same estimator as :func:`_triple_sums` with the transforms swapped
    for the distributed slab/pencil ones: every shell field is sharded
    (nbins simultaneous fields cost nbins/P of the grid per device),
    the masks shard with the spectrum, and the grid sums lower to
    psums — the full spectrum and the shell fields are never gathered.
    ``with_field=False`` compiles the geometry denominator (unit
    shells).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from randomfield_tpu.parallel import dfft
    from randomfield_tpu.parallel import pencil as _pencil
    from randomfield_tpu.parallel.mesh import SPACE_AXIS, field_sharding

    is_pencil = _pencil.is_pencil_mesh(mesh)
    if is_pencil:
        spec_sharding = NamedSharding(
            mesh, P(None, _pencil.SPX_AXIS, _pencil.SPY_AXIS)
        )
        in_sharding = _pencil.pencil_field_sharding(mesh)
    else:
        spec_sharding = NamedSharding(mesh, P(None, SPACE_AXIS, None))
        in_sharding = field_sharding(mesh)

    def _forward(delta):
        if is_pencil:
            return _pencil.rfftn_pencil(delta, shape, mesh)
        return dfft.rfftn_slab(delta, shape, mesh)

    def _shell(spec):
        if is_pencil:
            return _pencil.irfftn_pencil(
                spec, shape, mesh, assume_hermitian=True,
                input_layout="state1",
            )
        return dfft.irfftn_slab(spec, shape, mesh, assume_hermitian=True)

    def fn(delta):
        kmag = jax.lax.with_sharding_constraint(
            _grid.kmag(shape, spacing, jnp.float32), spec_sharding
        )
        sp3 = jnp.asarray(float(spacing) ** 3, jnp.complex64)
        c = None if not with_field else _forward(delta) * sp3
        shells = []
        for b in range(len(edges) - 1):
            mask = (kmag >= edges[b]) & (kmag < edges[b + 1]) & (kmag > 0)
            if c is None:
                spec = mask.astype(jnp.complex64)
            else:
                spec = jnp.where(mask, c, jnp.zeros((), c.dtype))
            shells.append(_shell(spec))
        sums = []
        prod_cache = {}
        for (i, j, l) in triples:
            if (i, j) not in prod_cache:
                prod_cache[(i, j)] = shells[i] * shells[j]
            s = jnp.sum(
                jnp.sum(prod_cache[(i, j)] * shells[l], axis=(1, 2)), axis=0
            )
            sums.append(s)
        return jnp.stack(sums)

    if with_field:
        return jax.jit(fn, in_shardings=in_sharding)
    return jax.jit(functools.partial(fn, None))


@functools.lru_cache(maxsize=8)
def _mesh_triangle_counts(mesh, shape, spacing, edges, triples):
    """Geometry denominator computed on the mesh (sharded unit shells)."""
    fn = _make_mesh_triple_sums(
        mesh, shape, spacing, edges, triples, with_field=False
    )
    return np.asarray(fn(), np.float64)


def calculate_bispectrum(delta, spacing, nbins=8, kmin=None, kmax=None,
                         mesh=None):
    """Binned bispectrum of a real-space field.

    Returns ``(k_centers, triples, bispec, ntri)``:

    - ``k_centers``: ``(nbins,)`` shell centers (linear bins),
    - ``triples``: ``(T, 3)`` bin-index triples ``i <= j <= l``,
    - ``bispec``: ``(T,)`` estimated B(k_i, k_j, k_l), units
      (length)^6 (e.g. (Mpc/h)^6),
    - ``ntri``: ``(T,)`` number of closed Fourier triads per triple
      (the estimator's inverse-variance weight; entries with few triads
      are noisy — the first shells at small nbins).

    Triples whose shells admit no closed triad are dropped.  For a
    Gaussian field the expectation is 0 for every triple; see
    ``reduced_bispectrum`` for the dimensionless Q.

    With ``mesh`` (a ('data','space') slab mesh or a 2-D pencil mesh,
    ``delta`` sharded accordingly) the shell synthesis runs through the
    distributed transforms and the reductions psum — the spectrum and
    shell fields stay sharded; parity vs the single-device estimator is
    asserted in tests/test_bispectrum.py.
    """
    delta = jnp.asarray(delta)
    shape = tuple(int(n) for n in delta.shape)
    edges, triples = bispectrum_bins(shape, spacing, nbins, kmin, kmax)
    ekey = tuple(float(e) for e in edges)
    tkey = tuple(map(tuple, triples.tolist()))
    volume = shape[0] * shape[1] * shape[2] * float(spacing) ** 3
    ncells = shape[0] * shape[1] * shape[2]
    if mesh is not None:
        fn = _make_mesh_triple_sums(
            mesh, shape, float(spacing), ekey, tkey, with_field=True
        )
        num = np.asarray(fn(delta), np.float64)
        den = _mesh_triangle_counts(mesh, shape, float(spacing), ekey, tkey)
    else:
        num = np.asarray(
            _triple_sums(delta, shape, float(spacing), ekey, tkey), np.float64
        )
        den = _triangle_counts(shape, float(spacing), ekey, tkey)
    ntri = den / ncells
    keep = ntri > 0.5  # shells with no closed triad
    # numerator shells carry no 1/V synthesis factor (irfftn is the
    # unnormalized sum over modes), so D_i = V d_i and
    # B = V^2 sum(d1 d2 d3) / sum(u1 u2 u3) = num / (V * den)
    with np.errstate(invalid="ignore", divide="ignore"):
        bispec = num / (volume * den)
    centers = 0.5 * (edges[:-1] + edges[1:])
    return centers, triples[keep], bispec[keep], ntri[keep]


def reduced_bispectrum(k_centers, triples, bispec, k_power, p_power):
    """Dimensionless Q = B / (P1 P2 + P2 P3 + P3 P1).

    ``(k_power, p_power)`` is a binned P(k) table (e.g. from
    ``calculate_power`` on the same field); interpolated at the shell
    centers.  Q is O(1) for gravitational/quadratic non-Gaussianity and
    removes the leading amplitude dependence.
    """
    pk = np.interp(np.asarray(k_centers)[np.asarray(triples)],
                   np.asarray(k_power), np.asarray(p_power))
    denom = (
        pk[:, 0] * pk[:, 1] + pk[:, 1] * pk[:, 2] + pk[:, 2] * pk[:, 0]
    )
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.asarray(bispec) / denom
