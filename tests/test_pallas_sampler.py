"""Pallas fused sampler tests.

The Mosaic interpreter stubs ``prng_random_bits`` to zeros (jax
interpret_pallas_call.py: "TODO: Implement this properly"), so the PRNG
path can only be validated on real TPU hardware:
``scripts/validate_pallas_sampler.py`` runs the statistical gate there
(per-mode variance, filter response, Hermitian-ness, determinism).  The
CPU suite checks what the interpreter can: tracing, shapes, the fused
sigma/filter amplitude algebra, and the Hermitian plane fixup.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from randomfield_tpu.ops import transform
from randomfield_tpu.ops.pallas_sampler import sample_spectrum_pallas


def _on_tpu():
    try:
        return jax.devices()[0].platform.startswith("tpu") or "TPU" in str(
            jax.devices()[0]
        )
    except Exception:
        return False


@pytest.mark.parametrize("layout", ["xyz", "xzy"])
@pytest.mark.parametrize("smoothing", [0.0, 2.0])
def test_amplitude_algebra_under_stubbed_prng(layout, smoothing):
    # interpreter PRNG yields all-zero bits => u1 = 2^-25, theta = 0, so
    # every mode gets the SAME deterministic draw r = sqrt(50 ln 2) on the
    # real axis — which pins the fused sigma * filter * 1/sqrt(2) * k^2
    # amplitude path exactly against a closed form
    shape = (8, 8, 8)
    spacing = 1.3
    nzh = 5
    sigma0 = 1.3
    sig_shape = (8, 8, nzh) if layout == "xyz" else (8, nzh, 8)
    sig = jnp.full(sig_shape, sigma0, jnp.float32)
    c = sample_spectrum_pallas(
        7, sig, shape, spacing, smoothing_length=smoothing, layout=layout,
        interpret=True,
    )
    assert c.shape == sig_shape
    assert c.dtype == jnp.complex64

    from randomfield_tpu.ops import grid

    km = np.asarray(grid.kmag(shape, spacing), np.float64)
    r = np.sqrt(50 * np.log(2.0))
    base = sigma0 * np.exp(-0.5 * (km * smoothing) ** 2) / np.sqrt(2.0) * r
    want = np.asarray(
        transform.symmetrize_with_shape(
            jnp.asarray(base, jnp.complex64), nz=8, scale_self_conjugate=True
        )
    )
    got = np.asarray(c.real) + 1j * np.asarray(c.imag)
    if layout == "xzy":
        got = got.transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-6)


@pytest.mark.skipif(not _on_tpu(), reason="hardware PRNG requires a real TPU")
def test_statistics_on_tpu():
    from scripts.validate_pallas_sampler import run_checks

    run_checks(n_seeds=100, shape=(16, 16, 16))
