"""Test harness config: run JAX on 8 virtual CPU devices.

The sandbox has one real TPU chip; multi-chip sharding is validated on a
virtual CPU mesh (SURVEY.md section 4, "Distributed tests").

Note: the sandbox's sitecustomize imports jax at interpreter startup to
register the TPU plugin, so env vars set here are too late — we must go
through jax.config.update before any backend is initialized.
"""

import os
import sys

import jax

_PLATFORM = os.environ.get("RF_TEST_PLATFORM", "cpu")
jax.config.update("jax_platforms", _PLATFORM)
if _PLATFORM == "cpu":
    jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
