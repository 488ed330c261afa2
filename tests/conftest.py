"""Test harness config: run JAX on 8 virtual CPU devices.

The sandbox has one real TPU chip; multi-chip sharding is validated on a
virtual CPU mesh (SURVEY.md section 4, "Distributed tests").

Note: the sandbox's sitecustomize imports jax at interpreter startup to
register the TPU plugin, so env vars set here are too late — we must go
through jax.config.update before any backend is initialized.
"""

import faulthandler
import os
import sys

import jax

_PLATFORM = os.environ.get("RF_TEST_PLATFORM", "cpu")
jax.config.update("jax_platforms", _PLATFORM)
if _PLATFORM == "cpu":
    jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Hang watchdog: a full-suite run has been observed to deadlock in a
# futex wait (only while the sandbox's TPU tunnel was wedged; never
# reproduced with the tunnel healthy or down cleanly).  Rather than let
# any such hang eat the whole CI/driver budget silently, arm a per-test
# deadline that dumps every thread's stack and hard-exits.  900 s is ~6x
# the slowest legitimate test (the 2-process Gloo multihost run).
_TEST_DEADLINE_S = float(os.environ.get("RF_TEST_DEADLINE", 900))


import pytest


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_protocol(item, nextitem):
    # wrap the WHOLE protocol (setup + call + teardown, including fixture
    # finalization — session-scoped finalizers run inside the last item's
    # teardown) so a hang anywhere inside it trips the deadline; plain
    # setup/teardown hooks run before the built-in runner finalizes
    # fixtures and would leave teardown hangs uncovered (ADVICE r3)
    if _TEST_DEADLINE_S > 0:
        faulthandler.dump_traceback_later(_TEST_DEADLINE_S, exit=True)
    yield
    if _TEST_DEADLINE_S > 0:
        faulthandler.cancel_dump_traceback_later()
