"""Test environment: single-device CPU backend.

NOTE (this environment): the axon TPU plugin ignores ``JAX_PLATFORMS``
unless explicitly overridden, and ``JAX_PLATFORM_NAME`` is the reliable
forcing switch. Multi-virtual-device CPU
(``--xla_force_host_platform_device_count=8``) makes XLA CPU compiles
~18× slower, so the suite runs single-device; multi-device/mesh coverage
(SURVEY.md §4's CPU-simulated-mesh strategy) lives in
``test_multichip.py``, which subprocess-spawns an 8-device interpreter —
same fake backend, isolated from the rest of the suite.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
