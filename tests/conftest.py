"""Test environment: force an 8-device CPU-simulated mesh.

Per SURVEY.md §4, multi-device/collective correctness is tested on a fake
backend: 8 virtual CPU devices via ``--xla_force_host_platform_device_count``.
This must be set before JAX initializes its backends.
"""

import os

# NOTE: in this environment the axon TPU plugin ignores JAX_PLATFORMS;
# JAX_PLATFORM_NAME is what actually forces the CPU backend.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def mesh():
    from fer_vit_tpu.core import make_mesh

    return make_mesh()
