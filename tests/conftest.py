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

# Hard-pin the suite to the CPU backend. The dev machine's TPU-tunnel
# sitecustomize (.axon_site on PYTHONPATH) force-overrides the platform
# config at interpreter start, and with the tunnel down the first device
# use then HANGS instead of erroring — this update wins over the override
# so tunnel health never gates the suite (subprocess-spawning tests use
# tests/env_utils.cpu_env for the same reason).
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(autouse=True)
def _no_fake_module_leaks():
    """Tests (and the in-process equivalence harness) install stub modules
    under generic names ('timm', 'torchvision', 'models', 'criteria', …)
    via tests.torch_refs_aux.install_fake_*, then import reference-tree
    modules ('afs', …) that bind classes FROM those stubs at import time.
    Snapshot/restore the stub names and evict reference-tree modules
    imported during the test, so neither a stale stub nor a reference
    module bound to one can poison a later test (order-dependence)."""
    import sys

    from tests.env_utils import FAKE_MODULE_NAMES

    sentinel = object()
    before = {n: sys.modules.get(n, sentinel) for n in FAKE_MODULE_NAMES}
    before_keys = set(sys.modules)
    yield
    for name, prev in before.items():
        if prev is sentinel:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = prev
    ref_root = os.environ.get("FERVIT_REFERENCE_ROOT", "/root/reference")
    for name in set(sys.modules) - before_keys:
        mod_file = getattr(sys.modules.get(name), "__file__", None) or ""
        if mod_file.startswith(ref_root):
            sys.modules.pop(name, None)
