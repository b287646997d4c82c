"""Environment helpers for CPU-forced test subprocesses.

The dev machine's shell environment routes jax to a TPU tunnel via a
sitecustomize on PYTHONPATH (``.axon_site``). That register module
force-overrides the platform config, so a fresh interpreter inheriting
the path will try to initialize the tunnel backend at first device use
even with ``JAX_PLATFORMS=cpu`` — and HANG (not error) whenever the
tunnel is down. Every CPU-forced subprocess must therefore strip the
sitecustomize dir from PYTHONPATH; tunnel health must never gate the
CPU test suite.
"""

from __future__ import annotations

import os

AXON_SITE_MARKER = ".axon_site"

# every sys.modules name any tests.torch_refs_aux.install_fake_* call may
# register — conftest snapshots/restores these around each test so an
# in-process stub install can never leak (incl. the generic top-level
# names) into later tests. Lives here (torch-free module) so conftest
# doesn't make torch an import dependency of the whole suite.
FAKE_MODULE_NAMES = (
    "timm", "torchvision", "torchvision.transforms",
    "models", "models.encoders", "models.encoders.model_irse",
    "criteria", "criteria.lpips", "criteria.lpips.lpips",
)


def strip_axon_site(pythonpath: str | None) -> str:
    """Drop the TPU-tunnel sitecustomize dir from a PYTHONPATH string."""
    return os.pathsep.join(
        p for p in (pythonpath or "").split(os.pathsep)
        if p and AXON_SITE_MARKER not in p)


def cpu_env(repo: str | None = None, xla_flags: str | None = None) -> dict:
    """A copy of os.environ hard-pinned to the CPU backend: XLA_FLAGS
    dropped (or replaced), JAX_PLATFORMS/JAX_PLATFORM_NAME forced to cpu,
    the tunnel sitecustomize stripped, and ``repo`` prepended to
    PYTHONPATH when given."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    pp = strip_axon_site(env.get("PYTHONPATH"))
    if repo:
        pp = repo + (os.pathsep + pp if pp else "")
    if pp:
        env["PYTHONPATH"] = pp
    else:
        env.pop("PYTHONPATH", None)
    if xla_flags:
        env["XLA_FLAGS"] = xla_flags
    return env
