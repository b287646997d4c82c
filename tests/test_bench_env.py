"""bench.py env plumbing: BENCH_COMPILER_OPTIONS must parse and reach the
timed jit.

The XLA option sweep (scripts/xla_flag_sweep.py) drives bench.py via this
env var because per-jit ``compiler_options`` is the only channel that
reaches the remote TPU compiler through the axon tunnel (XLA_FLAGS is
parsed client-side and aborts on TPU-only flags). These tests pin the
contract on the CPU backend: valid JSON parses into the jit, an invalid
option name fails LOUDLY (the sweep records it as rejected), and the
default path (no env var) stays None.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from tests.env_utils import cpu_env

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVE = """
import bench, jax.numpy as jnp
print("OPTS=" + repr(bench._compiler_options()))
s = bench._time_scan(lambda c, x: c + jnp.sum(x) * 0.0, (jnp.ones((4, 4)),), 3)
assert s > 0
print("TIMED_OK")
"""


def _run(extra_env: dict) -> subprocess.CompletedProcess:
    env = cpu_env(repo=REPO)
    env.update(extra_env)
    return subprocess.run([sys.executable, "-c", DRIVE], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=300)


def test_no_env_var_means_no_options():
    r = _run({})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OPTS=None" in r.stdout
    assert "TIMED_OK" in r.stdout


def test_valid_options_parse_and_compile():
    # a real XLA option accepted by every backend's option parser; bool
    # must be a JSON boolean (XLA rejects the string "false")
    opts = {"xla_llvm_disable_expensive_passes": False}
    r = _run({"BENCH_COMPILER_OPTIONS": json.dumps(opts)})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OPTS={'xla_llvm_disable_expensive_passes': False}" in r.stdout
    assert "TIMED_OK" in r.stdout


def test_unknown_option_fails_loudly():
    opts = {"xla_this_option_does_not_exist": "1"}
    r = _run({"BENCH_COMPILER_OPTIONS": json.dumps(opts)})
    assert r.returncode != 0
    assert "TIMED_OK" not in r.stdout
