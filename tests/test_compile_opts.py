"""Tuned-compiler-options plumbing (fer_vit_tpu/utils/compile_opts.py).

The tuned TPU default (xla_tpu_scoped_vmem_limit_kib=65536, measured
+3.7% end-to-end — XLA_SWEEP.json) must apply ONLY on TPU backends:
these tests run on CPU, where the option name itself would be rejected
at compile time, so the platform gate is what keeps the whole CPU suite
alive. Env precedence ('{}' disables, JSON dict overrides) is the sweep
and user contract.
"""

from __future__ import annotations

import json

import pytest

from fer_vit_tpu.utils.compile_opts import (
    TUNED_TPU_OPTIONS,
    resolve_compiler_options,
    tuned_tpu_options,
)


def test_cpu_backend_gets_no_tuned_default(monkeypatch):
    # conftest pins the CPU backend for the suite
    monkeypatch.delenv("FERVIT_COMPILER_OPTIONS", raising=False)
    assert tuned_tpu_options() is None
    assert resolve_compiler_options() is None


def test_env_dict_wins(monkeypatch):
    opts = {"xla_llvm_disable_expensive_passes": False}
    monkeypatch.setenv("FERVIT_COMPILER_OPTIONS", json.dumps(opts))
    assert resolve_compiler_options() == opts


def test_empty_env_dict_disables_default(monkeypatch):
    monkeypatch.setenv("FERVIT_COMPILER_OPTIONS", "{}")
    assert resolve_compiler_options() is None


def test_non_dict_env_rejected_loudly(monkeypatch):
    monkeypatch.setenv("FERVIT_COMPILER_OPTIONS", '["not", "a", "dict"]')
    with pytest.raises(ValueError, match="JSON object"):
        resolve_compiler_options()


def test_tuned_options_are_xla_typed():
    # XLA's option parser takes int64 options as decimal strings and
    # booleans as real JSON booleans; pin the types so a future edit
    # can't silently break the remote compile.
    for key, val in TUNED_TPU_OPTIONS.items():
        assert key.startswith("xla_tpu_"), key
        assert isinstance(val, (str, bool)), (key, type(val))
        if isinstance(val, str):
            int(val)  # decimal string


def test_predictor_jits_with_resolved_options(monkeypatch):
    # the serving hot path must consult the resolver at construction
    import fer_vit_tpu.serve as serve_mod
    from fer_vit_tpu.models import LatentViT

    calls = []

    def recorder(env_var="FERVIT_COMPILER_OPTIONS"):
        calls.append(env_var)
        return None

    monkeypatch.setattr(serve_mod, "_compiler_options", recorder)

    import jax
    import jax.numpy as jnp

    model = LatentViT(depth=1, heads=2, embed_dim=32, mlp_dim=32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 18, 512)))

    class _StubEnc:
        input_size = 32

    class _StubPsp:
        encoder = _StubEnc()
        variables = {}

    # image_route=False needs a pSp encoder; construction must call the
    # resolver exactly once for the single fused jit
    try:
        serve_mod.Predictor(model, variables, psp=_StubPsp(), batch_size=2)
    except Exception:
        # the stub encoder can't actually trace; the contract under test
        # is only that the resolver was consulted before jitting
        pass
    assert calls, "Predictor built its jit without resolving compiler options"
