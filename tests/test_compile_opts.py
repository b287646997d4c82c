"""Tuned-compiler-options plumbing (fer_vit_tpu/utils/compile_opts.py).

The tuned TPU default (xla_tpu_scoped_vmem_limit_kib=65536, measured
+3.7% end-to-end — XLA_SWEEP.json) must apply ONLY on TPU backends:
these tests run on CPU, where the option name itself would be rejected
at compile time, so the platform gate is what keeps the whole CPU suite
alive. It must also apply ONLY to the ``inference`` program class: the
same option is a measured 0.96× regression on the trainer epoch scans
(TRAIN_OPTIONS.json), so the ``train`` class ships compiler defaults.
Env precedence ('{}' disables, JSON dict overrides — every class) is
the sweep and user contract.
"""

from __future__ import annotations

import json

import pytest

from fer_vit_tpu.utils.compile_opts import (
    TUNED_TPU_OPTIONS,
    TUNED_TPU_OPTIONS_BY_CLASS,
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


def test_train_class_ships_compiler_defaults(monkeypatch):
    # TRAIN_OPTIONS.json measured the 64 MiB scoped-VMEM budget at
    # 0.9614× on the epoch scan: the train program class must resolve
    # to None (compiler defaults) REGARDLESS of platform — the class
    # table itself holds None, so no device query can resurrect it.
    monkeypatch.delenv("FERVIT_COMPILER_OPTIONS", raising=False)
    assert TUNED_TPU_OPTIONS_BY_CLASS["train"] is None
    assert tuned_tpu_options("train") is None
    assert resolve_compiler_options(program_class="train") is None
    assert TUNED_TPU_OPTIONS_BY_CLASS["inference"] == TUNED_TPU_OPTIONS


def test_env_override_applies_to_every_program_class(monkeypatch):
    opts = {"xla_llvm_disable_expensive_passes": False}
    monkeypatch.setenv("FERVIT_COMPILER_OPTIONS", json.dumps(opts))
    assert resolve_compiler_options(program_class="train") == opts
    assert resolve_compiler_options(program_class="inference") == opts


def test_tuned_jit_rejects_unknown_program_class():
    from fer_vit_tpu.utils.compile_opts import tuned_jit

    with pytest.raises(ValueError, match="program_class"):
        tuned_jit(lambda x: x, program_class="serving")


def test_tuned_options_are_xla_typed():
    # XLA's option parser takes int64 options as decimal strings and
    # booleans as real JSON booleans; pin the types so a future edit
    # can't silently break the remote compile.
    for key, val in TUNED_TPU_OPTIONS.items():
        assert key.startswith("xla_tpu_"), key
        assert isinstance(val, (str, bool)), (key, type(val))
        if isinstance(val, str):
            int(val)  # decimal string


def test_tuned_jit_decorator_forms_and_correctness(monkeypatch):
    # tuned_jit must work bare, as a factory with jit kwargs, and bound
    # as a method — the three forms used across the hot paths.
    import jax.numpy as jnp

    from fer_vit_tpu.utils.compile_opts import tuned_jit

    monkeypatch.delenv("FERVIT_COMPILER_OPTIONS", raising=False)

    @tuned_jit
    def double(x):
        return 2 * x

    assert double._fervit_tuned_jit
    assert float(double(jnp.float32(3.0))) == 6.0

    class Obj:
        scale = 5

        @tuned_jit(static_argnums=0)
        def mul(self, x):
            return self.scale * x

    assert Obj.mul._fervit_tuned_jit
    assert float(Obj().mul(jnp.float32(2.0))) == 10.0


def test_tuned_jit_rebuilds_on_env_change(monkeypatch):
    # flipping FERVIT_COMPILER_OPTIONS between calls must produce a
    # fresh jit (per-(platform, env) cache), not reuse stale options.
    import jax
    import jax.numpy as jnp

    import fer_vit_tpu.utils.compile_opts as mod

    built = []
    real_jit = jax.jit

    def spy(fun, **kw):
        built.append(kw.get("compiler_options"))
        return real_jit(fun, **{k: v for k, v in kw.items()
                                if k != "compiler_options"})

    monkeypatch.setattr(mod.jax, "jit", spy)
    monkeypatch.delenv("FERVIT_COMPILER_OPTIONS", raising=False)

    f = mod.tuned_jit(lambda x: x + 1)
    f(jnp.float32(0.0))
    f(jnp.float32(0.0))  # same key → cached, no rebuild
    assert len(built) == 1 and built[0] is None  # CPU → no tuned default

    monkeypatch.setenv("FERVIT_COMPILER_OPTIONS",
                       '{"xla_llvm_disable_expensive_passes": false}')
    f(jnp.float32(0.0))
    assert len(built) == 2
    assert built[1] == {"xla_llvm_disable_expensive_passes": False}


def test_hot_paths_use_tuned_jit():
    # every hot compile site must carry the tuned options AND the right
    # program class; introspect the markers rather than trusting the
    # rollout by hand.
    from fer_vit_tpu.train import loop as loop_mod
    from fer_vit_tpu.train.harness import Harness

    for fn in (Harness.train_epoch, Harness.eval_epoch,
               loop_mod._grad_snapshot):
        assert getattr(fn, "_fervit_tuned_jit", False)
        assert fn._fervit_program_class == "train"


def test_predictions_path_is_inference_class():
    # Harness.predictions must build its jit through tuned_jit (lazy
    # per-(platform, env) re-resolution) with the inference class.
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fer_vit_tpu.models import LatentViT
    from fer_vit_tpu.train.harness import Harness, TrainConfig

    model = LatentViT(depth=1, heads=2, embed_dim=32, mlp_dim=32)
    h = Harness(model=model, cfg=TrainConfig(batch_size=4))
    state = h.init_state(jax.random.key(0), jnp.zeros((1, 18, 512)))
    preds, probs = h.predictions(state, np.zeros((6, 18, 512), np.float32))
    assert preds.shape == (6,) and probs.shape == (6, 7)
    assert getattr(h._predict_jit, "_fervit_tuned_jit", False)
    assert h._predict_jit._fervit_program_class == "inference"


def test_tuned_jit_cache_keys_on_canonical_options(monkeypatch):
    # semantically identical env strings ('{}' vs '{ }', key-order
    # permutations) must share ONE built jit — the cache keys on the
    # parsed/canonicalized options, not the raw env string.
    import jax
    import jax.numpy as jnp

    import fer_vit_tpu.utils.compile_opts as mod

    built = []
    real_jit = jax.jit

    def spy(fun, **kw):
        built.append(kw.get("compiler_options"))
        return real_jit(fun, **{k: v for k, v in kw.items()
                                if k != "compiler_options"})

    monkeypatch.setattr(mod.jax, "jit", spy)

    f = mod.tuned_jit(lambda x: x + 1)
    for raw in ("{}", "{ }", " {}  "):
        monkeypatch.setenv("FERVIT_COMPILER_OPTIONS", raw)
        f(jnp.float32(0.0))
    assert len(built) == 1 and built[0] is None

    for raw in ('{"a": "1", "b": "2"}', '{"b": "2", "a": "1"}'):
        monkeypatch.setenv("FERVIT_COMPILER_OPTIONS", raw)
        f(jnp.float32(0.0))
    assert len(built) == 2
    assert built[1] == {"a": "1", "b": "2"}


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
