"""Per-jit XLA compiler options: tuned TPU defaults + env plumbing.

Why per-jit and not ``XLA_FLAGS``: with a remote PJRT TPU client (the
axon tunnel here, but any client/server PJRT split behaves the same),
``XLA_FLAGS`` is parsed by the CLIENT-side XLA build —
``parse_flags_from_env`` aborts the whole process on TPU-only flag
names — while ``jax.jit(..., compiler_options=...)`` rides the PJRT
compile request and is validated by the compiler that actually builds
the program (a bogus option name fails that one compile, loudly). TPU
compiler knobs therefore must be plumbed per-jit.

Tuned defaults are PER PROGRAM CLASS — the same option measured
opposite signs on the two hot program shapes this package compiles:

* ``inference`` (pSp encode trunk, eval/serve forwards, analysis):
  ``xla_tpu_scoped_vmem_limit_kib=65536`` raises the scoped-VMEM budget
  the fusion emitters may assume to 64 MiB, deepening fusion tiles in
  the bandwidth-bound early trunk (input conv + stage0: +6.6 % on that
  region isolated), worth **+3.7 % end-to-end** on the batch-512
  pSp→LatentViT headline (1038.5 → 1077.4 img/s/chip; 32 MiB +3.5 %,
  128 MiB +3.4 % — flat plateau, 64 MiB the peak). Measured 2026-08-19
  on the v5e chip, scan-in-jit protocol — XLA_SCREEN.json /
  XLA_SWEEP.json at the repo root. Every other knob screened (scheduler
  reruns, fusion toggles, DMA/vector-fusion sizes, MSA ratios — 20
  total) was neutral or worse.

* ``train`` (whole-epoch ``lax.scan`` trainers, grad snapshots): the
  same 64 MiB budget is a measured **0.96× regression** on the
  LatentViT d2 epoch scan (33,095 vs 34,423 img/s, ~2× first-compile
  time — TRAIN_OPTIONS.json, scripts/measure_train_options.py), so the
  train class ships COMPILER DEFAULTS. The option was tuned on a
  forward-only conv trunk; the fused fwd+bwd+optimizer scan body is a
  different program class and the budget hint does not transfer.

The tuned default applies only when the first visible device is a TPU:
other backends reject TPU-only option names at compile time (tests run
this package on CPU constantly). Users override with the
``FERVIT_COMPILER_OPTIONS`` env var (a JSON dict applied to EVERY
program class; ``{}`` disables the tuned default outright).
"""

from __future__ import annotations

import functools
import json
import os
import threading
from typing import Optional

import jax

# The measured winners, per program class. Option values are strings
# because XLA's option parser takes int64 options as decimal strings
# (booleans, by contrast, must be real JSON booleans — it rejects
# "true"/"false" strings). ``None`` = ship compiler defaults.
TUNED_TPU_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "65536"}
TUNED_TPU_OPTIONS_BY_CLASS = {
    "inference": TUNED_TPU_OPTIONS,
    # TRAIN_OPTIONS.json: 64 MiB scoped VMEM is 0.9614× on the epoch
    # scan — the train class keeps XLA's own defaults.
    "train": None,
}
PROGRAM_CLASSES = tuple(TUNED_TPU_OPTIONS_BY_CLASS)

ENV_VAR = "FERVIT_COMPILER_OPTIONS"


def tuned_tpu_options(program_class: str = "inference") -> Optional[dict]:
    """The tuned options dict for ``program_class`` on a TPU backend, else None.

    Calls ``jax.devices()`` — callers are always about to compile for
    those devices anyway, so this adds no new initialization.
    """
    tuned = TUNED_TPU_OPTIONS_BY_CLASS[program_class]
    if tuned is None:
        return None
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return None
    return dict(tuned) if platform == "tpu" else None


def resolve_compiler_options(
    env_var: str = ENV_VAR, program_class: str = "inference"
) -> Optional[dict]:
    """Value for ``jax.jit(compiler_options=...)`` on hot paths.

    Precedence: ``env_var`` as a JSON dict if set (``{}`` → None, i.e.
    compiler defaults; applies to every program class); otherwise the
    per-class tuned TPU default, platform-gated.
    """
    raw = os.environ.get(env_var)
    if raw is not None:
        opts = json.loads(raw)
        if not isinstance(opts, dict):
            raise ValueError(
                f"{env_var} must be a JSON object of XLA options, got "
                f"{type(opts).__name__}: {raw!r}")
        return opts or None
    return tuned_tpu_options(program_class)


def tuned_jit(fun=None, *, program_class: str = "inference", **jit_kwargs):
    """``jax.jit`` with the tuned compiler options, resolved LAZILY.

    Drop-in for the hot-path jits: the underlying ``jax.jit`` is built
    on the FIRST CALL, not at decoration time, because
    :func:`resolve_compiler_options` touches ``jax.devices()`` — doing
    that at import would initialize the backend (and, through a downed
    TPU tunnel, hang) for processes that never compile anything.

    ``program_class`` selects the tuned default: ``"inference"`` (pSp
    encode, eval/serve/analysis forwards) gets the 64 MiB scoped-VMEM
    winner; ``"train"`` (epoch scans, trainer steps, grad snapshots)
    gets compiler defaults — see the module docstring for the
    measurements behind the split. ``FERVIT_COMPILER_OPTIONS``
    overrides both.

    The wrapper is a plain function, so it binds as a method exactly
    like the ``partial(jax.jit, static_argnums=0)`` decorators it
    replaces. The built jit is cached per (platform, canonicalized
    resolved options) — NOT the raw env string, so semantically
    identical overrides (``'{}'`` vs ``'{ }'``) share one executable —
    and one process that runs the same function on CPU (oracle) and TPU
    (measurement), or flips the env between runs, gets the right
    options on each while repeat calls keep hitting one jit's trace
    cache. Builds are serialized by a lock (a concurrent first call
    would otherwise race a benign duplicate compile).
    """
    if fun is None:
        return lambda f: tuned_jit(f, program_class=program_class,
                                   **jit_kwargs)
    if program_class not in TUNED_TPU_OPTIONS_BY_CLASS:
        raise ValueError(
            f"unknown program_class {program_class!r}; "
            f"expected one of {PROGRAM_CLASSES}")

    cache: dict = {}
    lock = threading.Lock()

    @functools.wraps(fun)
    def wrapper(*args, **kwargs):
        try:
            platform = jax.devices()[0].platform
        except Exception:
            platform = None
        opts = resolve_compiler_options(program_class=program_class)
        key = (platform,
               None if opts is None else json.dumps(opts, sort_keys=True))
        jitted = cache.get(key)
        if jitted is None:
            with lock:
                jitted = cache.get(key)
                if jitted is None:
                    jitted = cache[key] = jax.jit(
                        fun, compiler_options=opts, **jit_kwargs)
        return jitted(*args, **kwargs)

    wrapper._fervit_tuned_jit = True  # introspected by the contract tests
    wrapper._fervit_program_class = program_class
    return wrapper
