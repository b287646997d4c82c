"""Per-jit XLA compiler options: tuned TPU defaults + env plumbing.

Why per-jit and not ``XLA_FLAGS``: with a remote PJRT TPU client (the
axon tunnel here, but any client/server PJRT split behaves the same),
``XLA_FLAGS`` is parsed by the CLIENT-side XLA build —
``parse_flags_from_env`` aborts the whole process on TPU-only flag
names — while ``jax.jit(..., compiler_options=...)`` rides the PJRT
compile request and is validated by the compiler that actually builds
the program (a bogus option name fails that one compile, loudly). TPU
compiler knobs therefore must be plumbed per-jit.

Tuned default (measured 2026-08-19 on the v5e chip, batch-512
pSp→LatentViT headline bench, scan-in-jit protocol — XLA_SCREEN.json /
XLA_SWEEP.json at the repo root): ``xla_tpu_scoped_vmem_limit_kib=65536``
raises the scoped-VMEM budget the fusion emitters may assume from the
default to 64 MiB, which deepens fusion tiles in the bandwidth-bound
early trunk (input conv + stage0: +6.6 % on that region isolated) and is
worth **+3.7 % end-to-end** (1038.5 → 1077.4 img/s/chip; 32 MiB +3.5 %,
128 MiB +3.4 % — a flat plateau, 64 MiB is the peak). Every other knob
screened (scheduler reruns, fusion toggles, DMA/vector-fusion sizes,
MSA ratios — 20 total) was neutral or worse.

The default applies only when the first visible device is a TPU: other
backends reject TPU-only option names at compile time (tests run this
package on CPU constantly). Users override with the
``FERVIT_COMPILER_OPTIONS`` env var (a JSON dict; ``{}`` disables the
tuned default outright).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Optional

import jax

# The measured winner. Value is a string because XLA's option parser
# takes int64 options as decimal strings (booleans, by contrast, must be
# real JSON booleans — it rejects "true"/"false" strings).
TUNED_TPU_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "65536"}

ENV_VAR = "FERVIT_COMPILER_OPTIONS"


def tuned_tpu_options() -> Optional[dict]:
    """The tuned options dict on a TPU backend, else None.

    Calls ``jax.devices()`` — callers are always about to compile for
    those devices anyway, so this adds no new initialization.
    """
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return None
    return dict(TUNED_TPU_OPTIONS) if platform == "tpu" else None


def resolve_compiler_options(env_var: str = ENV_VAR) -> Optional[dict]:
    """Value for ``jax.jit(compiler_options=...)`` on hot inference paths.

    Precedence: ``env_var`` as a JSON dict if set (``{}`` → None, i.e.
    compiler defaults); otherwise the tuned TPU default, platform-gated.
    """
    raw = os.environ.get(env_var)
    if raw is not None:
        opts = json.loads(raw)
        if not isinstance(opts, dict):
            raise ValueError(
                f"{env_var} must be a JSON object of XLA options, got "
                f"{type(opts).__name__}: {raw!r}")
        return opts or None
    return tuned_tpu_options()


def tuned_jit(fun=None, **jit_kwargs):
    """``jax.jit`` with the tuned compiler options, resolved LAZILY.

    Drop-in for the hot-path jits (train/eval epoch scans, the pSp
    encode, trainer steps): the underlying ``jax.jit`` is built on the
    FIRST CALL, not at decoration time, because
    :func:`resolve_compiler_options` touches ``jax.devices()`` — doing
    that at import would initialize the backend (and, through a downed
    TPU tunnel, hang) for processes that never compile anything.

    The wrapper is a plain function, so it binds as a method exactly like
    the ``partial(jax.jit, static_argnums=0)`` decorators it replaces.
    The built jit is cached per (default-device platform, env override),
    so one process that runs the same function on CPU (oracle) and TPU
    (measurement) — or flips ``FERVIT_COMPILER_OPTIONS`` between runs —
    gets the right options on each, while repeat calls keep hitting one
    jit's trace cache.
    """
    if fun is None:
        return lambda f: tuned_jit(f, **jit_kwargs)

    cache: dict = {}

    @functools.wraps(fun)
    def wrapper(*args, **kwargs):
        try:
            platform = jax.devices()[0].platform
        except Exception:
            platform = None
        key = (platform, os.environ.get(ENV_VAR))
        jitted = cache.get(key)
        if jitted is None:
            jitted = cache[key] = jax.jit(
                fun, compiler_options=resolve_compiler_options(),
                **jit_kwargs)
        return jitted(*args, **kwargs)

    wrapper._fervit_tuned_jit = True  # introspected by the contract tests
    return wrapper
