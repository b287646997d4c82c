"""Device-init watchdog for chip-facing entry points.

Backend init through this environment's TPU tunnel HANGS (not errors)
when the tunnel is down, which would stall a driver-run script
indefinitely. Arm the watchdog before the first ``jax.devices()``,
cancel it right after — if init doesn't return in time the process dies
loudly with a diagnosis and exit code 2.
"""

from __future__ import annotations

import os
import sys
import threading


def arm_device_init_watchdog(seconds: int | None = None,
                             env_var: str = "FERVIT_INIT_TIMEOUT",
                             default: int = 300) -> threading.Timer:
    """Start a daemon timer that aborts the process if not cancelled.

    Returns the timer; call ``.cancel()`` as soon as device init returns.
    """
    if seconds is None:
        seconds = int(os.environ.get(env_var, str(default)))

    def _abort():
        print(f"device-init watchdog: jax device init exceeded {seconds}s "
              "— TPU tunnel down/hung? (probe: timeout 60 python -c "
              "'import jax; print(jax.devices())')",
              flush=True, file=sys.stderr)
        os._exit(2)

    t = threading.Timer(seconds, _abort)
    t.daemon = True
    t.start()
    return t
