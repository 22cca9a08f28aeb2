"""Device health checks (SURVEY.md §5.3: the reference has no failure
detection — this fills the gap for remote-device deployments).

``check_devices`` probes the default backend in a subprocess with a hard
timeout (a wedged device runtime can hang ``jax.devices()`` itself, so the
probe must be out-of-process). ``run_with_watchdog`` guards a device
computation with SIGALRM and a fallback.
"""
from __future__ import annotations

import signal
import subprocess
import sys
from typing import Callable, Optional

__all__ = ["check_devices", "run_with_watchdog", "DeviceTimeout"]


class DeviceTimeout(Exception):
    pass


def check_devices(timeout_s: int = 120) -> bool:
    """True iff the default JAX backend can run a trivial program."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(float(jnp.ones((8, 8)).sum()))"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0 and b"64.0" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def run_with_watchdog(fn: Callable, timeout_s: int,
                      fallback: Optional[Callable] = None):
    """Run ``fn()`` with a SIGALRM watchdog; on expiry call ``fallback()``
    (or raise DeviceTimeout). Main-thread only."""

    def _handler(signum, frame):
        raise DeviceTimeout()

    prev = signal.signal(signal.SIGALRM, _handler)
    signal.alarm(timeout_s)
    try:
        return fn()
    except DeviceTimeout:
        if fallback is not None:
            return fallback()
        raise
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, prev)
