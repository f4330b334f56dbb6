"""Device liveness probing (failure detection, SURVEY.md §6).

The failure mode this guards against is NOT an exception: a tunneled /
remote accelerator whose relay dies leaves every subsequent device op
HANGING forever (observed on this environment's TPU: the relay process
exited mid-session and `jnp.ones((2,2)) + 1` never returned).  No
try/except in the caller helps — the call simply never comes back — so
the only robust gate is to touch the device from a THROWAWAY SUBPROCESS
under a hard timeout and fall back (e.g. to ``mode='cpu'``) when it
doesn't answer.

Serving pattern::

    from sslap_tpu.utils import device_alive
    solver = AuctionSolver(..., mode="hybrid" if device_alive() else "cpu")

``AuctionSolver(mode='hybrid')`` already degrades to the native CPU path
when the device RAISES (api.py); this probe covers the hang case, which
by nature cannot be caught in-process.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from typing import Callable, Optional

__all__ = ["device_alive"]

# One tiny matmul round-trip: forces a real compile + execute + host
# fetch (a dispatch-only ack is NOT proof of life on relayed backends —
# PERF.md round-2 timing methodology).
_PROBE_CODE = (
    "import jax, jax.numpy as jnp\n"
    "x = jnp.ones((64, 64))\n"
    "assert float((x @ x).sum()) == 64 * 64 * 64\n"
    "print('ok')\n"
)


def device_alive(wait_s: Optional[float] = None,
                 attempt_timeout_s: float = 90.0,
                 log: Optional[Callable[[str], None]] = None) -> bool:
    """True iff the default JAX backend completes a compile+execute+fetch
    round-trip from a fresh subprocess.

    Retries until ``wait_s`` seconds have elapsed (default: env
    ``SSLAP_TPU_DEVICE_WAIT_S``, falling back to legacy
    ``BENCH_DEVICE_WAIT_S``, else 300) in case the backend is briefly
    re-establishing; each attempt is bounded by ``attempt_timeout_s``
    (first TPU compiles are slow — keep this generous).  ``log`` receives
    human-readable progress lines (default: silent).
    """
    if wait_s is None:
        wait_s = float(os.environ.get(
            "SSLAP_TPU_DEVICE_WAIT_S",
            os.environ.get("BENCH_DEVICE_WAIT_S", "300")))
    if log is None:
        def log(_msg):
            pass
    deadline = time.monotonic() + wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run([sys.executable, "-c", _PROBE_CODE],
                               capture_output=True,
                               timeout=attempt_timeout_s)
            if r.returncode == 0 and b"ok" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            log(f"device probe: backend unreachable after {attempt} "
                f"attempts over {wait_s:.0f}s")
            return False
        log(f"device probe attempt {attempt} failed; retrying "
            f"({deadline - time.monotonic():.0f}s left)")
        time.sleep(min(60.0, max(5.0, deadline - time.monotonic())))
