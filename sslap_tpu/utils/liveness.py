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


def _relay_endpoints() -> list:
    """TCP endpoints of the relay that fronts the remote backend, if this
    process is on a relayed backend at all.  Empty list = no fast-fail
    signal available (non-relayed backends answer or raise in-process).

    Override with ``SSLAP_TPU_RELAY_TCP=host:port[,host:port...]``; the
    default covers this environment's loopback relay (remote-compile and
    device service ports observed at 127.0.0.1:8082/8083).
    """
    spec = os.environ.get("SSLAP_TPU_RELAY_TCP")
    if spec:
        out = []
        for part in spec.split(","):
            host, _, port = part.strip().rpartition(":")
            out.append((host or "127.0.0.1", int(port)))
        return out
    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        host = os.environ.get("PALLAS_AXON_POOL_IPS",
                              "127.0.0.1").split(",")[0]
        return [(host, 8082), (host, 8083)]
    return []


def _relay_definitely_dead() -> bool:
    """True iff every relay endpoint REFUSES a TCP connect.

    Distinguishes the two observed tunnel failure states: a HALF-DEAD
    tunnel (relay up, device slow/wedged — probes may time out but
    eventually succeed; keep retrying) still accepts connects, while a
    FULLY-DEAD tunnel (relay process exited — every device op hangs
    forever) refuses instantly.  Only the refused state short-circuits;
    anything ambiguous (timeout, no endpoints known) returns False and
    falls through to the real matmul probe.
    """
    import socket
    eps = _relay_endpoints()
    if not eps:
        return False
    for host, port in eps:
        try:
            with socket.create_connection((host, port), timeout=3.0):
                return False            # someone is listening
        except ConnectionRefusedError:
            continue                    # this one is definitely down
        except OSError:
            return False                # ambiguous -> full probe decides
    return True


def device_alive(wait_s: Optional[float] = None,
                 attempt_timeout_s: Optional[float] = None,
                 log: Optional[Callable[[str], None]] = None) -> bool:
    """True iff the default JAX backend completes a compile+execute+fetch
    round-trip from a fresh subprocess.

    Retries until ``wait_s`` seconds have elapsed (default: env
    ``SSLAP_TPU_DEVICE_WAIT_S``, falling back to legacy
    ``BENCH_DEVICE_WAIT_S``, else 300) in case the backend is briefly
    re-establishing; each attempt is bounded by ``attempt_timeout_s``
    (first TPU compiles are slow — keep this generous).  ``log`` receives
    human-readable progress lines (default: silent).

    A relay whose TCP endpoints refuse connects is reported dead in
    seconds instead of burning the full retry window (VERDICT round-3
    weak 3: bench startup spent 390 s discovering a dead tunnel).
    """
    if wait_s is None:
        wait_s = float(os.environ.get(
            "SSLAP_TPU_DEVICE_WAIT_S",
            os.environ.get("BENCH_DEVICE_WAIT_S", "300")))
    if attempt_timeout_s is None:
        # The relayed backend's CLAIM leg alone measured 60-152 s in its
        # congested-but-alive state (round 4); 90 s false-negatived a
        # live tunnel.  Fully-dead tunnels no longer pay this — the TCP
        # fast-fail catches them first.
        attempt_timeout_s = float(os.environ.get(
            "SSLAP_TPU_PROBE_ATTEMPT_S", "150"))
    if log is None:
        def log(_msg):
            pass
    deadline = time.monotonic() + wait_s
    attempt = 0
    while True:
        attempt += 1
        if _relay_definitely_dead():
            log(f"device probe: relay TCP endpoints refused (attempt "
                f"{attempt}) — backend process is gone; reporting dead")
            return False
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
