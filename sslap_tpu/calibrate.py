"""Measured auto-mode crossover calibration (VERDICT round-2 weak 6).

The `mode='auto'` router sends large square instances to the hybrid
device path and everything else to the native CPU engine.  The default
crossover (n >= 500k) was bracketed by measurement on THIS dev box
(PERF.md round 2: hybrid wins at 1M, native GS wins at 50k); on other
hardware the honest crossover moves with the ratio of the two engines'
speeds.  This module measures both once per machine and scales the
crossover accordingly:

  host rate    bids/s of the native GS on a small cache-resident
               synthetic instance (~5 ms);
  device rate  ns per random scalar gather, the hybrid's binding
               primitive (PERF.md: the device pass is gather-bound),
               via the chained-in-jit two-point fit that is the only
               trustworthy timing on tunneled TPUs (~1 s incl. compile
               the first time).

  crossover(n*) = 500k * (host_rate / REF_HOST_RATE)
                       * (device_gather_ns / REF_GATHER_NS)

A faster host pushes the crossover up (CPU wins longer); a faster
gather pulls it down.  Results are cached to a JSON file keyed by
hostname, so the probe runs once per machine, not per process.  The
device-touching half of the measurement runs in a timeout-guarded
SUBPROCESS (a dead relayed backend hangs device ops -- utils/liveness.py)
and falls back to the reference gather constant when the device does not
answer.  Opt in with SSLAP_TPU_CALIBRATE=1 (default off: auto routing
must not surprise a serving process with a one-off device probe).
"""

from __future__ import annotations

import json
import os
import socket
import tempfile
import time
from typing import Optional

import numpy as np

# This box's measured pair (round 3, measure_host_rate/measure_gather_ns
# run here): the 500k default crossover is calibrated against these, so
# on THIS machine the calibrated value reproduces the default.
REF_HOST_BIDS_PER_S = 9.35e6      # native GS, cache-resident small instance
REF_GATHER_NS = 7.2               # scalar gather ns/elem on the axon v5e
DEFAULT_CROSSOVER = 500_000

_cached: Optional[int] = None


def _cache_path() -> str:
    return os.path.join(tempfile.gettempdir(), "sslap_tpu_calib.json")


def _measure_device() -> tuple:
    """(device_kind, gather_ns) measured in a SUBPROCESS with a timeout.

    Both ``jax.devices()`` and the gather probe HANG (not raise) when a
    relayed backend's tunnel is dead, so the parent process must never
    touch the device here (utils/liveness.py rationale).  The subprocess
    inherits the parent's initialized backend platform if there is one
    (tests forced to CPU stay on CPU); on timeout or failure the fallback
    is ("nodevice", REF_GATHER_NS) -- calibration then scales by the host
    rate alone."""
    import subprocess
    import sys
    try:
        import jax
        platform = jax.default_backend() \
            if jax._src.xla_bridge._backends else None
    except Exception:
        platform = None
    code = (
        "import jax\n"
        + (f"jax.config.update('jax_platforms', {platform!r})\n"
           if platform else "")
        + "from sslap_tpu.calibrate import measure_gather_ns\n"
        "kind = jax.devices()[0].device_kind\n"
        "print('CALIB_OK', kind.replace(' ', '_'), measure_gather_ns())\n")
    timeout = float(os.environ.get("SSLAP_TPU_CALIBRATE_TIMEOUT", "120"))
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout)
        for line in out.stdout.splitlines():
            if line.startswith("CALIB_OK"):
                _, kind, ns = line.split()
                return kind, float(ns)
    except Exception:
        pass
    return "nodevice", REF_GATHER_NS


def measure_host_rate() -> float:
    """Native GS bids/s on a small synthetic instance (price table
    cache-resident -- the regime where the CPU engine wins)."""
    from sslap_tpu import hybrid as _hybrid
    if not _hybrid.native_available():
        return 0.0
    rng = np.random.default_rng(0)
    n = 4096
    k = 10
    indptr = np.arange(n + 1, dtype=np.int64) * k
    indices = rng.integers(0, n, n * k).astype(np.int32)
    indices[np.arange(n) * k] = rng.permutation(n).astype(np.int32)
    data = -(rng.random(n * k).astype(np.float32) * 1000 + 1)
    best = float("inf")
    for _ in range(3):
        prices = np.zeros(n, np.float32)
        sigma = np.full(n, -1, np.int32)
        owner = np.full(n, -1, np.int32)
        t0 = time.perf_counter()
        bids = _hybrid._gs(indptr, indices, data, prices, sigma, owner,
                           np.float32(1.0), np.float32(1002.0), 0, 10 ** 8)
        dt = time.perf_counter() - t0
        if bids > 0:
            best = min(best, dt / bids)
    return 1.0 / best if best < float("inf") else 0.0


def measure_gather_ns() -> float:
    """ns per random scalar gather on the accelerator, chained-in-jit
    two-point fit (PERF.md methodology: dispatch timing lies on tunneled
    devices; only a host fetch of a data-dependent scalar is ground
    truth)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    n = 1 << 20
    k = 8
    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.integers(0, n, (n // 64, k), dtype=np.int32))
    prices = jnp.asarray(rng.random(n, ).astype(np.float32))

    def timed(R):
        @jax.jit
        def run(prices, cols):
            def body(i, c):
                p, acc = c
                w = p[cols]
                s = jnp.sum(w) * 1e-30
                return p + s, acc + s
            _, acc = lax.fori_loop(0, R, body, (prices, jnp.float32(0)))
            return acc
        float(np.asarray(run(prices, cols)))          # compile
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(np.asarray(run(prices, cols)))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(8), timed(72)
    per_round = max((t2 - t1) / 64, 1e-9)
    return per_round / (cols.size) * 1e9


def crossover(force: bool = False) -> int:
    """The auto-mode hybrid crossover row count for this machine.

    Returns DEFAULT_CROSSOVER unless SSLAP_TPU_CALIBRATE=1 (or force=True),
    in which case the measured value is computed once and cached on disk.
    """
    global _cached
    enabled = force or os.environ.get("SSLAP_TPU_CALIBRATE") == "1"
    if not enabled:
        # Do NOT latch the default into _cached: the user may set
        # SSLAP_TPU_CALIBRATE=1 later in the same process (notebook use)
        # and must still get the measured routing then.
        return DEFAULT_CROSSOVER
    if _cached is not None and not force:
        return _cached
    # Hostname-only cache key so the fast path never touches the device
    # (querying the device kind can HANG on a dead relayed backend; the
    # kind is recorded informationally and force=True remeasures).
    key = socket.gethostname()
    path = _cache_path()
    try:
        with open(path) as f:
            blob = json.load(f)
        if not force and blob.get("key") == key:
            _cached = int(blob["crossover"])
            return _cached
    except Exception:
        pass
    host_rate = measure_host_rate()
    device_kind, gather_ns = _measure_device()
    if host_rate <= 0:
        # no native engine: the device path wins at every size anyway
        # (api._resolve_mode handles this before consulting the crossover)
        _cached = DEFAULT_CROSSOVER
        return _cached
    x = DEFAULT_CROSSOVER * (host_rate / REF_HOST_BIDS_PER_S) \
        * (gather_ns / REF_GATHER_NS)
    _cached = int(np.clip(x, 10_000, 50_000_000))
    try:
        with open(path, "w") as f:
            json.dump({"key": key, "device_kind": device_kind,
                       "crossover": _cached,
                       "host_bids_per_s": host_rate,
                       "gather_ns": gather_ns}, f)
    except Exception:
        pass
    return _cached
