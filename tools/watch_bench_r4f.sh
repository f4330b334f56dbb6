#!/bin/bash
# Session r4f: re-run the headline bench as soon as the tunnel answers
# (the host was recycled -> .jax_cache is cold; this run both records a
# fresh on-chip headline and re-warms the cache for the driver's
# end-of-round bench).  Probe cadence ~7 min, 150 s per probe (the
# congested-but-alive claim leg measured 60-152 s in round 4).
LOG=/root/repo/chip_logs/r4f_bench_watch.log
echo "bench watch start $(date +%F_%T)" >> "$LOG"
for i in $(seq 1 40); do
  # Probe via the package's liveness utility (ADVICE round 4): it TCP
  # fast-fails a fully-dead relay BEFORE spawning a device client, so
  # the probe itself cannot stale-claim-wedge the tunnel the way a
  # timeout-killed in-process device op can (PERF.md round-4 finding);
  # its per-attempt timeout also covers worst-case cold compiles.
  if timeout 400 python -c "
from sslap_tpu.utils import device_alive
import sys; sys.exit(0 if device_alive(wait_s=300) else 1)
" >/dev/null 2>&1; then
    echo "ALIVE probe=$i $(date +%F_%T)" >> "$LOG"
    timeout 3300 python -u bench.py \
      > /root/repo/chip_logs/r4f_bench.log 2>&1
    echo "bench exit=$? $(date +%F_%T)" >> "$LOG"
    tail -3 /root/repo/chip_logs/r4f_bench.log >> "$LOG"
    exit 0
  fi
  echo "dead probe=$i $(date +%F_%T)" >> "$LOG"
  sleep 270
done
echo "gave up after 40 probes $(date +%F_%T)" >> "$LOG"
