#!/bin/bash
# Session r4f: re-run the headline bench as soon as the tunnel answers
# (the host was recycled -> .jax_cache is cold; this run both records a
# fresh on-chip headline and re-warms the cache for the driver's
# end-of-round bench).  Probe cadence ~7 min, 150 s per probe (the
# congested-but-alive claim leg measured 60-152 s in round 4).
LOG=/root/repo/chip_logs/r4f_bench_watch.log
echo "bench watch start $(date +%F_%T)" >> "$LOG"
for i in $(seq 1 40); do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print(float((x@x).sum()))
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
