#!/bin/bash
# Re-run the headline bench when the tunnel answers (final round-4 record).
LOG=/root/repo/chip_logs/r4_bench_watch.log
echo "bench watch start $(date +%F_%T)" >> "$LOG"
for i in $(seq 1 60); do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print(float((x@x).sum()))
" >/dev/null 2>&1; then
    echo "ALIVE probe=$i $(date +%F_%T)" >> "$LOG"
    timeout 3600 python bench.py > /root/repo/chip_logs/r4_bench_final2.log 2>&1
    echo "bench exit=$? $(date +%F_%T)" >> "$LOG"
    tail -2 /root/repo/chip_logs/r4_bench_final2.log >> "$LOG"
    exit 0
  fi
  echo "dead probe=$i $(date +%F_%T)" >> "$LOG"
  sleep 420
done
