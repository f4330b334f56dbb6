#!/bin/bash
# Watch the tunnel; when it answers, drain the round-4 on-chip queue once.
# Probe timeout 150s: the live tunnel's claim leg measured 60-152s (r4).
LOG=/root/repo/chip_logs/r4_watch.log
MODE="${1:-full}"
echo "watch start $(date +%F_%T) mode=$MODE" >> "$LOG"
for i in $(seq 1 90); do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print(float((x@x).sum()))
" >/dev/null 2>&1; then
    echo "ALIVE probe=$i $(date +%F_%T); draining queue" >> "$LOG"
    bash /root/repo/tools/on_chip_r4.sh "$MODE" >> "$LOG" 2>&1
    echo "queue drained $(date +%F_%T)" >> "$LOG"
    exit 0
  fi
  echo "dead probe=$i $(date +%F_%T)" >> "$LOG"
  sleep 420
done
echo "gave up $(date +%F_%T)" >> "$LOG"
