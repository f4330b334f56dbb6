#!/bin/bash
# TPU tunnel watcher: probe every ~9 min, append status to the log,
# stop as soon as a device op completes.  Detached via nohup; read
# /tmp/tunnel_watch.log for status.
LOG=/tmp/tunnel_watch.log
echo "watch start $(date +%F_%T)" >> "$LOG"
for i in $(seq 1 80); do
  if timeout 75 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print(float((x@x).sum()))
" >/dev/null 2>&1; then
    echo "ALIVE probe=$i $(date +%F_%T)" >> "$LOG"
    exit 0
  fi
  echo "dead probe=$i $(date +%F_%T)" >> "$LOG"
  sleep 540
done
echo "gave up after 80 probes $(date +%F_%T)" >> "$LOG"
