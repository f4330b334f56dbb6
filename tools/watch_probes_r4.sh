#!/bin/bash
# Wait for the tunnel, then run the remaining bisect probes (one by one,
# each subprocess-isolated by the probe runner itself).
LOG=/root/repo/chip_logs/r4_probe_watch.log
echo "probe watch start $(date +%F_%T)" >> "$LOG"
for i in $(seq 1 90); do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print(float((x@x).sum()))
" >/dev/null 2>&1; then
    echo "ALIVE probe=$i $(date +%F_%T)" >> "$LOG"
    for p in qdma_store_via_dma qdma_store_bitcast; do
      timeout 600 python benchmarks/probe_mosaic_gs.py "$p" >> "$LOG" 2>&1
      echo "--- $p exit=$? $(date +%T)" >> "$LOG"
    done
    echo "probes done $(date +%F_%T)" >> "$LOG"
    exit 0
  fi
  echo "dead probe=$i $(date +%F_%T)" >> "$LOG"
  sleep 420
done
