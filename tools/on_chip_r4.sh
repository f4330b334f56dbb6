#!/bin/bash
# Round-4 on-chip work queue.  ONE TPU process at a time; sequential.
# Ordered so that steps that CANNOT wedge the tunnel (pure-XLA paths)
# run first, and the Mosaic GS-kernel probe suite -- which faulted the
# worker twice (rounds 3 and 4) -- runs LAST.
#
#   bash tools/on_chip_r4.sh [quick|full|scale]
#
# quick: widebid A/B + dense-cache A/B + small bench (~30 min)
# full:  quick + full 1M bench + theta steady A/B + tpu smoke (~2 h)
# scale: full + 10M rerun + GS probes (~3-4 h)

set -u
cd "$(dirname "$0")/.."
mkdir -p chip_logs
MODE="${1:-quick}"
TS=$(date +%m%d_%H%M)

step() {
  local name="$1"; shift
  echo "=== $name ($(date +%T)) ==="
  timeout "$@" > "chip_logs/r4_${name}.log" 2>&1
  echo "--- $name exit=$? ; tail:"
  grep -v "Platform 'axon'" "chip_logs/r4_${name}.log" | tail -6
}

# 1. Window-gather wide-round A/B (VERDICT r3 task 6 go/no-go) -- pure
# XLA, cannot wedge.  1M first; if the sort dominates, the 256k point
# shows the scaling.
step widebid_1m 2400 python benchmarks/probe_widebid.py
step widebid_256k 1200 python benchmarks/probe_widebid.py --n 262144

# 2. Dense-engine serving-cache A/B (VERDICT r3 task 5): second solve of
# the same 4096 dense instance must skip the 67 MB H2D.
step dense_cache_ab 2400 python -c "
import numpy as np, time
from scipy.optimize import linear_sum_assignment
from sslap_tpu import AuctionSolver
rng = np.random.default_rng(0)
C = (rng.random((4096, 4096)) * 999 + 1).astype(np.float32)
s = AuctionSolver(C, mode='hybrid', engine='dense', cardinality_check=False)
t0 = time.perf_counter(); r1 = s.solve(); t1 = time.perf_counter() - t0
t0 = time.perf_counter(); r2 = s.solve(); t2 = time.perf_counter() - t0
t0 = time.perf_counter(); r3 = s.solve(); t3 = time.perf_counter() - t0
t0 = time.perf_counter(); rr, cc = linear_sum_assignment(C); ts = time.perf_counter() - t0
obj = float(C[rr, cc].sum())
print(f'dense4096 construct-once: solve1={t1:.2f}s solve2={t2:.2f}s solve3={t3:.2f}s scipy={ts:.2f}s')
print(f'obj match: {abs(r2[\"meta\"][\"obj\"] - obj) < 1.0} (ours {r2[\"meta\"][\"obj\"]:.1f} scipy {obj:.1f})')
print('meta2 device/gs:', r2['meta'].get('device_time'), r2['meta'].get('host_gs_time'))
"

# 3. Small bench: end-to-end smoke of the bench machinery on-chip.
step bench_small 1200 env BENCH_SMALL=1 python bench.py

if [ "$MODE" = "quick" ]; then exit 0; fi

# 4. Full 1M bench (the headline).
step bench_full 3600 python bench.py

# 5. theta/tail steady-state A/B on the real chip (mixed-tail default
# validation at the headline size; ADVICE-fixed harness, 3 reps).
step theta_steady 5400 python benchmarks/theta_steady_ab.py

# 5b. Tracking workload: cold vs warm frames at 1M (VERDICT r3 task 8).
step tracking 3600 python benchmarks/tracking.py --frames 2

if [ "$MODE" = "scale" ]; then
  # 6. 10M x 10M full rerun with the fused host stages (VERDICT r3 task
  # 7; expected ~35 min solver path).  BEFORE the smoke suite: the GS
  # kernel smoke (subprocess-isolated xfail) can still wedge the worker.
  step scale10m 10800 python benchmarks/run_all.py --config scale
fi

# 7. Real-TPU smoke suite (GS-kernel smoke xfails, subprocess-isolated,
# while the bisect is open -- see tests_tpu/).
step tpu_smoke 2400 python -m pytest tests_tpu/ -q

if [ "$MODE" != "scale" ]; then exit 0; fi

# 8. GS-kernel Mosaic probe suite -- LAST: lane_read_write_2d wedged the
# worker this round; the fixed runner aborts when the tunnel dies.
step gs_probes 7200 python benchmarks/probe_mosaic_gs.py
