#!/bin/bash
# Round-5 on-chip work queue.  ONE TPU process at a time; sequential.
# The host is 1 vCPU: anything with host-timed stages (GS tails, CPU
# baselines, pack stages) must run UNCONTENDED -- do not run pytest or
# other CPU work alongside (the round-4 10M rerun was contaminated
# exactly that way; VERDICT r4 missing 4).
#
#   bash tools/on_chip_r5.sh [quick|full|scale]
#
# quick: bench smoke + dense cached A/B + join probe        (~25 min)
# full:  quick + 2x full bench (de-noise acceptance) + tracking FR/
#        persistent-pattern arms                            (~2 h)
# scale: full + UNCONTENDED 10M rerun + tpu smoke suite     (~3 h)

set -u
cd "$(dirname "$0")/.."
mkdir -p chip_logs
MODE="${1:-quick}"

step() {
  local name="$1"; shift
  echo "=== $name ($(date +%T)) ==="
  timeout "$@" > "chip_logs/r5_${name}.log" 2>&1
  echo "--- $name exit=$? ; tail:"
  grep -v "Platform 'axon'" "chip_logs/r5_${name}.log" | tail -6
}

# 1. Bench machinery smoke (new de-noised bench.py end-to-end).
step bench_small 1800 env BENCH_SMALL=1 python bench.py

# 2. Dense-engine serving-cost A/B (round-5 host-copy eliminations:
# cached stack, cached scalars, searchsorted objective).
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

# 3. Wide-round join alternatives (VERDICT r4 task 2 probe table).
step probe_join 2400 python benchmarks/probe_join.py

if [ "$MODE" = "quick" ]; then exit 0; fi

# 4. Full 1M bench TWICE in one session: task-3 acceptance is two runs
# whose vs_baseline differ < 0.05.
step bench_full_a 3600 python bench.py
step bench_full_b 3600 python bench.py

# 5. Tracking: persistent-pattern family (VERDICT r4 task 8) and the
# pattern-churn family under the FR warm treatment (task 4).
step tracking_c 5400 python benchmarks/tracking.py --families C --frames 4
step tracking_b_fr 5400 python benchmarks/tracking.py --families B --frames 2 --warm fr

if [ "$MODE" != "scale" ]; then exit 0; fi

# 6. UNCONTENDED 10M x 10M rerun (VERDICT r4 task 7).
step scale10m 10800 python benchmarks/run_all.py --config scale

# 7. Real-TPU smoke suite LAST (GS-kernel smoke xfails are
# subprocess-isolated but have wedged the worker before).
step tpu_smoke 2400 python -m pytest tests_tpu/ -q
