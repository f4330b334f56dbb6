#!/bin/bash
# Round-3 continuation-IV on-chip queue, priority-ordered for a live
# tunnel of unknown lifetime: cheapest/highest-decision-value first.
# ONE TPU process at a time; each step logs to chip_logs/.
set -u
cd "$(dirname "$0")/.."
mkdir -p chip_logs
TS=$(date +%H%M%S)

step() {
  local name="$1"; shift
  echo "=== $name ($(date +%T)) ==="
  timeout "$@" > "chip_logs/${TS}_${name}.log" 2>&1
  echo "--- $name exit=$? ; tail:"
  tail -5 "chip_logs/${TS}_${name}.log"
}

# 1. Pallas probe verdict on the real chip (VERDICT r2 task 5)
step pallas_probe 600 python -c "
from sslap_tpu.ops import bid as _bid
ok = _bid.pallas_bid_available()
print('pallas probe:', 'PASS' if ok else f'FAIL [{getattr(_bid, \"_last_probe_error\", \"?\")}]')
"

# 2. Real-TPU smoke suite (round-3 paths have never run on-chip)
step tpu_smoke 1800 python -m pytest tests_tpu/ -x -q

# 3. Dense-engine A/B at 4096 (fast; decides the sweep dense-cell story)
step dense_ab 1800 python -c "
import numpy as np, time
from scipy.optimize import linear_sum_assignment
from sslap_tpu import auction_solve
rng = np.random.default_rng(0)
C = (rng.random((4096, 4096)) * 999 + 1).astype(np.float32)
r = auction_solve(C, mode='hybrid', engine='dense')   # compile
t0 = time.perf_counter(); r = auction_solve(C, mode='hybrid', engine='dense')
ours = time.perf_counter() - t0
t0 = time.perf_counter(); rr, cc = linear_sum_assignment(C)
scipy_s = time.perf_counter() - t0
want = float(C[rr, cc].astype(np.float64).sum())
print(f'dense4096: ours={ours:.3f}s scipy={scipy_s:.3f}s '
      f'speedup={scipy_s/ours:.2f}x exact={abs(r[\"meta\"][\"obj\"]-want)<1e-3} '
      f'meta_dev={r[\"meta\"][\"device_time\"]:.3f} gs={r[\"meta\"][\"host_gs_time\"]:.3f}')
"

# 4. Full 1M headline bench (validates round-3 device path end-to-end)
step bench_full 3600 python bench.py

# 5. theta A/B, bench instance then sibling (decides the theta default)
step theta_ab_bench 3600 python benchmarks/sweep_schedule.py \
  --n 1000000 --seeds 1 --thetas 3 5 10 --e0divs 2 --bench-instance
step theta_ab_sib 3600 python benchmarks/sweep_schedule.py \
  --n 1000000 --seeds 1 --thetas 3 5 10 --e0divs 2

# 6. Stage breakdown at multi-million tier caps (scale-run diagnosis)
step probe_big 3600 python benchmarks/probe_stage_breakdown.py --big

# 7. 10M x 10M full solve rerun with the continuation-II host rewrites
step scale10m 4500 python benchmarks/run_all.py --config scale

echo "=== queue done; logs in chip_logs/ ==="
