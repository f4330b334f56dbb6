#!/bin/bash
# On-chip work queue for when the TPU tunnel is alive (round 3).
# ONE TPU process at a time: this script runs everything sequentially.
# Each step logs to chip_logs/ and survives individual failures.
#
#   bash tools/on_chip.sh [quick|full]
#
# quick: smoke tests + Pallas probe + small bench (~15 min)
# full:  quick + trunc sweep + full 1M bench (~1-2 h)

set -u
cd "$(dirname "$0")/.."
mkdir -p chip_logs
MODE="${1:-quick}"
TS=$(date +%H%M%S)

step() {
  local name="$1"; shift
  echo "=== $name ($(date +%T)) ==="
  timeout "$@" > "chip_logs/${TS}_${name}.log" 2>&1
  echo "--- $name exit=$? ; tail:"
  tail -5 "chip_logs/${TS}_${name}.log"
}

# 1. Real-TPU smoke suite (7 tests incl. round-3 paths)
step tpu_smoke 1800 python -m pytest tests_tpu/ -x -q

# 2. On-chip Pallas bid-kernel probe verdict (VERDICT r2 task 5)
step pallas_probe 600 python -c "
from sslap_tpu.ops import bid as _bid
ok = _bid.pallas_bid_available()
print('pallas probe:', 'PASS' if ok else f'FAIL [{_bid._last_probe_error}]')
"

# 3. Small bench (validates device path end-to-end + headline machinery)
step bench_small 900 env BENCH_SMALL=1 python bench.py

if [ "$MODE" = "full" ] || [ "$MODE" = "scale" ]; then
  # 4. Truncation sweep incl. --down (device-pass tuning, VERDICT r2 task 2)
  step sweep_trunc 5400 python benchmarks/sweep_trunc.py --down
  # 4b. theta A/B at the headline size (sweep_schedule, round-3 cont. III).
  # CPU-sim harness findings (counts reproduce the chip's 5.9M tail bids
  # exactly): on the bench instance theta=10 is fine (theta=3 model edge
  # 7%, within noise), but on a sibling make_sparse instance theta=10's
  # tail explodes to 44M bids while theta=3 stays ~1-2M -- theta=10 is
  # instance-FRAGILE.  wall_e2e_s on both instances decides the default.
  step theta_ab_bench 3600 python benchmarks/sweep_schedule.py \
    --n 1000000 --seeds 1 --thetas 3 5 10 --e0divs 2 --bench-instance
  step theta_ab_sib 3600 python benchmarks/sweep_schedule.py \
    --n 1000000 --seeds 1 --thetas 3 5 10 --e0divs 2
  # 4c. Dense-engine A/B at 4096 (sweep_scipy dense cell loses 6.7x on
  # the host path; the dense device rounds should flip it -- measured
  # 0.165 ms per 4096^2 round).
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
  # 5. Full 1M headline bench
  step bench_full 3600 python bench.py
fi

if [ "$MODE" = "scale" ]; then
  # 6. Stage breakdown at multi-million tier capacities: find where the
  # scale run's device pass (1338 s, ~15x above the gather-cost model)
  # actually goes.
  step probe_big 3600 python benchmarks/probe_stage_breakdown.py --big
  # 7. 10M x 10M full solve rerun: validates the continuation-II host-stage
  # rewrites (native CSR/cert, sorted gen) end-to-end at capacity.
  step scale10m 4500 python benchmarks/run_all.py --config scale
fi

echo "=== queue done; logs in chip_logs/ ==="
