"""Primary benchmark (driver-run on real TPU each round).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric (BASELINE.md): end-to-end time-to-optimal on the 1M x 1M,
~10 nnz/row float sparse LAP (config 4), reported as nnz/s of useful edge
throughput = nnz / solve_time for the best mode (auto = hybrid device bulk +
native host tail).  Device-round throughput (nnz * rounds / device_time) is
logged to stderr alongside.

vs_baseline: speedup in time-to-optimal over the sslap-class CPU reference
-- this repo's own native Gauss-Seidel auction (mode='cpu'), the same
algorithm family as the reference, measured on the same instance.  (The
actual sslap is unavailable: empty reference mount, see BASELINE.md.)

Extra diagnostics go to stderr; stdout carries exactly one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compile cache: the 1M-shape hybrid program takes minutes
# to compile cold; cached, a later bench run starts in seconds.  (Set via
# jax.config: this environment's sitecustomize imports jax before any env
# var here could take effect.)
import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_instance(n, m, k_extra, seed=0, low=1.0, high=1000.0):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), k_extra)
    cols = rng.integers(0, m, n * k_extra, dtype=np.int64)
    perm = rng.permutation(m)[:n].astype(np.int64)
    rr = np.concatenate([rows, np.arange(n, dtype=np.int64)])
    cc = np.concatenate([cols, perm])
    key = rr * m + cc
    _, idx = np.unique(key, return_index=True)
    rr, cc = rr[idx], cc[idx]
    vv = (rng.random(rr.shape[0]) * (high - low) + low).astype(np.float32)
    return rr, cc, vv


def smoke_device_exact():
    """Tiny device-mode exact-vs-oracle gate (VERDICT round-1 weak item 6):
    catches TPU-only lowering regressions before the long bench runs."""
    from scipy.optimize import linear_sum_assignment as scipy_lsa
    from sslap_tpu import auction_solve
    rng = np.random.default_rng(7)
    C = rng.integers(1, 1000, (256, 256))
    res = auction_solve(C, mode="device", cardinality_check=False)
    r, c = scipy_lsa(C)
    assert res["meta"]["obj"] == int(C[r, c].sum()), \
        "device smoke: objective != scipy optimum"
    log("device 256x256 smoke: exact vs scipy OK")


def kernel_tier_probe():
    """Report the Pallas kernel tier's status on this backend.

    Probe ONLY when the kernel is opted in (SSLAP_TPU_USE_PALLAS=1):
    the kernel lost its on-chip timing A/B 18x (PERF.md round-3
    continuation IV: XLA 113.8 vs Pallas 2064 ns/elem at 131072x16) and
    ships opt-in, so by default there is nothing to dispatch and the
    240 s probe subprocess is pure startup risk on a half-dead tunnel
    (BENCH_r03 burned 240 s+ here before its headline run)."""
    if os.environ.get("SSLAP_TPU_USE_PALLAS") != "1":
        log("pallas bid kernel: opt-in tier not requested "
            "(SSLAP_TPU_USE_PALLAS unset); probe skipped. On-chip verdict: "
            "A/B parity PASS, timing 18x SLOWER than XLA (PERF.md r3 IV).")
        return
    # Opted in: bound the probe tighter than its 240 s default so a
    # wedged compile tunnel can't eat the bench's startup budget.
    os.environ.setdefault("SSLAP_TPU_PROBE_TIMEOUT", "90")
    from sslap_tpu.ops import pallas_bid_available, resolve_bid_fn
    from sslap_tpu.ops import bid as _bid
    ok = pallas_bid_available()
    msg = "PASS (A/B matches XLA path on this chip)" if ok else \
        f"unavailable on this backend [{_bid._last_probe_error[:160]}]"
    log(f"pallas bid kernel probe: {msg}; "
        f"dispatch {'ACTIVE' if resolve_bid_fn() is not None else 'off'}")


def device_alive(wait_s: float = None) -> bool:
    """TPU liveness gate: a dead tunnel HANGS device ops instead of
    raising, and a hung bench leaves the driver with no JSON line at all
    -- so gate every device-touching path and fall back to an honest
    CPU-only report.  The probe itself is the package's failure-detection
    utility (sslap_tpu.utils.device_alive: subprocess + timeout +
    retry-until-deadline)."""
    from sslap_tpu.utils import device_alive as _alive
    return _alive(wait_s=wait_s, log=log)


def main():
    alive = device_alive()
    # Probe first: it runs in its own subprocess (ops/bid.py round-3
    # isolation) and must finish before this process opens its device
    # connection -- two live TPU clients conflict on this tunnel.
    if alive:
        kernel_tier_probe()
        smoke_device_exact()
    small = os.environ.get("BENCH_SMALL")
    n = 50_000 if small else 1_000_000
    rr, cc, vv = make_instance(n, n, 9, seed=0)
    nnz = rr.shape[0]
    loc = np.stack([rr, cc], 1)
    log(f"instance: {n}x{n}, nnz={nnz} ({nnz/n:.2f}/row)")

    from sslap_tpu import AuctionSolver
    from sslap_tpu.hybrid import native_available

    # CPU reference (sslap-class Gauss-Seidel, single thread), measured
    # under the SAME construct-once serving pattern as the hybrid (VERDICT
    # round-2 weak item 1: steady-state vs steady-state).  The 1-vCPU host
    # varies up to 6x run-to-run (steal time) and swung vs_baseline by
    # +-12% same-day across rounds 2-4 (VERDICT round-4 weak item 1), so
    # the reference is now 5 steady-state reps -> TRIMMED median (drop the
    # single worst outlier, median the rest) with per-rep load averages
    # recorded so a contaminated run is visible in the log.
    solver_cpu = AuctionSolver(loc=loc, val=vv, shape=(n, n), mode="cpu",
                               cardinality_check=False)
    res_cpu = solver_cpu.solve()                 # warm: ingest + CSR cached
    cpu_reps = int(os.environ.get("BENCH_CPU_REPS", "7"))

    def _steal_jiffies():
        # /proc/stat field 8 = hypervisor steal.  loadavg cannot see it,
        # and it is the prime suspect for the 13%-in-20-minutes CPU-rep
        # drift measured round 5 (device pass flat to 0.04% across the
        # same runs).  Per-rep steal%% makes a contaminated baseline
        # self-diagnosing in the recorded JSON.
        try:
            with open("/proc/stat") as f:
                parts = f.readline().split()
            return int(parts[8]) if len(parts) > 8 else 0
        except Exception:
            return 0

    def cpu_rep():
        nonlocal res_cpu
        load0 = os.getloadavg()[0]
        st0 = _steal_jiffies()
        t0 = time.perf_counter()
        res_cpu = solver_cpu.solve()
        dt = time.perf_counter() - t0
        cpu_times.append(dt)
        cpu_loads.append(round(max(load0, os.getloadavg()[0]), 2))
        # jiffy = 10 ms at USER_HZ=100; report steal as % of the rep wall
        cpu_steals.append(round((_steal_jiffies() - st0) / 100.0 / dt * 100,
                                1))
        return dt

    def cpu_summary():
        # Trimmed median: steal-time contamination is one-sided (reps only
        # get SLOWER under load), so drop the max before the median.
        trimmed = sorted(cpu_times)[:-1] if len(cpu_times) > 2 else cpu_times
        cpu_t = float(np.median(trimmed))
        log(f"cpu (sslap-class GS, steady-state x{len(cpu_times)}): "
            f"trimmed median {cpu_t:.2f}s band [{min(cpu_times):.2f}, "
            f"{max(cpu_times):.2f}]s loadavg/rep={cpu_loads} "
            f"steal%/rep={cpu_steals} "
            f"bids={res_cpu['meta']['host_bids']} "
            f"obj={res_cpu['meta']['obj']:.1f}")
        return cpu_t

    cpu_times, cpu_loads, cpu_steals = [], [], []
    cpu_rep()                                    # one timed rep up front:
    # the dead-tunnel branch needs a CPU number, and this rep's minutes
    # double as the recovery window for a half-dead relay

    if not alive:
        # Second chance: the CPU-reference section above takes minutes, and
        # the tunnel's observed half-dead state (a timeout-killed client
        # leaves a stale claim on the relay) recovers on that timescale --
        # a fully-dead relay still TCP-fast-fails in seconds, so this
        # re-probe is cheap exactly when it is hopeless.
        alive = device_alive(wait_s=180)
        if alive:
            log("device probe: backend recovered on the post-CPU re-probe; "
                "continuing with the hybrid path")
            # The startup-time exactness smoke was skipped on this branch
            # (initial probe reported dead); run it now, BEFORE this
            # process opens its long-lived device connection, so the
            # recorded headline never comes from a session whose
            # device-exactness gate never ran (ADVICE round 4).
            smoke_device_exact()
    if not alive:
        # The reported path IS the baseline-class CPU solver; vs_baseline
        # 1.0 by construction, flagged so the record can't be read as a
        # TPU result.
        for _ in range(cpu_reps - 1):
            cpu_rep()
        cpu_t = cpu_summary()
        print(json.dumps({
            "metric": "time_to_optimal_1Mx1M_sparse_lap_nnz_per_s",
            "value": round(nnz / cpu_t, 1),
            "unit": "nnz/s",
            "vs_baseline": 1.0,
            "device_unavailable": True,
            "cpu_steady_s": round(cpu_t, 2),
            "cpu_steady_band": [round(min(cpu_times), 2),
                                round(max(cpu_times), 2)],
            "note": "TPU tunnel dead for this run; CPU reference only. "
                    "Last on-chip headline of record (BENCH_r04.json, "
                    "2026-08-20, same code path with window-gather wide "
                    "rounds): hybrid steady 6.12 s (device 4.83 s + GS "
                    "0.96 s + readback 0.25 s) vs CPU steady 9.85 s at "
                    "1M x 1M -> vs_baseline 1.611, band [1.571, 1.639].",
        }))
        return

    # Hybrid TPU path: construct-once solver (ingest + device transfer paid
    # once -- the production serving pattern), warm the compile, then time
    # steady-state solves INTERLEAVED with the remaining CPU reps.
    # Pairing matters (round-5 acceptance): two back-to-back bench runs
    # measured the CPU block 7.67 vs 8.31 s (same session, loadavg ~0.5
    # both) while the device pass moved 0.3% -- the host's speed drifts on
    # the tens-of-minutes scale, so a ratio of two separated block medians
    # inherits that drift.  The per-pair cpu_i/hyb_i ratios sample both
    # engines in the same host regime; their median is the reported
    # vs_baseline.
    solver = AuctionSolver(loc=loc, val=vv, shape=(n, n), mode="hybrid",
                           cardinality_check=False)
    res_h = solver.solve()                       # compile + transfer warmup
    hyb_times = []
    for i in range(cpu_reps):
        t0 = time.perf_counter()
        res_h = solver.solve()
        hyb_times.append(time.perf_counter() - t0)
        if i + 1 < cpu_reps:
            cpu_rep()                            # pair i+1's CPU half
    cpu_t = cpu_summary()
    ratios = [c / h for c, h in zip(cpu_times, hyb_times)]
    hyb_t = float(np.median(hyb_times))
    meta = res_h["meta"]
    log(f"hybrid (steady-state x{len(hyb_times)}): median {hyb_t:.2f}s "
        f"band [{min(hyb_times):.2f}, {max(hyb_times):.2f}]s "
        f"device_rounds={meta['its']} "
        f"host_bids={meta['host_bids']} obj={meta['obj']:.1f} "
        f"device_t={meta.get('device_time', 0):.2f}s "
        f"readback_t={meta.get('readback_time', 0):.2f}s "
        f"host_gs_t={meta.get('host_gs_time', 0):.2f}s")
    if "tier_rounds" in meta:
        log(f"tier_rounds (phase-start, then ladder tiers): "
            f"{meta['tier_rounds']}")
    assert meta["soln_found"]
    rel_gap = abs(meta["obj"] - res_cpu["meta"]["obj"]) / abs(
        res_cpu["meta"]["obj"])
    log(f"objective agreement cpu vs hybrid: rel gap {rel_gap:.2e}")
    # Hard gate, not just a log line (ADVICE round 4): both engines solve
    # the same float32 instance to eps-optimality; disagreement beyond f32
    # accumulation noise means a correctness regression, and the headline
    # must not be recorded over one.
    assert rel_gap < 1e-6, f"cpu-vs-hybrid objective rel gap {rel_gap:.2e}"

    # Device-pass achieved bandwidth (VERDICT round-2 weak item 2): the
    # per-chip-efficiency number the >= 70%-of-SoL north star is about.
    # Bytes the device pass actually streams = sum over tiers of
    # rounds x capacity x (packed line W*4 + K price gathers * 4); the
    # phase-start tier's capacity is n.
    device_s = meta.get("device_time", 0.0)
    achieved_gbps = None
    touched_gbps = None
    if "tier_rounds" in meta and device_s > 0:
        from sslap_tpu.compact import default_tiers
        K = solver.problem_spec.K
        W = 2 * K + 1
        R = max(128 // W, 1)
        caps = [n] + list(default_tiers(n))
        tr = meta["tier_rounds"]
        # USEFUL bytes (conservative numerator): packed row W ints + K
        # price gathers per active-row fetch.  Full-width rounds
        # (tr[0]) run the WINDOW-GATHER formulation at n >= 400k
        # (wide_rounds auto): they stream coff+vals_cg (2 ints/slot,
        # ~1.12x pad) plus ~4 sort passes over (dest, w) pairs -- call
        # it 10 ints/slot either way; same order as the rowpack model,
        # so the single (W + K) model is kept for both (the SoL
        # fraction is a diagnostic, not a contract number).
        dev_bytes = sum(r * c * (W + K) * 4 for r, c in zip(tr, caps))
        # TOUCHED bytes: fetch_rows gathers the whole 128-lane line
        # (R*W ints) per row and selects the R-slot on the VPU, so the
        # memory system moves R*W + K ints per fetch -- the honest
        # numerator for an achieved-vs-HBM-spec fraction.
        dev_bytes_touched = sum(r * c * (R * W + K) * 4
                                for r, c in zip(tr, caps))
        achieved_gbps = dev_bytes / device_s / 1e9
        touched_gbps = dev_bytes_touched / device_s / 1e9
        log(f"device pass: {dev_bytes/1e9:.2f} GB useful "
            f"({dev_bytes_touched/1e9:.2f} GB touched) in "
            f"{device_s:.2f}s -> {achieved_gbps:.1f} GB/s useful, "
            f"{touched_gbps:.1f} GB/s touched "
            f"({touched_gbps/819*100:.1f}% of v5e HBM spec)")

    # Honest headline (VERDICT.md rounds 1-2): the reported value is the
    # TPU (hybrid) path's end-to-end nnz/s; vs_baseline = median CPU /
    # median hybrid with the band from the CPU and hybrid rep spreads --
    # it goes BELOW 1.0 when the device path loses to the sslap-class
    # single-thread CPU reference.
    nnz_per_s = nnz / hyb_t
    log(f"best mode: {'cpu' if cpu_t <= hyb_t else 'hybrid'}")
    # JSON field notes (VERDICT round-4 weak items 1 and 6):
    #  - vs_baseline: median of the PAIRED per-rep cpu_i/hyb_i ratios
    #    (interleaved sampling cancels common-mode host drift); band =
    #    [min, max] of the pair ratios.
    #  - device_pass_nnz_per_s: nnz / device-pass seconds -- the
    #    DEVICE-REFERENCED secondary metric, immune to the 1-vCPU CPU
    #    baseline's steal-time wobble; compare it round-over-round to see
    #    real device progress.
    #  - sol_fraction: PER-PASS accounting -- device touched GB/s over
    #    the v5e HBM spec (819 GB/s), i.e. the same number as the "% of
    #    v5e HBM spec" log line and the >= 70%-of-SoL north-star metric.
    #    (Before round 5 this field misleadingly divided time-to-optimal
    #    nnz/s -- which re-touches nnz over thousands of rounds -- by a
    #    single-pass stream bound.)
    print(json.dumps({
        "metric": "time_to_optimal_1Mx1M_sparse_lap_nnz_per_s",
        "value": round(nnz_per_s, 1),
        "unit": "nnz/s",
        "vs_baseline": round(float(np.median(ratios)), 3),
        "vs_baseline_band": [round(min(ratios), 3), round(max(ratios), 3)],
        "cpu_steady_s": round(cpu_t, 2),
        "cpu_steady_band": [round(min(cpu_times), 2),
                            round(max(cpu_times), 2)],
        "cpu_loadavg_per_rep": cpu_loads,
        "cpu_steal_pct_per_rep": cpu_steals,
        "hyb_steady_s": round(hyb_t, 2),
        "cpu_nnz_per_s": round(nnz / cpu_t, 1),
        "device_s": round(device_s, 2),
        "device_pass_nnz_per_s": (round(nnz / device_s, 1)
                                  if device_s > 0 else None),
        "readback_s": round(meta.get("readback_time", 0.0), 2),
        "host_gs_s": round(meta.get("host_gs_time", 0.0), 2),
        "device_achieved_gbps": (round(achieved_gbps, 2)
                                 if achieved_gbps else None),
        "device_touched_gbps": (round(touched_gbps, 2)
                                if touched_gbps else None),
        "sol_fraction": (round(touched_gbps / 819.0, 6)
                         if touched_gbps else None),
    }))


if __name__ == "__main__":
    main()
