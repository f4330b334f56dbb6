"""Analytic multi-chip scaling projection for the sharded hybrid
(BASELINE config 5 / the >= 80% scaling north star).

Real >= 2-host hardware does not exist in this environment (one tunneled
v5e chip), so the scaling number cannot be measured.  It CAN be projected
from measured quantities, with the interconnect left as an explicit
parameter -- the output is "the design scales like THIS provided the
interconnect delivers X", not a fake benchmark.

Measured inputs (PERF.md round 3, real chip + sim-mesh run):
  - per-round cost = A + b*C*K with A ~ 15 us fixed
    (probe_round_overhead) and b = 8.9-12.4 ns/elem
    (probe_stage_breakdown, C = 256/1024 'full' rows); the sweep uses
    b in {9, 12} ns as the optimistic/pessimistic band;
  - the 8-shard sharded-hybrid round histogram for the 1M x 1M bench
    instance (PERF.md round 3): 7 phase starts, 38 full-width rounds,
    ladder [35, 63, 121, 242, 472, 918, 1833, 3604] at
    sharded_ladder_tiers(1M, 1M, 8) = 65536 .. 512 (trunc = 256).
    Round count is an algorithmic property of the instance — validated
    empirically on a 32k bench-class instance at d = 1/8/16 (identical
    290 rounds, identical host-tail bids and objective; PERF.md round-3
    continuation note).

Projection per round regime at d shards:
  phase start   compute(n/d * K)   + allreduce(3 x 4m B)
  full-width    compute(n/d * K)   + allreduce(2 x 4m B)
                [overlap=True -> max(compute, comm)]
  ladder tier C compute(C * K)     + allgather(12*C B per shard)
                -- by default local buffers keep capacity min(C, n_local)
                = C, so ladder COMPUTE does not shrink with d: this is
                the design's Amdahl serial fraction.  The 'bal' columns
                model ladder_balance=True (implemented in
                sharded_compact.py), which sizes upper-ladder buffers
                ~2C/d with local spill rebuilds.

Collectives: ring all-reduce 2*(d-1)/d * bytes / BW + L; all-gather
(d-1) * bytes_per_shard / BW + L.  BW/L swept over a grid bracketing
public v5e ICI figures (per-chip ICI O(100) GB/s, microsecond-scale
collective latency) plus a DCN-scale 100 us row.

Model validation against a REAL transport (round-3 continuation III):
the additive-latency collective model was cross-checked against the
two-process Gloo runs (benchmarks/multiproc_sim.py, n=4096, 8 shards).
Measured per-collective boundary cost 3.0 ms (loopback Gloo); predicted
variable delta for the trunc=0 solve = 12,908 narrow rounds x 3.0 ms =
38.7 s; measured 38.3 s (after the ~10 s fixed cross-client
compile/init cost, itself measured at trunc=128).  The latency term the
whole projection hinges on is right to ~1% on the one non-simulated
transport available here.

Run: python benchmarks/project_scaling.py
"""

N = 1_000_000
K = 10
A_FIXED = 15e-6
BALANCE_FLOOR = 256   # = auction_solve_sharded_hybrid's default
MEASURED_SINGLE_CHIP_S = 5.17   # tiered single-chip design, context only

# 8-shard sharded-hybrid histogram (PERF.md round 3, trunc=256):
PHASE_STARTS = 7
FULL_WIDTH = 38
LADDER = [(65536, 35), (32768, 63), (16384, 121), (8192, 242),
          (4096, 472), (2048, 918), (1024, 1833), (512, 3604)]


def project(d, bw_gbps, lat_us, b, overlap=True, balanced=False):
    lat = lat_us * 1e-6
    bw = bw_gbps * 1e9
    n_local = N // d

    def ar(nbytes):
        return 0.0 if d == 1 else 2 * (d - 1) / d * nbytes / bw + lat

    def ag(nbytes_per_shard):
        return 0.0 if d == 1 else (d - 1) * nbytes_per_shard / bw + lat

    comp_fw = A_FIXED + b * n_local * K
    t = PHASE_STARTS * (comp_fw + ar(3 * 4 * N))
    comm_fw = ar(2 * 4 * N)
    t += FULL_WIDTH * (max(comp_fw, comm_fw) if overlap
                       else comp_fw + comm_fw)
    for c, r in LADDER:
        # balanced = the implemented ladder_balance=True policy at its
        # shipped default floor (sharded_compact.balanced_cap, floor
        # 256); spill rebuilds are local sorts, modeled free.
        cl = (min(c, n_local, max(-(-2 * c // d), BALANCE_FLOOR))
              if balanced else c)
        t += r * (A_FIXED + b * cl * K + ag(12 * cl))
    return t


def row(d, bw, lat, b, **kw):
    t1 = project(1, bw, lat, b, **kw)
    td = project(d, bw, lat, b, **kw)
    return t1, td, t1 / td, t1 / td / d


def main():
    print(f"(context: measured single-chip TIERED pass "
          f"{MEASURED_SINGLE_CHIP_S:.2f} s; the model's same-design d=1 "
          f"baselines below land at "
          f"{project(1, 45, 5, 9e-9):.2f}-{project(1, 45, 5, 12e-9):.2f} s"
          f" -- consistent)\n")
    for b_ns in (9, 12):
        b = b_ns * 1e-9
        print(f"--- b = {b_ns} ns/elem ---")
        hdr = f"{'d':>3} {'BW':>5} {'lat':>5} {'T(d) s':>7} " \
              f"{'eff':>6} {'T bal':>7} {'eff bal':>8}"
        print(hdr)
        for d in (2, 4, 8):
            for bw in (45, 90):
                for lat in (2, 10, 100):
                    _, td, _, eff = row(d, bw, lat, b)
                    _, tb, _, effb = row(d, bw, lat, b, balanced=True)
                    print(f"{d:>3} {bw:>5} {lat:>5} {td:>7.2f} "
                          f"{eff:>6.1%} {tb:>7.2f} {effb:>8.1%}")
        print()
    print(
        "Readings:\n"
        "  1. The ladder is the Amdahl wall: its compute does not shrink\n"
        "     with d (capacity-C local buffers), so efficiency falls from\n"
        "     ~75% at d=2 toward ~35% at d=8 regardless of bandwidth --\n"
        "     the compact exchanges keep collective BYTES negligible by\n"
        "     construction; what remains is serial compute + the latency\n"
        "     floor repeated over ~7300 narrow rounds.\n"
        "  2. 'bal' = ladder_balance=True (IMPLEMENTED: sharded_compact\n"
        "     sizes ladder buffers ~2C/d with local spill rebuilds):\n"
        "     recovers most of the wide-ladder compute, lifting d=8 to\n"
        "     ~63-69%.\n"
        "  3. The >= 80% north-star at d = 2 holds under ~2 us collective\n"
        "     latency with balanced buffers; the unbalanced design sits\n"
        "     at ~75% -- the gap is design (fixable), not wire.\n"
        "  4. Larger instances scale better: the wide regime grows with\n"
        "     n while chain depth grows sublinearly (the 10M run's\n"
        "     histogram is proportionally wider -- PERF.md round 3)."
    )


if __name__ == "__main__":
    main()
