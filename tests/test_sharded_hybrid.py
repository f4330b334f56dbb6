"""Sharded hybrid (parallel/sharded_compact.py, VERDICT round-2 task 1):
the distribution layer composed with the round-2 single-chip machinery --
per-shard RowPack tiered compaction, compact active-set exchanges in
narrow tiers, truncated phases, host GS tail.  All on the 8-virtual-device
CPU mesh (SURVEY.md SS5.2)."""

import numpy as np
import jax
import pytest

from sslap_tpu import AuctionSolver, auction_solve
from sslap_tpu.parallel import (
    auction_solve_sharded_hybrid,
    make_mesh,
    sharded_ladder_tiers,
)
from tests.utils import (contested_instance, random_sparse_instance,
                         scipy_sparse_objective)


def _mesh(k=None):
    devs = jax.devices()
    if k is not None:
        devs = devs[:k]
    return make_mesh(devices=devs)


def test_ladder_tiers_bounded_by_exchange_crossover():
    tiers = sharded_ladder_tiers(1 << 20, 1 << 20, 8)
    # compact exchange must beat the 2x[m] full-width exchange:
    # 3 * D * C <= 2 * m for every ladder tier
    assert all(3 * 8 * c <= 2 * (1 << 20) for c in tiers)
    assert tiers[0] == 65536 and tiers[-1] == 64
    # tiny problems may have no ladder at all (pure full-width rounds)
    assert sharded_ladder_tiers(64, 64, 8) == ()


@pytest.mark.parametrize("n", [64, 96])
def test_trunc0_exact_parity_vs_single_device(n):
    # trunc=0 runs phases to completion on-mesh: identical tie-breaks must
    # reproduce the single-device assignment EXACTLY.
    rng = np.random.default_rng(n)
    loc, val, _ = random_sparse_instance(rng, n, n, 0.15, integer=True)
    single = auction_solve(loc=loc, val=val, shape=(n, n), mode="device",
                           cardinality_check=False)
    sh = auction_solve_sharded_hybrid(loc=loc, val=val, shape=(n, n),
                                      mesh=_mesh(), trunc=0,
                                      cardinality_check=False)
    assert sh["meta"]["obj"] == single["meta"]["obj"]
    np.testing.assert_array_equal(sh["sol"], single["sol"])


def test_ladder_parity_larger_instance():
    # Size chosen so the compact-exchange ladder actually engages
    # (tier_rounds beyond index 1 nonzero).
    n = 512
    rng = np.random.default_rng(7)
    loc, val, _ = random_sparse_instance(rng, n, n, 0.03, integer=True)
    single = auction_solve(loc=loc, val=val, shape=(n, n), mode="device",
                           cardinality_check=False)
    sh = auction_solve_sharded_hybrid(loc=loc, val=val, shape=(n, n),
                                      mesh=_mesh(), trunc=0,
                                      cardinality_check=False)
    assert sh["meta"]["obj"] == single["meta"]["obj"]
    np.testing.assert_array_equal(sh["sol"], single["sol"])
    tr = sh["meta"]["tier_rounds"]
    assert len(tr) >= 3 and sum(tr[2:]) > 0, tr


def test_truncated_hybrid_with_gs_tail_matches_oracle():
    n = 256
    rng = np.random.default_rng(11)
    loc, val, _ = random_sparse_instance(rng, n, n, 0.06, integer=True)
    sh = auction_solve_sharded_hybrid(loc=loc, val=val, shape=(n, n),
                                      mesh=_mesh(), trunc=32,
                                      cardinality_check=False)
    assert sh["meta"]["soln_found"]
    assert sh["meta"]["obj"] == scipy_sparse_objective(loc, val, n, n)
    # the device pass truncated -> the host tail did real work
    assert sh["meta"]["host_bids"] > 0


def test_comm_bytes_track_active_set_not_m():
    # The point of the compact exchange (VERDICT round-2 missing item 1):
    # narrow-tier collective bytes are proportional to tier capacity D*C,
    # not to m.  Check the analytic model in the meta at a size where the
    # ladder crossover rule genuinely holds (3*D*C <= 2*m for all tiers;
    # at tiny m the 64-row floor tier can exceed it).
    n = 2048
    rng = np.random.default_rng(13)
    loc, val, _ = random_sparse_instance(rng, n, n, 0.008, integer=True)
    sh = auction_solve_sharded_hybrid(loc=loc, val=val, shape=(n, n),
                                      mesh=_mesh(), trunc=64,
                                      cardinality_check=False)
    meta = sh["meta"]
    per_round = meta["comm_bytes_per_round_by_tier"]
    caps = meta["tier_capacities"]
    D = meta["n_shards"]
    # full-width rounds move O(m); ladder rounds move 3*4*D*C
    assert per_round[0] == 3 * n * 4 and per_round[1] == 2 * n * 4
    for c, b in zip(caps[2:], per_round[2:]):
        assert b == 3 * 4 * D * c
        assert b < per_round[1]          # cheaper than a full-width round
    assert sum(meta["tier_rounds"][2:]) > 0
    assert meta["comm_bytes_total"] < meta["comm_bytes_fullwidth_equiv"]


def test_float_costs_and_warm_prices():
    n = 128
    rng = np.random.default_rng(17)
    loc, val, _ = random_sparse_instance(rng, n, n, 0.1, integer=False)
    sh = auction_solve_sharded_hybrid(loc=loc, val=val, shape=(n, n),
                                      mesh=_mesh(), trunc=16,
                                      cardinality_check=False)
    assert sh["meta"]["soln_found"]
    oracle = scipy_sparse_objective(loc, val, n, n)
    assert abs(sh["meta"]["obj"] - oracle) <= 1.5
    warm = auction_solve_sharded_hybrid(loc=loc, val=val, shape=(n, n),
                                        mesh=_mesh(), trunc=16,
                                        cardinality_check=False,
                                        warm_prices=sh.get("prices"))
    assert warm["meta"]["soln_found"]
    assert abs(warm["meta"]["obj"] - oracle) <= 1.5
    # Round-5 FR dual tightening on the sharded surface: a CHURNED
    # instance warm-started from the stale duals stays exact.
    rng2 = np.random.default_rng(18)
    loc2, val2, _ = random_sparse_instance(rng2, n, n, 0.1, integer=False)
    fr = auction_solve_sharded_hybrid(loc=loc2, val=val2, shape=(n, n),
                                      mesh=_mesh(), trunc=16,
                                      cardinality_check=False,
                                      warm_prices=sh.get("prices"),
                                      warm_fr=2)
    assert fr["meta"]["soln_found"]
    oracle2 = scipy_sparse_objective(loc2, val2, n, n)
    assert abs(fr["meta"]["obj"] - oracle2) <= 1.5


def test_mesh_size_1_equals_single_device():
    n = 96
    rng = np.random.default_rng(19)
    loc, val, _ = random_sparse_instance(rng, n, n, 0.12, integer=True)
    single = auction_solve(loc=loc, val=val, shape=(n, n), mode="device",
                           cardinality_check=False)
    sh = auction_solve_sharded_hybrid(loc=loc, val=val, shape=(n, n),
                                      mesh=_mesh(1), trunc=0,
                                      cardinality_check=False)
    np.testing.assert_array_equal(sh["sol"], single["sol"])


def test_mode_flag_and_rectangular_raise():
    rng = np.random.default_rng(23)
    C = rng.integers(1, 100, (48, 48))
    res = AuctionSolver(C, mode="sharded_hybrid",
                        cardinality_check=False).solve()
    assert res["meta"]["soln_found"]
    assert res["meta"]["mode"] == "sharded_hybrid"
    with pytest.raises(ValueError, match="square"):
        auction_solve_sharded_hybrid(rng.integers(1, 9, (8, 12)),
                                     cardinality_check=False)


def test_max_problem():
    n = 96
    rng = np.random.default_rng(29)
    loc, val, _ = random_sparse_instance(rng, n, n, 0.15, integer=True)
    single = auction_solve(loc=loc, val=val, shape=(n, n), mode="device",
                           problem="max", cardinality_check=False)
    sh = auction_solve_sharded_hybrid(loc=loc, val=val, shape=(n, n),
                                      problem="max", mesh=_mesh(), trunc=8,
                                      cardinality_check=False)
    assert sh["meta"]["obj"] == single["meta"]["obj"]


def test_overlap_objective_parity_int():
    # Pipelined full-width rounds (stale bids + acceptance guards) change
    # the round dynamics but not the optimum: integer costs solved to
    # eps_min < 1/(n+1) must reach the same objective.
    n = 512
    rng = np.random.default_rng(31)
    loc, val, _ = random_sparse_instance(rng, n, n, 0.03, integer=True)
    single = auction_solve(loc=loc, val=val, shape=(n, n), mode="device",
                           cardinality_check=False)
    sh = auction_solve_sharded_hybrid(loc=loc, val=val, shape=(n, n),
                                      mesh=_mesh(), trunc=0, overlap=True,
                                      cardinality_check=False)
    assert sh["meta"]["soln_found"]
    assert sh["meta"]["overlap"] is True
    assert sh["meta"]["obj"] == single["meta"]["obj"]
    # full-width rounds actually ran pipelined
    assert sh["meta"]["tier_rounds"][1] > 0, sh["meta"]["tier_rounds"]


def test_ladder_balance_optimality():
    # ladder_balance=True trades trunc=0 bit-exact sigma parity (spilled
    # rows bid later than the single-device engine) but never optimality:
    # integer costs at eps_min < 1/(n+1) reach the same objective.
    n = 512
    rng = np.random.default_rng(7)
    loc, val, _ = random_sparse_instance(rng, n, n, 0.03, integer=True)
    single = auction_solve(loc=loc, val=val, shape=(n, n), mode="device",
                           cardinality_check=False)
    sh = auction_solve_sharded_hybrid(loc=loc, val=val, shape=(n, n),
                                      mesh=_mesh(), trunc=0,
                                      cardinality_check=False,
                                      ladder_balance=True, balance_floor=16)
    m = sh["meta"]
    assert m["obj"] == single["meta"]["obj"]
    assert m["ladder_balance"] is True
    assert m["ladder_rebuilds"] >= 0


def test_ladder_balance_spill_rebuild_contested():
    # The crafted contention block concentrates actives in few shards ->
    # buffers sized max(2C/D, floor) overflow -> local spill rebuilds
    # readmit the waiting rows; the solve still reaches the optimum.
    n, C = 512, 56
    loc, val = contested_instance(n, C)
    sh = auction_solve_sharded_hybrid(loc=loc, val=val, shape=(n, n),
                                      mesh=_mesh(), trunc=0,
                                      cardinality_check=False,
                                      ladder_balance=True, balance_floor=8)
    m = sh["meta"]
    assert m["ladder_rebuilds"] >= 1, m
    assert m["obj"] == scipy_sparse_objective(loc, val, n, n)
    assert m["soln_found"]


def test_ladder_balance_comm_model_uses_balanced_caps():
    # The analytic collective-bytes meta must account ladder rounds at
    # the BALANCED buffer capacity, not the global tier capacity.
    n, bf = 512, 16
    rng = np.random.default_rng(7)
    loc, val, _ = random_sparse_instance(rng, n, n, 0.03, integer=True)
    sh = auction_solve_sharded_hybrid(loc=loc, val=val, shape=(n, n),
                                      mesh=_mesh(), trunc=0,
                                      cardinality_check=False,
                                      ladder_balance=True,
                                      balance_floor=bf)
    meta = sh["meta"]
    D = meta["n_shards"]
    n_local = -(-n // D)
    for c, b in zip(meta["tier_capacities"][2:],
                    meta["comm_bytes_per_round_by_tier"][2:]):
        cap = min(c, n_local, max(-(-2 * c // D), bf))
        assert b == 3 * 4 * D * cap
        assert cap < c or c <= max(-(-2 * c // D), bf)


def test_ladder_balance_with_gs_tail():
    # Truncated balanced device pass + host GS tail still reaches the
    # exact optimum (the tail finishes whatever the spills deferred).
    n, C = 256, 48
    loc, val = contested_instance(n, C, seed=1)
    sh = auction_solve_sharded_hybrid(loc=loc, val=val, shape=(n, n),
                                      mesh=_mesh(), trunc=24,
                                      cardinality_check=False,
                                      ladder_balance=True, balance_floor=8)
    m = sh["meta"]
    assert m["soln_found"]
    assert m["obj"] == scipy_sparse_objective(loc, val, n, n)


def test_overlap_with_gs_tail_and_floats():
    n = 256
    rng = np.random.default_rng(37)
    loc, val, _ = random_sparse_instance(rng, n, n, 0.06, integer=False)
    sh = auction_solve_sharded_hybrid(loc=loc, val=val, shape=(n, n),
                                      mesh=_mesh(), trunc=32, overlap=True,
                                      cardinality_check=False)
    assert sh["meta"]["soln_found"]
    oracle = scipy_sparse_objective(loc, val, n, n)
    assert abs(sh["meta"]["obj"] - oracle) <= 1.5


def test_mixed_tail_schedule_threads_through_all_distributed_drivers():
    # VERDICT r3 missing #2: theta_tail was wired into the single-chip
    # hybrid but not the distributed drivers.  With an explicit aggressive
    # theta and a ratio-3 tail, every distributed mode must (a) still land
    # on the oracle objective and (b) take MORE eps phases than the pure
    # descent (the tail inserts ~tail_phases extra drops), proving the
    # mixed schedule actually executed on-mesh.
    from sslap_tpu.parallel import (auction_solve_overlapped,
                                    auction_solve_sharded)
    n = 256
    rng = np.random.default_rng(23)
    loc, val, _ = random_sparse_instance(rng, n, n, 0.06, integer=True)
    oracle = scipy_sparse_objective(loc, val, n, n)
    for fn, kw in [
        (auction_solve_sharded_hybrid, dict(trunc=32)),
        (auction_solve_sharded, {}),
        (auction_solve_overlapped, {}),
    ]:
        pure = fn(loc=loc, val=val, shape=(n, n), mesh=_mesh(),
                  theta=10.0, theta_tail=0.0, cardinality_check=False, **kw)
        mixed = fn(loc=loc, val=val, shape=(n, n), mesh=_mesh(),
                   theta=10.0, theta_tail=3.0, tail_phases=2,
                   cardinality_check=False, **kw)
        assert pure["meta"]["obj"] == oracle, fn.__name__
        assert mixed["meta"]["obj"] == oracle, fn.__name__
        assert mixed["meta"]["phases"] > pure["meta"]["phases"], \
            (fn.__name__, mixed["meta"]["phases"], pure["meta"]["phases"])


def test_mixed_tail_default_matches_single_chip_hybrid():
    # The DEFAULT schedule (theta=None) must resolve identically on the
    # sharded hybrid and the single-chip hybrid: tail engaged iff the
    # device theta is aggressive (n >= 200k -> theta=10 -> tail=3).  At
    # test sizes theta=5, so the default tail stays OFF and the trunc=0
    # parity tests above remain like-for-like.  Assert the resolution
    # logic directly.
    from sslap_tpu import auction as _auction
    assert _auction.device_theta_default(256) == 5.0
    assert _auction.device_theta_default(1_000_000) == 10.0
    # AuctionSolver surface: explicit bad values rejected on every mode
    with pytest.raises(ValueError):
        AuctionSolver(np.ones((4, 4)), theta_tail=0.5)
    with pytest.raises(ValueError):
        AuctionSolver(np.ones((4, 4)), tail_phases=0)


def test_wide_rounds_sharded_bit_identical():
    # Window-gather full-width rounds on the sharded hybrid (round 4):
    # per-shard column-window layouts with a common group width; must
    # reproduce the scalar-gather solve bit-for-bit (same bid sets, same
    # tie-break ids), trunc=0 and truncated, int and float.
    rng = np.random.default_rng(29)
    for n, dens, integer, trunc in [(384, 0.05, True, 0),
                                    (768, 0.02, False, 32)]:
        loc, val, _ = random_sparse_instance(rng, n, n, dens,
                                             integer=integer)
        a = auction_solve_sharded_hybrid(
            loc=loc, val=val, shape=(n, n), mesh=_mesh(), trunc=trunc,
            wide_rounds=False, cardinality_check=False)
        b = auction_solve_sharded_hybrid(
            loc=loc, val=val, shape=(n, n), mesh=_mesh(), trunc=trunc,
            wide_rounds=True, cardinality_check=False)
        np.testing.assert_array_equal(a["sol"], b["sol"])
        assert a["meta"]["obj"] == b["meta"]["obj"]
        assert a["meta"]["host_bids"] == b["meta"]["host_bids"]
