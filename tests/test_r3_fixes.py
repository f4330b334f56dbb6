"""Round-3 advisor/verdict fixes (ADVICE.md round 2, VERDICT.md task 7):
distributed-mode config parity, float64 mode guard, sharded warm-start +
returned prices, overlapped instrumentation, candidate tie-break contract.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sslap_tpu import AuctionSolver, auction_solve
from sslap_tpu.config import AuctionConfig
from tests.utils import random_sparse_instance


def test_config_accepts_distributed_modes():
    for mode in ("sharded", "overlapped"):
        cfg = AuctionConfig(mode=mode)
        assert cfg.mode == mode


def test_config_mode_matches_solver_whitelist():
    rng = np.random.default_rng(0)
    C = rng.integers(1, 50, (16, 16))
    cfg = AuctionConfig(mode="sharded")
    res = auction_solve(C, config=cfg, cardinality_check=False)
    assert res["meta"]["soln_found"]
    assert res["meta"]["n_shards"] >= 1


def test_float64_rejects_distributed_modes():
    rng = np.random.default_rng(1)
    C = rng.random((12, 12)).astype(np.float64)
    for mode in ("sharded", "overlapped"):
        with pytest.raises(ValueError, match="float64"):
            AuctionSolver(C, mode=mode, dtype=np.float64,
                          cardinality_check=False).solve()


@pytest.mark.parametrize("mode", ["sharded", "overlapped"])
def test_distributed_warm_prices_and_returned_prices(mode):
    rng = np.random.default_rng(2)
    n = 48
    loc, val, _ = random_sparse_instance(rng, n, n, 0.2, integer=True)
    solver = AuctionSolver(loc=loc, val=val, shape=(n, n), mode=mode,
                          cardinality_check=False)
    res1 = solver.solve()
    assert res1["meta"]["soln_found"]
    assert solver.prices is not None and solver.prices.shape == (n,)
    # Warm-started re-solve: prices seed the next solve (correctness is
    # the contract: monotone prices keep eps-CS arguments intact).
    res2 = solver.solve(warm_prices=solver.prices)
    assert res2["meta"]["obj"] == res1["meta"]["obj"]
    assert res2["meta"]["soln_found"]


def test_overlapped_instrument_keys():
    from sslap_tpu.parallel.overlap import auction_solve_overlapped
    rng = np.random.default_rng(3)
    n = 32
    loc, val, _ = random_sparse_instance(rng, n, n, 0.25, integer=True)
    res = auction_solve_overlapped(loc=loc, val=val, shape=(n, n),
                                   cardinality_check=False, instrument=True)
    meta = res["meta"]
    for k in ("round_s", "compute_s", "comm_s", "comm_fraction"):
        assert k in meta and meta[k] >= 0.0


def test_calibrated_crossover(tmp_path, monkeypatch):
    # Opt-in machine calibration for the auto crossover (VERDICT round-2
    # weak 6): default stays 500k without the env flag; forced calibration
    # measures this machine and returns a sane, cached value.
    import sslap_tpu.calibrate as cal
    monkeypatch.delenv("SSLAP_TPU_CALIBRATE", raising=False)
    cal._cached = None
    assert cal.crossover() == cal.DEFAULT_CROSSOVER
    monkeypatch.setattr(cal, "_cache_path",
                        lambda: str(tmp_path / "calib.json"))
    cal._cached = None
    x = cal.crossover(force=True)
    assert 10_000 <= x <= 50_000_000
    # second call hits the disk cache (no remeasure): same value
    cal._cached = None
    assert cal.crossover(force=False) in (x, cal.DEFAULT_CROSSOVER)


def test_candidate_fast_bid_tie_breaks_lowest_column():
    # Shortlist slots ordered by build-time w (col 7 first), but at bid
    # time both entries tie: the bid must target the LOWER column (3),
    # matching the compact engine's documented tie-break.
    from sslap_tpu.candidate import _fast_bids, build_scpack
    dtype = jnp.float32
    kappa = 2
    sc_cols = jnp.asarray([[7, 3]], jnp.int32)
    sc_vals = jnp.asarray([[5.0, 5.0]], dtype)
    from sslap_tpu.auction import neg_sentinel
    tau = jnp.full((1,), neg_sentinel(dtype))       # certified
    nv = jnp.asarray([2], jnp.int32)
    scpack = build_scpack(sc_cols, sc_vals, tau, nv, kappa)
    tgt, bid, uncert, viol = _fast_bids(
        scpack, jnp.zeros((16,), dtype), jnp.full((1,), -1, jnp.int32),
        jnp.ones((1,), bool), jnp.asarray(0.5, dtype),
        jnp.asarray(10.0, dtype), kappa, dtype, 16, False)
    assert int(tgt[0]) == 3
    assert not bool(uncert[0])
