"""Hybrid (device bulk + native host tail) and pure-CPU mode tests: both
must reach the same optimum as the pure device path and the scipy oracle."""

import numpy as np
import pytest

from sslap_tpu import auction_solve
from sslap_tpu.hybrid import native_available
from tests.utils import (
    random_sparse_instance,
    scipy_dense_objective,
    scipy_sparse_objective,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


@pytest.mark.parametrize("mode", ["cpu", "hybrid"])
@pytest.mark.parametrize("problem", ["min", "max"])
def test_modes_dense_int_exact(mode, problem):
    rng = np.random.default_rng(0)
    C = rng.integers(0, 100, (48, 48))
    res = auction_solve(C, problem=problem, mode=mode)
    assert res["meta"]["obj"] == scipy_dense_objective(
        C, maximize=problem == "max")
    assert res["meta"]["mode"] == mode


@pytest.mark.parametrize("mode", ["cpu", "hybrid"])
def test_modes_sparse_int_exact(mode):
    rng = np.random.default_rng(1)
    n = m = 200
    loc, val, _ = random_sparse_instance(rng, n, m, 0.05)
    res = auction_solve(loc=loc, val=val, shape=(n, m), mode=mode)
    assert res["meta"]["obj"] == scipy_sparse_objective(loc, val, n, m)


@pytest.mark.parametrize("mode", ["cpu", "hybrid"])
def test_modes_rectangular(mode):
    rng = np.random.default_rng(2)
    n, m = 40, 70
    loc, val, _ = random_sparse_instance(rng, n, m, 0.2)
    res = auction_solve(loc=loc, val=val, shape=(n, m), mode=mode)
    assert res["meta"]["obj"] == scipy_sparse_objective(loc, val, n, m)
    assert (res["sol"] >= 0).all() and len(np.unique(res["sol"])) == n


@pytest.mark.parametrize("mode", ["cpu", "hybrid"])
def test_modes_float_tolerance(mode):
    rng = np.random.default_rng(3)
    n = m = 64
    loc, val, _ = random_sparse_instance(rng, n, m, 0.15, integer=False)
    res = auction_solve(loc=loc, val=val, shape=(n, m), mode=mode)
    oracle = scipy_sparse_objective(loc, val, n, m)
    tol = (m + 1) * res["meta"]["final_eps"] + 1e-3
    assert abs(res["meta"]["obj"] - oracle) <= tol


def test_modes_agree_with_device():
    rng = np.random.default_rng(4)
    C = rng.integers(0, 1000, (64, 64))
    objs = {mode: auction_solve(C, mode=mode)["meta"]["obj"]
            for mode in ("device", "hybrid", "cpu")}
    assert objs["device"] == objs["hybrid"] == objs["cpu"]


def test_cpu_mode_forbidden_and_infeasible():
    from sslap_tpu import InfeasibleError
    C = np.array([[5.0, -1.0], [7.0, -1.0]])
    with pytest.raises(InfeasibleError):
        auction_solve(C, mode="cpu")
    res = auction_solve(C, mode="cpu", cardinality_check=False)
    assert not res["meta"]["soln_found"]


def test_cpu_warm_start():
    rng = np.random.default_rng(5)
    from sslap_tpu import AuctionSolver
    C = rng.integers(0, 100, (32, 32))
    s = AuctionSolver(C, mode="cpu")
    a = s.solve()
    b = s.solve(warm_prices=s.prices)
    assert a["meta"]["obj"] == b["meta"]["obj"]


def test_wide_rounds_bit_identical_solve():
    # Window-gather phase starts (ops/widebid.py, VERDICT r3 task 6): the
    # full hybrid solve with wide_rounds=True must reproduce the default
    # path bit-for-bit (sigma AND prices), int and float.
    from sslap_tpu import hybrid as H
    from sslap_tpu import ingest as I
    from tests.utils import random_sparse_instance

    rng = np.random.default_rng(3)
    for integer, n, dens in [(True, 1024, 0.01), (False, 512, 0.05)]:
        loc, val, _ = random_sparse_instance(rng, n, n, dens,
                                             integer=integer)
        prob = I.from_coo(loc, val, shape=(n, n))
        s1, p1, m1 = H.solve_hybrid(prob, mode="hybrid", wide_rounds=False)
        s2, p2, m2 = H.solve_hybrid(prob, mode="hybrid", wide_rounds=True)
        np.testing.assert_array_equal(s1, s2)
        np.testing.assert_array_equal(p1, p2)
        assert m1["host_bids"] == m2["host_bids"]
        assert m1["its"] == m2["its"]


def test_wide_rounds_auctionsolver_surface():
    from sslap_tpu import AuctionSolver
    from tests.utils import random_sparse_instance, scipy_sparse_objective

    rng = np.random.default_rng(5)
    n = 256
    loc, val, _ = random_sparse_instance(rng, n, n, 0.08, integer=True)
    s = AuctionSolver(loc=loc, val=val, shape=(n, n), mode="hybrid",
                      wide_rounds=True, cardinality_check=False)
    r = s.solve()
    assert r["meta"]["obj"] == scipy_sparse_objective(loc, val, n, n)
    # wide layout cached for construct-once re-solves
    assert "wide" in s._device_cache
    r2 = s.solve(warm_prices=r.get("prices"))
    assert r2["meta"]["obj"] == r["meta"]["obj"]


def test_wide_rounds_skew_guard_falls_back():
    # A degenerate SQUARE instance (nearly all off-diagonal entries
    # concentrated in one 128-column window) must refuse the wide layout
    # (NB*E blowup guard) and solve via the scalar path -- the OOM class
    # the round-4 tracking run hit when ingest pads all carried col 0.
    from sslap_tpu import AuctionSolver
    from tests.utils import scipy_sparse_objective

    rng = np.random.default_rng(9)
    n = 4096
    rows = np.repeat(np.arange(n), 3)
    cols = rng.integers(0, 128, rows.shape[0])     # window 0 only
    rr = np.concatenate([rows, np.arange(n)])
    cc = np.concatenate([cols, np.arange(n)])      # diagonal: feasible
    key = rr.astype(np.int64) * n + cc
    _, idx = np.unique(key, return_index=True)
    rr, cc = rr[idx], cc[idx]
    vv = (rng.random(rr.shape[0]) * 100 + 1).astype(np.float32)
    loc = np.stack([rr, cc], 1)
    s = AuctionSolver(loc=loc, val=vv, shape=(n, n), mode="hybrid",
                      wide_rounds=True, cardinality_check=False)
    r = s.solve()
    assert r["meta"]["soln_found"]
    oracle = scipy_sparse_objective(loc, vv, n, n)
    assert abs(r["meta"]["obj"] - oracle) <= (n + 1) * r["meta"]["final_eps"]
    # layout refused by the guard -> cached verdict is None (the square
    # fast path ran; no per-solve re-try)
    assert s._device_cache.get("wide_key") is not None
    assert s._device_cache.get("wide") is None
