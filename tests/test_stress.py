"""Broad oracle sweep + edge cases (SURVEY.md SS5.2 'Integration': sizes x
densities x dtypes x objectives vs scipy, and degenerate inputs)."""

import numpy as np
import pytest

from sslap_tpu import AuctionSolver, InfeasibleError, auction_solve, ingest
from tests.utils import (
    random_sparse_instance,
    scipy_dense_objective,
    scipy_sparse_objective,
)


@pytest.mark.parametrize("n,density", [(256, 0.02), (256, 0.3), (512, 0.05)])
@pytest.mark.parametrize("integer", [True, False])
@pytest.mark.parametrize("problem", ["min", "max"])
def test_oracle_sweep(n, density, integer, problem):
    rng = np.random.default_rng(hash((n, density, integer, problem)) % 2**32)
    loc, val, _ = random_sparse_instance(rng, n, n, density, integer=integer)
    res = auction_solve(loc=loc, val=val, shape=(n, n), problem=problem,
                        cardinality_check=False)
    assert res["meta"]["soln_found"]
    oracle = scipy_sparse_objective(loc, val, n, n,
                                    maximize=problem == "max")
    if integer:
        assert res["meta"]["obj"] == oracle
    else:
        assert abs(res["meta"]["obj"] - oracle) <= 2.0
    sol = res["sol"]
    assert (sol >= 0).all() and len(set(sol.tolist())) == n


def test_one_by_one():
    res = auction_solve(np.array([[7.0]]))
    assert res["sol"].tolist() == [0]
    assert res["meta"]["obj"] == 7.0


def test_single_row_rectangular():
    res = auction_solve(np.array([[5.0, 2.0, 9.0]]))
    assert res["sol"].tolist() == [1]
    assert res["meta"]["obj"] == 2.0


def test_all_forbidden_row_infeasible():
    C = np.array([[1.0, 2.0], [-1.0, -1.0]])
    with pytest.raises(InfeasibleError):
        auction_solve(C)


def test_duplicate_coo_rejected():
    loc = np.array([[0, 0], [0, 0]], np.int64)
    with pytest.raises(ValueError):
        auction_solve(loc=loc, val=np.array([1.0, 2.0]), shape=(1, 1))


def test_int_range_routing():
    """Costs beyond the int32 exact range route to the float64 path (still
    exact); truly huge integers (>= 2**50 scaled) are rejected."""
    C = np.full((50, 50), 2 ** 24, dtype=np.int64)
    res = auction_solve(C)                      # f64 path, exact
    assert res["meta"]["obj"] == 50 * 2 ** 24
    with pytest.raises(ValueError):
        auction_solve(np.full((50, 50), 2 ** 46, dtype=np.int64))


def test_nan_dense_is_forbidden():
    C = np.array([[1.0, np.nan], [np.nan, 3.0]])
    res = auction_solve(C)
    assert res["sol"].tolist() == [0, 1]
    assert res["meta"]["obj"] == 4.0


def test_zero_cost_entries_allowed():
    C = np.zeros((8, 8))
    res = auction_solve(C)
    assert res["meta"]["soln_found"] and res["meta"]["obj"] == 0.0


def test_identical_costs_deterministic_tiebreak():
    """All-equal costs: the documented tie-break (lowest column index /
    lowest row id) must give the identity-leaning assignment
    deterministically across modes."""
    C = np.full((16, 16), 5)
    a = auction_solve(C, mode="device")
    b = auction_solve(C, mode="device")
    np.testing.assert_array_equal(a["sol"], b["sol"])
    assert a["meta"]["obj"] == 16 * 5


def test_dense_vs_sparse_entry_points_agree():
    rng = np.random.default_rng(9)
    loc, val, dense = random_sparse_instance(rng, 64, 64, 0.15, integer=True)
    r1 = auction_solve(dense)
    r2 = auction_solve(loc=loc, val=val, shape=(64, 64))
    assert r1["meta"]["obj"] == r2["meta"]["obj"]


def test_warm_start_faster_or_equal_rounds():
    """Warm prices + a resumed (small) eps schedule must re-converge in far
    fewer rounds than the cold solve -- the auction warm-start property
    (prices from the optimum make most rows immediately happy)."""
    rng = np.random.default_rng(13)
    loc, val, _ = random_sparse_instance(rng, 200, 200, 0.1, integer=False)
    s = AuctionSolver(loc=loc, val=val, shape=(200, 200), mode="device",
                      cardinality_check=False)
    cold = s.solve()
    warm_solver = AuctionSolver(loc=loc, val=val, shape=(200, 200),
                                mode="device", cardinality_check=False,
                                eps_start=cold["meta"]["final_eps"] * 4)
    warm = warm_solver.solve(warm_prices=s.prices)
    assert warm["meta"]["obj"] == pytest.approx(cold["meta"]["obj"], abs=1.0)
    assert warm["meta"]["its"] < cold["meta"]["its"]


def test_float64_explicit_dtype_tight_tolerance():
    """Explicit float64 rides the native CPU path with reference-grade
    (sslap f64) tolerance."""
    from sslap_tpu.hybrid import native_available
    if not native_available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(17)
    loc, val, _ = random_sparse_instance(rng, 300, 300, 0.08, integer=False)
    res = auction_solve(loc=loc, val=val.astype(np.float64),
                        shape=(300, 300), dtype=np.float64,
                        cardinality_check=False)
    assert res["meta"]["soln_found"]
    assert res["meta"]["mode"] == "cpu"
    oracle = scipy_sparse_objective(loc, val, 300, 300)
    # f64 path: eps-optimal to ~m * eps_min = ~1; in practice much tighter
    assert abs(res["meta"]["obj"] - oracle) <= 1.0


def test_float64_rejects_device_mode():
    from sslap_tpu.hybrid import native_available
    if not native_available():
        pytest.skip("native toolchain unavailable")
    C = np.random.default_rng(0).random((8, 8))
    with pytest.raises(ValueError):
        auction_solve(C, dtype=np.float64, mode="device")


def test_big_integer_costs_exact_via_float64():
    """Integer costs whose (m+1)-scaled range exceeds int32 are routed to
    the exact float64 path automatically (the int32 path would refuse)."""
    from sslap_tpu.hybrid import native_available
    if not native_available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(23)
    n = 64
    C = rng.integers(1, 10 ** 7, (n, n))       # 1e7 * 65 >> 2**26
    res = auction_solve(C)
    from scipy.optimize import linear_sum_assignment as scipy_lsa
    r, c = scipy_lsa(C)
    assert res["meta"]["obj"] == int(C[r, c].sum())
    assert isinstance(res["meta"]["obj"], int)
