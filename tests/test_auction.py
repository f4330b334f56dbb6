"""Oracle tests: auction objective equality vs scipy (SURVEY.md SS5.2,
'Integration (single device)').  Integer costs must match the optimum
exactly; float costs within the documented m*eps tolerance.

Shapes are held fixed within each sweep so jit caching keeps the suite fast.
"""

import numpy as np
import pytest

from sslap_tpu import auction_solve
from tests.utils import (
    random_sparse_instance,
    scipy_dense_objective,
    scipy_sparse_objective,
)


@pytest.mark.parametrize("n,m", [(8, 8), (16, 16), (8, 12), (64, 64)])
@pytest.mark.parametrize("problem", ["min", "max"])
def test_dense_int_exact(n, m, problem):
    rng = np.random.default_rng(hash((n, m, problem)) % 2**32)
    for _ in range(3):
        C = rng.integers(0, 100, (n, m))
        res = auction_solve(C, problem=problem)
        oracle = scipy_dense_objective(C, maximize=problem == "max")
        assert res["meta"]["soln_found"]
        assert res["meta"]["obj"] == oracle
        # assignment is a valid injection
        sol = res["sol"]
        assert (sol >= 0).all() and len(set(sol.tolist())) == n


@pytest.mark.parametrize("problem", ["min", "max"])
def test_dense_float_tolerance(problem):
    rng = np.random.default_rng(7)
    n = m = 32
    for _ in range(3):
        C = rng.random((n, m)) * 100
        res = auction_solve(C, problem=problem)
        oracle = scipy_dense_objective(C, maximize=problem == "max")
        tol = (m + 1) * res["meta"]["final_eps"] + 1e-3
        assert abs(res["meta"]["obj"] - oracle) <= tol


def test_dense_forbidden_entries():
    rng = np.random.default_rng(3)
    n = m = 24
    for _ in range(3):
        C = rng.integers(1, 50, (n, m)).astype(np.float64)
        forb = rng.random((n, m)) < 0.3
        np.fill_diagonal(forb, False)  # keep feasible
        Cd = np.where(forb, -1.0, C)
        res = auction_solve(Cd.astype(np.int64))
        oracle = scipy_dense_objective(Cd)
        assert res["meta"]["obj"] == oracle
        sol = res["sol"]
        assert not forb[np.arange(n), sol].any()


@pytest.mark.parametrize("n,m,density", [(50, 50, 0.1), (50, 64, 0.15),
                                         (128, 128, 0.05)])
def test_sparse_int_exact(n, m, density):
    rng = np.random.default_rng(hash((n, m)) % 2**32)
    for _ in range(3):
        loc, val, _ = random_sparse_instance(rng, n, m, density)
        res = auction_solve(loc=loc, val=val, shape=(n, m))
        oracle = scipy_sparse_objective(loc, val, n, m)
        assert res["meta"]["obj"] == oracle


def test_sparse_float():
    rng = np.random.default_rng(11)
    n = m = 64
    loc, val, _ = random_sparse_instance(rng, n, m, 0.12, integer=False)
    res = auction_solve(loc=loc, val=val, shape=(n, m))
    oracle = scipy_sparse_objective(loc, val, n, m)
    tol = (m + 1) * res["meta"]["final_eps"] + 1e-3
    assert abs(res["meta"]["obj"] - oracle) <= tol


def test_rectangular_sparse():
    rng = np.random.default_rng(13)
    n, m = 40, 70
    for _ in range(3):
        loc, val, _ = random_sparse_instance(rng, n, m, 0.2)
        res = auction_solve(loc=loc, val=val, shape=(n, m))
        oracle = scipy_sparse_objective(loc, val, n, m)
        assert res["meta"]["obj"] == oracle


def test_deterministic_reruns():
    """Same input => bit-identical assignment (documented tie-break rule)."""
    rng = np.random.default_rng(17)
    C = rng.integers(0, 5, (32, 32))  # many ties
    sols = [auction_solve(C)["sol"] for _ in range(3)]
    np.testing.assert_array_equal(sols[0], sols[1])
    np.testing.assert_array_equal(sols[0], sols[2])


def test_trivial_sizes():
    assert auction_solve(np.array([[3]]))["sol"].tolist() == [0]
    res = auction_solve(np.array([[3, 1]]))
    assert res["sol"].tolist() == [1]
    assert res["meta"]["obj"] == 1
    res = auction_solve(np.array([[3, 1]]), problem="max")
    assert res["sol"].tolist() == [0]


def test_warm_start_prices():
    from sslap_tpu import AuctionSolver
    rng = np.random.default_rng(23)
    C = rng.integers(0, 100, (32, 32))
    s = AuctionSolver(C)
    r1 = s.solve()
    assert s.prices is not None
    r2 = s.solve(warm_prices=s.prices)
    assert r2["meta"]["obj"] == r1["meta"]["obj"]


class TestKeepAssignment:
    """Warm-started eps-scaling (unassign only eps-CS violators) must give
    the same optimal objective as the reference-style full phase reset."""

    @pytest.mark.parametrize("problem", ["min", "max"])
    @pytest.mark.parametrize("integer", [False, True])
    def test_objective_matches_reset(self, problem, integer):
        rng = np.random.default_rng(7)
        n = m = 64
        mat = rng.integers(1, 100, (n, m)) if integer else \
            rng.random((n, m)) * 100 + 1
        kw = dict(problem=problem, cardinality_check=False, mode="device")
        a = auction_solve(np.asarray(mat), keep_assignment=True, **kw)
        b = auction_solve(np.asarray(mat), keep_assignment=False, **kw)
        assert a["meta"]["soln_found"] and b["meta"]["soln_found"]
        if integer:
            assert a["meta"]["obj"] == b["meta"]["obj"]
        else:
            assert abs(a["meta"]["obj"] - b["meta"]["obj"]) <= 1e-3 * abs(
                b["meta"]["obj"]) + 1e-6
        ref = scipy_dense_objective(np.asarray(mat, np.float64),
                                    maximize=problem == "max")
        tol = 0 if integer else 1.0  # float path: m * eps_min <= 1
        assert abs(a["meta"]["obj"] - ref) <= tol + 1e-5

    def test_rectangular_and_sparse(self):
        rng = np.random.default_rng(11)
        n, m = 40, 64
        mat = rng.random((n, m)) * 50 + 1
        mat[rng.random((n, m)) < 0.4] = -1  # forbidden
        mat[np.arange(n), rng.permutation(m)[:n]] = 1.0  # keep feasible
        a = auction_solve(mat, keep_assignment=True, mode="device")
        b = auction_solve(mat, keep_assignment=False, mode="device")
        assert a["meta"]["soln_found"] and b["meta"]["soln_found"]
        assert abs(a["meta"]["obj"] - b["meta"]["obj"]) <= 1e-3 * abs(
            b["meta"]["obj"]) + 1e-5

    def test_hybrid_keep_assignment(self):
        from sslap_tpu.hybrid import native_available
        if not native_available():
            pytest.skip("native toolchain unavailable")
        rng = np.random.default_rng(13)
        n = m = 300
        loc, val, _ = random_sparse_instance(rng, n, m, 0.05, integer=False)
        a = auction_solve(loc=loc, val=val, shape=(n, m), mode="hybrid",
                          keep_assignment=True, cardinality_check=False)
        b = auction_solve(loc=loc, val=val, shape=(n, m), mode="cpu",
                          keep_assignment=False, cardinality_check=False)
        assert a["meta"]["soln_found"] and b["meta"]["soln_found"]
        assert abs(a["meta"]["obj"] - b["meta"]["obj"]) <= 1e-3 * abs(
            b["meta"]["obj"]) + 1e-5
