"""Property tests (SURVEY.md SS5.2): eps-complementary-slackness on the
final state, price monotonicity vs initial prices, injectivity."""

import numpy as np
import jax.numpy as jnp

from sslap_tpu import AuctionSolver, auction_solve, ingest
from sslap_tpu import auction as _auction
from tests.utils import random_sparse_instance


def _final_state(C, problem="min"):
    s = AuctionSolver(C, problem=problem)
    res = s.solve()
    return s, res


def test_eps_cs_invariant_dense():
    """a[i, sigma(i)] - p[sigma(i)] >= max_j (a[i, j] - p[j]) - eps for the
    transformed (maximization) values."""
    rng = np.random.default_rng(0)
    C = rng.integers(0, 100, (48, 48))
    s, res = _final_state(C)
    prob = s.problem_spec
    tr = _auction.make_transform("min", prob.m, np.int32, float(C.max()))
    vals_t = np.asarray(tr.apply(prob.vals))
    cols = np.asarray(prob.cols)
    valid = np.asarray(prob.valid)
    p = s.prices.astype(np.int64)
    sol = res["sol"]
    # final eps in transformed units: meta stores it descaled
    eps_t = int(round(res["meta"]["final_eps"] * tr.scale))
    for i in range(prob.n):
        vals_row = vals_t[i][valid[i]].astype(np.int64)
        cols_row = cols[i][valid[i]]
        profits = vals_row - p[cols_row]
        mine = profits[cols_row == sol[i]]
        assert mine.size == 1
        assert mine[0] >= profits.max() - eps_t


def test_prices_nonnegative_and_assigned_priced():
    rng = np.random.default_rng(1)
    C = rng.integers(0, 100, (32, 40))
    s, res = _final_state(C)
    p = s.prices
    assert (p >= 0).all()  # prices start at 0 and only rise


def test_assignment_injective_sparse():
    rng = np.random.default_rng(2)
    n, m = 64, 64
    loc, val, _ = random_sparse_instance(rng, n, m, 0.1)
    res = auction_solve(loc=loc, val=val, shape=(n, m))
    sol = res["sol"]
    assert (sol >= 0).all()
    assert len(np.unique(sol)) == n
    # every assigned edge exists in the input
    edges = set(map(tuple, loc.tolist()))
    for i, j in enumerate(sol):
        assert (i, int(j)) in edges


def test_objective_matches_sol():
    rng = np.random.default_rng(3)
    C = rng.integers(0, 50, (24, 24))
    res = auction_solve(C)
    assert res["meta"]["obj"] == C[np.arange(24), res["sol"]].sum()


def test_meta_contract():
    rng = np.random.default_rng(4)
    C = rng.integers(0, 50, (8, 8))
    res = auction_solve(C)
    meta = res["meta"]
    for key in ("obj", "its", "phases", "soln_found", "final_eps",
                "unassigned", "time"):
        assert key in meta
    assert meta["its"] > 0 and meta["phases"] > 0
    assert meta["final_eps"] > 0
    assert res.sol is res["sol"]
    assert res.objective == meta["obj"]


def test_determinism_same_input_same_assignment():
    """Same instance solved twice (and via a fresh solver object) must give
    bit-identical assignments -- the documented deterministic tie-breaks
    (SURVEY.md SS6 'Race detection': determinism serves the trust role)."""
    import numpy as np
    from sslap_tpu import auction_solve
    from tests.utils import random_sparse_instance

    rng = np.random.default_rng(77)
    n = 128
    loc, val, _ = random_sparse_instance(rng, n, n, 0.1, integer=True)
    a = auction_solve(loc=loc, val=val, shape=(n, n), mode="device")
    b = auction_solve(loc=loc, val=val, shape=(n, n), mode="device")
    np.testing.assert_array_equal(a["sol"], b["sol"])
    assert a["meta"]["obj"] == b["meta"]["obj"]
    assert a["meta"]["its"] == b["meta"]["its"]


def test_eps_cs_invariant_sharded_overlap():
    """The overlap acceptance guard's correctness claim, checked directly:
    the final assignment of the pipelined sharded hybrid satisfies eps-CS
    at eps_min (stale accepted bids must not have broken the invariant)."""
    import jax
    from sslap_tpu.parallel import auction_solve_sharded_hybrid, make_mesh
    rng = np.random.default_rng(43)
    n = 256
    loc, val, _ = random_sparse_instance(rng, n, n, 0.06, integer=True)
    res = auction_solve_sharded_hybrid(
        loc=loc, val=val, shape=(n, n),
        mesh=make_mesh(devices=jax.devices()), trunc=0, overlap=True,
        cardinality_check=False)
    assert res["meta"]["soln_found"]
    prob = ingest.from_coo(loc, val, shape=(n, n))
    tr = _auction.make_transform("min", n, np.asarray(val).dtype,
                                 float(np.abs(val).max()),
                                 int_exact=prob.int_exact)
    vals_t = np.asarray(tr.apply(prob.vals)).astype(np.int64)
    cols = np.asarray(prob.cols)
    valid = np.asarray(prob.valid)
    p = np.asarray(res["prices"]).astype(np.int64)
    sol = res["sol"]
    eps_t = max(int(round(res["meta"]["final_eps"] * tr.scale)), 1)
    for i in range(n):
        if not valid[i].any():
            continue
        profits = vals_t[i][valid[i]] - p[cols[i][valid[i]]]
        mine = profits[cols[i][valid[i]] == sol[i]]
        assert mine.size == 1, f"row {i} assigned outside its edges"
        assert mine[0] >= profits.max() - eps_t, f"eps-CS broken at row {i}"


def test_eps_cs_invariant_ladder_balance():
    """Spill rebuilds defer rows' bids but must not break eps-CS: the
    balanced sharded hybrid's final state satisfies the invariant at
    eps_min, even on a contention instance that forces rebuilds."""
    import jax
    from sslap_tpu.parallel import auction_solve_sharded_hybrid, make_mesh
    rng = np.random.default_rng(5)
    n, C = 256, 48
    locs, vals = [], []
    for i in range(C):
        for j in range(C):
            locs.append((i, j))
            vals.append(int(rng.integers(1, 100)))
    for i in range(C, n):
        locs.append((i, i))
        vals.append(int(rng.integers(1, 100)))
    loc = np.array(locs, np.int64)
    val = np.array(vals, np.float64)
    res = auction_solve_sharded_hybrid(
        loc=loc, val=val, shape=(n, n),
        mesh=make_mesh(devices=jax.devices()), trunc=0,
        ladder_balance=True, balance_floor=8,
        cardinality_check=False)
    assert res["meta"]["soln_found"]
    prob = ingest.from_coo(loc, val, shape=(n, n))
    tr = _auction.make_transform("min", n, np.asarray(val).dtype,
                                 float(np.abs(val).max()),
                                 int_exact=prob.int_exact)
    vals_t = np.asarray(tr.apply(prob.vals)).astype(np.int64)
    cols = np.asarray(prob.cols)
    valid = np.asarray(prob.valid)
    p = np.asarray(res["prices"]).astype(np.int64)
    sol = res["sol"]
    eps_t = max(int(round(res["meta"]["final_eps"] * tr.scale)), 1)
    for i in range(n):
        if not valid[i].any():
            continue
        profits = vals_t[i][valid[i]] - p[cols[i][valid[i]]]
        mine = profits[cols[i][valid[i]] == sol[i]]
        assert mine.size == 1, f"row {i} assigned outside its edges"
        assert mine[0] >= profits.max() - eps_t, f"eps-CS broken at row {i}"
