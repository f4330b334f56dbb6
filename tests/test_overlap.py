"""Overlapped sharded solve (parallel/overlap.py): correctness on the
8-virtual-device CPU mesh.  The stale-bid acceptance guards must preserve
optimality -- objective equality vs the scipy oracle and vs the plain
(non-overlapped) sharded path."""

import numpy as np
import pytest

from sslap_tpu.parallel.overlap import auction_solve_overlapped
from sslap_tpu.parallel.sharded import auction_solve_sharded
from tests.utils import random_sparse_instance, scipy_sparse_objective


@pytest.mark.parametrize("n", [32, 96])
@pytest.mark.parametrize("integer", [True, False])
def test_overlap_objective_matches_oracle(n, integer):
    rng = np.random.default_rng(hash((n, integer)) % 2**32)
    loc, val, _ = random_sparse_instance(rng, n, n, 0.15, integer=integer)
    res = auction_solve_overlapped(loc=loc, val=val, shape=(n, n),
                                   cardinality_check=False)
    assert res["meta"]["soln_found"], res["meta"]
    oracle = scipy_sparse_objective(loc, val, n, n)
    if integer:
        assert res["meta"]["obj"] == oracle
    else:
        assert abs(res["meta"]["obj"] - oracle) <= 1.5
    # valid injection
    sol = res["sol"]
    assert (sol >= 0).all() and len(set(sol.tolist())) == n


def test_overlap_matches_plain_sharded():
    rng = np.random.default_rng(3)
    n = 64
    loc, val, _ = random_sparse_instance(rng, n, n, 0.2, integer=True)
    a = auction_solve_overlapped(loc=loc, val=val, shape=(n, n),
                                 cardinality_check=False)
    b = auction_solve_sharded(loc=loc, val=val, shape=(n, n),
                              cardinality_check=False)
    assert a["meta"]["soln_found"] and b["meta"]["soln_found"]
    assert a["meta"]["obj"] == b["meta"]["obj"]


def test_overlap_max_problem():
    rng = np.random.default_rng(9)
    n = 48
    loc, val, _ = random_sparse_instance(rng, n, n, 0.25, integer=True)
    res = auction_solve_overlapped(loc=loc, val=val, shape=(n, n),
                                   problem="max", cardinality_check=False)
    assert res["meta"]["soln_found"]
    from scipy.optimize import linear_sum_assignment
    dense = np.full((n, n), -1.0)
    dense[loc[:, 0], loc[:, 1]] = val
    big = np.where(dense < 0, -1e9, dense)
    r, c = linear_sum_assignment(big, maximize=True)
    assert res["meta"]["obj"] == int(dense[r, c].sum())
