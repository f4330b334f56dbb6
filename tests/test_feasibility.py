"""Feasibility layer tests (T6): Hopcroft-Karp matching size vs scipy,
infeasible detection in auction_solve, max_iter no-hang guarantee."""

import numpy as np
import pytest
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import maximum_bipartite_matching

from sslap_tpu import InfeasibleError, auction_solve, hopcroft_solve, ingest
from sslap_tpu.feasibility import hopcroft_karp, is_feasible


def _scipy_matching_size(mask):
    sp = csr_matrix(mask.astype(np.int8))
    match = maximum_bipartite_matching(sp, perm_type="column")
    return int((match >= 0).sum())


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("density", [0.02, 0.08, 0.3])
def test_hk_size_matches_scipy(seed, density):
    rng = np.random.default_rng(seed)
    n, m = 60, 80
    mask = rng.random((n, m)) < density
    prob = ingest.from_dense(np.where(mask, 1.0, -1.0))
    for native in (False, True):
        mr, mc, size = hopcroft_karp(prob, use_native=native)
        assert size == _scipy_matching_size(mask)
        # matching consistency
        matched = mr >= 0
        assert (mc[mr[matched]] == np.nonzero(matched)[0]).all()
        assert size == matched.sum()


def test_hk_python_native_agree_exactly():
    rng = np.random.default_rng(42)
    n, m = 40, 45
    mask = rng.random((n, m)) < 0.1
    prob = ingest.from_dense(np.where(mask, 1.0, -1.0))
    a = hopcroft_karp(prob, use_native=False)
    b = hopcroft_karp(prob, use_native=True)
    # both deterministic over the same scan order => identical matchings
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    assert a[2] == b[2]


def test_hopcroft_solve_api():
    mat = np.array([[1.0, -1.0], [1.0, 1.0]])
    sol = hopcroft_solve(mat)
    assert sol.tolist() == [0, 1]
    # sparse entry point, values optional
    sol2 = hopcroft_solve(loc=np.array([[0, 0], [1, 0], [1, 1]]))
    assert sol2.tolist() == [0, 1]


def test_infeasible_raises():
    # two rows share a single usable column
    C = np.array([[5.0, -1.0], [7.0, -1.0]])
    with pytest.raises(InfeasibleError):
        auction_solve(C)
    assert not is_feasible(ingest.from_dense(C))


def test_row_with_no_valid_entries():
    C = np.array([[-1.0, -1.0], [1.0, 2.0]])
    with pytest.raises(InfeasibleError):
        auction_solve(C)


def test_structurally_infeasible_subset():
    # 3 rows confined to 2 columns (Hall violation), feasible-looking rows
    C = -np.ones((4, 4))
    C[0, :2] = 1
    C[1, :2] = 2
    C[2, :2] = 3
    C[3, :] = 1
    with pytest.raises(InfeasibleError):
        auction_solve(C)


def test_max_iter_never_hangs():
    """With the cardinality check disabled, infeasible inputs terminate via
    max_iter and report soln_found=False (SURVEY.md SS1 item 5)."""
    C = np.array([[5.0, -1.0], [7.0, -1.0]])
    res = auction_solve(C, cardinality_check=False, max_iter=200)
    assert not res["meta"]["soln_found"]
    assert res["meta"]["unassigned"] >= 1
    assert res["meta"]["obj"] is None


def test_feasible_passes_check():
    rng = np.random.default_rng(5)
    C = rng.integers(1, 10, (16, 16))
    res = auction_solve(C, cardinality_check=True)
    assert res["meta"]["soln_found"]


# ---- device-seeded path (round 2: VERDICT item 6) -------------------------

def _rand_prob(rng, n, m, density):
    mask = rng.random((n, m)) < density
    mat = np.where(mask, rng.integers(1, 100, (n, m)), -1).astype(float)
    return ingest.from_dense(mat), mask


@pytest.mark.parametrize("seed", range(4))
def test_device_greedy_matching_is_valid_and_maximal(seed):
    from sslap_tpu import feasibility_device as fd
    rng = np.random.default_rng(seed)
    prob, mask = _rand_prob(rng, 80, 90, 0.1)
    mr, mc = fd.greedy_matching(prob)
    matched = mr >= 0
    # valid: matched pairs are real edges, and the matching is consistent
    rows = np.nonzero(matched)[0]
    assert mask[rows, mr[rows]].all()
    assert (mc[mr[rows]] == rows).all()
    cols_used = mr[rows]
    assert len(np.unique(cols_used)) == len(cols_used)
    # maximal: no edge with both endpoints free
    free_r = ~matched
    free_c = np.ones(prob.m, bool)
    free_c[cols_used] = False
    assert not (mask[free_r][:, free_c]).any()


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("density", [0.03, 0.15])
def test_device_seeded_hk_equals_host(seed, density):
    rng = np.random.default_rng(100 + seed)
    prob, mask = _rand_prob(rng, 70, 70, density)
    _, _, size_host = hopcroft_karp(prob, device_seed=False)
    mr, mc, size_dev = hopcroft_karp(prob, device_seed=True)
    assert size_dev == size_host == _scipy_matching_size(mask)
    # returned matching is itself valid
    rows = np.nonzero(mr >= 0)[0]
    assert mask[rows, mr[rows]].all()


def test_device_seeded_hk_numpy_fallback_warm():
    # exercise the numpy HK warm-start path (use_native=False)
    rng = np.random.default_rng(7)
    prob, mask = _rand_prob(rng, 40, 44, 0.12)
    from sslap_tpu import feasibility_device as fd
    init = fd.greedy_matching(prob)
    from sslap_tpu.feasibility import hopcroft_karp_csr, _ell_to_csr
    indptr, indices = _ell_to_csr(prob)
    _, _, size_warm = hopcroft_karp_csr(indptr, indices, prob.n, prob.m,
                                        use_native=False, init_match=init)
    _, _, size_cold = hopcroft_karp_csr(indptr, indices, prob.n, prob.m,
                                        use_native=False)
    assert size_warm == size_cold == _scipy_matching_size(mask)
