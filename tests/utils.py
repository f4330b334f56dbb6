"""Shared test helpers: random instance generators with guaranteed
feasibility (a planted random perfect matching), scipy oracles."""

import numpy as np
from scipy.optimize import linear_sum_assignment as scipy_lsa
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import min_weight_full_bipartite_matching


def random_sparse_instance(rng, n, m, density, low=1, high=1000,
                           integer=True):
    """Random sparse instance with a planted perfect matching; returns
    (loc [nnz,2], val [nnz], dense_with_forbidden [-1 fill])."""
    mask = rng.random((n, m)) < density
    perm = rng.permutation(m)[:n]
    mask[np.arange(n), perm] = True
    if integer:
        C = rng.integers(low, high, (n, m))
    else:
        C = rng.random((n, m)) * (high - low) + low
    rr, cc = np.nonzero(mask)
    loc = np.stack([rr, cc], axis=1)
    dense = np.where(mask, C, -1).astype(C.dtype if integer else np.float64)
    return loc, C[rr, cc], dense


def scipy_sparse_objective(loc, val, n, m, maximize=False):
    v = val.astype(np.float64)
    sign = -1.0 if maximize else 1.0
    sp = csr_matrix((sign * v, (loc[:, 0], loc[:, 1])), shape=(n, m))
    r, c = min_weight_full_bipartite_matching(sp)
    return float(sign * sp[r, c].sum())


def scipy_dense_objective(dense, maximize=False, forbidden=-1):
    """Oracle objective for a dense matrix with forbidden = negative entries
    (replaced by +/- big value for scipy)."""
    C = np.asarray(dense, np.float64).copy()
    bad = C < 0
    if bad.any():
        C[bad] = np.inf if not maximize else -np.inf
        # scipy lsa handles inf as 'avoid'; result must avoid all bad cells
    r, c = scipy_lsa(C, maximize=maximize)
    assert not bad[r, c].any(), "oracle used a forbidden entry"
    return float(np.asarray(dense, np.float64)[r, c].sum())


def contested_instance(n, C, seed=0):
    """Rows 0..C-1 form a dense CxC block (all compete for cols 0..C-1
    through eviction chains, so actives stay concentrated in few shards);
    remaining rows are diagonal-only.  Deterministically overflows the
    sharded hybrid's balanced ladder buffers (ladder_balance=True) --
    the ONE builder shared by every test that needs spills to trigger."""
    rng = np.random.default_rng(seed)
    locs, vals = [], []
    for i in range(C):
        for j in range(C):
            locs.append((i, j))
            vals.append(int(rng.integers(1, 100)))
    for i in range(C, n):
        locs.append((i, i))
        vals.append(int(rng.integers(1, 100)))
    return np.array(locs, np.int64), np.array(vals, np.float64)
