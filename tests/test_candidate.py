"""Candidate-list engine (candidate.py): exactness vs scipy, parity with
the compact engine, and shortlist invariants."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sslap_tpu import auction as A
from sslap_tpu import candidate as CD
from sslap_tpu import compact as C
from sslap_tpu import ingest
from tests.utils import random_sparse_instance, scipy_dense_objective


def _solve(prob, engine_mod, **kw):
    vals = np.asarray(prob.vals)
    valid = np.asarray(prob.valid)
    vmax = float(np.abs(vals[valid]).max())
    tr = A.make_transform("min", prob.m, vals.dtype, vmax)
    e0, emin, th = A.default_eps_schedule(vals.dtype, vmax, prob.m, tr.scale)
    mi = A.default_max_iter(prob.n)
    vt = tr.apply(prob.vals)
    fn = (CD.solve_ell_candidates if engine_mod == "candidates"
          else C.solve_ell_tiered)
    res, st = jax.jit(lambda *a: fn(*a, e0, emin, th, mi, **kw))(
        prob.cols, vt, prob.valid, prob.nvalid,
        jnp.zeros((prob.n,), vt.dtype))
    return res, st


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("integer", [True, False])
def test_candidates_exact_vs_scipy(seed, integer):
    rng = np.random.default_rng(50 + seed)
    n = 220
    loc, val, dense = random_sparse_instance(rng, n, n, 0.08,
                                             integer=integer)
    prob = ingest.from_coo(loc, val, shape=(n, n))
    res, st = _solve(prob, "candidates")
    sol = np.asarray(res.sigma)
    assert (sol >= 0).all()
    obj = sum(dense[i, sol[i]] for i in range(n))
    opt = scipy_dense_objective(dense)
    if integer:
        assert obj == opt
    else:
        assert abs(obj - opt) <= 1.0


def test_candidates_matches_compact_rounds_small():
    """With full-rebuild phase starts, trajectories coincide with compact
    when no kappa tier engages (n below the 4096 switch)."""
    rng = np.random.default_rng(60)
    loc, val, dense = random_sparse_instance(rng, 300, 300, 0.06)
    prob = ingest.from_coo(loc, val, shape=(300, 300))
    res_cd, _ = _solve(prob, "candidates")
    res_c, _ = _solve(prob, "compact")
    assert int(res_cd.rounds) == int(res_c.rounds)
    np.testing.assert_array_equal(np.asarray(res_cd.sigma),
                                  np.asarray(res_c.sigma))


def test_candidates_via_public_api():
    from sslap_tpu import auction_solve
    rng = np.random.default_rng(61)
    C_mat = rng.integers(1, 900, (64, 64))
    res = auction_solve(C_mat, mode="device", engine="candidates")
    assert res["meta"]["obj"] == scipy_dense_objective(C_mat.astype(float))
