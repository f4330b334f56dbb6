"""Forward-reverse dual tightening (round 5: auction.fr_tighten and the
AuctionSolver ``warm_mode='fr'`` surface).

The FR sweep's two contract properties are provable one-liners (see the
native fr_tighten docstring), and both are asserted directly here; the
solve-level tests then check the only thing tightening may NOT change:
the fixed point (exact objectives vs scipy), under the pattern-churn and
chained-warm workloads it exists to accelerate.
"""

import numpy as np
import pytest

from sslap_tpu import AuctionSolver
from sslap_tpu.auction import fr_tighten
from tests.utils import random_sparse_instance, scipy_sparse_objective


def _csr_from(loc, val, n):
    order = np.lexsort((loc[:, 1], loc[:, 0]))
    rr, cc = loc[order, 0], loc[order, 1]
    counts = np.bincount(rr, minlength=n)
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=indptr[1:])
    return indptr, cc.astype(np.int32), np.ascontiguousarray(val[order])


def test_fr_monotone_descent_and_dual_feasibility():
    rng = np.random.default_rng(0)
    n = m = 300
    loc, val, _ = random_sparse_instance(rng, n, m, 0.05, integer=False)
    indptr, indices, data = _csr_from(loc, val.astype(np.float32), n)
    prices0 = (rng.random(m) * 50).astype(np.float32)
    prices = prices0.copy()
    fr_tighten(indptr, indices, data, prices, iters=2)
    assert (prices <= prices0 + 1e-5).all(), "prices may only fall"
    assert (prices >= 0).all(), "prices stay non-negative"
    rows_flat = np.repeat(np.arange(n), np.diff(indptr))
    w = data - prices[indices]
    pi = np.full(n, -np.inf)
    np.maximum.at(pi, rows_flat, w)
    slack = data.astype(np.float64) - pi[rows_flat] - prices[indices]
    assert (slack <= 1e-4).all(), "a_ij <= pi_i + p_j after tightening"


def test_fr_unsupported_columns_fall_to_zero():
    # Column 2 has no incident edges -> its stale high price drops to 0.
    n, m = 2, 3
    loc = np.array([[0, 0], [0, 1], [1, 0], [1, 1]])
    val = np.array([5.0, 3.0, 2.0, 6.0], np.float32)
    indptr, indices, data = _csr_from(loc, val, n)
    prices = np.array([10.0, 10.0, 40.0], np.float32)
    fr_tighten(indptr, indices, data, prices, iters=1)
    assert prices[2] == 0.0


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int32])
def test_fr_numpy_native_parity(monkeypatch, dtype):
    from sslap_tpu.native import build as nb
    if nb.load_native() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(3)
    n = m = 200
    loc, val, _ = random_sparse_instance(
        rng, n, m, 0.06, integer=np.issubdtype(dtype, np.integer))
    indptr, indices, data = _csr_from(loc, val.astype(dtype), n)
    warm = (rng.random(m) * 100).astype(dtype)
    p_native = warm.copy()
    fr_tighten(indptr, indices, data, p_native, iters=2)
    monkeypatch.setattr(nb, "fr_tighten_native", lambda *a, **k: False)
    p_numpy = warm.copy()
    fr_tighten(indptr, indices, data, p_numpy, iters=2)
    if np.issubdtype(dtype, np.integer):
        assert (p_native == p_numpy).all()
    else:
        np.testing.assert_allclose(p_native, p_numpy, rtol=1e-6)


@pytest.mark.parametrize("mode", ["cpu", "hybrid"])
@pytest.mark.parametrize("integer", [True, False])
def test_warm_fr_pattern_churn_exact(mode, integer):
    """Full pattern churn (an independent new instance) warm-started from
    the old duals with warm_mode='fr': exact objective, solution found."""
    rng = np.random.default_rng(11)
    n = m = 120
    loc, val, _ = random_sparse_instance(rng, n, m, 0.08, integer=integer)
    s = AuctionSolver(loc=loc, val=val, shape=(n, m), mode=mode,
                      cardinality_check=False)
    r = s.solve()
    loc2, val2, _ = random_sparse_instance(rng, n, m, 0.08, integer=integer)
    s2 = AuctionSolver(loc=loc2, val=val2, shape=(n, m), mode=mode,
                       cardinality_check=False)
    r2 = s2.solve(warm_prices=r.get("prices"), warm_mode="fr")
    assert r2["meta"]["soln_found"]
    expected = scipy_sparse_objective(loc2, val2, n, m)
    if integer:
        assert r2["meta"]["obj"] == int(round(expected))
    else:
        np.testing.assert_allclose(r2["meta"]["obj"], expected, rtol=1e-6)


def test_warm_fr_chained_frames_stay_exact():
    """>= 4 chained warm frames under value drift (the round-4 blowup
    workload shape, downscaled): every frame exact vs scipy and none may
    trip the bid budget."""
    rng = np.random.default_rng(7)
    n = m = 150
    loc, val, _ = random_sparse_instance(rng, n, m, 0.06, integer=False)
    val = val.astype(np.float32)
    s = AuctionSolver(loc=loc, val=val, shape=(n, m), mode="cpu",
                      cardinality_check=False)
    r = s.solve()
    prices = r.get("prices")
    for _ in range(4):
        val = np.clip(val + rng.standard_normal(val.shape)
                      .astype(np.float32) * 10.0, 1.0, 1000.0)
        s = AuctionSolver(loc=loc, val=val, shape=(n, m), mode="cpu",
                          cardinality_check=False)
        r = s.solve(warm_prices=prices, warm_mode="fr")
        assert r["meta"]["soln_found"]
        expected = scipy_sparse_objective(loc, val, n, m)
        np.testing.assert_allclose(r["meta"]["obj"], expected, rtol=1e-5)
        prices = r.get("prices")


def test_warm_fr_composes_with_warm_relax_and_validates():
    rng = np.random.default_rng(5)
    n = m = 60
    loc, val, _ = random_sparse_instance(rng, n, m, 0.1, integer=True)
    s = AuctionSolver(loc=loc, val=val, shape=(n, m), mode="cpu",
                      cardinality_check=False)
    r = s.solve()
    with pytest.raises(ValueError, match="warm_mode"):
        s.solve(warm_prices=r.get("prices"), warm_mode="bogus")
    r2 = s.solve(warm_prices=r.get("prices"), warm_relax=0.95,
                 warm_mode="fr")
    assert r2["meta"]["soln_found"]
    assert r2["meta"]["obj"] == r["meta"]["obj"]


def test_warm_fr_maximization_exact():
    rng = np.random.default_rng(9)
    n = m = 80
    loc, val, _ = random_sparse_instance(rng, n, m, 0.1, integer=True)
    s = AuctionSolver(loc=loc, val=val, shape=(n, m), problem="max",
                      mode="cpu", cardinality_check=False)
    r = s.solve()
    loc2, val2, _ = random_sparse_instance(rng, n, m, 0.1, integer=True)
    s2 = AuctionSolver(loc=loc2, val=val2, shape=(n, m), problem="max",
                       mode="cpu", cardinality_check=False)
    r2 = s2.solve(warm_prices=r.get("prices"), warm_mode="fr")
    assert r2["meta"]["soln_found"]
    expected = scipy_sparse_objective(loc2, val2, n, m, maximize=True)
    assert r2["meta"]["obj"] == int(round(expected))
