"""Combined forward-reverse GS auction (round 5: gs_engine='fr').

A different algorithm from the forward GS (reverse bids lower prices via
tight profit/price pairs), so the contract here is OBJECTIVE optimality
vs scipy -- not bit-identical trajectories -- plus the engine-selection
plumbing (config routing, silent fallback off the square/native domain).
"""

import numpy as np
import pytest

from sslap_tpu import AuctionSolver
from sslap_tpu.config import AuctionConfig
from sslap_tpu.hybrid import native_available
from tests.utils import random_sparse_instance, scipy_sparse_objective

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


@pytest.mark.parametrize("mode", ["cpu", "hybrid"])
@pytest.mark.parametrize("integer", [True, False])
def test_fr_engine_square_exact(mode, integer):
    rng = np.random.default_rng(21)
    n = m = 150
    loc, val, _ = random_sparse_instance(rng, n, m, 0.06, integer=integer)
    s = AuctionSolver(loc=loc, val=val, shape=(n, m), mode=mode,
                      cardinality_check=False, gs_engine="fr")
    r = s.solve()
    assert r["meta"]["soln_found"]
    expected = scipy_sparse_objective(loc, val, n, m)
    if integer:
        assert r["meta"]["obj"] == int(round(expected))
    else:
        np.testing.assert_allclose(r["meta"]["obj"], expected, rtol=1e-6)


@pytest.mark.parametrize("problem", ["min", "max"])
def test_fr_engine_minmax_and_config_routing(problem):
    rng = np.random.default_rng(23)
    n = m = 100
    loc, val, _ = random_sparse_instance(rng, n, m, 0.08, integer=True)
    cfg = AuctionConfig(problem=problem, mode="cpu",
                        cardinality_check=False, gs_engine="fr")
    s = AuctionSolver(loc=loc, val=val, shape=(n, m), config=cfg)
    r = s.solve()
    assert r["meta"]["soln_found"]
    expected = scipy_sparse_objective(loc, val, n, m,
                                      maximize=problem == "max")
    assert r["meta"]["obj"] == int(round(expected))


def test_fr_engine_warm_churn_exact():
    """The motivating workload: churned warm re-solve with warm_mode='fr'
    duals AND the FR finisher."""
    rng = np.random.default_rng(29)
    n = m = 120
    loc, val, _ = random_sparse_instance(rng, n, m, 0.08, integer=False)
    s = AuctionSolver(loc=loc, val=val, shape=(n, m), mode="cpu",
                      cardinality_check=False, gs_engine="fr")
    r = s.solve()
    loc2, val2, _ = random_sparse_instance(rng, n, m, 0.08, integer=False)
    s2 = AuctionSolver(loc=loc2, val=val2, shape=(n, m), mode="cpu",
                       cardinality_check=False, gs_engine="fr")
    r2 = s2.solve(warm_prices=r.get("prices"), warm_mode="fr")
    assert r2["meta"]["soln_found"]
    expected = scipy_sparse_objective(loc2, val2, n, m)
    np.testing.assert_allclose(r2["meta"]["obj"], expected, rtol=1e-6)


def test_fr_engine_rect_falls_back_forward():
    # Rectangular problems silently keep the forward engine; results stay
    # exact either way.
    rng = np.random.default_rng(31)
    n, m = 60, 90
    loc, val, _ = random_sparse_instance(rng, n, m, 0.12, integer=True)
    s = AuctionSolver(loc=loc, val=val, shape=(n, m), mode="cpu",
                      cardinality_check=False, gs_engine="fr")
    r = s.solve()
    assert r["meta"]["soln_found"]
    expected = scipy_sparse_objective(loc, val, n, m)
    assert r["meta"]["obj"] == int(round(expected))


def test_fr_engine_validation():
    rng = np.random.default_rng(33)
    loc, val, _ = random_sparse_instance(rng, 20, 20, 0.3, integer=True)
    with pytest.raises(ValueError, match="gs_engine"):
        AuctionSolver(loc=loc, val=val, shape=(20, 20), gs_engine="bogus")
    with pytest.raises(ValueError, match="gs_engine"):
        AuctionConfig(gs_engine="bogus")


def test_fr_engine_fuzz_small():
    """Randomized mini-fuzz: many tiny square instances, both dtypes,
    objective exact/oracle-close every time."""
    rng = np.random.default_rng(37)
    for trial in range(25):
        n = int(rng.integers(5, 60))
        integer = bool(rng.random() < 0.5)
        loc, val, _ = random_sparse_instance(
            rng, n, n, float(rng.uniform(0.1, 0.6)), integer=integer)
        s = AuctionSolver(loc=loc, val=val, shape=(n, n), mode="cpu",
                          cardinality_check=False, gs_engine="fr")
        r = s.solve()
        assert r["meta"]["soln_found"], (trial, n)
        expected = scipy_sparse_objective(loc, val, n, n)
        if integer:
            assert r["meta"]["obj"] == int(round(expected)), (trial, n)
        else:
            np.testing.assert_allclose(r["meta"]["obj"], expected,
                                       rtol=1e-5)
