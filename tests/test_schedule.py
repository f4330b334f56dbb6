"""Mixed tail eps schedule (auction._next_eps theta_tail; PERF.md round-3
theta A/B: the host-GS tail bid count is set by the FINAL eps drop ratio,
so descend fast early and gently for the last ~tail_phases phases)."""

import numpy as np
import pytest
import jax.numpy as jnp

from sslap_tpu import auction as A


def _trajectory(e0, theta, e_min, theta_tail, dtype, tail_phases=2):
    eps = jnp.asarray(e0, dtype)
    theta = jnp.asarray(theta, dtype)
    e_min = jnp.asarray(e_min, dtype)
    out = [float(eps)]
    for _ in range(60):
        eps = A._next_eps(eps, theta, e_min, theta_tail=theta_tail,
                          tail_phases=tail_phases)
        out.append(float(eps))
        if float(eps) <= float(e_min):
            break
    return out


def test_mixed_tail_float():
    tr = _trajectory(1000.0, 10.0, 1.0, 3.0, jnp.float32)
    # Ends at eps_min, and the FINAL drops are ratio <= 3 (+fp slack).
    assert tr[-1] == 1.0
    ratios = [a / b for a, b in zip(tr, tr[1:])]
    assert all(r <= 3.0 + 1e-5 for r in ratios[-2:]), ratios
    # The early drops still descend fast (ratio ~10 until the clamp).
    assert ratios[0] == pytest.approx(10.0)
    # Clamp point: the schedule passes through eps_min * 3^2 = 9.
    assert any(abs(x - 9.0) < 1e-4 for x in tr), tr


def test_mixed_tail_disabled_matches_pure():
    pure = _trajectory(1000.0, 10.0, 1.0, None, jnp.float32)
    off = _trajectory(1000.0, 10.0, 1.0, 0.0, jnp.float32)
    assert pure == off


def test_mixed_tail_int():
    tr = _trajectory(1 << 20, 10, 1, 3, jnp.int32)
    assert tr[-1] == 1.0
    ratios = [a / b for a, b in zip(tr, tr[1:])]
    assert all(r <= 3.0 + 1e-9 for r in ratios[-2:]), ratios
    assert any(x == 9.0 for x in tr), tr


def test_mixed_tail_never_stalls():
    # eps strictly decreases until eps_min for assorted shapes of the
    # schedule (guards against a clamp that re-yields the same eps).
    for e0, th, tl in [(7.3, 10.0, 3.0), (1e6, 50.0, 2.0), (12.0, 4.0, 3.0),
                       (8.9, 10.0, 1.5)]:
        tr = _trajectory(e0, th, 1e-3, tl, jnp.float32, tail_phases=3)
        assert tr[-1] == pytest.approx(1e-3)
        assert all(b < a for a, b in zip(tr, tr[1:])), (e0, th, tl, tr)


def test_hybrid_mixed_schedule_optimal():
    """End-to-end: explicit theta_tail on the hybrid square fast path still
    reaches the scipy-optimal objective."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import min_weight_full_bipartite_matching
    from sslap_tpu import AuctionSolver

    rng = np.random.default_rng(42)
    from tests.utils import random_sparse_instance
    n = m = 600
    loc, val, _ = random_sparse_instance(rng, n, m, 0.02, integer=True)
    solver = AuctionSolver(loc=loc, val=val, shape=(n, m), mode="hybrid",
                           theta=10.0, theta_tail=3.0,
                           cardinality_check=False)
    res = solver.solve()
    sp = coo_matrix((val, (loc[:, 0], loc[:, 1])), shape=(n, m)).tocsr()
    rows, cols = min_weight_full_bipartite_matching(sp)
    opt = sp[rows, cols].sum()
    got = val[[np.flatnonzero((loc[:, 0] == i) & (loc[:, 1] == j))[0]
               for i, j in enumerate(res.sol)]].sum()
    assert got == opt


def test_config_theta_tail_roundtrip():
    from sslap_tpu.config import AuctionConfig
    cfg = AuctionConfig(theta=10.0, theta_tail=3.0)
    assert cfg.solver_kwargs()["theta_tail"] == 3.0
    with pytest.raises(ValueError):
        AuctionConfig(theta_tail=0.5)
    AuctionConfig(theta_tail=0)     # 0 = explicit off, valid
