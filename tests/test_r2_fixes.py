"""Round-2 fixes: ADVICE.md items (batched int_exact propagation, f64
batch guard, hybrid truncated-phase meta honesty, keep_assignment routing)
and VERDICT.md weak items (scipy adapter tall-matrix parity, numpy GS
fallback so float64 works without the native toolchain)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from sslap_tpu import auction_solve, linear_sum_assignment
from sslap_tpu.batch import auction_solve_batched, batch_from_dense
from tests.utils import random_sparse_instance, scipy_dense_objective


def test_scipy_adapter_tall_matrix():
    from scipy.optimize import linear_sum_assignment as scipy_lsa
    rng = np.random.default_rng(11)
    C = rng.integers(0, 1000, (30, 12)).astype(float)
    r, c = linear_sum_assignment(C)
    rs, cs = scipy_lsa(C)
    assert len(r) == len(rs) == 12
    assert np.all(np.diff(r) > 0) or np.all(np.diff(c) > 0)
    assert abs(C[r, c].sum() - C[rs, cs].sum()) <= 1.0
    r, c = linear_sum_assignment(C, maximize=True)
    rs, cs = scipy_lsa(C, maximize=True)
    assert abs(C[r, c].sum() - C[rs, cs].sum()) <= 1.0


def test_keep_assignment_false_square_routes_and_solves():
    rng = np.random.default_rng(12)
    C = rng.integers(1, 500, (48, 48))
    res_keep = auction_solve(C, mode="device", keep_assignment=True)
    res_reset = auction_solve(C, mode="device", keep_assignment=False)
    assert res_keep["meta"]["obj"] == res_reset["meta"]["obj"] == \
        scipy_dense_objective(C.astype(float))
    # reset-per-phase re-auctions everything each phase: strictly more
    # rounds than the warm-started tiered driver on any multi-phase solve
    assert res_reset["meta"]["its"] != res_keep["meta"]["its"]


def test_batched_int_exact_large_costs():
    # costs large enough that vmax * (m+1) >= 2**26 routes to float64
    # int-exact; the batch paths must propagate int_exact (ADVICE medium).
    rng = np.random.default_rng(13)
    B, n = 3, 24
    base = 50_000_000
    mats = rng.integers(base, base + 10_000, (B, n, n))
    batched = batch_from_dense(mats)
    assert batched.int_exact
    sols, metas = auction_solve_batched(batched, mode="cpu")
    for b in range(B):
        assert metas[b]["soln_found"]
        assert isinstance(metas[b]["obj"], int)
        assert metas[b]["obj"] == scipy_dense_objective(
            mats[b].astype(float))


def test_batched_f64_device_mode_raises():
    rng = np.random.default_rng(14)
    mats = rng.random((2, 16, 16)) + 1.0
    batched = batch_from_dense(mats, dtype=np.float64)
    with pytest.raises(ValueError, match="host path"):
        auction_solve_batched(batched, mode="device")
    # auto must NOT resolve f64 to 'device' and then reject its own
    # routing -- it rides the cpu path (numpy gs_host works without g++).
    sols, metas = auction_solve_batched(batched, mode="auto")
    assert all(m["soln_found"] for m in metas)


def test_numpy_gs_engine_matches_oracle(monkeypatch):
    """The gs_host numpy engine, driven through the full hybrid cpu-mode
    flow (monkeypatched in), reproduces exact optima."""
    from sslap_tpu import gs_host, hybrid
    monkeypatch.setattr(hybrid, "_gs", gs_host.auction_gs_numpy)
    monkeypatch.setattr(hybrid, "_unassign",
                        gs_host.unassign_violators_numpy)
    rng = np.random.default_rng(15)
    # square int, sparse
    loc, val, dense = random_sparse_instance(rng, 40, 40, 0.3)
    res = auction_solve(loc=loc, val=val, shape=(40, 40), mode="cpu")
    assert res["meta"]["soln_found"]
    assert res["meta"]["obj"] == scipy_dense_objective(dense)
    # rectangular (dummy-bid branch) + max problem
    loc, val, dense = random_sparse_instance(rng, 12, 20, 0.5)
    res = auction_solve(loc=loc, val=val, shape=(12, 20), mode="cpu",
                        problem="max")
    assert res["meta"]["soln_found"]
    assert res["meta"]["obj"] == scipy_dense_objective(dense, maximize=True)


def test_float64_without_native_toolchain():
    """SSLAP_TPU_NO_NATIVE=1 + dtype=float64 must still solve (VERDICT
    hygiene item: f64 parity must not silently depend on g++)."""
    code = (
        "import numpy as np\n"
        "from sslap_tpu import auction_solve\n"
        "from sslap_tpu.hybrid import native_available\n"
        "assert not native_available()\n"
        "rng = np.random.default_rng(0)\n"
        "C = rng.random((24, 24)) + 1.0\n"
        "res = auction_solve(C, dtype=np.float64)\n"
        "assert res['meta']['soln_found']\n"
        "from scipy.optimize import linear_sum_assignment as lsa\n"
        "r, c = lsa(C)\n"
        "assert abs(res['meta']['obj'] - C[r, c].sum()) <= 1.0\n"  # eps-opt

    )
    env = dict(os.environ, SSLAP_TPU_NO_NATIVE="1", JAX_PLATFORMS="cpu")
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]


def test_hybrid_truncated_budget_reports_honestly():
    """If the device pass exits on the round budget before reaching
    eps_min, the hybrid meta must not claim eps_min-CS optimality
    (ADVICE low: hybrid.py square fast path)."""
    pytest.importorskip("sslap_tpu.native")
    from sslap_tpu.hybrid import native_available, solve_hybrid
    if not native_available():
        pytest.skip("no native toolchain")
    from sslap_tpu import ingest
    rng = np.random.default_rng(16)
    C = rng.integers(1, 100_000, (96, 96))
    prob = ingest.from_dense(C)
    sigma, prices, meta = solve_hybrid(prob, max_iter=1, mode="hybrid")
    assert (sigma >= 0).all()          # host GS still completes it
    if meta["final_eps"] > 1.0 / (96 + 1):
        assert not meta["soln_found"]
