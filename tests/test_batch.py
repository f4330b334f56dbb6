"""Batched solve tests (T9; BASELINE config 3 shape): vmapped batch equals
per-instance solves."""

import numpy as np
import pytest

from sslap_tpu import auction_solve, ingest
from sslap_tpu.batch import auction_solve_batched, batch_from_dense, stack_problems
from tests.utils import random_sparse_instance, scipy_dense_objective


def test_batched_dense_matches_single():
    rng = np.random.default_rng(0)
    B, n, m = 6, 24, 24
    mats = rng.integers(0, 100, (B, n, m))
    prob = batch_from_dense(mats)
    sols, metas = auction_solve_batched(prob)
    for b in range(B):
        single = auction_solve(mats[b])
        assert metas[b]["soln_found"]
        assert metas[b]["obj"] == single["meta"]["obj"]
        assert metas[b]["obj"] == scipy_dense_objective(mats[b])


def test_batched_sparse_mixed_difficulty():
    """Instances converging at different round counts in one batch."""
    rng = np.random.default_rng(1)
    n, m = 32, 32
    probs, oracles = [], []
    for b in range(4):
        loc, val, dense = random_sparse_instance(rng, n, m, 0.1 + 0.1 * b)
        probs.append(ingest.from_coo(loc, val, shape=(n, m)))
        oracles.append(auction_solve(loc=loc, val=val, shape=(n, m))["meta"]["obj"])
    batched = stack_problems(probs)
    sols, metas = auction_solve_batched(batched)
    for b in range(4):
        assert metas[b]["obj"] == oracles[b]


def test_batched_max_problem():
    rng = np.random.default_rng(2)
    B, n, m = 3, 16, 20
    mats = rng.integers(0, 50, (B, n, m))
    prob = batch_from_dense(mats)
    sols, metas = auction_solve_batched(prob, problem="max")
    for b in range(B):
        oracle = scipy_dense_objective(mats[b], maximize=True)
        assert metas[b]["obj"] == oracle


def test_stack_shape_mismatch_raises():
    a = ingest.from_dense(np.ones((2, 2)))
    b = ingest.from_dense(np.ones((3, 3)))
    with pytest.raises(ValueError, match="share"):
        stack_problems([a, b])


def test_batched_sharded_over_mesh():
    """Batch axis sharded over an 8-device mesh must reproduce the
    unsharded batched results exactly (DP over instances, T9)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from sslap_tpu import ingest
    from sslap_tpu.batch import auction_solve_batched, stack_problems
    from tests.utils import random_sparse_instance

    rng = np.random.default_rng(21)
    B, n = 8, 48
    probs = []
    for b in range(B):
        loc, val, _ = random_sparse_instance(rng, n, n, 0.2)
        probs.append(ingest.from_coo(loc, val, shape=(n, n), pad_to=16))
    batched = stack_problems(probs)
    sols_ref, metas_ref = auction_solve_batched(batched)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("batch",))
    sols_sh, metas_sh = auction_solve_batched(batched, mesh=mesh)
    np.testing.assert_array_equal(sols_ref, sols_sh)
    for a, b_ in zip(metas_ref, metas_sh):
        assert a["obj"] == b_["obj"]


def test_batched_cpu_mode_matches_device():
    import numpy as np
    from sslap_tpu import ingest
    from sslap_tpu.batch import auction_solve_batched, stack_problems
    from tests.utils import random_sparse_instance

    rng = np.random.default_rng(31)
    probs = []
    for b in range(4):
        loc, val, _ = random_sparse_instance(rng, 40, 40, 0.2, integer=True)
        probs.append(ingest.from_coo(loc, val, shape=(40, 40), pad_to=14))
    batched = stack_problems(probs)
    s_dev, m_dev = auction_solve_batched(batched, mode="device")
    try:
        s_cpu, m_cpu = auction_solve_batched(batched, mode="cpu")
    except AssertionError:
        import pytest
        pytest.skip("native toolchain unavailable")
    for a, b_ in zip(m_dev, m_cpu):
        assert a["obj"] == b_["obj"]


def test_batched_rectangular():
    import numpy as np
    from sslap_tpu import ingest
    from sslap_tpu.batch import auction_solve_batched, stack_problems
    from tests.utils import random_sparse_instance, scipy_sparse_objective

    rng = np.random.default_rng(41)
    n, m = 24, 32
    probs, oracles = [], []
    for b in range(3):
        loc, val, _ = random_sparse_instance(rng, n, m, 0.3, integer=True)
        probs.append(ingest.from_coo(loc, val, shape=(n, m), pad_to=16))
        oracles.append(scipy_sparse_objective(loc, val, n, m))
    batched = stack_problems(probs)
    sols, metas = auction_solve_batched(batched, mode="device")
    for mt, orc in zip(metas, oracles):
        assert mt["soln_found"]
        assert mt["obj"] == orc


# ---- dense-chunk batched hybrid (round 2: VERDICT item 4) -----------------

def test_batched_dense_hybrid_matches_oracle():
    pytest.importorskip("sslap_tpu.native")
    from sslap_tpu.hybrid import native_available
    if not native_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(31)
    B, n = 5, 48
    probs = []
    denses = []
    for b in range(B):
        loc, val, dense = random_sparse_instance(rng, n, n, 0.2)
        probs.append(ingest.from_coo(loc, val, shape=(n, n), pad_to=24))
        denses.append(dense)
    batched = stack_problems(probs)
    sols, metas = auction_solve_batched(batched, mode="hybrid", chunk=2)
    assert len(metas) == B
    for b in range(B):
        assert metas[b]["soln_found"], metas[b]
        assert metas[b]["mode"] == "dense-hybrid"
        assert metas[b]["obj"] == scipy_dense_objective(denses[b])
    # agrees with the cpu engine exactly (int costs)
    sols_cpu, metas_cpu = auction_solve_batched(batched, mode="cpu")
    for b in range(B):
        assert metas[b]["obj"] == metas_cpu[b]["obj"]


def test_batched_dense_hybrid_max_and_float():
    pytest.importorskip("sslap_tpu.native")
    from sslap_tpu.hybrid import native_available
    if not native_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(32)
    B, n = 3, 40
    probs, denses = [], []
    for b in range(B):
        loc, val, dense = random_sparse_instance(rng, n, n, 0.3,
                                                 integer=False)
        probs.append(ingest.from_coo(loc, val, shape=(n, n), pad_to=20))
        denses.append(dense)
    batched = stack_problems(probs)
    sols, metas = auction_solve_batched(batched, mode="hybrid",
                                        problem="max")
    for b in range(B):
        assert metas[b]["soln_found"]
        gap = abs(metas[b]["obj"] -
                  scipy_dense_objective(denses[b], maximize=True))
        assert gap <= n * metas[b]["final_eps"] + 1e-3
