"""Real-TPU smoke suite (VERDICT round-1 weak item 6).

The main suite (tests/) pins JAX to a CPU-sim mesh for shard_map logic;
nothing there would catch a TPU-only lowering regression.  This suite runs
on whatever accelerator the environment provides (the axon-tunneled v5e
here) and checks the device solver paths end-to-end against exact oracles
at small shapes.

Run manually (NOT under tests/' conftest):  python -m pytest tests_tpu/ -q
One TPU process at a time -- stop any running bench first.
"""

import numpy as np
import pytest

from scipy.optimize import linear_sum_assignment as scipy_lsa


@pytest.fixture(scope="module")
def accel():
    import jax
    d = jax.devices()[0]
    if d.platform == "cpu":
        pytest.skip("no accelerator attached")
    return d


def test_device_mode_exact_vs_oracle(accel):
    from sslap_tpu import auction_solve
    rng = np.random.default_rng(0)
    C = rng.integers(1, 1000, (256, 256))
    res = auction_solve(C, mode="device", cardinality_check=False)
    r, c = scipy_lsa(C)
    assert res["meta"]["soln_found"]
    assert res["meta"]["obj"] == int(C[r, c].sum())


def test_device_candidates_engine_exact(accel):
    from sslap_tpu import auction_solve
    rng = np.random.default_rng(1)
    C = rng.integers(1, 1000, (256, 256))
    res = auction_solve(C, mode="device", engine="candidates",
                        cardinality_check=False)
    r, c = scipy_lsa(C)
    assert res["meta"]["obj"] == int(C[r, c].sum())


def test_hybrid_mode_exact(accel):
    from sslap_tpu import auction_solve
    from sslap_tpu.hybrid import native_available
    if not native_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(2)
    C = rng.integers(1, 1000, (300, 300))
    res = auction_solve(C, mode="hybrid", cardinality_check=False)
    r, c = scipy_lsa(C)
    assert res["meta"]["obj"] == int(C[r, c].sum())


def test_device_greedy_matching_smoke(accel):
    from sslap_tpu import ingest
    from sslap_tpu import feasibility_device as fd
    rng = np.random.default_rng(3)
    mat = np.where(rng.random((200, 220)) < 0.08,
                   rng.integers(1, 50, (200, 220)), -1).astype(float)
    prob = ingest.from_dense(mat)
    mr, mc = fd.greedy_matching(prob)
    rows = np.nonzero(mr >= 0)[0]
    assert (mat[rows, mr[rows]] >= 0).all()
    assert (mc[mr[rows]] == rows).all()
