"""Distribution tests (T7/T8) on a virtual 8-device CPU mesh
(SURVEY.md SS5.2 'Distributed without a real cluster'): the sharded path
must reproduce the unsharded result exactly (same deterministic tie-breaks);
the injectable combine is exercised hermetically."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sslap_tpu import auction_solve, ingest
from sslap_tpu import auction as _auction
from sslap_tpu.parallel import (
    auction_solve_sharded,
    make_mesh,
    pad_rows_for_mesh,
)
from tests.utils import random_sparse_instance, scipy_dense_objective


def _mesh(k=None):
    devs = jax.devices()
    if k is not None:
        devs = devs[:k]
    return make_mesh(devices=devs)


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"


@pytest.mark.parametrize("n,m", [(64, 64), (48, 64)])
def test_sharded_matches_unsharded_dense(n, m):
    rng = np.random.default_rng(0)
    C = rng.integers(0, 100, (n, m))
    single = auction_solve(C, mode="device")
    sharded = auction_solve_sharded(C, mesh=_mesh())
    assert sharded["meta"]["obj"] == single["meta"]["obj"]
    # identical tie-break rules across paths => identical assignments
    np.testing.assert_array_equal(sharded["sol"], single["sol"])


def test_sharded_sparse_vs_oracle():
    rng = np.random.default_rng(1)
    n, m = 96, 96
    loc, val, _ = random_sparse_instance(rng, n, m, 0.08)
    single = auction_solve(loc=loc, val=val, shape=(n, m),
                           mode="device")
    sharded = auction_solve_sharded(loc=loc, val=val, shape=(n, m),
                                    mesh=_mesh())
    assert sharded["meta"]["obj"] == single["meta"]["obj"]
    np.testing.assert_array_equal(sharded["sol"], single["sol"])


def test_sharded_mesh_size_1_equals_single():
    rng = np.random.default_rng(2)
    C = rng.integers(0, 100, (32, 32))
    single = auction_solve(C, mode="device")
    sharded = auction_solve_sharded(C, mesh=_mesh(1))
    np.testing.assert_array_equal(sharded["sol"], single["sol"])


def test_sharded_uneven_rows_padding():
    rng = np.random.default_rng(3)
    C = rng.integers(0, 100, (37, 41))  # 37 not divisible by 8
    sharded = auction_solve_sharded(C, mesh=_mesh())
    assert sharded["meta"]["obj"] == scipy_dense_objective(C)
    assert sharded["sol"].shape == (37,)


def test_pad_rows_for_mesh():
    prob = ingest.from_dense(np.ones((5, 8)))
    padded = pad_rows_for_mesh(prob, 4)
    assert padded.n == 8
    assert np.asarray(padded.nvalid)[5:].sum() == 0
    noop = pad_rows_for_mesh(padded, 4)
    assert noop.n == 8


def test_fake_combine_injection():
    """Round logic is testable hermetically with an injected combine
    (SURVEY.md SS5.2c): identity combine on a single 'shard' must equal the
    default path."""
    rng = np.random.default_rng(4)
    C = rng.integers(0, 50, (16, 16))
    prob = ingest.from_dense(C)
    vals_t = _auction.make_transform("min", prob.m, np.int32,
                                     float(C.max())).apply(prob.vals)
    calls = []

    def fake_combine(best, winner):
        calls.append(1)
        return best, winner

    res = _auction.solve_ell(
        prob.cols, vals_t, prob.valid, prob.nvalid,
        jnp.zeros((prob.m,), vals_t.dtype),
        eps0=100, eps_min=1, theta=5, max_iter=10_000,
        combine=fake_combine)
    assert calls, "combine was traced"
    base = _auction.solve_ell(
        prob.cols, vals_t, prob.valid, prob.nvalid,
        jnp.zeros((prob.m,), vals_t.dtype),
        eps0=100, eps_min=1, theta=5, max_iter=10_000)
    np.testing.assert_array_equal(np.asarray(res.sigma),
                                  np.asarray(base.sigma))


# ---- nnz-balanced partitioner + scaling instrumentation (round 2) ---------

def _skewed_instance(rng, n, m, heavy_rows=8, heavy_nnz=64, light_nnz=2):
    """First ``heavy_rows`` rows carry heavy_nnz entries, the rest a couple:
    contiguous by-rows splits put all heavy rows on shard 0."""
    rr, cc = [], []
    perm = rng.permutation(m)[:n]
    for i in range(n):
        k = heavy_nnz if i < heavy_rows else light_nnz
        cs = set(rng.integers(0, m, k).tolist()) | {int(perm[i])}
        rr.extend([i] * len(cs))
        cc.extend(sorted(cs))
    loc = np.stack([np.array(rr), np.array(cc)], 1)
    val = rng.integers(1, 100, len(rr))
    return loc, val


def test_partition_rows_nnz_balances_skew():
    from sslap_tpu.parallel import partition_rows, shard_nnz_counts
    rng = np.random.default_rng(21)
    loc, val = _skewed_instance(rng, 64, 80)
    prob = ingest.from_coo(loc, val, shape=(64, 80))
    by_rows, order0 = partition_rows(prob, 8, by="rows")
    by_nnz, order = partition_rows(prob, 8, by="nnz")
    assert order0 is None and order is not None
    s_rows = shard_nnz_counts(by_rows, 8)
    s_nnz = shard_nnz_counts(by_nnz, 8)
    assert s_rows.max() > 2.0 * s_rows.mean()     # the skew is real
    assert s_nnz.max() <= 1.1 * s_nnz.mean()      # and nnz-balancing fixes it
    # relabeling is a permutation of the padded rows
    assert sorted(order.tolist()) == list(range(by_nnz.n))


def test_sharded_nnz_partition_solves_correctly():
    rng = np.random.default_rng(22)
    loc, val = _skewed_instance(rng, 30, 40)
    prob_dense = np.full((30, 40), -1.0)
    prob_dense[loc[:, 0], loc[:, 1]] = val
    res = auction_solve_sharded(loc=loc, val=val, shape=(30, 40),
                                mesh=_mesh(), partition="nnz")
    assert res["meta"]["soln_found"]
    assert res["meta"]["obj"] == scipy_dense_objective(prob_dense)


def test_measure_round_breakdown_smoke():
    from sslap_tpu.parallel import measure_round_breakdown
    rng = np.random.default_rng(23)
    loc, val, dense = random_sparse_instance(rng, 64, 64, 0.2)
    prob = ingest.from_coo(loc, val, shape=(64, 64))
    out = measure_round_breakdown(prob, _mesh(), r1=2, r2=6)
    assert out["n_shards"] == len(jax.devices())
    assert out["round_s"] > 0 and out["compute_s"] > 0
    assert 0.0 <= out["comm_fraction"] <= 1.0
    assert out["nnz_imbalance"] >= 1.0


def test_api_mode_sharded_one_flag():
    """mode='sharded' / 'overlapped' reachable from the public entry point
    (VERDICT round-1 weak item 7)."""
    from sslap_tpu import auction_solve
    rng = np.random.default_rng(24)
    loc, val, dense = random_sparse_instance(rng, 32, 32, 0.25)
    res = auction_solve(loc=loc, val=val, shape=(32, 32), mode="sharded")
    assert res["meta"]["soln_found"]
    assert res["meta"]["obj"] == scipy_dense_objective(dense)
    res_o = auction_solve(loc=loc, val=val, shape=(32, 32),
                          mode="overlapped")
    assert res_o["meta"]["obj"] == scipy_dense_objective(dense)
