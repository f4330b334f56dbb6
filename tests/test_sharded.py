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
    single = auction_solve(C)
    sharded = auction_solve_sharded(C, mesh=_mesh())
    assert sharded["meta"]["obj"] == single["meta"]["obj"]
    # identical tie-break rules across paths => identical assignments
    np.testing.assert_array_equal(sharded["sol"], single["sol"])


def test_sharded_sparse_vs_oracle():
    rng = np.random.default_rng(1)
    n, m = 96, 96
    loc, val, _ = random_sparse_instance(rng, n, m, 0.08)
    single = auction_solve(loc=loc, val=val, shape=(n, m))
    sharded = auction_solve_sharded(loc=loc, val=val, shape=(n, m),
                                    mesh=_mesh())
    assert sharded["meta"]["obj"] == single["meta"]["obj"]
    np.testing.assert_array_equal(sharded["sol"], single["sol"])


def test_sharded_mesh_size_1_equals_single():
    rng = np.random.default_rng(2)
    C = rng.integers(0, 100, (32, 32))
    single = auction_solve(C)
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
