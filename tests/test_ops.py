"""Kernel layer oracle tests (SURVEY.md SS5.2 'unit'): Pallas kernels in
interpret mode vs the pure-XLA reference implementations, including rows
with a single valid entry and duplicate-bid ties."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sslap_tpu import auction as A
from sslap_tpu.ops.bid import bid_topk_pallas
from sslap_tpu.ops.commit import commit_scatter_pallas


def _random_problem(rng, n, m, K, single_entry_rows=True):
    cols = rng.integers(0, m, (n, K)).astype(np.int32)
    vals = (rng.random((n, K)) * 100).astype(np.float32)
    valid = rng.random((n, K)) < 0.7
    valid[:, 0] = True  # no empty rows
    if single_entry_rows:
        valid[0, 1:] = False  # exercise the v2 = v1 - bigp branch
    # within-row sorted unique columns (the ingest invariant)
    for i in range(n):
        c = np.unique(cols[i][valid[i]])
        valid[i] = False
        valid[i, :len(c)] = True
        cols[i, :len(c)] = c
    nvalid = valid.sum(1).astype(np.int32)
    return (jnp.asarray(cols), jnp.asarray(vals), jnp.asarray(valid),
            jnp.asarray(nvalid))


@pytest.mark.parametrize("seed", [0, 1])
def test_bid_kernel_matches_xla(seed):
    rng = np.random.default_rng(seed)
    n, m, K = 96, 128, 6
    cols, vals, valid, nvalid = _random_problem(rng, n, m, K)
    prices = jnp.asarray((rng.random(m) * 10).astype(np.float32))
    sigma = jnp.asarray(
        np.where(rng.random(n) < 0.3, 1, -1).astype(np.int32))
    eps = jnp.float32(0.25)
    bigp = jnp.float32(101.0)
    t0, b0 = A.compute_bids(cols, vals, valid, nvalid, prices, sigma,
                            eps, bigp)
    t1, b1 = bid_topk_pallas(cols, vals, valid, nvalid, prices, sigma,
                             eps, bigp, block=32, interpret=True)
    assert np.array_equal(np.asarray(t0), np.asarray(t1))
    mask = np.asarray(t0) < m
    np.testing.assert_allclose(np.asarray(b0)[mask], np.asarray(b1)[mask],
                               rtol=1e-6)


def test_commit_kernel_matches_xla_with_ties():
    rng = np.random.default_rng(7)
    nb, m = 64, 32
    tgt = rng.integers(0, m + 1, nb).astype(np.int32)   # m = no bid
    bid = (rng.integers(0, 5, nb)).astype(np.float32)   # deliberate ties
    rows = np.arange(nb, dtype=np.int32)
    b0, w0 = A.resolve_bids(jnp.asarray(tgt), jnp.asarray(bid), m,
                            jnp.asarray(rows))
    b1, w1 = commit_scatter_pallas(jnp.asarray(tgt), jnp.asarray(bid),
                                   jnp.asarray(rows), m, interpret=True)
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))
    # best values only meaningful where a bid landed
    landed = np.asarray(w0) != 2 ** 31 - 1
    np.testing.assert_allclose(np.asarray(b0)[landed],
                               np.asarray(b1)[landed])


def test_bid_kernel_inside_round():
    """bid_fn hook: a full jacobi_round driven by the Pallas kernel
    (interpret) must match the XLA round bit-for-bit."""
    rng = np.random.default_rng(3)
    n = m = 64
    K = 5
    cols, vals, valid, nvalid = _random_problem(rng, n, m, K,
                                                single_entry_rows=False)
    prices = jnp.zeros((m,), jnp.float32)
    owner = jnp.full((m,), -1, jnp.int32)
    sigma = jnp.full((n,), -1, jnp.int32)
    eps = jnp.float32(1.0)
    bigp = jnp.float32(101.0)

    def bid_fn(cols, vals, valid, nvalid, prices, sigma, eps, bigp):
        return bid_topk_pallas(cols, vals, valid, nvalid, prices, sigma,
                               eps, bigp, block=32, interpret=True)

    ref = A.jacobi_round(cols, vals, valid, nvalid, prices, owner, sigma,
                         eps, bigp)
    got = A.jacobi_round(cols, vals, valid, nvalid, prices, owner, sigma,
                         eps, bigp, bid_fn=bid_fn)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gs_kernel_matches_native_gs():
    """Device GS kernel (interpret) vs native C++ GS: identical prices,
    owner, and bid count -- same FIFO order and tie-breaks."""
    from sslap_tpu.hybrid import native_available
    if not native_available():
        pytest.skip("native toolchain unavailable")
    from sslap_tpu.native import auction_gs as gs_host
    from sslap_tpu.ops.gs_kernel import gs_auction_device
    from sslap_tpu import ingest as I
    from sslap_tpu import hybrid as H

    rng = np.random.default_rng(5)
    n = m = 48
    from tests.utils import random_sparse_instance
    loc, val, _ = random_sparse_instance(rng, n, m, 0.15, integer=False)
    prob = I.from_coo(loc, val.astype(np.float32), shape=(n, m))
    indptr, indices, data = H.ell_to_csr_transformed(prob, -1, 1)
    bigp = float(data.max() - data.min()) + 1.0
    eps = 5.0

    # Host GS
    prices_h = np.zeros(m, np.float32)
    sigma_h = np.full(n, -1, np.int32)
    owner_h = np.full(m, -1, np.int32)
    bids_h = gs_host(indptr, indices, data, prices_h, sigma_h, owner_h,
                     np.float32(eps), np.float32(bigp), 0, 10 ** 7)

    # Device GS (interpret): vals masked with -2*bigp at padding.
    cols = np.asarray(prob.cols)
    vals_t = np.where(np.asarray(prob.valid),
                      np.asarray(prob.vals) * -1.0,
                      -2.0 * bigp).astype(np.float32)
    cap = n + 1
    queue = np.full(cap, -1, np.int32)
    queue[:n] = np.arange(n)
    prices_d, owner_d, _, bids_d, left = gs_auction_device(
        jnp.asarray(cols), jnp.asarray(vals_t), jnp.asarray(queue), n,
        jnp.zeros(m, jnp.float32), jnp.full((m,), -1, jnp.int32),
        eps, bigp, 10 ** 7, interpret=True)
    assert int(left) == 0
    assert int(bids_d) == int(bids_h)
    np.testing.assert_array_equal(np.asarray(owner_d), owner_h)
    np.testing.assert_allclose(np.asarray(prices_d), prices_h, rtol=1e-6)


def test_resolve_bid_fn_dispatch(monkeypatch):
    """Production kernel dispatch (VERDICT round-1 item 3): opt-in env var
    + probe gate routes solve_ell's bid_fn hook to the Pallas kernel."""
    from sslap_tpu import ops
    monkeypatch.delenv("SSLAP_TPU_USE_PALLAS", raising=False)
    assert ops.resolve_bid_fn() is None
    monkeypatch.setenv("SSLAP_TPU_USE_PALLAS", "1")
    monkeypatch.setattr(ops, "pallas_bid_available", lambda: True)
    assert ops.resolve_bid_fn() is ops.bid_topk_pallas
    monkeypatch.setattr(ops, "pallas_bid_available", lambda: False)
    assert ops.resolve_bid_fn() is None


def test_gs_kernel_single_entry_rows_match_native_gs():
    """Regression for the single-valid-entry rule (v2 = v1 - bigp): padded
    slots' raw w values used to defeat the substitution for K >= 2, so
    1-nnz rows bid a wrong amount.  Build a pattern that FORCES 1-nnz rows
    alongside multi-nnz ones and cross-check device vs native GS."""
    from sslap_tpu.hybrid import native_available
    if not native_available():
        pytest.skip("native toolchain unavailable")
    from sslap_tpu.native import auction_gs as gs_host
    from sslap_tpu.ops.gs_kernel import gs_auction_device
    from sslap_tpu import ingest as I
    from sslap_tpu import hybrid as H

    rng = np.random.default_rng(9)
    n = m = 24
    # rows 0..7: exactly one valid entry (the diagonal); rest: 4 entries
    locs = [(i, i) for i in range(8)]
    for i in range(8, n):
        cols_i = {i} | set(rng.integers(0, m, 3).tolist())
        locs += [(i, j) for j in cols_i]
    loc = np.array(sorted(set(locs)))
    val = rng.random(len(loc)).astype(np.float32) * 50 + 1
    prob = I.from_coo(loc, val, shape=(n, m))
    assert (np.asarray(prob.nvalid)[:8] == 1).all()
    indptr, indices, data = H.ell_to_csr_transformed(prob, -1, 1)
    bigp = float(data.max() - data.min()) + 1.0
    eps = 2.0

    prices_h = np.zeros(m, np.float32)
    sigma_h = np.full(n, -1, np.int32)
    owner_h = np.full(m, -1, np.int32)
    bids_h = gs_host(indptr, indices, data, prices_h, sigma_h, owner_h,
                     np.float32(eps), np.float32(bigp), 0, 10 ** 7)

    cols = np.asarray(prob.cols)
    vals_t = np.where(np.asarray(prob.valid),
                      np.asarray(prob.vals) * -1.0,
                      -2.0 * bigp).astype(np.float32)
    cap = n + 1
    queue = np.full(cap, -1, np.int32)
    queue[:n] = np.arange(n)
    prices_d, owner_d, _, bids_d, left = gs_auction_device(
        jnp.asarray(cols), jnp.asarray(vals_t), jnp.asarray(queue), n,
        jnp.zeros(m, jnp.float32), jnp.full((m,), -1, jnp.int32),
        eps, bigp, 10 ** 7, interpret=True)
    assert int(left) == 0
    assert int(bids_d) == int(bids_h)
    np.testing.assert_array_equal(np.asarray(owner_d), owner_h)
    np.testing.assert_allclose(np.asarray(prices_d), prices_h, rtol=1e-6)


@pytest.mark.parametrize("seed,n,m,K", [(0, 257, 300, 5), (1, 64, 64, 3),
                                        (2, 500, 1100, 9)])
def test_wide_w_bit_identical_to_scalar_gather(seed, n, m, K):
    # Window-gather wide round (ops/widebid.py, VERDICT r3 task 6): the
    # col-window-grouped one-hot gather + static sorted join must
    # reproduce vals - prices[cols] BIT-identically, including invalid
    # entries (whose routed value is ignored) and m not a multiple of 128.
    from sslap_tpu.ops.widebid import build_wide_layout, wide_w

    rng = np.random.default_rng(seed)
    cols = rng.integers(0, m, (n, K), dtype=np.int32)
    vals = (rng.random((n, K)) * 100).astype(np.float32)
    valid = rng.random((n, K)) < 0.85
    layout = build_wide_layout(cols, vals, valid, m)
    p = jnp.asarray(rng.random(m).astype(np.float32) * 100)
    ref = vals - np.asarray(p)[np.clip(cols, 0, m - 1)]
    got = np.asarray(jax.jit(lambda p: wide_w(layout, p))(p))
    np.testing.assert_array_equal(got[valid], ref[valid].astype(np.float32))
