"""Unit tests for the tiered active-compaction layer (compact.py):
one compact round must produce exactly the same state transition as the
full-width reference round (auction.jacobi_round), and the truncated solve
must stay eps-CS-consistent for the host GS finisher."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from sslap_tpu import auction as A
from sslap_tpu import compact as C
from tests.utils import random_sparse_instance
from sslap_tpu import ingest as I


def _problem(seed=0, n=96, density=0.15):
    rng = np.random.default_rng(seed)
    loc, val, _ = random_sparse_instance(rng, n, n, density, integer=False)
    prob = I.from_coo(loc, val.astype(np.float32), shape=(n, n))
    vals_t = -jnp.asarray(prob.vals)     # min -> maximization
    return prob, vals_t


@pytest.mark.parametrize("Ccap", [32, 96])
def test_compact_round_matches_reference_round(Ccap):
    prob, vals_t = _problem()
    n = prob.n
    cols = jnp.asarray(prob.cols)
    valid = jnp.asarray(prob.valid)
    nvalid = jnp.asarray(prob.nvalid)
    vals_m = C.mask_vals(vals_t, valid)
    eps = jnp.float32(2.0)
    bigp = jnp.float32(200.0)
    prices = jnp.asarray(np.random.default_rng(1).random(n).astype(np.float32))
    owner = jnp.full((n,), -1, jnp.int32)
    sigma = jnp.full((n,), -1, jnp.int32)

    # Reference: full-width Jacobi round over ALL rows (all unassigned).
    p_ref, o_ref, s_ref = A.jacobi_round(
        cols, vals_t, valid, nvalid, prices, owner, sigma, eps, bigp)

    # Compact round over the same full active set (possibly in two chunks
    # is NOT equivalent; use full width in one compact buffer).
    ids = jnp.where(nvalid > 0, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    if Ccap < n:
        # restrict both sides to the first Ccap rows being active
        ids = jnp.where(jnp.arange(n) < Ccap, ids, jnp.int32(n))
        sig0 = jnp.where(jnp.arange(n) < Ccap, sigma, 0)  # mark others
        p_ref, o_ref, s_ref = A.jacobi_round(
            cols, vals_t, valid, nvalid, prices, owner,
            jnp.where(jnp.arange(n) < Ccap, -1, 0), eps, bigp)
    rowpack = C.build_rowpack(cols, vals_m, nvalid)
    p_c, o_c, s_c, new_ids, n_won, n_evi = C.compact_round(
        rowpack, prices, owner,
        jnp.full((n,), -1, jnp.int32) if Ccap >= n else
        jnp.where(jnp.arange(n) < Ccap, -1, 0),
        ids, eps, bigp)

    np.testing.assert_allclose(np.asarray(p_ref), np.asarray(p_c), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(o_ref), np.asarray(o_c))
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_c))
    # Active-list bookkeeping is consistent.
    assert int(n_won) == int((np.asarray(o_c) >= 0).sum())
    live_new = np.asarray(new_ids) < n
    stay_or_evicted = np.asarray(new_ids)[live_new]
    assert len(set(stay_or_evicted.tolist())) == live_new.sum()


def test_truncated_solve_completed_by_gs_reference():
    """solve_ell_tiered(trunc>0) leaves an eps-CS-consistent partial state:
    completing it with the (numpy mirror of the) GS auction at eps_min gives
    the scipy-optimal objective."""
    from tests.utils import scipy_sparse_objective
    rng = np.random.default_rng(3)
    n = 128
    loc, val, _ = random_sparse_instance(rng, n, n, 0.12, integer=False)
    prob = I.from_coo(loc, val.astype(np.float32), shape=(n, n))
    vals_t = -jnp.asarray(prob.vals)
    e0, e_min, theta = A.default_eps_schedule(np.float32, float(val.max()),
                                              n, 1)
    res, _ = C.solve_ell_tiered(
        jnp.asarray(prob.cols), vals_t, jnp.asarray(prob.valid),
        jnp.asarray(prob.nvalid), jnp.zeros((n,), jnp.float32),
        e0, e_min, theta, 100_000, trunc=8)
    # finish with the native GS (same bid semantics)
    from sslap_tpu.hybrid import native_available, ell_to_csr_transformed
    if not native_available():
        pytest.skip("native toolchain unavailable")
    from sslap_tpu.native import auction_gs
    indptr, indices, data = ell_to_csr_transformed(prob, -1, 1)
    bigp = np.float32(float(data.max() - data.min()) + 1.0)
    prices = np.array(res.prices)
    sigma = np.array(res.sigma)
    owner = np.full(n, -1, np.int32)
    a = sigma >= 0
    owner[sigma[a]] = np.nonzero(a)[0].astype(np.int32)
    bids = auction_gs(indptr, indices, data, prices, sigma, owner,
                      np.float32(e_min), bigp, 0, 10 ** 7)
    assert bids >= 0
    assert (sigma >= 0).all()
    dense_obj = 0.0
    colsA = np.asarray(prob.cols)
    valsA = np.asarray(prob.vals)
    validA = np.asarray(prob.valid)
    for i in range(n):
        k = np.argmax((colsA[i] == sigma[i]) & validA[i])
        dense_obj += float(valsA[i, k])
    oracle = scipy_sparse_objective(loc, val, n, n)
    assert abs(dense_obj - oracle) <= 1.0


def test_phase_chunked_resume_matches_single_call():
    """Running the tiered solve 2 phases at a time with state resume must
    reproduce the single-call solve exactly (phase boundaries are exact
    resume/checkpoint points)."""
    rng = np.random.default_rng(19)
    loc, val, _ = random_sparse_instance(rng, 96, 96, 0.15, integer=True)
    prob = I.from_coo(loc, val, shape=(96, 96))
    vals_t = -jnp.asarray(prob.vals) * 97      # min -> max, (m+1) scaling
    e0, e_min, theta = A.default_eps_schedule(np.int32, float(val.max()),
                                              96, 97)
    args = (jnp.asarray(prob.cols), vals_t, jnp.asarray(prob.valid),
            jnp.asarray(prob.nvalid), jnp.zeros((96,), jnp.int32),
            e0, e_min, theta, 100_000)
    ref, _ = C.solve_ell_tiered(*args)
    st = None
    for _ in range(20):
        res, st = C.solve_ell_tiered(*args, init_state=st, max_phases=2)
        if int(res.unassigned) == 0 and float(res.final_eps) <= e_min:
            break
    np.testing.assert_array_equal(np.asarray(ref.sigma), np.asarray(res.sigma))
    assert int(ref.rounds) == int(res.rounds)
    assert int(ref.phases) == int(res.phases)


# ---- line-packed RowPack (round 2: K-class packing, VERDICT item 2) -------

def test_np_rowpack_matches_device_rowpack():
    rng = np.random.default_rng(40)
    n, m, K = 37, 50, 6
    cols = rng.integers(0, m, (n, K)).astype(np.int32)
    vals = (rng.random((n, K)) * 100).astype(np.float32)
    valid = rng.random((n, K)) < 0.7
    nvalid = valid.sum(1).astype(np.int32)
    host = C.np_build_rowpack(cols, vals, valid, nvalid)
    dev = C.build_rowpack(jnp.asarray(cols),
                          C.mask_vals(jnp.asarray(vals), jnp.asarray(valid)),
                          jnp.asarray(nvalid))
    assert isinstance(host, C.RowPack) and isinstance(dev, C.RowPack)
    assert host.R == dev.R and host.W == dev.W
    np.testing.assert_array_equal(np.asarray(host.data), np.asarray(dev.data))
    # fetch_rows round-trips the packed rows
    ids = jnp.asarray(np.arange(n, dtype=np.int32))
    pk = C.fetch_rows(dev, ids)
    np.testing.assert_array_equal(np.asarray(pk[:, :K]), cols)


def test_rowpack_wide_rows_fall_back_to_plain():
    # W = 2K+1 > 64 -> R = 1 -> plain [n, W] array
    rng = np.random.default_rng(41)
    n, m, K = 10, 40, 40
    cols = rng.integers(0, m, (n, K)).astype(np.int32)
    vals = (rng.random((n, K)) * 100).astype(np.float32)
    valid = np.ones((n, K), bool)
    pk = C.np_build_rowpack(cols, vals, valid, valid.sum(1).astype(np.int32))
    assert not isinstance(pk, C.RowPack)
    assert pk.shape == (n, 2 * K + 1)


def test_solve_rowpack_tiered_equals_solve_ell_tiered():
    rng = np.random.default_rng(42)
    n = 150
    mask = rng.random((n, n)) < 0.15
    perm = rng.permutation(n); mask[np.arange(n), perm] = True
    M = np.where(mask, rng.integers(1, 500, (n, n)), -1).astype(np.int64)
    from sslap_tpu import ingest, auction as A
    prob = ingest.from_dense(M)
    vals = np.asarray(prob.vals); valid = np.asarray(prob.valid)
    vmax = float(np.abs(vals[valid]).max())
    tr = A.make_transform("min", n, vals.dtype, vmax)
    e0, emin, th = A.default_eps_schedule(vals.dtype, vmax, n, tr.scale)
    mi = A.default_max_iter(n)
    vt = tr.apply(prob.vals)
    res_a, _ = jax.jit(lambda *a: C.solve_ell_tiered(*a, e0, emin, th, mi))(
        prob.cols, vt, prob.valid, prob.nvalid, jnp.zeros((n,), vt.dtype))
    vals_t_np = vals * np.asarray(tr.sign * tr.scale, vals.dtype)
    rowpack = C.np_build_rowpack(np.asarray(prob.cols), vals_t_np, valid,
                                 np.asarray(prob.nvalid))
    bigp = float(vals_t_np[valid].max() - vals_t_np[valid].min()) + 1
    res_b, _ = jax.jit(lambda rp, nv, p0: C.solve_rowpack_tiered(
        rp, nv, p0, e0, emin, th, mi, bigp=bigp))(
        rowpack, jnp.asarray(np.asarray(prob.nvalid)),
        jnp.zeros((n,), vt.dtype))
    np.testing.assert_array_equal(np.asarray(res_a.sigma),
                                  np.asarray(res_b.sigma))


def test_rowpack_extreme_K_edges():
    """K=1 (W=3, R=42) and K=63 (W=127, R=1) pack/solve correctly."""
    from scipy.optimize import linear_sum_assignment as lsa
    rng = np.random.default_rng(43)
    # K=1: a permutation matrix pattern (each row one entry)
    n = 50
    perm = rng.permutation(n)
    loc = np.stack([np.arange(n), perm], 1)
    val = rng.integers(1, 100, n)
    prob = I.from_coo(loc, val, shape=(n, n))
    assert prob.K == 1
    from sslap_tpu import auction_solve
    res = auction_solve(loc=loc, val=val, shape=(n, n), mode="device")
    assert res["meta"]["soln_found"]
    np.testing.assert_array_equal(res["sol"], perm)
    # wide rows: K up to 63 still packs (R=1 plain fallback above W=64)
    n = 40
    mask = rng.random((n, n)) < 0.9
    mask[np.arange(n), rng.permutation(n)] = True
    M = np.where(mask, rng.integers(1, 100, (n, n)), -1).astype(float)
    prob2 = I.from_dense(M)
    res2 = auction_solve(M, mode="device")
    r, c = lsa(np.where(mask, M, 1e18))
    assert res2["meta"]["obj"] == int(M[r, c].sum())


def test_scatter_resolve_branch_matches_all_pairs():
    # pairs_resolve_max selects between the all-pairs resolve and the
    # scatter resolve (shared resolve_bids reduction); both must produce
    # the identical state transition.
    prob, vals_t = _problem(seed=5)
    n = prob.n
    cols = jnp.asarray(prob.cols)
    valid = jnp.asarray(prob.valid)
    nvalid = jnp.asarray(prob.nvalid)
    vals_m = C.mask_vals(vals_t, valid)
    rowpack = C.build_rowpack(cols, vals_m, nvalid)
    eps = jnp.float32(2.0)
    bigp = jnp.float32(200.0)
    prices = jnp.asarray(
        np.random.default_rng(2).random(n).astype(np.float32))
    owner = jnp.full((n,), -1, jnp.int32)
    sigma = jnp.full((n,), -1, jnp.int32)
    ids = jnp.where(nvalid > 0, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    out_pairs = C.compact_round(rowpack, prices, owner, sigma, ids, eps,
                                bigp, pairs_resolve_max=n + 1)
    out_scatter = C.compact_round(rowpack, prices, owner, sigma, ids, eps,
                                  bigp, pairs_resolve_max=0)
    for a, b in zip(out_pairs, out_scatter):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_exchange_scatter_branch_matches_all_pairs():
    # Same A/B for the sharded compact exchange (pairs_max flows through
    # auction_solve_sharded_hybrid): tiny pairs_max forces the scatter
    # path in every ladder round; the solve must be identical.
    from sslap_tpu.parallel import auction_solve_sharded_hybrid, make_mesh
    n = 512
    rng = np.random.default_rng(41)
    loc, val, _ = random_sparse_instance(rng, n, n, 0.03, integer=True)
    mesh = make_mesh(devices=jax.devices())
    a = auction_solve_sharded_hybrid(loc=loc, val=val, shape=(n, n),
                                     mesh=mesh, trunc=0,
                                     cardinality_check=False)
    b = auction_solve_sharded_hybrid(loc=loc, val=val, shape=(n, n),
                                     mesh=mesh, trunc=0, pairs_max=0,
                                     cardinality_check=False)
    np.testing.assert_array_equal(a["sol"], b["sol"])
    assert a["meta"]["obj"] == b["meta"]["obj"]


def test_default_tiers_fine_and_floor():
    t = C.default_tiers(2 ** 20)
    tf = C.default_tiers(2 ** 20, fine=True)
    tp = C.default_tiers(2 ** 20, fine=True, floor=256)
    # Descending, top tier = n, all unique.
    for ts in (t, tf, tp):
        assert ts[0] == 2 ** 20
        assert list(ts) == sorted(set(ts), reverse=True)
    # fine adds the 3*2^(k-1) tiers below 32768 that the default skips.
    assert 12288 not in t and 12288 in tf and 1536 in tf
    # floor prunes tiers at/below it (they are never entered when the
    # runtime trunc >= floor).
    assert min(tp) > 256 and 512 in tp
    assert all(x in tf for x in tp)
    # Program-size bookkeeping: pruning pays for most of the interleave.
    assert len(tp) <= len(t) + 4


def test_fine_ladder_parity():
    # Capacity only pads: every round bids ALL active rows regardless of
    # tier capacity, so sigma/prices must be BIT-identical for any ladder
    # (the fine/floor ladder included).  n=2048 exercises several
    # sub-32768 tiers where fine interleaving engages.
    rng = np.random.default_rng(7)
    n = 2048
    loc, val, _ = random_sparse_instance(rng, n, n, 0.01, integer=True)
    from sslap_tpu import ingest, auction as A2
    prob = ingest.from_coo(loc, val, shape=(n, n))
    vals = np.asarray(prob.vals); valid = np.asarray(prob.valid)
    vmax = float(np.abs(vals[valid]).max())
    tr = A2.make_transform("min", n, vals.dtype, vmax)
    e0, emin, th = A2.default_eps_schedule(vals.dtype, vmax, n, tr.scale)
    mi = A2.default_max_iter(n)
    vals_t_np = vals * np.asarray(tr.sign * tr.scale, vals.dtype)
    rowpack = C.np_build_rowpack(np.asarray(prob.cols), vals_t_np, valid,
                                 np.asarray(prob.nvalid))
    bigp = float(vals_t_np[valid].max() - vals_t_np[valid].min()) + 1
    nv = jnp.asarray(np.asarray(prob.nvalid))
    p0 = jnp.zeros((n,), jnp.asarray(vals_t_np).dtype)

    def run(tiers, trunc):
        res, st = jax.jit(lambda rp, nvv, pp: C.solve_rowpack_tiered(
            rp, nvv, pp, e0, emin, th, mi, bigp=bigp, trunc=trunc,
            tiers=tiers))(rowpack, nv, p0)
        return np.asarray(res.sigma), np.asarray(res.prices)

    # Run-to-completion (trunc=0): default vs fine ladder, no pruning.
    s_a, p_a = run(None, 0)
    s_b, p_b = run(C.default_tiers(n, fine=True), 0)
    np.testing.assert_array_equal(s_a, s_b)
    np.testing.assert_array_equal(p_a, p_b)
    # Truncated (trunc=64): default vs fine+floor-pruned ladder -- the
    # production combination (hybrid passes floor=trunc).
    s_c, p_c = run(None, 64)
    s_d, p_d = run(C.default_tiers(n, fine=True, floor=64), 64)
    np.testing.assert_array_equal(s_c, s_d)
    np.testing.assert_array_equal(p_c, p_d)


def test_hybrid_fine_ladder_solve_parity():
    # End-to-end: solve_hybrid(fine_ladder=True) must match the default
    # ladder bit-for-bit (sigma, prices, objective).
    rng = np.random.default_rng(11)
    n = 1024
    loc, val, _ = random_sparse_instance(rng, n, n, 0.02, integer=True)
    from sslap_tpu import ingest, hybrid as H
    prob = ingest.from_coo(loc, val, shape=(n, n))
    s_a, p_a, m_a = H.solve_hybrid(prob, fine_ladder=False)
    s_b, p_b, m_b = H.solve_hybrid(prob, fine_ladder=True)
    np.testing.assert_array_equal(s_a, s_b)
    np.testing.assert_array_equal(p_a, p_b)
