"""Ingest layer tests (T1): COO/dense -> ELL round-trips, forbidden-entry
masking, validation errors, native vs numpy builder agreement."""

import numpy as np
import pytest

from sslap_tpu import ingest


def test_dense_roundtrip():
    mat = np.array([[1.0, -1.0, 3.0],
                    [-1.0, 5.0, 0.0]])
    prob = ingest.from_dense(mat)
    assert prob.n == 2 and prob.m == 3
    assert prob.nnz == 4
    back = ingest.to_dense(prob, forbidden_value=-1.0)
    np.testing.assert_array_equal(back, mat)


def test_dense_nan_is_forbidden():
    mat = np.array([[1.0, np.nan], [2.0, 3.0]])
    prob = ingest.from_dense(mat)
    assert prob.nnz == 3
    assert not np.asarray(prob.valid)[0, 1]


def test_coo_roundtrip_and_sorted_cols():
    loc = np.array([[1, 2], [0, 1], [0, 0], [1, 0]])
    val = np.array([4.0, 2.0, 1.0, 3.0])
    prob = ingest.from_coo(loc, val)
    assert (prob.n, prob.m) == (2, 3)
    cols = np.asarray(prob.cols)
    valid = np.asarray(prob.valid)
    # within-row ascending column order (deterministic tie-break contract)
    for i in range(prob.n):
        cs = cols[i][valid[i]]
        assert (np.diff(cs) > 0).all()
    back = ingest.to_dense(prob, forbidden_value=-1.0)
    expected = np.array([[1.0, 2.0, -1.0], [3.0, -1.0, 4.0]])
    np.testing.assert_array_equal(back, expected)


def test_coo_duplicate_raises():
    loc = np.array([[0, 0], [0, 0]])
    with pytest.raises(ValueError, match="duplicate"):
        ingest.from_coo(loc, np.array([1.0, 2.0]), shape=(1, 1))


def test_coo_negative_cost_raises():
    with pytest.raises(ValueError, match=">= 0"):
        ingest.from_coo(np.array([[0, 0]]), np.array([-1.0]), shape=(1, 1))


def test_coo_out_of_bounds_raises():
    with pytest.raises(ValueError, match="out of bounds"):
        ingest.from_coo(np.array([[0, 5]]), np.array([1.0]), shape=(1, 2))


def test_rows_exceed_cols_raises():
    with pytest.raises(ValueError, match="transpose"):
        ingest.from_dense(np.ones((3, 2)))


def test_dtype_selection():
    p_int = ingest.from_dense(np.array([[1, 2], [3, 4]], np.int64))
    assert np.asarray(p_int.vals).dtype == np.int32
    p_f = ingest.from_dense(np.array([[1.0, 2.0], [3.0, 4.0]]))
    assert np.asarray(p_f.vals).dtype == np.float32


def test_csr_ingest():
    indptr = np.array([0, 2, 3])
    indices = np.array([0, 2, 1])
    data = np.array([5.0, 6.0, 7.0])
    prob = ingest.from_csr(indptr, indices, data, shape=(2, 3))
    back = ingest.to_dense(prob, forbidden_value=-1.0)
    expected = np.array([[5.0, -1.0, 6.0], [-1.0, 7.0, -1.0]])
    np.testing.assert_array_equal(back, expected)


def test_native_matches_numpy_builder():
    from sslap_tpu.ingest import _native_builder
    native = _native_builder()
    if native is None:
        pytest.skip("native builder unavailable")
    rng = np.random.default_rng(0)
    n, m, nnz = 37, 53, 400
    # unique (r, c) pairs
    flat = rng.choice(n * m, size=nnz, replace=False)
    rr, cc = (flat // m).astype(np.int64), (flat % m).astype(np.int64)
    vv = rng.random(nnz).astype(np.float32)
    import os
    os.environ["SSLAP_TPU_NO_NATIVE"] = "1"
    try:
        import importlib
        # direct numpy path: call internal builder with native disabled via
        # monkeypatching the lazy lookup
        from sslap_tpu import ingest as ing
        loc = np.stack([rr, cc], 1)
        prob_native = ing.from_coo(loc, vv, shape=(n, m))
        orig = ing._native_builder
        ing._native_builder = lambda: None
        try:
            prob_np = ing.from_coo(loc, vv, shape=(n, m))
        finally:
            ing._native_builder = orig
    finally:
        del os.environ["SSLAP_TPU_NO_NATIVE"]
    np.testing.assert_array_equal(np.asarray(prob_native.cols),
                                  np.asarray(prob_np.cols))
    np.testing.assert_array_equal(np.asarray(prob_native.vals),
                                  np.asarray(prob_np.vals))
    np.testing.assert_array_equal(np.asarray(prob_native.valid),
                                  np.asarray(prob_np.valid))
    np.testing.assert_array_equal(np.asarray(prob_native.nvalid),
                                  np.asarray(prob_np.nvalid))
