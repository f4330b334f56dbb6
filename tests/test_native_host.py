"""Native host-runtime kernels (round 3 continuation): fused ELL->CSR and
eps-CS certificate statistics, A/B'd bit-for-bit against the numpy
formulations they replace (which materialize multi-GB temps at the 10M
scale config -- PERF.md round-3 table)."""

import numpy as np
import pytest

from sslap_tpu import ingest
from sslap_tpu.hybrid import ell_to_csr_transformed
from sslap_tpu.native import ell_to_csr_native, eps_cs_stats


def _random_ell(rng, n, m, K, dtype):
    cols = rng.integers(0, m, (n, K)).astype(np.int32)
    valid = rng.random((n, K)) < rng.uniform(0.1, 1.0)
    valid[rng.integers(0, n)] = False          # an all-invalid row
    if dtype == np.int32:
        vals = rng.integers(1, 10_000, (n, K)).astype(dtype)
    else:
        vals = ((rng.random((n, K)) - 0.3) * 1e3).astype(dtype)
    return cols, vals, valid


@pytest.mark.skipif(ell_to_csr_native is None, reason="no native toolchain")
@pytest.mark.parametrize("dtype,sign,scale", [(np.float32, -1, 1),
                                              (np.float64, 1, 1),
                                              (np.int32, -1, 3)])
def test_ell_to_csr_native_matches_numpy(dtype, sign, scale):
    rng = np.random.default_rng(50)
    for _ in range(5):
        n, m, K = int(rng.integers(2, 300)), int(rng.integers(2, 400)), \
            int(rng.integers(1, 9))
        cols, vals, valid = _random_ell(rng, n, m, K, dtype)
        out = ell_to_csr_native(cols, vals, valid,
                                vals.dtype.type(sign * scale),
                                int(valid.sum()))
        counts = valid.sum(axis=1).astype(np.int64)
        indptr = np.zeros(n + 1, np.int64)
        np.cumsum(counts, out=indptr[1:])
        indices = cols[valid].astype(np.int32)
        data = (vals[valid] * np.asarray(sign * scale, vals.dtype)).astype(
            vals.dtype)
        np.testing.assert_array_equal(out[0], indptr)
        np.testing.assert_array_equal(out[1], indices)
        np.testing.assert_array_equal(out[2], data)


@pytest.mark.skipif(ell_to_csr_native is None, reason="no native toolchain")
def test_ell_to_csr_transformed_wiring():
    # Through the hybrid entry (ELLProblem in, native path engaged) vs the
    # numpy formulation recomputed inline.
    rng = np.random.default_rng(51)
    n, m = 80, 110
    rows = np.repeat(np.arange(n), 5)
    cols = rng.integers(0, m, rows.shape[0])
    key = rows.astype(np.int64) * m + cols
    _, idx = np.unique(key, return_index=True)
    rows, cols = rows[idx], cols[idx]
    vals = (rng.random(rows.shape[0]) * 100 + 1).astype(np.float32)
    prob = ingest.from_coo(np.stack([rows, cols], 1), vals, shape=(n, m))
    ip, ix, d = ell_to_csr_transformed(prob, -1, 1)
    valid = np.asarray(prob.valid)
    np.testing.assert_array_equal(ix, np.asarray(prob.cols)[valid])
    np.testing.assert_array_equal(
        d, (np.asarray(prob.vals)[valid] * np.float32(-1)))
    assert ip[-1] == valid.sum() and ip.dtype == np.int64


@pytest.mark.skipif(eps_cs_stats is None, reason="no native toolchain")
def test_eps_cs_stats_matches_numpy():
    rng = np.random.default_rng(52)
    for _ in range(8):
        n, m, K = int(rng.integers(3, 300)), int(rng.integers(3, 400)), \
            int(rng.integers(1, 10))
        cols, vals, valid = _random_ell(rng, n, m, K, np.float32)
        prices = (rng.random(m) * 50).astype(np.float32)
        # sigma mixes assigned, unassigned (-1), and cols absent from the row
        sigma = rng.integers(-1, m, n).astype(np.int32)
        for ss in (np.float32(1), np.float32(-1)):
            v1n, curn, an, wmaxn = eps_cs_stats(cols, vals, valid, prices,
                                                sigma, ss)
            w = np.where(valid, vals * ss - prices[cols],
                         np.float32(-np.inf))
            v1 = w.max(axis=1)
            slot = np.argmax(cols == sigma[:, None], axis=1)[:, None]
            cur = np.take_along_axis(w, slot, axis=1)[:, 0]
            a = np.take_along_axis(vals, slot, axis=1)[:, 0]
            np.testing.assert_array_equal(v1n, v1)
            np.testing.assert_array_equal(curn, cur)
            np.testing.assert_array_equal(an, a)
            finite = np.isfinite(w)
            if finite.any():
                assert np.float32(wmaxn) == np.abs(w[finite]).max()
