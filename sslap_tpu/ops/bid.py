"""Pallas bid kernel (T3): fused price-gather + per-row top-2 + bid.

Reference hot loop: the per-row scan of ``a_ij - p_j`` with running best /
second-best (SURVEY.md SS4.1 BIDDING).  The pure-XLA path (auction.py:
compute_bids) materializes the gathered prices and the w matrix in HBM;
this kernel streams an ELL row block through VMEM, gathers prices from a
VMEM-resident price table, and emits (tgt, bid) per row -- one HBM pass
over the block, no intermediates.

Mosaic on this stack has no vectorized random gather (tpu.dynamic_gather
only lowers single-vreg shapes and at scalar speed), so the gather is an
explicit scalar loop into a VMEM scratch tile; everything downstream is
vector ops.  The kernel is therefore bandwidth/scalar-bound at roughly the
XLA gather's element rate -- its win is fusion (no w round-trip), not the
gather itself.  `pallas_bid_available()` probes compile+run viability at
import of the fast path; callers fall back to compute_bids.

Interpret-mode twin (`interpret=True`) doubles as the CI oracle vs
compute_bids on CPU (tests/test_ops.py).
"""

from __future__ import annotations

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sslap_tpu.auction import neg_sentinel

_DEF_BLOCK = 512


def _bid_kernel(scal_ref, prices_ref, cols_ref, vals_ref, valid_ref,
                nvalid_ref, sigma_ref, tgt_ref, bid_ref, w_scratch):
    """One grid step = one [B, K] ELL row block.

    scal_ref (SMEM): [4] = (eps, bigp, m_as_dtype, unused)
    prices_ref (VMEM): [m] price table, resident across grid steps
    outputs: tgt [B] int32 (m = no bid), bid [B]
    """
    B, K = cols_ref.shape
    eps = scal_ref[0]
    bigp = scal_ref[1]
    dtype = vals_ref.dtype
    neg = neg_sentinel(dtype)

    cols = cols_ref[:]
    # Scalar gather loop: w_scratch[b, k] = prices[cols[b, k]].
    def gather_body(i, _):
        b = i // K
        k = i % K
        c = cols_ref[b, k]
        w_scratch[b, k] = prices_ref[c]
        return 0

    lax.fori_loop(0, B * K, gather_body, 0)

    vals = vals_ref[:]
    valid = valid_ref[:] != 0
    w = jnp.where(valid, vals - w_scratch[:], neg)          # [B, K]
    slot = jnp.argmax(w, axis=1)
    onehot = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1) == slot[:, None]
    v1 = jnp.max(w, axis=1)
    v2 = jnp.max(jnp.where(onehot, neg, w), axis=1)
    nv = nvalid_ref[:]
    v2 = jnp.where(nv >= 2, v2, v1 - bigp)
    a_star = jnp.sum(jnp.where(onehot, vals, jnp.zeros_like(vals)), axis=1)
    jstar = jnp.sum(jnp.where(onehot, cols, 0), axis=1).astype(jnp.int32)

    bidding = (sigma_ref[:] < 0) & (nv > 0)
    # Non-bidders emit the 2**30 sentinel (the wrapper maps it to m; m is
    # not passed in to keep the scalar args dtype-homogeneous).
    tgt_ref[:] = jnp.where(bidding, jstar, jnp.int32(2 ** 30))
    bid_ref[:] = a_star - v2 + eps


def _pallas_bid_call(cols, vals_t, valid, nvalid, sigma, prices, eps, bigp,
                     block: int, interpret: bool):
    n, K = cols.shape
    m = prices.shape[0]
    dtype = vals_t.dtype
    n_pad = (-n) % block
    if n_pad:
        cols = jnp.pad(cols, ((0, n_pad), (0, 0)))
        vals_t = jnp.pad(vals_t, ((0, n_pad), (0, 0)))
        valid = jnp.pad(valid, ((0, n_pad), (0, 0)))
        nvalid = jnp.pad(nvalid, ((0, n_pad),))
        sigma = jnp.pad(sigma, ((0, n_pad),), constant_values=0)
    npad = cols.shape[0]
    scal = jnp.stack([jnp.asarray(eps, dtype), jnp.asarray(bigp, dtype),
                      jnp.asarray(0, dtype), jnp.asarray(0, dtype)])
    grid = npad // block
    tgt, bid = pl.pallas_call(
        _bid_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((block, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((npad,), jnp.int32),
            jax.ShapeDtypeStruct((npad,), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((block, K), dtype)],
        interpret=interpret,
    )(scal, prices, cols, vals_t, valid.astype(jnp.int8), nvalid, sigma)
    # Kernel emits 2**30 for non-bidders; the contract uses m.
    tgt = jnp.where(tgt == 2 ** 30, jnp.int32(m), tgt)[:n]
    bid = bid[:n]
    return tgt, bid


def bid_topk_pallas(cols, vals_t, valid, nvalid, prices, sigma, eps, bigp,
                    *, block: int = _DEF_BLOCK, interpret: bool = False):
    """Drop-in replacement for auction.compute_bids (same signature order as
    the bid_fn hook in auction.jacobi_round)."""
    return _pallas_bid_call(cols, vals_t, valid, nvalid, sigma, prices,
                            eps, bigp, block=block, interpret=interpret)


@functools.lru_cache(maxsize=1)
def pallas_bid_available() -> bool:
    """Probe whether the kernel compiles and matches the XLA path on this
    backend (Mosaic rejects some lowerings per stack; see module doc)."""
    try:
        from sslap_tpu import auction as _a
        rng = np.random.default_rng(0)
        n, m, K = 64, 96, 4
        cols = jnp.asarray(rng.integers(0, m, (n, K), dtype=np.int32))
        vals = jnp.asarray(rng.random((n, K), np.float32) * 10)
        valid = jnp.asarray(rng.random((n, K)) < 0.8)
        nvalid = valid.sum(1).astype(jnp.int32)
        prices = jnp.asarray(rng.random(m, np.float32))
        sigma = jnp.full((n,), -1, jnp.int32)
        eps = jnp.float32(0.5)
        bigp = jnp.float32(11.0)
        t1, b1 = jax.jit(
            lambda: bid_topk_pallas(cols, vals, valid, nvalid, prices,
                                    sigma, eps, bigp, block=32))()
        t0, b0 = _a.compute_bids(cols, vals, valid, nvalid, prices, sigma,
                                 eps, bigp)
        mask = np.asarray(t0) < m
        return bool(np.array_equal(np.asarray(t0), np.asarray(t1)) and
                    np.allclose(np.asarray(b0)[mask], np.asarray(b1)[mask],
                                rtol=1e-6))
    except Exception:
        return False
