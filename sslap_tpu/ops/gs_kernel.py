"""On-device Gauss-Seidel auction kernel (Pallas TPU).

Why this exists: the tail of every eps phase is serial eviction chains --
measured ~2.6 sequential rounds per row on random sparse instances -- and
no amount of vectorization helps work that is one bid deep at a time.  The
reference (and our native C++ GS, sslap_native.cpp) runs those chains on
the host at ~0.7 us/bid, *bound by DRAM latency on the random price-vector
accesses*.  On TPU the price table fits in VMEM (4 MB at m = 1M), where
random scalar access has deterministic few-cycle latency -- so a scalar
Gauss-Seidel loop inside one Pallas kernel can compete with a 2 GHz host
core at its own serial game, with zero tunnel transfers (this environment
pays up to seconds per MB of device->host readback).

The kernel is semantically identical to the C++ auction_gs (FIFO queue of
unassigned rows, lowest-column-index argmax tie-break, v2 = v1 - bigp for
single-entry rows), so device and host tails are interchangeable and
cross-validated in tests/test_ops.py.

Mosaic constraints (round-3 continuation IV): this stack lowers scalar
VMEM *loads* from rank-1 refs but rejects scalar VMEM *stores* ("Cannot
store scalars to VMEM"), and rejects scalar loads from 2-D refs at a
dynamic lane index ("cannot statically prove that index in dimension 1
is a multiple of 128").  So all mutable scalar state stays RANK-1 --
prices [m], owner [m], queue ring [cap], each padded to a 128 multiple
-- read with plain scalar loads (tbl[i]) and written via a 128-aligned
dynamic-slice row blend: load tbl[ds((i//128)*128, 128)], one-hot blend
the lane, store the row back (the explicit *128 offset is what Mosaic's
alignment prover accepts).

State in VMEM: prices [m_pad], owner [m_pad], queue ring [cap_pad].
Row ELL data (cols/vals) stays in HBM; each bid DMAs its row's K-entry
slices into double-buffered VMEM scratch, prefetching the next queued row
while the current row computes.  ``vals`` must be pre-masked (padding <=
-bigp) so no validity mask is needed in-kernel; queued rows must have >= 1
valid entry.  Square problems only (implicit dummies stay on XLA paths).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_L = 128


def _gs_kernel(counts_ref,           # SMEM i32 [3]: qcount, max_bids, cap
               fscal_ref,            # SMEM f32 [2]: eps, bigp
               cols_hbm,             # ANY  i32 [n, K]
               vals_hbm,             # ANY  f32 [n, K] (masked: pad = -big)
               queue_in, prices_in, owner_in,   # aliased onto outputs
               queue_io, prices_io, owner_io, stats_ref,
               cbuf, vbuf, sem):
    """stats_ref (SMEM i32 [2]): bids performed, rows left in queue.

    queue_io/prices_io/owner_io are rank-1, padded to 128 multiples (see
    module doc); ring arithmetic uses the LOGICAL capacity counts_ref[2].
    """
    del queue_in, prices_in, owner_in
    K = cols_hbm.shape[1]
    eps = fscal_ref[0]
    bigp = fscal_ref[1]
    qcount = counts_ref[0]
    max_bids = counts_ref[1]
    cap = counts_ref[2]               # logical ring capacity (<= padded)

    lane2d = jax.lax.broadcasted_iota(jnp.int32, (1, _L), 1)

    def blend_store(tbl, idx, value):
        """tbl[idx] = value via 128-aligned row load -> one-hot lane blend
        -> row store (Mosaic rejects scalar VMEM stores; the explicit *128
        offset is what its alignment prover accepts)."""
        base = (idx // _L) * _L
        row = tbl[pl.ds(base, _L)].reshape(1, _L)
        out = jnp.where(lane2d == idx - base, value, row)
        tbl[pl.ds(base, _L)] = out.reshape(_L)

    def copies(slot, r):
        return (
            pltpu.make_async_copy(cols_hbm.at[r], cbuf.at[slot],
                                  sem.at[0, slot]),
            pltpu.make_async_copy(vals_hbm.at[r], vbuf.at[slot],
                                  sem.at[1, slot]),
        )

    def start(slot, r):
        a, b = copies(slot, r)
        a.start()
        b.start()

    def wait(slot, r):
        a, b = copies(slot, r)
        a.wait()
        b.wait()

    def qread(i):
        return queue_io[i]

    @pl.when(qcount > 0)
    def _():
        start(0, qread(0))

    def cond(carry):
        head, tail, bids, _ = carry
        return (head != tail) & (bids < max_bids)

    def body(carry):
        head, tail, bids, slot = carry
        u = qread(head)
        head1 = head + 1
        head1 = jnp.where(head1 == cap, 0, head1)

        # Prefetch the next queued row while this one computes.
        @pl.when(head1 != tail)
        def _():
            start(1 - slot, qread(head1))

        wait(slot, u)

        # Scalar top-2 scan with direct ref indexing (Mosaic cannot lower
        # dynamic_slice on materialized vectors); ascending k keeps the
        # FIRST max, which is the lowest column index (ELL columns are
        # sorted) -- the documented deterministic tie-break, identical to
        # the C++ GS.  Padded slots (vals <= -bigp; real transformed vals
        # are always > -bigp since bigp = range + 1) are pinned to ``neg``
        # BEFORE the price subtract: a pad's raw w = pad - price lands
        # above neg * 0.5, which silently disabled the single-valid-entry
        # v2 substitution below for every K >= 2 row.
        neg = jnp.float32(-3e38)

        def scan(k, st):
            v1, v2, kb = st
            vk = vbuf[slot, k]
            c = cbuf[slot, k]
            w = jnp.where(vk > -bigp,
                          vk - prices_io[c], neg)
            better1 = w > v1
            v2n = jnp.where(better1, v1, jnp.maximum(v2, w))
            v1n = jnp.where(better1, w, v1)
            kbn = jnp.where(better1, k, kb)
            return v1n, v2n, kbn

        v1, v2, kb = lax.fori_loop(0, K, scan,
                                   (neg, neg, jnp.int32(0)))
        v2 = jnp.where(v2 > neg * 0.5, v2, v1 - bigp)
        jstar = cbuf[slot, kb]
        bid = vbuf[slot, kb] - v2 + eps

        prev = owner_io[jstar]
        tail1 = jnp.where(tail + 1 == cap, 0, tail + 1)

        @pl.when(prev >= 0)
        def _():
            blend_store(queue_io, tail, prev)
            # Queue was empty after this pop: the prefetcher must fetch
            # the row we just pushed instead.
            @pl.when(head1 == tail)
            def _():
                start(1 - slot, prev)

        new_tail = jnp.where(prev >= 0, tail1, tail)
        blend_store(prices_io, jstar, bid)
        blend_store(owner_io, jstar, u)
        return head1, new_tail, bids + 1, 1 - slot

    head, tail, bids, _ = lax.while_loop(
        cond, body, (jnp.int32(0), qcount, jnp.int32(0), jnp.int32(0)))
    stats_ref[0] = bids
    left = jnp.where(tail >= head, tail - head, tail - head + cap)
    stats_ref[1] = left


def _pad1d(vec, fill):
    """rank-1 [k] -> rank-1 padded to a 128 multiple (the in-kernel row
    blends address 128-aligned windows, which must stay in bounds)."""
    pad = (-vec.shape[0]) % _L
    if pad:
        vec = jnp.pad(vec, ((0, pad),), constant_values=fill)
    return vec


def gs_auction_device(cols, vals_masked, queue, qcount, prices, owner,
                      eps, bigp, max_bids, *, interpret: bool = False):
    """Run the GS auction kernel to queue exhaustion (or bid budget).

    Args:
      cols: int32 [n, K] ELL columns.
      vals_masked: f32 [n, K] transformed maximization values with padding
        entries <= -bigp (so they never win the top-2).
      queue: int32 [cap] ring, first ``qcount`` slots = unassigned row ids
        (each with >= 1 valid entry); cap >= n + 1.
      prices, owner: current dual/assignment state ([m] f32 / int32 where
        owner -1 = free).
      max_bids: safety budget (infeasible inputs stop here, reporting
        remaining > 0 instead of hanging).

    Returns (prices, owner, queue, bids_done, remaining_in_queue).
    """
    n, K = cols.shape
    m = prices.shape[0]
    cap = queue.shape[0]
    counts = jnp.stack([jnp.asarray(qcount, jnp.int32),
                        jnp.asarray(max_bids, jnp.int32),
                        jnp.asarray(cap, jnp.int32)])
    fscal = jnp.stack([jnp.asarray(eps, jnp.float32),
                       jnp.asarray(bigp, jnp.float32)])
    queue_p = _pad1d(queue, 0)
    prices_p = _pad1d(prices, 0)
    owner_p = _pad1d(owner, -1)
    queue_o, prices_o, owner_o, stats = pl.pallas_call(
        _gs_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(queue_p.shape, jnp.int32),
            jax.ShapeDtypeStruct(prices_p.shape, jnp.float32),
            jax.ShapeDtypeStruct(owner_p.shape, jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ),
        input_output_aliases={4: 0, 5: 1, 6: 2},
        scratch_shapes=[
            pltpu.VMEM((2, K), jnp.int32),
            pltpu.VMEM((2, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(counts, fscal, cols, vals_masked, queue_p, prices_p, owner_p)
    return (prices_o[:m], owner_o[:m],
            queue_o[:cap], stats[0], stats[1])
