"""On-device Gauss-Seidel auction kernel (Pallas TPU).

Why this exists: the tail of every eps phase is serial eviction chains --
measured ~2.6 sequential rounds per row on random sparse instances -- and
no amount of vectorization helps work that is one bid deep at a time.  The
reference (and our native C++ GS, sslap_native.cpp) runs those chains on
the host at ~0.2-0.7 us/bid, *bound by DRAM latency on the random price-
vector accesses*.  On TPU the price table fits in VMEM (4 MB at m = 1M),
where random access has deterministic few-cycle latency -- so a scalar
Gauss-Seidel loop inside one Pallas kernel can compete with a host core at
its own serial game, with zero tunnel transfers (this environment pays up
to seconds per MB of device->host readback).

The kernel is semantically identical to the C++ auction_gs (FIFO queue of
unassigned rows, lowest-column-index argmax tie-break, v2 = v1 - bigp for
single-entry rows), so device and host tails are interchangeable and
cross-validated in tests/test_ops.py.

Mosaic constraints (round-3 continuation IV, micro-probed on-chip):
  - scalar stores to VMEM: rejected ("Cannot store scalars to VMEM");
  - scalar loads from VMEM at a dynamic index: rejected, rank-1 and 2-D
    ("cannot statically prove that index ... is a multiple of 128");
  - dynamic ROW access on 2-D VMEM refs: fine;
  - vector->scalar reductions, and that scalar driving pl.when and DMA
    row indices: fine;
  - HBM memref slices must keep the lane dim 128-aligned: a DMA of one
    [K] ELL row (K < 128) is itself rejected.

A further rule found by micro-probe (benchmarks/probe_mosaic_gs.py):
dynamic 128-wide slices of RANK-1 VMEM refs are ALSO rejected ("multiple
of 512" -- the prover wants full-vreg alignment on rank-1), while
dynamic-ROW loads AND stores on 2-D [rows, 128] refs pass (the bid
kernel's primitives).  So every mutable scalar table lives as 2-D
[rows, 128] -- prices, owner, queue ring -- and every dynamic scalar
access is a row load (+ one-hot lane reduce) or a row load -> one-hot
lane blend -> row store.

HBM row data is LINE-PACKED: cols/vals [n, K] are flattened to [n*K] and
reshaped to [lines, 128]; row r's K entries live at flat [r*K, r*K + K),
spanning at most NL = (K + 254) // 128 consecutive lines.  Each bid DMAs
those NL whole lines per operand into double-buffered VMEM scratch,
prefetching the next queued row while the current row computes; the
in-row offset (r*K - line0*128) is recomputed at compute time and entries
are extracted by one-hot over the (NL, 128) scratch block.

``vals`` must be pre-masked (padding <= -bigp) so no validity mask is
needed in-kernel; queued rows must have >= 1 valid entry.  Square
problems only (implicit dummies stay on XLA paths).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_L = 128


def _gs_kernel(counts_ref,           # SMEM i32 [3]: qcount, max_bids, cap
               fscal_ref,            # SMEM f32 [2]: eps, bigp
               clines_hbm,           # ANY  i32 [lines, 128] (line-packed)
               vlines_hbm,           # ANY  f32 [lines, 128] (masked pads)
               queue_in, prices_in, owner_in,   # aliased onto outputs
               queue_io, prices_io, owner_io, stats_ref,
               cbuf, vbuf, sem, *, K: int, NL: int,
               prefetch: bool = True, _scan: str = "full"):
    """stats_ref (SMEM i32 [2]): bids performed, rows left in queue.

    queue_io/prices_io/owner_io are 2-D [rows, 128] scalar tables (see
    module doc); ring arithmetic uses the LOGICAL capacity counts_ref[2].
    cbuf/vbuf: [2 * NL, 128] double-buffered line scratch.
    """
    del queue_in, prices_in, owner_in
    eps = fscal_ref[0]
    bigp = fscal_ref[1]
    qcount = counts_ref[0]
    max_bids = counts_ref[1]
    cap = counts_ref[2]               # logical ring capacity (<= padded)

    lane2d = jax.lax.broadcasted_iota(jnp.int32, (1, _L), 1)
    # flat position of scratch element [j, l] = j*128 + l
    flat2d = (jax.lax.broadcasted_iota(jnp.int32, (NL, _L), 0) * _L
              + jax.lax.broadcasted_iota(jnp.int32, (NL, _L), 1))

    def lane_read(tbl2, idx, zero):
        """tbl2.flat[idx] via dynamic-row load -> one-hot lane reduce
        (Mosaic rejects dynamic-index scalar VMEM loads)."""
        r = idx // _L
        row = tbl2[r].reshape(1, _L)
        return jnp.sum(jnp.where(lane2d == idx - r * _L, row, zero))

    def blend_store(tbl2, idx, value):
        """tbl2.flat[idx] = value via dynamic-row load -> one-hot lane
        blend -> dynamic-row store (Mosaic rejects scalar VMEM stores)."""
        r = idx // _L
        row = tbl2[r].reshape(1, _L)
        out = jnp.where(lane2d == idx - r * _L, value, row)
        tbl2[r] = out.reshape(_L)

    def copies(slot, r):
        l0 = (r * K) // _L            # first line holding row r's entries
        return (
            pltpu.make_async_copy(clines_hbm.at[pl.ds(l0, NL)],
                                  cbuf.at[pl.ds(slot * NL, NL)],
                                  sem.at[0, slot]),
            pltpu.make_async_copy(vlines_hbm.at[pl.ds(l0, NL)],
                                  vbuf.at[pl.ds(slot * NL, NL)],
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
        return lane_read(queue_io, i, 0)

    if prefetch:
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

        if prefetch:
            # Prefetch the next queued row while this one computes.
            @pl.when(head1 != tail)
            def _():
                start(1 - slot, qread(head1))
        else:
            start(slot, u)

        wait(slot, u)

        # Scratch block -> materialized [NL, 128] (single-row dynamic
        # reads are the proven 2-D VMEM primitive).
        cmat = jnp.concatenate(
            [cbuf[slot * NL + j].reshape(1, _L) for j in range(NL)], axis=0)
        vmat = jnp.concatenate(
            [vbuf[slot * NL + j].reshape(1, _L) for j in range(NL)], axis=0)
        off0 = u * K - ((u * K) // _L) * _L   # row start within the block

        # Scalar top-2 scan, statically unrolled over the K ELL slots.
        # Strict `>` keeps the FIRST max, which is the lowest column index
        # (ELL columns are sorted) -- the documented deterministic
        # tie-break, identical to the C++ GS.  Padded slots (vals <=
        # -bigp; real transformed vals are always > -bigp since bigp =
        # range + 1) are pinned to ``neg`` BEFORE the price subtract: a
        # pad's raw w = pad - price lands above neg * 0.5, which silently
        # disabled the single-valid-entry v2 substitution below for every
        # K >= 2 row.
        neg = jnp.float32(-3e38)
        if _scan == "const":
            # Bisect stub: bid on the row's first entry with a fixed
            # increment (wrong auction, same memory/control pattern).
            sel0 = flat2d == off0
            jstar = jnp.sum(jnp.where(sel0, cmat, 0))
            bid = lane_read(prices_io, jstar, jnp.float32(0)) + eps
        else:
            v1 = neg
            v2 = neg
            jstar = jnp.int32(0)
            astar = neg
            for k in range(K):
                sel = flat2d == off0 + k
                ck = jnp.sum(jnp.where(sel, cmat, 0))
                vk = jnp.sum(jnp.where(sel, vmat, jnp.float32(0)))
                pk = (jnp.float32(0) if _scan == "noprices"
                      else lane_read(prices_io, ck, jnp.float32(0)))
                w = jnp.where(vk > -bigp, vk - pk, neg)
                better = w > v1
                v2 = jnp.where(better, v1, jnp.maximum(v2, w))
                v1 = jnp.where(better, w, v1)
                jstar = jnp.where(better, ck, jstar)
                astar = jnp.where(better, vk, astar)
            v2 = jnp.where(v2 > neg * 0.5, v2, v1 - bigp)
            bid = astar - v2 + eps

        prev = lane_read(owner_io, jstar, 0)
        tail1 = jnp.where(tail + 1 == cap, 0, tail + 1)

        @pl.when(prev >= 0)
        def _():
            blend_store(queue_io, tail, prev)
            if prefetch:
                # Queue was empty after this pop: the prefetcher must
                # fetch the row we just pushed instead.
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


def _pad2d(vec, fill):
    """rank-1 [k] -> 2-D [ceil(k/128), 128] scalar table (rank-1 VMEM
    refs reject dynamic 128-wide slices; 2-D dynamic-row access passes)."""
    pad = (-vec.shape[0]) % _L
    if pad:
        vec = jnp.pad(vec, ((0, pad),), constant_values=fill)
    return vec.reshape(-1, _L)


def _line_pack(arr2d, fill):
    """[n, K] -> [lines, 128] flat line packing (HBM DMA slices must keep
    the lane dim 128-aligned; a [K]-wide row DMA is rejected).  Padded with
    NL extra lines so the last row's NL-line DMA window stays in bounds."""
    n, K = arr2d.shape
    NL = (K + 2 * (_L - 1)) // _L
    flat = arr2d.reshape(-1)
    total = ((n * K + _L - 1) // _L + NL) * _L
    flat = jnp.pad(flat, ((0, total - n * K)), constant_values=fill)
    return flat.reshape(-1, _L), NL


def gs_auction_device(cols, vals_masked, queue, qcount, prices, owner,
                      eps, bigp, max_bids, *, interpret: bool = False,
                      prefetch: bool = True, _scan: str = "full"):
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
    if n * K >= 2 ** 31 - 2 * _L * ((K + 2 * (_L - 1)) // _L):
        raise ValueError(
            f"gs_auction_device: n*K = {n * K} overflows the kernel's "
            "int32 line arithmetic; shard rows first")
    counts = jnp.stack([jnp.asarray(qcount, jnp.int32),
                        jnp.asarray(max_bids, jnp.int32),
                        jnp.asarray(cap, jnp.int32)])
    fscal = jnp.stack([jnp.asarray(eps, jnp.float32),
                       jnp.asarray(bigp, jnp.float32)])
    clines, NL = _line_pack(cols.astype(jnp.int32), 0)
    vlines, _ = _line_pack(vals_masked.astype(jnp.float32), -3e38)
    queue_p = _pad2d(queue, 0)
    prices_p = _pad2d(prices, 0)
    owner_p = _pad2d(owner, -1)
    queue_o, prices_o, owner_o, stats = pl.pallas_call(
        functools.partial(_gs_kernel, K=K, NL=NL, prefetch=prefetch,
                          _scan=_scan),
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
            pltpu.VMEM((2 * NL, _L), jnp.int32),
            pltpu.VMEM((2 * NL, _L), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(counts, fscal, clines, vlines, queue_p, prices_p, owner_p)
    return (prices_o.reshape(-1)[:m], owner_o.reshape(-1)[:m],
            queue_o.reshape(-1)[:cap], stats[0], stats[1])
