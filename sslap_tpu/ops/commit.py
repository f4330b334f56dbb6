"""Pallas commit kernel (T4): conflict-resolving bid -> price scatter.

Reference ASSIGNMENT phase (SURVEY.md SS4.1): per column take the max bid
(ties -> lowest row id), raise the price, install the winner, evict the
previous owner.  The XLA path (auction.resolve_bids + commit_bids) uses two
scatter ops; this kernel keeps the price/owner tables VMEM-resident and
applies the bids with a scalar max-compare loop -- the scatter equivalent
of the bid kernel's gather loop (Mosaic has no vectorized scatter at all).

Processing order is by ascending bidder index with a strict > compare plus
equal-bid lower-row preference, which reproduces the documented
deterministic tie-break exactly.  Interpret-mode twin = CI oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sslap_tpu.auction import neg_sentinel


def _commit_kernel(tgt_ref, bid_ref, rowid_ref, best_in_ref, winner_in_ref,
                   best_ref, winner_ref):
    # best/winner inputs are aliased onto the outputs (same buffers); the
    # kernel reads and writes through the output refs only.
    del best_in_ref, winner_in_ref
    """Sequential max-scatter: for each bid i (ascending row id), update
    (best, winner) of its target column.  best/winner are input_output
    aliased so the tables persist in place."""
    nbids = tgt_ref.shape[0]
    m = best_ref.shape[0]

    def body(i, _):
        j = tgt_ref[i]

        @pl.when(j < m)
        def _():
            b = bid_ref[i]
            r = rowid_ref[i]
            cur = best_ref[j]
            cur_w = winner_ref[j]
            take = (b > cur) | ((b == cur) & (r < cur_w))
            best_ref[j] = jnp.where(take, b, cur)
            winner_ref[j] = jnp.where(take, r, cur_w)

        return 0

    lax.fori_loop(0, nbids, body, 0)


def commit_scatter_pallas(tgt, bid, row_ids, m: int, *,
                          interpret: bool = False):
    """Resolve bids into per-column (best, winner); same contract as
    auction.resolve_bids: best [m] (neg sentinel = no bid), winner [m]
    (int32 max = none)."""
    dtype = bid.dtype
    neg = neg_sentinel(dtype)
    best0 = jnp.full((m,), neg, dtype)
    winner0 = jnp.full((m,), 2 ** 31 - 1, jnp.int32)
    best, winner = pl.pallas_call(
        _commit_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m,), dtype),
            jax.ShapeDtypeStruct((m,), jnp.int32),
        ),
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(tgt, bid, row_ids, best0, winner0)
    return best, winner
