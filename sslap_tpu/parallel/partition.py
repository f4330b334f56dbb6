"""Row partitioner (T2): split an ELL problem's rows over a mesh axis.

Two static strategies (SURVEY.md SS3b T2 "by rows or by nnz"):

  by='rows'  pad rows to a multiple of n_shards; shard s owns the contiguous
             block [s*n_local, (s+1)*n_local).  No relabeling; global row
             ids are shard_offset + local index.
  by='nnz'   additionally RELABEL rows so each contiguous block carries a
             near-equal share of nnz: rows are sorted by nnz descending and
             dealt to shards in serpentine (boustrophedon) order -- each
             group of n_shards consecutive rows contributes exactly one row
             per shard, alternating direction, so both row counts (exactly
             equal) and nnz sums (within one row's nnz of each other per
             group) balance even on heavily skewed instances.  Returns the
             relabeling so callers can un-permute the solution.

Padding rows have nvalid == 0 -- they never bid and are excluded from
unassigned counts (auction.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from sslap_tpu.ingest import ELLProblem


def pad_rows_for_mesh(prob: ELLProblem, n_shards: int) -> ELLProblem:
    """Pad rows up to a multiple of n_shards (no-op if already aligned)."""
    n = prob.n
    n_pad = (-n) % n_shards
    if n_pad == 0:
        return prob

    def pad0(a, fill):
        a = np.asarray(a)
        width = [(0, n_pad)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, width, constant_values=fill)

    return ELLProblem(
        cols=pad0(prob.cols, 0),
        vals=pad0(prob.vals, 0),
        valid=pad0(prob.valid, False),
        nvalid=pad0(prob.nvalid, 0),
        n=n + n_pad,
        m=prob.m,
        int_exact=prob.int_exact,
    )


def partition_rows(
    prob: ELLProblem,
    n_shards: int,
    by: str = "rows",
) -> Tuple[ELLProblem, Optional[np.ndarray]]:
    """Pad (and for by='nnz' relabel) rows for an n_shards row mesh.

    Returns (problem, row_order) where ``row_order[i_new] = original row``
    (None for by='rows', which keeps original order).  To map a solution
    back: ``sol_orig[row_order[i]] = sol_new[i]`` for real rows.
    """
    if by not in ("rows", "nnz"):
        raise ValueError(f"unknown partition strategy {by!r}")
    padded = pad_rows_for_mesh(prob, n_shards)
    if by == "rows":
        return padded, None

    nv = np.asarray(padded.nvalid)
    n_pad = padded.n
    # Stable heavy-first sort, then serpentine deal: group g of n_shards
    # rows sends its k-th heaviest to shard k (even g) or n_shards-1-k
    # (odd g).  Exactly n_pad / n_shards rows per shard.
    order = np.argsort(-nv, kind="stable")
    g = np.arange(n_pad) // n_shards
    pos = np.arange(n_pad) % n_shards
    shard = np.where(g % 2 == 0, pos, n_shards - 1 - pos)
    row_order = np.concatenate(
        [order[shard == s] for s in range(n_shards)])

    cols = np.asarray(padded.cols)[row_order]
    vals = np.asarray(padded.vals)[row_order]
    valid = np.asarray(padded.valid)[row_order]
    return ELLProblem(cols=cols, vals=vals, valid=valid,
                      nvalid=nv[row_order], n=n_pad, m=padded.m,
                      int_exact=padded.int_exact), row_order


def shard_nnz_counts(prob: ELLProblem, n_shards: int) -> np.ndarray:
    """Per-shard nnz sums of a (padded) contiguous row split -- load-balance
    diagnostic used by tests and the scaling instrumentation."""
    nv = np.asarray(prob.nvalid)
    assert prob.n % n_shards == 0
    return nv.reshape(n_shards, -1).sum(axis=1)
