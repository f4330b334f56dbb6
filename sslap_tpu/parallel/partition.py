"""Row partitioner (T2): pad an ELL problem so rows split evenly over a
mesh axis.  Padding rows have nvalid == 0 -- they never bid and are excluded
from unassigned counts (auction.py).  Balanced-by-rows is the static default;
rows are contiguous so global row ids are shard_offset + local index.
"""

from __future__ import annotations

import numpy as np

from sslap_tpu.ingest import ELLProblem


def pad_rows_for_mesh(prob: ELLProblem, n_shards: int) -> ELLProblem:
    """Pad rows up to a multiple of n_shards (no-op if already aligned)."""
    n = prob.n
    n_pad = (-n) % n_shards
    if n_pad == 0:
        return prob
    K = prob.K

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
    )
