"""Kernel layer (T3/T4): Pallas TPU kernels for the auction hot ops.

bid.py    -- fused per-row top-2 + bid emission over the ELL layout
commit.py -- conflict-resolving bid->price commit
gs_kernel.py -- on-device Gauss-Seidel auction (VMEM price table)

Each kernel has an interpret-mode twin used as its correctness oracle in CI
(SURVEY.md SS6 'Race detection': Pallas kernels validated against the pure
XLA path).

Production status (honest, measured -- PERF.md): the bid kernel IS wired
into the Jacobi driver via ``resolve_bid_fn()`` (auction.solve_ell's
``bid_fn`` hook) but ships OPT-IN (``SSLAP_TPU_USE_PALLAS=1``) behind the
``pallas_bid_available()`` compile-and-match probe, because this stack's
Mosaic has no vectorized random gather: the kernel's scalar VMEM gather
(~350 ns/elem) loses to XLA's ~7 ns HBM gather, so XLA stays the default.
On a toolchain where the probe passes and the gather vectorizes, flipping
the env var moves the hot loop into the kernel with no code changes --
re-probe per toolchain update.
"""

import os

from sslap_tpu.ops.bid import bid_topk_pallas, pallas_bid_available
from sslap_tpu.ops.commit import commit_scatter_pallas
from sslap_tpu.ops.gs_kernel import gs_auction_device


def resolve_bid_fn():
    """Production kernel dispatch for auction.solve_ell's ``bid_fn`` hook:
    returns bid_topk_pallas when opted in (SSLAP_TPU_USE_PALLAS=1) and the
    runtime probe passes, else None (pure-XLA compute_bids)."""
    if os.environ.get("SSLAP_TPU_USE_PALLAS") != "1":
        return None
    if pallas_bid_available():
        return bid_topk_pallas
    return None


__all__ = [
    "bid_topk_pallas",
    "pallas_bid_available",
    "commit_scatter_pallas",
    "gs_auction_device",
    "resolve_bid_fn",
]
