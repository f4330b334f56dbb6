"""Kernel layer (T3/T4): Pallas TPU kernels for the auction hot ops.

bid.py    -- fused per-row top-2 + bid emission over the ELL layout
commit.py -- conflict-resolving bid->price commit

Each kernel has an interpret-mode twin used as its correctness oracle in CI
(SURVEY.md SS6 'Race detection': Pallas kernels validated against the pure
XLA path).  Kernel availability is probed at runtime -- this environment's
Mosaic toolchain rejects several lowering patterns -- and callers fall back
to the pure-XLA implementations in auction.py transparently.
"""

from sslap_tpu.ops.bid import bid_topk_pallas, pallas_bid_available
from sslap_tpu.ops.commit import commit_scatter_pallas
from sslap_tpu.ops.gs_kernel import gs_auction_device

__all__ = [
    "bid_topk_pallas",
    "pallas_bid_available",
    "commit_scatter_pallas",
    "gs_auction_device",
]
