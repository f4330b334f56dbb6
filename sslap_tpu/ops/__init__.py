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
``pallas_bid_available()`` compile-and-match probe.  Round 3 replaced the
scalar-VMEM gather (which Mosaic rejects outright) with a window-row-load
+ one-hot lane-select formulation that LOWERS on this stack (bid.py
module doc); the probe now runs in a timeout-guarded subprocess because a
rejected lowering once took the axon remote-compile tunnel down with the
probing process.  XLA stays the production default: the kernel's
per-element cost is one VMEM row load + row store + one-hot select,
which cannot beat XLA's ~7 ns HBM scalar gather on this part.
On a toolchain where the in-kernel gather beats XLA's, flipping the env
var moves the hot loop into the kernel with no code changes -- re-probe
per toolchain update.

Scope (why the TIERED production engine does not consult this hook): the
kernel's interface is the full-width ELL bid (all n rows, [n, K] arrays)
-- exactly the Jacobi driver's round shape.  The tiered engine's rounds
instead fetch ONE packed line per ACTIVE row (compact.fetch_rows on the
RowPack layout) and bid only the compacted id buffer; at ladder widths
(C << n) the round's cost is the C slice gathers, which the
all-rows-every-round kernel cannot undercut at any per-element speed.  A
packed-line kernel variant for the compacted round would have to beat
~7 ns/elem on a (1, W) dynamic row load -- the same primitive the probe
measures -- so it inherits the same verdict as the full-width kernel;
build it only if a probe PASS shows the window-load formulation beating
the XLA gather on a future toolchain.
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
