"""Pallas bid kernel (T3): fused price-gather + per-row top-2 + bid.

Reference hot loop: the per-row scan of ``a_ij - p_j`` with running best /
second-best (SURVEY.md SS4.1 BIDDING).  The pure-XLA path (auction.py:
compute_bids) materializes the gathered prices and the w matrix in HBM;
this kernel streams an ELL row block through VMEM and emits (tgt, bid)
per row -- one HBM pass over the block, no intermediates.

Gather formulation (round 3 -- built from the primitives this Mosaic
accepts):
Mosaic here has no vectorized random gather, rejects scalar VMEM stores
outright, and ``tpu.dynamic_gather`` only handles single-vreg shapes.
What it DOES support: scalar reads from SMEM, dynamic-index (1, 128)
row loads/stores in VMEM, and full vector ALU.  So the price table is
reshaped [m/128, 128] and, per ELL slot k, each row's price is fetched
as (window = col >> 7) row-load + one-hot (lane = col & 127) select:

    rows_scratch[b, :] = prices2d[cols_smem[b, k] >> 7, :]   (B row loads)
    w_k = sum(rows_scratch * onehot(cols & 127), axis=1)     (vector)

Two further Mosaic quirks shape the interface: rank-1 HBM operands hit an
XLA/Mosaic layout disagreement (T(256) vs T(128)) on this stack, so every
per-row vector crosses the boundary as an [n, 1] 2-D array; and the w
matrix is accumulated in registers (static-K stack) rather than a scratch
column store.

Cost: one VMEM row load + row store + one-hot select per element --
worse than XLA's ~7 ns HBM scalar gather on this part, so XLA stays the
production default and the kernel ships opt-in (SSLAP_TPU_USE_PALLAS=1,
ops.resolve_bid_fn) for stacks where VMEM row-load latency beats the
HBM gather.  The probe (subprocess-isolated, see pallas_bid_available)
reports compile + A/B parity per backend; bench.py logs its verdict.

Interpret-mode twin (`interpret=True`) doubles as the CI oracle vs
compute_bids on CPU (tests/test_ops.py).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sslap_tpu.auction import neg_sentinel

_DEF_BLOCK = 512
_LANES = 128

# Last probe failure (diagnostics surface for bench.py's kernel report).
_last_probe_error: str = ""


def _bid_kernel(scal_ref, cols_smem, prices2d_ref, cols_ref, vals_ref,
                valid_ref, nvalid_ref, sigma_ref, tgt_ref, bid_ref,
                rows_scratch):
    """One grid step = one [B, K] ELL row block.

    scal_ref (SMEM): [4] = (eps, bigp, unused, unused)
    cols_smem (SMEM): [B, K] int32 -- scalar-read copy of cols
    prices2d_ref (VMEM): [m_pad/128, 128] price table, resident across steps
    nvalid/sigma (VMEM): [B, 1] (2-D: rank-1 operands mis-lay out, see doc)
    outputs: tgt [B, 1] int32 (2**30 = no bid), bid [B, 1]
    """
    B, K = cols_ref.shape
    eps = scal_ref[0]
    bigp = scal_ref[1]
    dtype = vals_ref.dtype
    neg = neg_sentinel(dtype)

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (B, _LANES), 1)
    cols = cols_ref[:]
    wks = []
    for k in range(K):                      # static unroll over ELL slots
        def load_body(b, _):
            win = cols_smem[b, k] // _LANES  # window row of the price table
            rows_scratch[b, :] = prices2d_ref[win, :]
            return 0
        lax.fori_loop(0, B, load_body, 0)
        onehot = lane_iota == (cols[:, k] % _LANES)[:, None]  # [B, 128]
        wks.append(jnp.sum(jnp.where(onehot, rows_scratch[:, :],
                                     jnp.zeros((B, _LANES), dtype)), axis=1))
    prices_g = jnp.stack(wks, axis=1)                         # [B, K]

    vals = vals_ref[:]
    valid = valid_ref[:] != 0
    w = jnp.where(valid, vals - prices_g, neg)                # [B, K]
    slot = jnp.argmax(w, axis=1)
    onehot = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1) == slot[:, None]
    v1 = jnp.max(w, axis=1)
    v2 = jnp.max(jnp.where(onehot, neg, w), axis=1)
    nv = nvalid_ref[:, 0]
    v2 = jnp.where(nv >= 2, v2, v1 - bigp)
    a_star = jnp.sum(jnp.where(onehot, vals, jnp.zeros_like(vals)), axis=1)
    jstar = jnp.sum(jnp.where(onehot, cols, 0), axis=1).astype(jnp.int32)

    bidding = (sigma_ref[:, 0] < 0) & (nv > 0)
    # Non-bidders emit the 2**30 sentinel (the wrapper maps it to m; m is
    # not passed in to keep the scalar args dtype-homogeneous).
    tgt_ref[:, 0] = jnp.where(bidding, jstar, jnp.int32(2 ** 30))
    bid_ref[:, 0] = a_star - v2 + eps


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
    # Price table as [mw, 128]; padded past m so the ELL col sentinel (m)
    # stays in bounds.
    m_pad = ((m + 1 + _LANES - 1) // _LANES) * _LANES
    prices2d = jnp.pad(prices, ((0, m_pad - m),)).reshape(-1, _LANES)
    scal = jnp.stack([jnp.asarray(eps, dtype), jnp.asarray(bigp, dtype),
                      jnp.asarray(0, dtype), jnp.asarray(0, dtype)])
    grid = npad // block
    tgt, bid = pl.pallas_call(
        _bid_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block, K), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((block, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((npad, 1), jnp.int32),
            jax.ShapeDtypeStruct((npad, 1), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((block, _LANES), dtype)],
        interpret=interpret,
    )(scal, cols, prices2d, cols, vals_t, valid.astype(jnp.int8),
      nvalid[:, None].astype(jnp.int32), sigma[:, None].astype(jnp.int32))
    # Kernel emits 2**30 for non-bidders; the contract uses m.
    tgt = jnp.where(tgt[:, 0] == 2 ** 30, jnp.int32(m), tgt[:, 0])[:n]
    bid = bid[:n, 0]
    return tgt, bid


def bid_topk_pallas(cols, vals_t, valid, nvalid, prices, sigma, eps, bigp,
                    *, block: int = _DEF_BLOCK, interpret: bool = False):
    """Drop-in replacement for auction.compute_bids (same signature order as
    the bid_fn hook in auction.jacobi_round)."""
    return _pallas_bid_call(cols, vals_t, valid, nvalid, sigma, prices,
                            eps, bigp, block=block, interpret=interpret)


def _probe_inproc() -> bool:
    """The actual compile-and-match probe (runs in THIS process).  It
    probes at the PRODUCTION block size (_DEF_BLOCK): Mosaic lowering
    outcomes depend on the block shape (the round-2 probe's block=32
    failed the lowering for a reason that had nothing to do with the
    kernel body; rank-1 blocks must be 128-multiples), so validating one
    block size and dispatching another would let a passing probe precede
    a crashing production solve."""
    global _last_probe_error
    try:
        from sslap_tpu import auction as _a
        rng = np.random.default_rng(0)
        n, m, K = 2 * _DEF_BLOCK, 300, 4
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
                                    sigma, eps, bigp))()
        t0, b0 = _a.compute_bids(cols, vals, valid, nvalid, prices, sigma,
                                 eps, bigp)
        mask = np.asarray(t0) < m
        ok = bool(np.array_equal(np.asarray(t0), np.asarray(t1)) and
                  np.allclose(np.asarray(b0)[mask], np.asarray(b1)[mask],
                              rtol=1e-6))
        if not ok:
            _last_probe_error = "A/B mismatch vs compute_bids"
        return ok
    except Exception as e:  # noqa: BLE001 - any lowering failure = no tier
        _last_probe_error = f"{type(e).__name__}: {e}"
        return False


@functools.lru_cache(maxsize=1)
def pallas_bid_available() -> bool:
    """Probe whether the kernel compiles and matches the XLA path on this
    backend -- in a SUBPROCESS with a timeout.

    Round-3 lesson: a Mosaic lowering this stack rejects can crash (or,
    via the axon remote-compile helper, wedge) more than the probing
    process -- an in-process probe once took the whole tunnel down with
    it.  The subprocess carries its own backend connection and is killed
    on timeout, so the caller (production dispatch, bench.py) survives
    any compiler behavior.  Opt out of the isolation with
    SSLAP_TPU_PROBE_INPROC=1 (e.g. tests already on a CPU backend)."""
    global _last_probe_error
    if os.environ.get("SSLAP_TPU_PROBE_INPROC") == "1":
        return _probe_inproc()
    import subprocess
    import sys
    try:
        import jax
        platform = jax.default_backend() \
            if jax._src.xla_bridge._backends else None
    except Exception:
        platform = None
    code = (
        "import jax\n"
        + (f"jax.config.update('jax_platforms', {platform!r})\n"
           if platform else "")
        + "from sslap_tpu.ops import bid\n"
        "ok = bid._probe_inproc()\n"
        "print('PROBE_OK' if ok else 'PROBE_FAIL ' +"
        " bid._last_probe_error[:500])\n")
    timeout = float(os.environ.get("SSLAP_TPU_PROBE_TIMEOUT", "240"))
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout)
    except subprocess.TimeoutExpired:
        _last_probe_error = f"probe subprocess timed out ({timeout:.0f}s)"
        return False
    for line in out.stdout.splitlines():
        if line.startswith("PROBE_OK"):
            return True
        if line.startswith("PROBE_FAIL"):
            _last_probe_error = line[len("PROBE_FAIL "):]
            return False
    _last_probe_error = (f"probe subprocess exit {out.returncode}: "
                         f"{out.stderr[-300:]}")
    return False
