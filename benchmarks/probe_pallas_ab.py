"""On-chip A/B: Pallas bid kernel vs the XLA compute_bids path.

VERDICT round-2 task 5 asked for "an on-chip A/B parity + timing line"
once the probe passes (it does, round-3 continuation IV).  This probe
times both bid formulations at phase-start conditions (all rows bidding,
the regime that carries ~45% of the 1M solve's bids) using the
chained-in-jit two-point methodology (probe_timing.py: block_until_ready
does not block on this tunnel; R reps chained with a data dependency,
slope between two R values is ground truth).

Decision rule: the Pallas kernel becomes the default bid tier
(SSLAP_TPU_USE_PALLAS unset -> on) only if it beats XLA by >1.2x at the
config-4 shape; the dispatch already exists (ops.resolve_bid_fn).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from sslap_tpu import auction as _a
from sslap_tpu.ops import bid as _bid


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chained(fn, cols, vals, valid, nvalid, prices, sigma, eps, bigp, reps):
    """R reps of the bid fn inside one jit; prices perturbed each rep by a
    negligible function of the previous rep's bids (data dependency: no
    hoisting/CSE across reps)."""

    @jax.jit
    def run(p0):
        def body(i, p):
            tgt, b = fn(cols, vals, valid, nvalid, p, sigma, eps, bigp)
            # O(1e-14) perturbation: keeps the dependency, not the price.
            return p + (jnp.sum(b) + jnp.sum(tgt).astype(b.dtype)) * 1e-20
        return lax.fori_loop(0, reps, body, p0)

    out = run(prices)
    # Scalar readback forces completion through the tunnel.
    return float(np.asarray(out[:1])[0])


def two_point(fn, args, r1=2, r2=6):
    chained(fn, *args, r1)            # compile both rep counts
    chained(fn, *args, r2)
    t0 = time.perf_counter(); chained(fn, *args, r1)
    ta = time.perf_counter() - t0
    t0 = time.perf_counter(); chained(fn, *args, r2)
    tb = time.perf_counter() - t0
    return (tb - ta) / (r2 - r1)


def make(n, m, K, seed=0):
    rng = np.random.default_rng(seed)
    cols = jnp.asarray(rng.integers(0, m, (n, K), dtype=np.int32))
    vals = jnp.asarray((rng.random((n, K), np.float32) * 1000))
    valid = jnp.asarray(rng.random((n, K)) < 0.9)
    nvalid = valid.sum(1).astype(jnp.int32)
    prices = jnp.asarray(rng.random(m, np.float32))
    sigma = jnp.full((n,), -1, jnp.int32)   # phase start: everyone bids
    return (cols, vals, valid, nvalid, prices, sigma,
            jnp.float32(0.5), jnp.float32(2000.0))


def main():
    shapes = [(131072, 131072, 16), (1_000_000, 1_000_000, 16)]
    if os.environ.get("AB_SMALL"):
        shapes = shapes[:1]
    for n, m, K in shapes:
        args = make(n, m, K)
        # Parity first (single call, full readback).
        t0, b0 = jax.jit(_a.compute_bids)(*args)
        t1, b1 = jax.jit(_bid.bid_topk_pallas)(*args)
        mask = np.asarray(t0) < m
        par = (np.array_equal(np.asarray(t0), np.asarray(t1)) and
               np.allclose(np.asarray(b0)[mask], np.asarray(b1)[mask],
                           rtol=1e-6))
        s_xla = two_point(_a.compute_bids, args)
        s_pal = two_point(_bid.bid_topk_pallas, args)
        log(f"n={n} K={K}: parity={'OK' if par else 'MISMATCH'}  "
            f"xla={s_xla*1e3:.2f} ms ({s_xla/(n*K)*1e9:.2f} ns/elem)  "
            f"pallas={s_pal*1e3:.2f} ms ({s_pal/(n*K)*1e9:.2f} ns/elem)  "
            f"ratio xla/pallas={s_xla/s_pal:.2f}x")


if __name__ == "__main__":
    main()
