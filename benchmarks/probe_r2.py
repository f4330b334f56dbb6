"""Round-2 primitive probes (real TPU): measure the candidate building
blocks for a faster wide-round device path before committing to a design.

Timing methodology (IMPORTANT, discovered this round): on this axon-tunneled
TPU, ``block_until_ready`` returns without waiting for execution, so naive
dispatch-loop timing reports ~0.  Ground truth = R reps chained inside ONE
jit via ``lax.fori_loop`` with a data dependency threading every iteration,
reduced to a scalar, fetched to host (a 4-byte readback forces completion).
Constant overhead (dispatch + tunnel RTT + fetch) is eliminated with a
two-point fit: time at R1 and R2 reps, slope = per-rep cost.
probe_timing.py validates this harness against known-cost ops (4096^3
matmul -> 4.3 ms = 32 TF/s f32, sane for one v5e core).

Key round-1 numbers these probes re-verify or extend (PERF.md):
  random gather / scatter  ~7 ns/elem (confirmed: 70 ms per 10M)
  one-hot window-128 gather  claimed 0.06 ns/elem -> needs col-grouped layout

Writes PROBE_r2.json.  Usage: python benchmarks/probe_r2.py [--quick]
"""

from __future__ import annotations

import argparse
import json
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

RESULTS = {}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _scalarize(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    acc = jnp.float32(0)
    for leaf in leaves:
        acc = acc + jnp.sum(leaf.ravel()[:4]).astype(jnp.float32)
    return acc


def chain_time(step, carry0, r1=2, r2=8):
    """Two-point chained-in-jit timing: returns seconds per step call.

    ``step(carry) -> carry`` must thread a data dependency (each iteration's
    inputs depend on the previous outputs) so XLA cannot hoist or elide."""
    ts = {}
    for R in (r1, r2):
        run = jax.jit(lambda carry, R=R: _scalarize(
            lax.fori_loop(0, R, lambda i, c: step(c), carry)))
        float(np.asarray(run(carry0)))          # compile + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(np.asarray(run(carry0)))      # fetch forces completion
            best = min(best, time.perf_counter() - t0)
        ts[R] = best
    return max((ts[r2] - ts[r1]) / (r2 - r1), 1e-9)


_OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "PROBE_r2.json")


def record(name, seconds, per=None, unit="s", note=""):
    RESULTS[name] = {"seconds": seconds}
    msg = f"{name}: {seconds*1e3:.3f} ms"
    if per is not None:
        RESULTS[name]["ns_per"] = seconds * 1e9 / per
        msg += f"  ({seconds*1e9/per:.3f} ns/{unit})"
    if note:
        msg += f"  [{note}]"
    log(msg)
    with open(_OUT, "w") as fh:     # incremental: timeouts keep partials
        json.dump(RESULTS, fh, indent=1)


def perturb_f(x, out):
    """Cheap data-dependent perturbation: prevents hoisting across fori
    iterations; numerically ~0 so repeated steps stay representative."""
    return x + _scalarize(out) * jnp.float32(1e-30)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    n = m = 2 ** 18 if args.quick else 2 ** 20      # 1048576
    K = 10
    nnz = n * K
    NB = m // 128                                    # col windows
    E = (nnz // NB) + 128                            # padded entries/window
    rng = np.random.default_rng(0)
    log(f"devices: {jax.devices()}")
    log(f"probe: n=m={n} K={K} nnz={nnz} NB={NB} E={E}")

    p = jnp.asarray(rng.random(m).astype(np.float32) * 1000)
    cols_flat = jnp.asarray(rng.integers(0, m, nnz, dtype=np.int32))
    vals_flat = jnp.asarray(rng.random(nnz).astype(np.float32) * 1000)
    cols_ell = cols_flat.reshape(n, K)
    vals_ell = vals_flat.reshape(n, K)

    # ---- scalar gather / scatter baselines ------------------------------
    def g_step(c):
        p, idx, acc = c
        pg = p[idx]
        return (perturb_f(p, pg), idx, acc + pg[0])

    dt = chain_time(g_step, (p, cols_flat, jnp.float32(0)))
    record("gather_scalar", dt, per=nnz, unit="elem")

    rows_flat = jnp.asarray(np.repeat(np.arange(n, dtype=np.int32), K))

    def sc_step(c):
        w, rows, acc = c
        out = jnp.full((n,), -1.0, jnp.float32).at[rows].max(w, mode="drop")
        return (perturb_f(w, out), rows, acc + out[0])

    dt = chain_time(sc_step, (vals_flat, rows_flat, jnp.float32(0)))
    record("scatter_max", dt, per=nnz, unit="upd")

    # ---- slice gather width scaling --------------------------------------
    for w in (1, 4, 16):
        tab = jnp.asarray(rng.random((n, w)).astype(np.float32))
        ids = cols_flat % n

        def sg_step(c, tab=tab):
            t, ids, acc = c
            out = t.at[ids].get(mode="clip")
            return (perturb_f(t, out[0]), ids, acc + out[0, 0])

        dt = chain_time(sg_step, (tab, ids, jnp.float32(0)), r1=2, r2=6)
        record(f"slice_gather_w{w}", dt, per=nnz, unit="row")

    # ---- one-hot window-128 gather (col-window-grouped layout) ----------
    coff = jnp.asarray(rng.integers(0, 128, (NB, E), dtype=np.int32))
    p2d = p.reshape(NB, 128)
    iota = jnp.arange(128, dtype=jnp.int32)

    def oh_sum_step(c):
        p2d, coff, acc = c
        oh = coff[..., None] == iota
        pg = jnp.sum(jnp.where(oh, p2d[:, None, :], 0.0), axis=-1)
        return (perturb_f(p2d, pg[0, 0]), coff, acc + pg[0, 0])

    try:
        dt = chain_time(oh_sum_step, (p2d, coff, jnp.float32(0)), r1=1, r2=4)
        record("onehot_gather_sum", dt, per=NB * E, unit="elem")
    except Exception as e:
        log(f"onehot_sum: FAILED {type(e).__name__}: {str(e)[:150]}")

    def oh_dot_step(c):
        p2d, coff, acc = c
        oh = (coff[..., None] == iota).astype(jnp.float32)
        pg = lax.dot_general(oh, p2d[:, :, None],
                             dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)[..., 0]
        return (perturb_f(p2d, pg[0, 0]), coff, acc + pg[0, 0])

    try:
        dt = chain_time(oh_dot_step, (p2d, coff, jnp.float32(0)), r1=1, r2=4)
        record("onehot_gather_dot", dt, per=NB * E, unit="elem")
    except Exception as e:
        log(f"onehot_dot: FAILED {type(e).__name__}: {str(e)[:150]}")

    # binary tree-select variant (7 halvings)
    def tree_step(c):
        p2d, coff, acc = c
        x = jnp.broadcast_to(p2d[:, None, :], (NB, E, 128))
        cc = coff
        width = 128
        while width > 1:
            half = width // 2
            hi = cc >= half
            x = jnp.where(hi[..., None], x[..., half:width], x[..., 0:half])
            cc = jnp.where(hi, cc - half, cc)
            width = half
        pg = x[..., 0]
        return (perturb_f(p2d, pg[0, 0]), coff, acc + pg[0, 0])

    try:
        dt = chain_time(tree_step, (p2d, coff, jnp.float32(0)), r1=1, r2=4)
        record("onehot_gather_tree", dt, per=NB * E, unit="elem")
    except Exception as e:
        log(f"tree_select: FAILED {type(e).__name__}: {str(e)[:150]}")

    # ---- row-window-128 masked top-2 reduce ------------------------------
    # entries grouped by 128-row window: [RB, E2] w + row offsets
    RB = n // 128
    E2 = K * 128 + 128
    wrb = jnp.asarray(rng.random((RB, E2)).astype(np.float32))
    roff = jnp.asarray(rng.integers(0, 128, (RB, E2), dtype=np.int32))

    def rb_step(c):
        wrb, roff, acc = c
        oh = roff[..., None] == iota
        masked = jnp.where(oh, wrb[..., None], -jnp.inf)
        v1 = jnp.max(masked, axis=1)                      # [RB, 128]
        return (perturb_f(wrb, v1[0, 0]), roff, acc + v1[0, 0])

    try:
        dt = chain_time(rb_step, (wrb, roff, jnp.float32(0)), r1=1, r2=4)
        record("rowblock_maskmax", dt, per=RB * E2, unit="elem")
    except Exception as e:
        log(f"rowblock_max: FAILED {type(e).__name__}: {str(e)[:150]}")

    # ---- take_along_axis / transpose (permutation-network pieces) -------
    X2 = jnp.asarray(rng.random((NB, E)).astype(np.float32))
    idx_lane = jnp.asarray(rng.integers(0, E, (NB, E), dtype=np.int32))
    idx_sub = jnp.asarray(rng.integers(0, NB, (NB, E), dtype=np.int32))

    def taa1_step(c):
        x, idx, acc = c
        out = jnp.take_along_axis(x, idx, axis=1)
        return (perturb_f(x, out[0, 0]), idx, acc + out[0, 0])

    dt = chain_time(taa1_step, (X2, idx_lane, jnp.float32(0)), r1=1, r2=4)
    record("take_along_axis1", dt, per=NB * E, unit="elem")

    def taa0_step(c):
        x, idx, acc = c
        out = jnp.take_along_axis(x, idx, axis=0)
        return (perturb_f(x, out[0, 0]), idx, acc + out[0, 0])

    dt = chain_time(taa0_step, (X2, idx_sub, jnp.float32(0)), r1=1, r2=4)
    record("take_along_axis0", dt, per=NB * E, unit="elem")

    def tr_step(c):
        x, acc = c
        out = x.T + 1.0
        return (out.T, acc + out[0, 0])

    dt = chain_time(tr_step, (X2, jnp.float32(0)), r1=2, r2=8)
    record("transpose_10M", dt, per=NB * E, unit="elem",
           note="round trip / 1")

    # ---- CSC broadcast w (col-grouped layout, gather-free) ---------------
    D = 16
    vals_csc = jnp.asarray(rng.random((m, D)).astype(np.float32))

    def csc_step(c):
        vals, p, acc = c
        w = vals - p[:, None]
        v = jnp.max(w, axis=1)
        return (vals, perturb_f(p, v[0]), acc + v[0])

    dt = chain_time(csc_step, (vals_csc, p, jnp.float32(0)), r1=2, r2=8)
    record("csc_broadcast_w_colmax", dt, per=m * D, unit="elem")

    # ---- sorts ------------------------------------------------------------
    keys = jnp.asarray(rng.integers(0, 2 ** 31 - 1, nnz, dtype=np.int32))

    def sort_step(c):
        k, acc = c
        out = lax.sort(k)
        return (out[::-1] ^ 1, acc + out[0])

    dt = chain_time(sort_step, (keys, jnp.int32(0)), r1=1, r2=4)
    record("sort_i32", dt, per=nnz, unit="elem")

    def psort_step(c):
        k, v, acc = c
        ks, vs = lax.sort((k, v), num_keys=1)
        return (ks[::-1] ^ 1, vs, acc + vs[0])

    dt = chain_time(psort_step, (keys, vals_flat, jnp.float32(0)), r1=1, r2=4)
    record("sort_pair_i32f32", dt, per=nnz, unit="elem")

    # ---- full-width ELL bid round (current design's wide round) ----------
    def bid_step(c):
        p, acc = c
        w = vals_ell - p[cols_ell]
        slot = jnp.argmax(w, axis=1)
        oh = jnp.arange(K, dtype=jnp.int32)[None, :] == slot[:, None]
        v1 = jnp.max(w, axis=1)
        v2 = jnp.max(jnp.where(oh, -jnp.inf, w), axis=1)
        jstar = jnp.sum(jnp.where(oh, cols_ell, 0), axis=1)
        return (perturb_f(p, v1[0] + v2[0] + jstar[0]), acc + v1[0])

    dt = chain_time(bid_step, (p, jnp.float32(0)), r1=1, r2=4)
    record("ell_fullwidth_bid", dt, per=nnz, unit="elem")

    # ---- dense batched round (config-3 candidate) -------------------------
    nb = 4096
    A = jnp.asarray(rng.random((nb, nb)).astype(np.float32) * 1000)
    pb = jnp.asarray(rng.random(nb).astype(np.float32))

    def dense_step(c):
        A, p, acc = c
        w = A - p[None, :]
        v1 = jnp.max(w, axis=1)
        j = jnp.argmax(w, axis=1)
        oh = jnp.arange(nb)[None, :] == j[:, None]
        v2 = jnp.max(jnp.where(oh, -jnp.inf, w), axis=1)
        best = jnp.full((nb,), -jnp.inf).at[j].max(v1 - v2)
        return (A, perturb_f(p, best[0]), acc + best[0])

    dt = chain_time(dense_step, (A, pb, jnp.float32(0)), r1=2, r2=8)
    record(f"dense_round_{nb}", dt, per=nb * nb, unit="elem")

    # ---- compact_round per tier (current production round) ---------------
    from sslap_tpu import compact as _compact
    valid = jnp.ones((n, K), bool)
    nvalid = jnp.full((n,), K, jnp.int32)
    rowpack = _compact.build_rowpack(
        cols_ell, _compact.mask_vals(vals_ell, valid), nvalid)
    owner0 = jnp.full((m,), -1, jnp.int32)
    sigma0 = jnp.full((n,), -1, jnp.int32)
    bigp = jnp.float32(1001.0)
    for C in (256, 1024, 4096, 16384, 65536, 262144, n):
        ids0 = jnp.asarray(np.sort(
            rng.choice(n, C, replace=False)).astype(np.int32))

        def cr_step(c, C=C):
            prices, owner, sigma, ids, acc = c
            prices, owner, sigma, ids, n_won, n_evi = _compact.compact_round(
                rowpack, prices, owner, sigma, ids,
                jnp.float32(1.0), bigp)
            return (prices, owner, sigma, ids, acc + n_won)

        dt = chain_time(cr_step, (p, owner0, sigma0, ids0, jnp.int32(0)),
                        r1=1, r2=5)
        record(f"compact_round_C{C}", dt, per=C * K, unit="gather")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROBE_r2.json")
    with open(out, "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
