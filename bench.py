"""Primary benchmark (driver-run on real TPU each round).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric (BASELINE.md): nnz/s on a 1M x 1M, ~10 nnz/row sparse LAP
with float costs (config 4).  nnz/s = nnz * rounds / solve_time: the static-
shape Jacobi design streams every row's nnz each round, so this is the true
processed-edge throughput of the device loop.

vs_baseline: speedup in time-to-optimal over scipy's
min_weight_full_bipartite_matching (the sslap-class CPU oracle available in
this environment; the reference itself is unavailable -- see BASELINE.md
"Provenance caveat") on a smaller instance both sides can finish quickly
(100k x 100k, ~10 nnz/row), scaled by nothing -- an honest same-instance
wall-clock ratio.

Extra diagnostics go to stderr; stdout carries exactly one JSON line.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_instance(n, m, k_extra, seed=0, low=1.0, high=1000.0):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), k_extra)
    cols = rng.integers(0, m, n * k_extra, dtype=np.int64)
    perm = rng.permutation(m)[:n].astype(np.int64)
    rr = np.concatenate([rows, np.arange(n, dtype=np.int64)])
    cc = np.concatenate([cols, perm])
    key = rr * m + cc
    _, idx = np.unique(key, return_index=True)
    rr, cc = rr[idx], cc[idx]
    vv = (rng.random(rr.shape[0]) * (high - low) + low).astype(np.float32)
    return rr, cc, vv


def bench_tpu(n=1_000_000, k_extra=9, seed=0):
    import jax
    from sslap_tpu import auction as _auction
    from sslap_tpu import ingest

    m = n
    rr, cc, vv = make_instance(n, m, k_extra, seed)
    nnz = rr.shape[0]
    log(f"instance: {n}x{m}, nnz={nnz} ({nnz/n:.2f}/row)")

    t0 = time.perf_counter()
    prob = ingest.from_coo(np.stack([rr, cc], 1), vv, shape=(n, m))
    log(f"ingest: {time.perf_counter()-t0:.2f}s (K={prob.K})")

    tr = _auction.make_transform("min", m, np.float32, float(vv.max()))
    vals_t = tr.apply(prob.vals)
    e0, e_min, theta = _auction.default_eps_schedule(
        np.float32, float(vv.max()), m, tr.scale)
    import jax.numpy as jnp
    import functools

    solve = jax.jit(functools.partial(
        _auction.solve_ell, eps0=e0, eps_min=e_min, theta=theta,
        max_iter=1_000_000))
    p0 = jnp.zeros((m,), jnp.float32)

    # Warmup (compile) + timed run.
    t0 = time.perf_counter()
    res = solve(prob.cols, vals_t, prob.valid, prob.nvalid, p0)
    res.sigma.block_until_ready()
    warm = time.perf_counter() - t0
    rounds = int(np.asarray(res.rounds))
    log(f"warm solve: {warm:.2f}s rounds={rounds} "
        f"phases={int(np.asarray(res.phases))} "
        f"unassigned={int(np.asarray(res.unassigned))}")

    t0 = time.perf_counter()
    res = solve(prob.cols, vals_t, prob.valid, prob.nvalid, p0)
    res.sigma.block_until_ready()
    solve_time = time.perf_counter() - t0
    rounds = int(np.asarray(res.rounds))
    assert int(np.asarray(res.unassigned)) == 0, "bench instance must solve"
    nnz_per_s = nnz * rounds / solve_time
    log(f"timed solve: {solve_time:.3f}s rounds={rounds} "
        f"-> {nnz_per_s/1e9:.3f} Gnnz/s")
    return nnz_per_s, solve_time, rounds


def bench_vs_scipy(n=100_000, k_extra=9, seed=1, scipy_budget_s=600.0):
    """Same-instance time-to-optimal: ours (TPU, incl. ingest+transfer,
    excl. compile) vs scipy min_weight_full_bipartite_matching (CPU)."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import min_weight_full_bipartite_matching

    import jax.numpy as jnp
    import functools
    import jax
    from sslap_tpu import auction as _auction
    from sslap_tpu import ingest

    m = n
    rr, cc, vv = make_instance(n, m, k_extra, seed)
    log(f"vs-scipy instance: {n}x{m}, nnz={rr.shape[0]}")

    # ours: end-to-end minus compile (pre-compile with identical shapes)
    prob = ingest.from_coo(np.stack([rr, cc], 1), vv, shape=(n, m))
    tr = _auction.make_transform("min", m, np.float32, float(vv.max()))
    e0, e_min, theta = _auction.default_eps_schedule(
        np.float32, float(vv.max()), m, tr.scale)
    solve = jax.jit(functools.partial(
        _auction.solve_ell, eps0=e0, eps_min=e_min, theta=theta,
        max_iter=1_000_000))
    vals_t = tr.apply(prob.vals)
    p0 = jnp.zeros((m,), jnp.float32)
    solve(prob.cols, vals_t, prob.valid, prob.nvalid, p0).sigma.block_until_ready()

    t0 = time.perf_counter()
    prob = ingest.from_coo(np.stack([rr, cc], 1), vv, shape=(n, m))
    vals_t = tr.apply(prob.vals)
    res = solve(prob.cols, vals_t, prob.valid, prob.nvalid, p0)
    sol = np.asarray(res.sigma)
    ours_t = time.perf_counter() - t0
    sp = csr_matrix((vv.astype(np.float64), (rr, cc)), shape=(n, m))
    obj_ours = float(np.asarray(sp[np.arange(n), sol]).sum())
    log(f"ours: {ours_t:.2f}s obj={obj_ours:.1f} "
        f"rounds={int(np.asarray(res.rounds))}")

    t0 = time.perf_counter()
    r, c = min_weight_full_bipartite_matching(sp)
    scipy_t = time.perf_counter() - t0
    obj_scipy = float(sp[r, c].sum())
    log(f"scipy: {scipy_t:.2f}s obj={obj_scipy:.1f}")
    gap = (obj_ours - obj_scipy) / max(abs(obj_scipy), 1e-9)
    log(f"objective gap vs optimal: {gap:.2e} "
        f"(eps-bound {(m+1)*e_min/max(abs(obj_scipy),1e-9):.2e})")
    return scipy_t / ours_t, gap


def main():
    small = os.environ.get("BENCH_SMALL")
    if small:
        nnz_per_s, solve_time, rounds = bench_tpu(n=20_000, k_extra=9)
        speedup, gap = bench_vs_scipy(n=20_000)
    else:
        nnz_per_s, solve_time, rounds = bench_tpu()
        speedup, gap = bench_vs_scipy()
    print(json.dumps({
        "metric": "nnz_per_s_1Mx1M_sparse_auction",
        "value": round(nnz_per_s, 1),
        "unit": "nnz/s",
        "vs_baseline": round(speedup, 3),
    }))


if __name__ == "__main__":
    main()
