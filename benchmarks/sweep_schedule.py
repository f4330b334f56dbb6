"""Sweep eps-schedule theta and hybrid trunc on the 1M bench instance.
Both are traced scalars -- no recompilation per setting, so the whole grid
runs in minutes.  Usage: python benchmarks/sweep_schedule.py [n]"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from bench import make_instance
    from sslap_tpu import ingest
    from sslap_tpu.hybrid import solve_hybrid

    rr, cc, vv = make_instance(n, n, 9, seed=0)
    prob = ingest.from_coo(np.stack([rr, cc], 1), vv, shape=(n, n))
    log(f"instance: {n}x{n} nnz={prob.nnz} K={prob.K}")

    solve_hybrid(prob)    # compile warm
    best = None
    for theta in (5.0, 10.0, 20.0, 40.0):
        for trunc in (256, 1024, 4096):
            t0 = time.perf_counter()
            sig, _, meta = solve_hybrid(prob, theta=theta, trunc=trunc)
            dt = time.perf_counter() - t0
            ok = meta["soln_found"]
            log(f"theta={theta:5.1f} trunc={trunc:5d}: e2e={dt:6.2f}s "
                f"device={meta['device_time']:6.2f}s "
                f"gs={meta['host_gs_time']:5.2f}s rounds={meta['its']:6d} "
                f"host_bids={meta['host_bids']:9d} ok={ok}")
            log(f"   tiers={meta['tier_rounds']}")
            if ok and (best is None or dt < best[0]):
                best = (dt, theta, trunc)
    log(f"BEST: e2e={best[0]:.2f}s theta={best[1]} trunc={best[2]}")


if __name__ == "__main__":
    main()
