"""Multi-PROCESS simulation of the multi-host sharded hybrid (T8 / DCN).

The environment has one host and one TPU chip, so the pod-scale story
(BASELINE config 5, SURVEY.md SS3b T8 "cross-host price all-reduce") cannot
run on real DCN.  This driver gets as close as one box allows: it launches
N independent Python PROCESSES, each owning its own XLA CPU client with
``--xla_force_host_platform_device_count`` virtual devices, joined via
``jax.distributed.initialize`` into one global runtime.  Collectives between
the processes ride XLA's cross-process Gloo transport over TCP -- a real
two-client exchange with serialization, socket hops, and process-boundary
synchronization, i.e. the same code path shape a DCN pod takes (different
constants, same topology: 'rows' axis spanning hosts via
mesh_utils.create_hybrid_device_mesh in parallel/mesh.make_mesh).

What this validates that the in-process 8-virtual-device tests cannot:
  * jit + shard_map over a mesh whose devices span multiple XLA clients;
  * explicit global placement of host inputs (parallel.mesh.put_global) --
    jit cannot auto-commit onto a process-spanning mesh;
  * the row-sharded sigma readback via multihost_utils.process_allgather
    (parallel.mesh.fetch_global);
  * the SPMD wrapper discipline: every process executes the identical
    ingest / schedule / GS-tail host code (the tail is deterministic on
    replicated inputs, so redundant execution replaces a broadcast).

Usage (launcher spawns the SPMD workers and re-prints worker 0's report):

    python benchmarks/multiproc_sim.py [--n 4096] [--k 12] [--nproc 2]
        [--local-devices 4] [--overlap] [--ladder-balance] [--trunc 128]

Exit code 0 iff every worker's objective matched the scipy oracle.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_instance(n: int, k: int, seed: int):
    """Deterministic sparse instance with a planted perfect matching
    (identical on every process -- the SPMD contract).  Integer costs so
    the oracle comparison is exact."""
    import numpy as np
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    cols = rng.integers(0, n, size=n * k)
    perm = rng.permutation(n)
    rows = np.concatenate([rows, np.arange(n, dtype=np.int64)])
    cols = np.concatenate([cols, perm])
    vals = rng.integers(1, 1000, size=rows.shape[0])
    # Drop duplicate (row, col) pairs keeping the first occurrence.
    key = rows * n + cols
    _, first = np.unique(key, return_index=True)
    first.sort()
    loc = np.stack([rows[first], cols[first]], axis=1)
    return loc, vals[first]


def scipy_objective(loc, val, n: int) -> float:
    import numpy as np
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import min_weight_full_bipartite_matching
    sp = csr_matrix((val.astype(np.float64), (loc[:, 0], loc[:, 1])),
                    shape=(n, n))
    r, c = min_weight_full_bipartite_matching(sp)
    return float(sp[r, c].sum())


def worker(args) -> int:
    # Platform pinning (tests/conftest.py pattern): this environment's
    # sitecustomize imports jax at interpreter start, so env vars alone are
    # too late -- override via jax.config before any backend initializes.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
            f"{args.local_devices}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from sslap_tpu.parallel.mesh import initialize_multihost, make_mesh
    initialize_multihost(coordinator_address=f"localhost:{args.port}",
                         num_processes=args.nproc, process_id=args.worker)
    assert jax.process_count() == args.nproc, "distributed init failed"

    import numpy as np

    if args.backend == "batched":
        # DP over instances (T9): batch axis sharded across the processes.
        from sslap_tpu import ingest
        from sslap_tpu.batch import auction_solve_batched, stack_problems
        B = args.nproc * args.local_devices * 2
        probs, oracles = [], []
        for b in range(B):
            loc, val = build_instance(args.n, args.k, args.seed + b)
            probs.append(ingest.from_coo(loc, val, shape=(args.n, args.n),
                                         pad_to=args.k + 8))
            oracles.append(scipy_objective(loc, val, args.n))
        mesh = make_mesh(axis_name="batch")
        t0 = time.perf_counter()
        sols, metas = auction_solve_batched(stack_problems(probs),
                                            mesh=mesh, mode="device")
        solve_s = time.perf_counter() - t0
        objs = [mt["obj"] for mt in metas]
        ok = all(mt["soln_found"] for mt in metas) and all(
            o is not None and abs(float(o) - w) < 1e-6
            for o, w in zip(objs, oracles))
        report = {
            "ok": ok, "backend": "batched", "n": args.n, "B": B,
            "nproc": args.nproc,
            "devices_per_proc": args.local_devices,
            "objs_match": sum(o is not None and float(o) == w
                              for o, w in zip(objs, oracles)),
            "solve_s": round(solve_s, 3),
        }
        if args.worker == 0:
            print(json.dumps(report), flush=True)
        else:
            print(f"[worker {args.worker}] ok={ok}", flush=True)
        return 0 if ok else 1

    loc, val = build_instance(args.n, args.k, args.seed)
    mesh = make_mesh()
    common = dict(loc=loc, val=val, shape=(args.n, args.n), problem="min",
                  mesh=mesh)
    t0 = time.perf_counter()
    if args.backend == "hybrid":
        from sslap_tpu.parallel.sharded_compact import (
            auction_solve_sharded_hybrid)
        sol = auction_solve_sharded_hybrid(
            trunc=args.trunc, overlap=args.overlap,
            ladder_balance=args.ladder_balance, **common)
    elif args.backend == "sharded":
        from sslap_tpu.parallel.sharded import auction_solve_sharded
        sol = auction_solve_sharded(instrument=args.instrument, **common)
    else:
        from sslap_tpu.parallel.overlap import auction_solve_overlapped
        sol = auction_solve_overlapped(**common)
    solve_s = time.perf_counter() - t0

    want = scipy_objective(loc, val, args.n)
    got = sol.meta["obj"]
    ok = bool(sol.meta["soln_found"]) and got is not None \
        and abs(float(got) - want) < 1e-6
    report = {
        "ok": ok,
        "backend": args.backend,
        "n": args.n,
        "nnz": int(loc.shape[0]),
        "nproc": args.nproc,
        "devices_per_proc": args.local_devices,
        "n_shards": sol.meta["n_shards"],
        "obj": None if got is None else float(got),
        "scipy_obj": want,
        "rounds": sol.meta["its"],
        "phases": sol.meta["phases"],
        "tier_rounds": sol.meta.get("tier_rounds"),
        "comm_bytes_total": sol.meta.get("comm_bytes_total"),
        "comm_bytes_fullwidth_equiv": sol.meta.get(
            "comm_bytes_fullwidth_equiv"),
        "overlap": args.overlap,
        "ladder_balance": args.ladder_balance,
        "solve_s": round(solve_s, 3),
    }
    if args.instrument:
        report.update({k: sol.meta[k] for k in
                       ("round_s", "compute_s", "comm_s", "comm_fraction")
                       if k in sol.meta})
    if args.worker == 0:
        print(json.dumps(report), flush=True)
    else:
        print(f"[worker {args.worker}] ok={ok} obj={got}", flush=True)
    return 0 if ok else 1


def launcher(args) -> int:
    # Grab a free coordinator port (bind-and-release; single box, the
    # window between release and the coordinator's bind is tiny).
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(args.nproc):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--worker", str(pid), "--port", str(port),
               "--n", str(args.n), "--k", str(args.k),
               "--nproc", str(args.nproc),
               "--local-devices", str(args.local_devices),
               "--trunc", str(args.trunc), "--seed", str(args.seed),
               "--backend", args.backend]
        if args.overlap:
            cmd.append("--overlap")
        if args.ladder_balance:
            cmd.append("--ladder-balance")
        if args.instrument:
            cmd.append("--instrument")
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))
    rc = 0
    deadline = time.monotonic() + args.timeout  # total budget, all workers
    try:
        for pid, p in enumerate(procs):
            out, _ = p.communicate(
                timeout=max(1.0, deadline - time.monotonic()))
            if pid == 0 or p.returncode != 0:
                sys.stdout.write(out)
            rc |= p.returncode
    except subprocess.TimeoutExpired:
        sys.stdout.write("TIMEOUT: killing workers\n")
        for p in procs:
            p.kill()
        for p in procs:
            out, _ = p.communicate()
            sys.stdout.write(out[-2000:])
        rc = 2
    return rc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--k", type=int, default=12)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--backend", default="hybrid",
                    choices=("hybrid", "sharded", "overlapped", "batched"))
    ap.add_argument("--trunc", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--overlap", action="store_true")
    ap.add_argument("--ladder-balance", action="store_true")
    ap.add_argument("--instrument", action="store_true",
                    help="sharded backend: attach the comm/compute "
                         "breakdown (cross-process collective timing)")
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("--worker", type=int, default=None,
                    help="internal: SPMD worker process id")
    ap.add_argument("--port", type=int, default=None,
                    help="internal: coordinator port")
    args = ap.parse_args()
    if args.worker is not None:
        return worker(args)
    return launcher(args)


if __name__ == "__main__":
    sys.exit(main())
