"""Row-sharded auction solve over a device mesh (T7/T8).

Design (SURVEY.md SS2b 'Distribution layer', SS8.1 M4): each device owns a
contiguous block of rows of the ELL cost layout and a *replica* of the
price/owner state.  Every Jacobi round:

  1. each shard computes bids for its rows and reduces them locally into
     per-column (best_bid, winner_row) of length m;
  2. two collectives combine shards: pmax of best, then pmin of winner among
     shards holding the max (deterministic highest-bid-then-lowest-row-id
     tie-break, identical to the single-device rule);
  3. every shard applies the identical commit to its price/owner replicas
     and updates the rows of sigma it owns.

The convergence test is a psum'd unassigned count, so all shards leave the
while_loop on the same round.  This is the Jacobi auction's key parallel
property (SURVEY.md SS8.0): bids computed against stale/partial price
knowledge are still correct, which is also what will make the overlapped
(stale-price) multi-host variant legal.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sslap_tpu import auction as _auction
from sslap_tpu.ingest import ELLProblem
from sslap_tpu.parallel.partition import pad_rows_for_mesh, partition_rows

_I32_MAX = 2 ** 31 - 1


def make_pmax_combine(axis_name: str):
    """Cross-shard (best, winner) combine: max bid, then min row id among
    shards achieving it.  Two all-reduces of [m] each per round."""

    def combine(best, winner):
        best_g = lax.pmax(best, axis_name)
        cand = jnp.where(best == best_g, winner, jnp.int32(_I32_MAX))
        winner_g = lax.pmin(cand, axis_name)
        return best_g, winner_g

    return combine


def sharded_solve_ell(
    prob: ELLProblem,
    vals_t: jax.Array,
    mesh: Mesh,
    p0: jax.Array,
    eps0,
    eps_min,
    theta,
    max_iter,
    bigp,
    n_real: int,
    axis_name: str = "rows",
    theta_tail=None,
    tail_phases: int = 2,
) -> _auction.SolveResult:
    """shard_map'd eps-scaled solve.  ``prob`` must already be row-padded to
    the mesh size (pad_rows_for_mesh); ``n_real`` is the pre-padding row
    count (determines the implicit-dummy count m - n_real)."""
    n_shards = mesh.shape[axis_name]
    n_pad, K = prob.cols.shape
    assert n_pad % n_shards == 0, "call pad_rows_for_mesh first"
    n_local = n_pad // n_shards
    m = prob.m

    combine = make_pmax_combine(axis_name)

    def run(cols, vals, valid, nvalid, p0_rep):
        shard = lax.axis_index(axis_name)
        row_offset = shard.astype(jnp.int32) * jnp.int32(n_local)

        def count_unassigned(sigma):
            local = jnp.sum((sigma < 0) & (nvalid > 0)).astype(jnp.int32)
            return lax.psum(local, axis_name)

        return _auction.solve_ell(
            cols, vals, valid, nvalid, p0_rep,
            eps0, eps_min, theta, max_iter,
            theta_tail=theta_tail,
            tail_phases=tail_phases,
            combine=combine,
            count_unassigned=count_unassigned,
            row_offset=row_offset,
            n_global=n_real,
            bigp=bigp,
            # Warm-started phases: each shard frees only its own rows'
            # columns in the owner replica; pmin re-converges the replicas
            # (freed -1 beats any row id; see unassign_violators docstring).
            combine_owner=lambda o: lax.pmin(o, axis_name),
        )

    spec_rows = P(axis_name)
    spec_rep = P()
    fn = shard_map(
        run,
        mesh=mesh,
        in_specs=(spec_rows, spec_rows, spec_rows, spec_rows, spec_rep),
        out_specs=_auction.SolveResult(
            sigma=spec_rows, prices=spec_rep, rounds=spec_rep,
            phases=spec_rep, final_eps=spec_rep, unassigned=spec_rep,
        ),
        check_vma=False,  # prices/owner replicas provably identical: the
        # commit consumes only collective-combined (best, winner)
    )
    # Process-spanning meshes need explicit placement (no-op otherwise).
    from sslap_tpu.parallel.mesh import put_global_args
    args = put_global_args(
        mesh, (spec_rows, spec_rows, spec_rows, spec_rows, spec_rep),
        (prob.cols, vals_t, prob.valid, prob.nvalid, p0))
    return jax.jit(fn)(*args)


def auction_solve_sharded(
    mat=None,
    *,
    loc=None,
    val=None,
    shape=None,
    problem: str = "min",
    mesh: Optional[Mesh] = None,
    eps_start=None,
    eps_min=None,
    theta: Optional[float] = None,
    theta_tail: Optional[float] = None,
    tail_phases: int = 2,
    max_iter: Optional[int] = None,
    cardinality_check: bool = True,
    dtype=None,
    axis_name: str = "rows",
    partition: str = "rows",
    instrument: bool = False,
    warm_prices=None,
):
    """Drop-in sharded variant of api.auction_solve: same inputs and result
    contract, with the solve row-partitioned over ``mesh`` (default: a 1-D
    mesh over all devices).

    ``instrument=True`` additionally measures the per-round comm/compute
    split on this mesh (parallel/scaling.py chained-timing harness) and
    attaches it to the meta as ``round_s``/``compute_s``/``comm_s``/
    ``comm_fraction`` -- the config-5 scaling-efficiency inputs.

    ``partition``: 'rows' (contiguous blocks, bit-identical to the
    unsharded solve) or 'nnz' (rows relabeled so shards carry near-equal
    nnz -- use on skewed instances; same optimal objective, assignments may
    differ on cost ties because deterministic tie-breaks see the relabeled
    row ids)."""
    from sslap_tpu import api as _api
    from sslap_tpu import feasibility as _feas
    from sslap_tpu.parallel.mesh import make_mesh

    t0 = time.perf_counter()
    prob = _api._ingest_any(mat=mat, loc=loc, val=val, shape=shape,
                            dtype=dtype)
    if prob.n == 0:
        raise ValueError("empty problem (no rows)")
    if np.asarray(prob.vals).dtype == np.float64:
        # Includes int_exact (integers too large for f32): jnp.asarray
        # would silently downcast to f32 on device and corrupt costs
        # above 2**24.  float64 rides the host CPU path (mode='cpu').
        raise ValueError("float64 costs ride the host CPU path "
                         "(mode='cpu'); the sharded backend is f32/int32")
    if cardinality_check and not _feas.is_feasible(prob):
        raise _api.InfeasibleError(
            "no perfect matching exists for this sparsity pattern")
    if mesh is None:
        mesh = make_mesh(axis_name=axis_name)

    vals_np = np.asarray(prob.vals)
    valid_np = np.asarray(prob.valid)
    vmax_abs = float(np.abs(vals_np[valid_np]).max()) if valid_np.any() else 0.0
    tr = _auction.make_transform(problem, prob.m, vals_np.dtype, vmax_abs)
    theta_eff = (_auction.device_theta_default(prob.n)
                 if theta is None else theta)
    if theta_tail is None:
        # Mixed tail default, matching the single-chip hybrid: engage the
        # ratio-3 final drops wherever the aggressive device theta is
        # (PERF.md round-3 theta A/B; VERDICT r3 missing #2).
        theta_tail = 3.0 if float(theta_eff) > 5 else 0.0
    if tail_phases < 1:
        raise ValueError("tail_phases must be >= 1")
    e0, e_min, theta_v = _auction.default_eps_schedule(
        vals_np.dtype, vmax_abs, prob.m, tr.scale,
        eps_min=eps_min, eps_start=eps_start,
        theta=theta_eff)
    if max_iter is None:
        max_iter = _auction.default_max_iter(prob.n)

    # Global bid-arithmetic constants computed host-side so every shard's
    # control flow is identical.
    tvals = vals_np.astype(np.int64) if np.issubdtype(vals_np.dtype, np.integer) \
        else vals_np.astype(np.float64)
    tvals = tvals * (tr.sign * tr.scale)
    if valid_np.any():
        bigp = float(tvals[valid_np].max() - tvals[valid_np].min()) + 1.0
    else:
        bigp = 1.0

    n_real = prob.n
    prob_p, row_order = partition_rows(prob, mesh.shape[axis_name],
                                       by=partition)
    vals_t = tr.apply(prob_p.vals)
    # Warm-start parity with the single-device modes: prices are replicated
    # state, so a previous solve's prices seed every shard identically.
    p0 = (jnp.zeros((prob.m,), vals_t.dtype) if warm_prices is None
          else jnp.asarray(_auction.validate_warm_prices(warm_prices,
                                                         prob.m),
                           vals_t.dtype))

    # With relabeled rows every row is "real" from the solver's view (the
    # padding rows are interleaved but have nvalid == 0 and never bid);
    # n_real only drives the implicit-dummy count m - n_real, unchanged.
    res = sharded_solve_ell(prob_p, vals_t, mesh, p0, e0, e_min, theta_v,
                            max_iter, bigp, n_real, axis_name=axis_name,
                            theta_tail=theta_tail, tail_phases=tail_phases)
    from sslap_tpu.parallel.mesh import fetch_global
    sol_p = fetch_global(res.sigma)
    if row_order is None:
        sol = sol_p[:n_real]
    else:
        sol = np.full(n_real, -1, sol_p.dtype)
        real = row_order < n_real
        sol[row_order[real]] = sol_p[real]
    t1 = time.perf_counter()
    n_empty = int((np.asarray(prob.nvalid) == 0).sum())
    unassigned = int(np.asarray(res.unassigned)) + n_empty
    soln_found = unassigned == 0
    meta = {
        "obj": _api._objective_host(prob, sol) if soln_found else None,
        "its": int(np.asarray(res.rounds)),
        "phases": int(np.asarray(res.phases)),
        "soln_found": soln_found,
        "final_eps": float(np.asarray(res.final_eps)) / tr.scale,
        "unassigned": unassigned,
        "time": t1 - t0,
        "n_shards": int(mesh.shape[axis_name]),
        "mode": "sharded",
    }
    if instrument:
        from sslap_tpu.parallel.scaling import measure_round_breakdown
        meta.update(measure_round_breakdown(
            prob, mesh, problem=problem, axis_name=axis_name,
            partition=partition))
    return _api.AuctionSolution(sol=sol, meta=meta,
                                prices=np.asarray(res.prices))
