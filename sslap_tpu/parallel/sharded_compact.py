"""Row-sharded tiered-compaction auction -- the sharded hybrid (round 3).

Why this exists (VERDICT round 2, missing item 1): the plain sharded round
(parallel/sharded.py) bids all n/D local rows and all-reduces two
[m]-vectors EVERY round.  The auction's round-width histogram (PERF.md:
~82% of rounds carry < 16 bids) makes that design unrunnable at BASELINE
config 5 scale -- tens of thousands of narrow serial-chain rounds, each
paying O(n/D*K) bid compute plus 2x[10M] collectives.  This module
composes the distribution layer with everything the round-2 single-chip
winner learned:

  per-shard RowPack     each shard owns a contiguous row block stored in
                        the line-packed layout (compact.RowPack): one slice
                        gather per active row per round, ~128/(2K+1) x less
                        HBM than lane-padded ELL.
  tiered compaction     each shard keeps its active (unassigned) rows in a
                        compacted id buffer whose static capacity C steps
                        down a tier ladder as the GLOBAL active set
                        collapses; round cost is O(C*K), not O(n/D*K).
  compact exchanges     narrow tiers exchange the ACTIVE-SET bids -- an
                        all-gather of [C, 3] (col, bid-bits, row) triples,
                        3*4*D*C bytes -- instead of two [m] all-reduces.
                        Collective bytes track the active set, not m.
  wide tiers            phase starts and bulk rounds (>~ 2m/(3D) active)
                        keep the classic [m] pmax/pmin exchange, which is
                        cheaper than gathering ~n triples.
  truncated phases      every eps phase stops once <= trunc rows remain
                        active (the serial-eviction-chain tail); ONE native
                        host Gauss-Seidel pass at eps_min finishes the
                        assignment.  Prices are replicated, so any single
                        host can run the tail (multi-host: process 0).

Determinism: identical tie-breaks to the single-device engines -- rows
pick the lowest column among w-maxima (ELL columns sorted ascending),
columns pick the highest bid then the lowest GLOBAL row id.  With
trunc=0 the sharded solve reproduces the single-device tiered solve's
assignment exactly (tested on the 8-virtual-device CPU mesh).

Capability contract: SURVEY.md SS2b 'Distribution layer' / SS3b T7-T8;
BASELINE config 5 (10M x 10M row-partitioned, overlapped/narrowed
collectives).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sslap_tpu import auction as _auction
from sslap_tpu.auction import neg_sentinel, neg_sentinel_np as _neg_sentinel_np
from sslap_tpu import compact as _compact
from sslap_tpu.compact import RowPack, fetch_rows, _unpack_rows
from sslap_tpu.ingest import ELLProblem

_I32_MAX = 2 ** 31 - 1


def sharded_ladder_tiers(n_glob: int, m: int, n_shards: int
                         ) -> Tuple[int, ...]:
    """Descending GLOBAL active-set capacities for the compact-exchange
    ladder.  A tier-C round all-gathers 3*4*D*C bytes; the full-width
    exchange moves 2*4*m.  Compact exchange pays off below C ~ 2m/(3D),
    so the ladder starts at the largest power of two under that (and
    under n/2), stepping x2 down to 64 (the x2 spacing rationale is
    compact.default_tiers: capacity/active slack (r-1)/ln r = 1.44).

    Above 32768 the ladder interleaves {2^k, 3*2^(k-1)} exactly like
    compact.default_tiers (round 3: slack 1.44x -> ~1.2x on the tiers
    that carry the most gathered elements; measured 5.14 -> 4.86 s on
    the single-chip 1M pass).  Kept sparse below that -- each tier adds
    XLA program size, and narrow rounds are latency- not
    capacity-bound."""
    cmax = max(min((2 * m) // (3 * n_shards), n_glob // 2), 64)
    c = 1 << (int(cmax).bit_length() - 1)
    tiers = []
    while c >= 64:
        half_up = 3 * (c // 2)                  # 1.5 * c
        if c >= 32768 and half_up <= cmax and half_up < n_glob:
            tiers.append(half_up)
        if c < n_glob:
            tiers.append(c)
        c //= 2
    return tuple(tiers)


def _to_bits(x):
    if jnp.issubdtype(x.dtype, jnp.integer):
        return x.astype(jnp.int32)
    return lax.bitcast_convert_type(x, jnp.int32)


def _from_bits(x, dtype):
    if jnp.issubdtype(jnp.dtype(dtype), jnp.integer):
        return x.astype(dtype)
    return lax.bitcast_convert_type(x, dtype)


def balanced_cap(C: int, n_local: int, D: int, floor: int) -> int:
    """Shard-local ladder buffer capacity under ``ladder_balance=True``:
    min(C, n_local, max(ceil(2C/D), floor)).  The ONE definition shared
    by the solver's buffer sizing and the analytic comm-bytes meta --
    the two must agree or comm_bytes_total stops matching the actual
    all-gather sizes."""
    return min(C, n_local, max(-(-2 * C // D), floor))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis_name", "R", "W", "n_glob", "tiers",
                     "pairs_max", "overlap", "balance", "balance_floor",
                     "tail_phases"))
def _solve_sharded_tiered_jit(
    data,                  # [L, R*W] packed lines (or [n_pad, W] when R=1)
    nvalid,                # [n_pad] int32
    p0,                    # [m]
    eps0, eps_min, theta, max_iter, bigp, trunc, theta_tail,
    wide=None,             # WideLayout with [D*NB, E] arrays (or None)
    *,
    tail_phases: int = 2,
    mesh: Mesh,
    axis_name: str,
    R: int,
    W: int,
    n_glob: int,
    tiers: Tuple[int, ...],
    pairs_max: int = 8192,
    overlap: bool = False,
    balance: bool = False,
    balance_floor: int = 256,
):
    """shard_map'd eps-scaled tiered solve.  Returns (SolveResult with
    sigma over the PADDED row axis, tier_rounds[3 + len(tiers)]):
    tier_rounds[0] counts phase-start rounds, [1] the remaining full-width
    rounds, [2+i] the ladder rounds at tiers[i], and [-1] the total
    spill-rebuild sort count summed over shards and phases (see
    ``balance``).

    ``balance=True`` sizes each shard's ladder buffer at
    min(C, n_local, max(2C/D, balance_floor)) instead of min(C, n_local):
    ladder-round compute then SHRINKS with the mesh (the capacity-C
    buffers are the design's Amdahl serial fraction -- see
    benchmarks/project_scaling.py: d=8 efficiency ~33% unbalanced vs
    ~65% balanced).  The 2x slack absorbs mild imbalance; when a shard's
    actives still exceed its buffer, the overflow rows wait OUTSIDE the
    buffer (they stay unassigned, the global gate keeps counting them)
    and a LOCAL spill-rebuild -- an O(n_local) sort, no collective --
    readmits them as soon as slots free up.  Trades the trunc=0
    bit-exact-parity guarantee (spilled rows bid later than the
    single-device engine would) for scalable round cost; objective
    optimality is unaffected."""
    n_pad = nvalid.shape[0]
    m = p0.shape[0]
    D = mesh.shape[axis_name]
    assert n_pad % (D * R) == 0, "pad rows to a multiple of D*R first"
    n_local = n_pad // D
    dtype = p0.dtype
    K = (W - 1) // 2
    neg = neg_sentinel(dtype)
    neg_half = neg // 2 if jnp.issubdtype(dtype, jnp.integer) else neg / 2
    n_tiers = len(tiers)

    def cap_local(C: int) -> int:
        if not balance:
            return min(C, n_local)
        return balanced_cap(C, n_local, D, balance_floor)

    def run(data_l, nvalid_l, p0_r, eps0_, eps_min_, theta_, max_iter_,
            bigp_, trunc_, theta_tail_, wide_l=None):
        shard = lax.axis_index(axis_name)
        row_offset = shard.astype(jnp.int32) * jnp.int32(n_local)
        gids = row_offset + jnp.arange(n_local, dtype=jnp.int32)
        rowpack_l = (RowPack(data=data_l, R=R, W=W) if R > 1 else data_l)
        # Full-width rounds read the local pack directly (rows are
        # consecutive within each line, so a reshape recovers [n_local, W]).
        base = data_l.reshape(n_local, W)
        colsL, valsL, nvL = _unpack_rows(base, dtype)
        nvL = jnp.where(nvalid_l > 0, nvL, 0)

        eps_min__ = jnp.asarray(eps_min_, dtype)
        theta__ = jnp.asarray(theta_, dtype)
        theta_tail__ = jnp.asarray(theta_tail_, dtype)
        bigp__ = jnp.asarray(bigp_, dtype)
        max_iter__ = jnp.asarray(max_iter_, jnp.int32)
        trunc__ = jnp.asarray(trunc_, jnp.int32)

        def top2_bid(w, nv):
            slot = jnp.argmax(w, axis=1)
            onehot = (jnp.arange(w.shape[1], dtype=jnp.int32)[None, :]
                      == slot[:, None])
            v1 = jnp.max(w, axis=1)
            v2 = jnp.max(jnp.where(onehot, neg, w), axis=1)
            v2 = jnp.where(nv >= 2, v2, v1 - bigp__)
            return onehot, v1, v2

        def full_round(prices, owner, sigma, eps, phase_start: bool):
            """Full-width round over all local rows: local [m] resolve +
            pmax/pmin combine (2x[m] collectives; 3x with the violator
            scan's owner re-convergence at phase starts).  With a wide
            layout, w comes from the window-gather formulation
            (ops/widebid.py: 1.69x the scalar gather on-chip,
            bit-identical) -- the wide regime carries ~45% of all bids,
            so this is the multi-chip path's share of the round-4 win."""
            if wide_l is not None:
                from sslap_tpu.ops.widebid import wide_w
                w = wide_w(wide_l, prices)
            else:
                w = valsL - prices[colsL]
            onehot, v1, v2 = top2_bid(w, nvL)
            a_star = jnp.sum(jnp.where(onehot, valsL,
                                       jnp.zeros_like(valsL)), axis=1)
            jstar = jnp.sum(jnp.where(onehot, colsL, 0),
                            axis=1).astype(jnp.int32)
            bid = a_star - v2 + eps
            if phase_start:
                # Warm-started eps-CS violator scan fused into the round
                # (compact.compact_round phase_start semantics): each shard
                # frees its own rows' columns; pmin re-converges the owner
                # replicas (-1 beats any row id).
                sig = sigma
                real = w > neg_half
                cur_hit = (colsL == sig[:, None]) & real
                cur = jnp.sum(jnp.where(cur_hit, w, jnp.zeros_like(w)),
                              axis=1)
                viol = (sig >= 0) & (cur < v1 - eps)
                owner = owner.at[jnp.where(viol, sig, m)].set(
                    -1, mode="drop")
                owner = lax.pmin(owner, axis_name)
                sigma = jnp.where(viol, jnp.int32(-1), sigma)
                bidding = (nvL > 0) & ((sig < 0) | viol)
            else:
                bidding = (sigma < 0) & (nvL > 0)
            tgt = jnp.where(bidding, jstar, jnp.int32(m))
            best_l, winner_l = _auction.resolve_bids(tgt, bid, m, gids)
            best_g = lax.pmax(best_l, axis_name)
            cand = jnp.where(best_l == best_g, winner_l,
                             jnp.int32(_I32_MAX))
            winner_g = lax.pmin(cand, axis_name)
            has = best_g > neg_half
            n_won = jnp.sum(has).astype(jnp.int32)
            n_evi = jnp.sum(has & (owner >= 0)).astype(jnp.int32)
            prices, owner, sigma = _auction.commit_bids(
                best_g, winner_g, prices, owner, sigma, row_offset)
            return prices, owner, sigma, n_won, n_evi

        def compact_exchange_round(prices, owner, sigma, ids, eps, C: int):
            """Compact round at local capacity C: one slice gather per
            active row; the exchange is an all-gather of [C, 3] triples
            (3*4*D*C bytes), NOT an [m] all-reduce.  Every shard resolves
            the gathered D*C candidate set identically (all-pairs when
            D*C <= pairs_max, else a local [m] scatter with no collective)
            and applies the identical commit to its price/owner replicas."""
            live = ids < n_glob
            lid = jnp.where(live, ids - row_offset, 0)
            pk = fetch_rows(rowpack_l, lid)             # [C, W]
            colsC, valsC, nvC = _unpack_rows(pk, dtype)
            nvC = jnp.where(live, nvC, 0)
            w = valsC - prices[colsC]
            onehot, v1, v2 = top2_bid(w, nvC)
            a_star = jnp.sum(jnp.where(onehot, valsC,
                                       jnp.zeros_like(valsC)), axis=1)
            jstar = jnp.sum(jnp.where(onehot, colsC, 0),
                            axis=1).astype(jnp.int32)
            bid = a_star - v2 + eps
            bidding = live & (nvC > 0)
            tgt = jnp.where(bidding, jstar, jnp.int32(m))

            trip = jnp.stack([tgt, _to_bits(bid), ids], axis=1)  # [C, 3]
            gath = lax.all_gather(trip, axis_name)               # [D, C, 3]
            g_tgt = gath[..., 0].reshape(-1)
            g_bid = _from_bits(gath[..., 1].reshape(-1), dtype)
            g_ids = gath[..., 2].reshape(-1)
            G = D * C

            if G <= pairs_max:
                bidding_g = g_tgt < m
                same = g_tgt[:, None] == g_tgt[None, :]
                beats = same & ((g_bid[None, :] > g_bid[:, None]) |
                                ((g_bid[None, :] == g_bid[:, None]) &
                                 (g_ids[None, :] < g_ids[:, None])))
                won = bidding_g & jnp.logical_not(jnp.any(beats, axis=1))
            else:
                # Shared deterministic tie-break reduction (auction.py's
                # resolve_bids); won iff this row is its column's winner.
                _, winner = _auction.resolve_bids(g_tgt, g_bid, m, g_ids)
                won = winner.at[g_tgt].get(
                    mode="fill", fill_value=_I32_MAX) == g_ids

            tgt_won = jnp.where(won, g_tgt, jnp.int32(m))
            prev_owner = jnp.where(won, owner.at[g_tgt].get(mode="clip"),
                                   -1)
            prices = prices.at[tgt_won].set(
                jnp.where(won, g_bid, prices[0]), mode="drop")
            owner = owner.at[tgt_won].set(g_ids, mode="drop")
            evicted = jnp.where(prev_owner >= 0, prev_owner,
                                jnp.int32(n_glob))        # [G] global ids
            # Local sigma commit: my winners install, my evictees clear.
            win_loc = g_ids - row_offset
            win_ok = won & (win_loc >= 0) & (win_loc < n_local)
            ev_loc = evicted - row_offset
            ev_ok = (evicted < n_glob) & (ev_loc >= 0) & (ev_loc < n_local)
            sig_idx = jnp.concatenate([
                jnp.where(win_ok, win_loc, jnp.int32(n_local)),
                jnp.where(ev_ok, ev_loc, jnp.int32(n_local))])
            sig_val = jnp.concatenate([
                g_tgt, jnp.full((G,), -1, jnp.int32)])
            sigma = sigma.at[sig_idx].set(sig_val, mode="drop")
            # Relist MY actives: my bidders that lost + my evicted rows.
            won_my = lax.dynamic_slice_in_dim(
                won, shard.astype(jnp.int32) * C, C)
            stay = jnp.where(bidding & jnp.logical_not(won_my), ids,
                             jnp.int32(n_glob))
            ev_mine = jnp.where(ev_ok, evicted, jnp.int32(n_glob))
            new_ids = lax.sort(jnp.concatenate([stay, ev_mine]))[:C]
            n_won = jnp.sum(won).astype(jnp.int32)
            n_evi = jnp.sum(prev_owner >= 0).astype(jnp.int32)
            # Per-shard deltas (for the local-active tracking that drives
            # balanced-buffer spill rebuilds).
            my_win = jnp.sum(win_ok).astype(jnp.int32)
            my_ev = jnp.sum(ev_ok).astype(jnp.int32)
            return (prices, owner, sigma, new_ids, n_won, n_evi,
                    my_win, my_ev)

        def count_active_global(sigma):
            local = jnp.sum((sigma < 0) & (nvL > 0)).astype(jnp.int32)
            return lax.psum(local, axis_name)

        def active_ids(sigma, cap: int):
            """Smallest-gid active rows, padded with n_glob to ``cap``.
            The ONE definition used at ladder entry AND by spill
            rebuilds: both must select identically or rebuilt buffers
            diverge from entry buffers."""
            return lax.sort(jnp.where(
                (sigma < 0) & (nvL > 0), gids, jnp.int32(n_glob)))[:cap]

        def run_phase(st: _compact.TieredState, first: bool):
            prices, owner, sigma = st.prices, st.owner, st.sigma
            eps = st.eps
            prices, owner, sigma, _, _ = full_round(
                prices, owner, sigma, eps, phase_start=not first)
            rounds = st.rounds + 1
            tier_rounds = st.tier_rounds.at[0].add(1)
            active = count_active_global(sigma)

            # Full-width regime down to the ladder's top capacity.
            top_floor = tiers[0] if n_tiers else 0
            gate = jnp.maximum(jnp.int32(top_floor), trunc__)

            rb = rounds
            if not overlap:
                def cond_top(c):
                    _, _, _, act, rnd = c
                    return (act > gate) & (rnd < max_iter__)

                def body_top(c):
                    prices, owner, sigma, act, rnd = c
                    prices, owner, sigma, nw, ne = full_round(
                        prices, owner, sigma, eps, phase_start=False)
                    return (prices, owner, sigma, act - nw + ne, rnd + 1)

                prices, owner, sigma, active, rounds = lax.while_loop(
                    cond_top, body_top,
                    (prices, owner, sigma, active, rounds))
            else:
                # Depth-1 pipelined full-width rounds (overlap.py design,
                # composed with the tiered engine): each body bids against
                # its ENTRY prices while combining the PREVIOUS round's
                # pending (best, winner) -- the two are independent, so
                # XLA's latency-hiding scheduler runs the 2x[m] all-reduce
                # under the O(n_local*K) bid compute instead of after it.
                # Stale bids commit behind an eps-progress acceptance
                # guard; rejected bidders re-bid with fresh prices.  The
                # NARROW compact tiers below deliberately stay
                # synchronous: their eviction chains are data-serial (a
                # bid-cycle spans 2 pipelined bodies ~ 2x collective
                # latency vs latency+tiny-compute synchronous), so
                # pipelining the latency-bound regime would slow it down.
                def commit_guarded(best_g, winner_g, prices, owner, sigma):
                    accept = (winner_g != jnp.int32(_I32_MAX)) \
                        & (best_g >= prices + eps)
                    new_prices = jnp.where(accept, best_g, prices)
                    col_idx = jnp.arange(m, dtype=jnp.int32)

                    def loc_idx(global_rows, mask):
                        loc = global_rows - row_offset
                        ok = mask & (loc >= 0) & (loc < n_local)
                        return jnp.where(ok, loc, jnp.int32(n_local))

                    ev_idx = loc_idx(owner, accept & (owner >= 0))
                    sigma = sigma.at[ev_idx].set(-1, mode="drop")
                    win_idx = loc_idx(winner_g, accept)
                    sigma = sigma.at[win_idx].set(col_idx, mode="drop")
                    new_owner = jnp.where(accept, winner_g, owner)
                    nw = jnp.sum(accept).astype(jnp.int32)
                    ne = jnp.sum(accept & (owner >= 0)).astype(jnp.int32)
                    return new_prices, new_owner, sigma, nw, ne

                def combine_pending(pb, pw):
                    best_g = lax.pmax(pb, axis_name)
                    cand = jnp.where(pb == best_g, pw,
                                     jnp.int32(_I32_MAX))
                    return best_g, lax.pmin(cand, axis_name)

                def cond_ov(c):
                    act, rnd = c[6], c[7]
                    return (act > gate) & (rnd < max_iter__)

                def body_ov(c):
                    prices, owner, sigma, pending, pb, pw, act, rnd = c
                    # (1) bid against entry prices; rows with a bid in
                    # flight sit this round out.
                    w = valsL - prices[colsL]
                    onehot, v1, v2 = top2_bid(w, nvL)
                    a_star = jnp.sum(jnp.where(onehot, valsL,
                                               jnp.zeros_like(valsL)),
                                     axis=1)
                    jstar = jnp.sum(jnp.where(onehot, colsL, 0),
                                    axis=1).astype(jnp.int32)
                    bid = a_star - v2 + eps
                    bidding = (sigma < 0) & (nvL > 0) \
                        & jnp.logical_not(pending)
                    tgt = jnp.where(bidding, jstar, jnp.int32(m))
                    best_l, winner_l = _auction.resolve_bids(
                        tgt, bid, m, gids)
                    # (2) combine + (3) guarded-commit the previous
                    # round's pending bids -- independent of (1).
                    best_g, winner_g = combine_pending(pb, pw)
                    prices, owner, sigma, nw, ne = commit_guarded(
                        best_g, winner_g, prices, owner, sigma)
                    return (prices, owner, sigma, tgt < m, best_l,
                            winner_l, act - nw + ne, rnd + 1)

                pending0 = jnp.zeros((n_local,), bool)
                pb0 = jnp.full((m,), neg, dtype)
                pw0 = jnp.full((m,), _I32_MAX, jnp.int32)
                (prices, owner, sigma, _, pb, pw, active, rounds) = \
                    lax.while_loop(
                        cond_ov, body_ov,
                        (prices, owner, sigma, pending0, pb0, pw0,
                         active, rounds))
                # Drain the in-flight combine so the ladder starts clean.
                best_g, winner_g = combine_pending(pb, pw)
                prices, owner, sigma, nw, ne = commit_guarded(
                    best_g, winner_g, prices, owner, sigma)
                active = active - nw + ne
            tier_rounds = tier_rounds.at[1].add(rounds - rb)

            if n_tiers:
                # Local buffer capacity: a shard can never hold more than
                # n_local actives, so small shards cap below the GLOBAL
                # tier capacity (the tier's while-gate stays global); with
                # ``balance`` the cap also shrinks toward 2C/D.
                ids = active_ids(sigma, cap_local(tiers[0]))
                lact = jnp.sum((sigma < 0) & (nvL > 0)).astype(jnp.int32)
                nreb = jnp.int32(0)
                carry = (prices, owner, sigma, ids, active, lact, nreb,
                         rounds)
                for ti, C in enumerate(tiers):
                    floor = tiers[ti + 1] if ti + 1 < n_tiers else 0
                    Cl = cap_local(C)

                    def cond(c, floor=floor):
                        act, rnd = c[4], c[7]
                        return (act > jnp.maximum(jnp.int32(floor),
                                                  trunc__)) \
                            & (rnd < max_iter__)

                    def body(c, Cl=Cl):
                        prices, owner, sigma, ids, act, lact, nreb, rnd = c
                        (prices, owner, sigma, ids, nw, ne, my_win,
                         my_ev) = compact_exchange_round(
                             prices, owner, sigma, ids, eps, Cl)
                        lact = lact - my_win + my_ev
                        if balance:
                            # Spill rebuild: rows that overflowed the
                            # buffer wait unassigned; readmit them (LOCAL
                            # sort, no collective, shards may diverge
                            # here) once slots free up.
                            blive = jnp.sum(ids < n_glob).astype(jnp.int32)
                            # Debug gate read at TRACE time: the jit
                            # cache is keyed on static args only, so set
                            # SSLAP_DEBUG_SPILL before the FIRST solve of
                            # a shape in the process (toggling later hits
                            # the cached executable and prints nothing).
                            if os.environ.get("SSLAP_DEBUG_SPILL"):
                                jax.debug.print(
                                    "C={c} lact={l} blive={b}", c=Cl,
                                    l=lact, b=blive)
                            need = (lact > blive) & (blive < jnp.int32(Cl))
                            ids = lax.cond(
                                need,
                                lambda s: active_ids(s, Cl),
                                lambda s: ids,
                                sigma)
                            nreb = nreb + need.astype(jnp.int32)
                        return (prices, owner, sigma, ids, act - nw + ne,
                                lact, nreb, rnd + 1)

                    if ti > 0:
                        prices, owner, sigma, ids, act, lact, nreb, rnd \
                            = carry
                        carry = (prices, owner, sigma, ids[:Cl], act,
                                 lact, nreb, rnd)
                    rb = carry[7]
                    carry = lax.while_loop(cond, body, carry)
                    tier_rounds = tier_rounds.at[2 + ti].add(carry[7] - rb)
                (prices, owner, sigma, ids, active, lact, nreb,
                 rounds) = carry
                # Spill-rebuild count: TOTAL rebuild sorts across shards
                # (rebuilds are local and may diverge; the sum is the
                # actual work done), recorded in the last slot.
                tier_rounds = tier_rounds.at[2 + n_tiers].add(
                    lax.psum(nreb, axis_name))

            return st._replace(prices=prices, owner=owner, sigma=sigma,
                               rounds=rounds, phases=st.phases + 1,
                               tier_rounds=tier_rounds)

        eps0__ = jnp.maximum(jnp.asarray(eps0_, dtype), eps_min__)
        init = _compact.TieredState(
            prices=p0_r.astype(dtype),
            owner=jnp.full((m,), -1, jnp.int32),
            sigma=jnp.full((n_local,), -1, jnp.int32),
            eps=eps0__,
            rounds=jnp.int32(0),
            phases=jnp.int32(0),
            tier_rounds=jnp.zeros((3 + n_tiers,), jnp.int32),
        )
        st = run_phase(init, first=True)

        def outer_cond(carry):
            st, done = carry
            return jnp.logical_not(done)

        def outer_body(carry):
            st, _ = carry
            # Mixed tail schedule (auction._next_eps): the host GS tail's
            # bid count is set by the FINAL eps drop ratio, and theta=10
            # end-to-end measured 8.7-44M tail bids on sibling 1M
            # instances where ratio-3 final drops hold 1-3M (PERF.md
            # round-3 theta A/B).  Same default as the single-chip
            # hybrid (VERDICT r3 missing #2).
            new_eps = _auction._next_eps(st.eps, theta__, eps_min__,
                                         theta_tail=theta_tail__,
                                         tail_phases=tail_phases)
            st = run_phase(st._replace(eps=new_eps), first=False)
            done = (st.eps <= eps_min__) | (st.rounds >= max_iter__)
            return st, done

        done0 = (st.eps <= eps_min__) | (st.rounds >= max_iter__)
        st, _ = lax.while_loop(outer_cond, outer_body, (st, done0))

        unassigned = count_active_global(st.sigma)
        res = _auction.SolveResult(
            sigma=st.sigma, prices=st.prices, rounds=st.rounds,
            phases=st.phases, final_eps=st.eps, unassigned=unassigned)
        return res, st.tier_rounds

    spec_rows = P(axis_name)
    spec_rep = P()
    wide_spec = None
    if wide is not None:
        from sslap_tpu.ops import widebid as _wb
        wide_spec = _wb.WideLayout(coff=spec_rows, vals_cg=spec_rows,
                                   dest=spec_rows, n=wide.n, K=wide.K,
                                   m_pad=wide.m_pad)
    fn = shard_map(
        run,
        mesh=mesh,
        in_specs=(spec_rows, spec_rows, spec_rep, spec_rep, spec_rep,
                  spec_rep, spec_rep, spec_rep, spec_rep, spec_rep,
                  wide_spec),
        out_specs=(_auction.SolveResult(
            sigma=spec_rows, prices=spec_rep, rounds=spec_rep,
            phases=spec_rep, final_eps=spec_rep, unassigned=spec_rep),
            spec_rep),
        check_vma=False,  # replicas provably identical: every commit
        # consumes only collective-combined or all-gathered data
    )
    return fn(data, nvalid, p0, eps0, eps_min, theta, max_iter, bigp, trunc,
              theta_tail, wide)


def comm_bytes_model(tier_rounds, tiers: Tuple[int, ...], m: int,
                     n_shards: int, elem_bytes: int = 4,
                     n_local: Optional[int] = None,
                     overlap: bool = False,
                     cap=None) -> dict:
    """Analytic per-tier collective-byte accounting from the round
    histogram: phase starts move 3x[m] (owner pmin + best pmax + winner
    pmin) -- except the FIRST phase's opening round, which runs without
    the violator scan's owner pmin (2x[m]); full-width rounds 2x[m];
    ladder tier-C rounds all-gather 3*D*min(C, n_local) triples (a
    shard's buffer caps at its row count).  ``overlap=True`` adds each
    phase's pipeline-drain combine (2x[m], outside the round counters).
    This is the VERDICT round-2 'collective bytes track the active set,
    not m' instrumentation."""
    tr = [int(x) for x in np.asarray(tier_rounds)]
    if cap is None:
        cap = (lambda c: min(c, n_local)) if n_local else (lambda c: c)
    per_round = [3 * m * elem_bytes, 2 * m * elem_bytes] + \
        [3 * n_shards * cap(c) * elem_bytes for c in tiers]
    by_tier = [r * b for r, b in zip(tr, per_round)]
    # tr[0] == number of phases (one phase-start round per phase).
    adjust = -(m * elem_bytes if tr[0] >= 1 else 0)
    if overlap:
        adjust += tr[0] * 2 * m * elem_bytes
    return {
        "tier_capacities": [None, None, *tiers],
        "comm_bytes_per_round_by_tier": per_round,
        "comm_bytes_by_tier": by_tier,
        "comm_bytes_adjustments": int(adjust),
        "comm_bytes_total": int(sum(by_tier) + adjust),
        # What the SAME round count would move on the round-2 full-width
        # design: 2x[m] per round everywhere, plus the phase-start owner
        # re-convergence [m] that any warm-started sharded design pays
        # (first phase excepted, as above).
        "comm_bytes_fullwidth_equiv": int(
            (sum(tr) * 2 + max(tr[0] - 1, 0)) * m * elem_bytes),
    }


def auction_solve_sharded_hybrid(
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
    trunc: int = 256,
    warm_prices=None,
    warm_fr: int = 0,
    tiers: Optional[Tuple[int, ...]] = None,
    pairs_max: int = 8192,
    overlap: bool = False,
    ladder_balance: bool = False,
    balance_floor: int = 256,
    wide_rounds: Optional[bool] = None,
):
    """Sharded hybrid solve: row-sharded tiered-compaction device pass with
    truncated phases + ONE host Gauss-Seidel tail at eps_min.

    ``overlap=True`` pipelines the FULL-WIDTH rounds one deep (stale-price
    bids + eps-progress acceptance guards, the overlap.py design): the
    2x[m] all-reduce of round k-1 rides under round k's bid compute.  The
    narrow compact-exchange tiers stay synchronous on purpose -- their
    eviction chains are data-serial, so a pipelined bid-cycle would pay
    ~2x the collective latency the synchronous round pays once.

    ``ladder_balance=True`` sizes ladder buffers at ~2C/D per shard
    (floor ``balance_floor``) instead of C, so ladder-round compute
    shrinks with the mesh -- the scaling-critical knob
    (benchmarks/project_scaling.py: d=8 efficiency ~33% -> ~65%).
    Overflowing shards spill rows out of the buffer and readmit them via
    local rebuilds (meta ``ladder_rebuilds`` = total rebuild sorts summed
    over shards and phases).  Costs the
    trunc=0 bit-exact single-device parity (objective optimality
    unaffected); leave off for single-digit meshes on one host where
    collective latency is microseconds and the wide regime dominates.

    Same result contract as api.auction_solve.  Square problems only (the
    rectangular implicit-dummy path stays on parallel/sharded.py).  The
    meta carries the per-tier round histogram and the analytic
    collective-bytes breakdown (comm_bytes_by_tier): narrow tiers move
    3*4*D*C bytes per round -- proportional to the active-set capacity,
    not to m."""
    from sslap_tpu import api as _api
    from sslap_tpu import feasibility as _feas
    from sslap_tpu import hybrid as _hybrid
    from sslap_tpu.parallel.mesh import (make_mesh, put_global_args,
                                         fetch_global)
    from sslap_tpu.parallel.partition import pad_rows_for_mesh

    t0 = time.perf_counter()
    prob = _api._ingest_any(mat=mat, loc=loc, val=val, shape=shape,
                            dtype=dtype)
    if prob.n != prob.m:
        raise ValueError("sharded hybrid requires a square problem; use "
                         "parallel.auction_solve_sharded for n < m")
    if np.asarray(prob.vals).dtype == np.float64:
        raise ValueError("float64 costs ride the host CPU path "
                         "(mode='cpu'); the sharded hybrid is f32/int32")
    if cardinality_check and not _feas.is_feasible(prob):
        raise _api.InfeasibleError(
            "no perfect matching exists for this sparsity pattern")
    if mesh is None:
        mesh = make_mesh(axis_name=axis_name)
    D = mesh.shape[axis_name]
    n, m = prob.n, prob.m

    vals_np = np.asarray(prob.vals)
    valid_np = np.asarray(prob.valid)
    vdtype = vals_np.dtype
    vmax_abs = float(np.abs(vals_np[valid_np]).max()) if valid_np.any() \
        else 0.0
    tr = _auction.make_transform(problem, m, vdtype, vmax_abs,
                                 int_exact=prob.int_exact)
    theta_eff = (_auction.device_theta_default(n) if theta is None
                 else theta)
    if theta_tail is None:
        # Default-match the single-chip hybrid (hybrid.py): engage the
        # ratio-3 tail wherever the aggressive device theta is.
        theta_tail = 3.0 if float(theta_eff) > 5 else 0.0
    if tail_phases < 1:
        raise ValueError("tail_phases must be >= 1")
    e0, e_min, theta_v = _auction.default_eps_schedule(
        vdtype, vmax_abs, m, tr.scale,
        eps_min=eps_min, eps_start=eps_start,
        theta=theta_eff, int_exact=prob.int_exact)
    if max_iter is None:
        max_iter = _auction.default_max_iter(n)

    # Host CSR for the GS tail + global bid constants (identical on every
    # shard).
    indptr, indices, data_csr = _hybrid.ell_to_csr_transformed(
        prob, tr.sign, tr.scale)
    if valid_np.any():
        tmax, tmin = data_csr.max(), data_csr.min()
        bigp = (tmax - tmin) + (1 if np.issubdtype(vdtype, np.integer)
                                else 1.0)
    else:
        bigp = 1

    # Pad rows so line boundaries align with shard boundaries, then pack.
    K = prob.K
    W = 2 * K + 1
    R = max(128 // W, 1)
    prob_p = pad_rows_for_mesh(prob, D * R)
    n_pad = prob_p.n
    rp = _compact.np_build_rowpack(
        np.asarray(prob_p.cols), np.asarray(prob_p.vals),
        np.asarray(prob_p.valid), np.asarray(prob_p.nvalid),
        sign_scale=tr.sign * tr.scale)
    data_arr = rp.data if isinstance(rp, RowPack) else rp
    nvalid_pad = np.asarray(prob_p.nvalid)

    if tiers is None:
        tiers = sharded_ladder_tiers(n_pad, m, D)
    # Window-gather full-width rounds (ops/widebid.py), per shard: each
    # shard's local rows get their own column-window layout with a
    # common group width E; prices are replicated so the gather itself
    # needs no collective.  Same auto-gate and bit-parity contract as
    # the single-chip hybrid (PERF.md round 4: 1.69x the scalar-gather
    # wide round; the wide regime carries ~45% of all bids).
    if wide_rounds is None:
        wide_rounds = n >= 400_000
    wide_np = None
    if wide_rounds:
        from sslap_tpu.ops.widebid import build_sharded_wide_layouts
        neg_np = _neg_sentinel_np(vdtype)
        wide_np = build_sharded_wide_layouts(
            np.asarray(prob_p.cols), np.asarray(prob_p.vals),
            np.asarray(prob_p.valid), m, D,
            sign_scale=tr.sign * tr.scale, neg=neg_np)
    trunc_v = min(int(trunc), max(n // 8, 1))
    p0 = (np.zeros((m,), vdtype) if warm_prices is None
          else _auction.validate_warm_prices(warm_prices, m).astype(vdtype))
    if warm_prices is not None and warm_fr > 0:
        # Forward-reverse dual tightening, same as the single-chip hybrid
        # (round 5): host-side, over the already-built global CSR, before
        # the prices replicate onto the mesh.  Deterministic on identical
        # host inputs, so SPMD symmetry across processes is preserved.
        _auction.fr_tighten(indptr, indices, data_csr, p0, iters=warm_fr)

    # Multi-process meshes ("multi-host"): every process runs this entire
    # function SPMD on identical host inputs (same instance, same seeds);
    # jit cannot auto-commit host arrays onto a process-spanning mesh, so
    # inputs get explicit global placement here and the row-sharded sigma
    # comes back via a process_allgather.  The host GS tail below then runs
    # REDUNDANTLY on every process (it is deterministic on replicated
    # inputs), which keeps the SPMD symmetry without a broadcast.
    # Scalars need explicit replicated placement too on process-spanning
    # meshes: jit cannot commit process-local values onto such a mesh.
    e0, e_min = np.asarray(e0, vdtype), np.asarray(e_min, vdtype)
    theta_tail_v = np.asarray(theta_tail, vdtype)
    (data_arr, nvalid_pad, p0, e0, e_min, theta_v, max_iter, bigp,
     trunc_v, theta_tail_v) = put_global_args(
        mesh, (P(axis_name), P(axis_name)) + (P(),) * 8,
        (data_arr, nvalid_pad, p0, e0, e_min, theta_v, max_iter, bigp,
         trunc_v, theta_tail_v))
    wide_g = None
    if wide_np is not None:
        coff_g, vcg_g, dest_g = put_global_args(
            mesh, (P(axis_name),) * 3,
            (wide_np.coff, wide_np.vals_cg, wide_np.dest))
        from sslap_tpu.ops.widebid import WideLayout as _WL
        wide_g = _WL(coff=coff_g, vals_cg=vcg_g, dest=dest_g,
                     n=wide_np.n, K=wide_np.K, m_pad=wide_np.m_pad)

    t_dev0 = time.perf_counter()
    res, tier_rounds = _solve_sharded_tiered_jit(
        data_arr, nvalid_pad, p0, e0, e_min, theta_v, max_iter, bigp,
        trunc_v, theta_tail_v, wide_g, tail_phases=int(tail_phases),
        mesh=mesh, axis_name=axis_name, R=R, W=W, n_glob=n_pad,
        tiers=tiers, pairs_max=pairs_max, overlap=overlap,
        balance=ladder_balance, balance_floor=balance_floor)

    # np.array (copy), NOT np.asarray: the GS tail writes prices in place
    # through ctypes, and np.asarray would alias JAX's read-only cached
    # value (hybrid.py makes the same copy for the same reason).
    prices = np.array(res.prices)
    sigma = fetch_global(res.sigma)[:n].copy()
    dev_rounds = int(np.asarray(res.rounds))
    t_dev = time.perf_counter() - t_dev0

    # Host GS tail (any one host: prices are replicated).
    owner = np.full(m, -1, np.int32)
    assigned = sigma >= 0
    owner[sigma[assigned]] = np.nonzero(assigned)[0].astype(np.int32)
    t_gs0 = time.perf_counter()
    bids = _hybrid._gs(indptr, indices, data_csr, prices, sigma, owner,
                       e_min, bigp, 0, 100 * n + 10_000_000)
    t_gs = time.perf_counter() - t_gs0

    unassigned = int(((sigma < 0) & (np.diff(indptr) > 0)).sum())
    dev_eps = float(np.asarray(res.final_eps))
    eps_reached = bool(np.asarray(res.final_eps)
                       <= np.asarray(e_min, data_csr.dtype))
    soln_found = unassigned == 0 and bids >= 0 and eps_reached
    meta = {
        "obj": _api._objective_host(prob, sigma) if soln_found else None,
        "its": dev_rounds,
        "host_bids": max(int(bids), 0),
        "phases": int(np.asarray(res.phases)),
        "final_eps": (float(e_min) if eps_reached else dev_eps) / tr.scale,
        "unassigned": unassigned,
        "soln_found": soln_found,
        "time": time.perf_counter() - t0,
        "device_time": t_dev,
        "host_gs_time": t_gs,
        # last slot of the raw array is the spill-rebuild count, split out
        "tier_rounds": np.asarray(tier_rounds)[:-1].tolist(),
        "ladder_rebuilds": int(np.asarray(tier_rounds)[-1]),
        "n_shards": int(D),
        "mode": "sharded_hybrid",
        "overlap": bool(overlap),
        "ladder_balance": bool(ladder_balance),
    }
    meta.update(comm_bytes_model(
        np.asarray(tier_rounds)[:-1], tiers, m, D,
        n_local=n_pad // D, overlap=overlap,
        cap=(None if not ladder_balance else
             (lambda c: balanced_cap(c, n_pad // D, int(D),
                                     balance_floor)))))
    return _api.AuctionSolution(sol=sigma, meta=meta, prices=prices)
