"""Tiered active-compaction auction solve with a maintained w matrix
(single-device fast path).

Two measured facts drive this design (TPU v5e, 1M x 1M, ~10 nnz/row):

1. Random element gather runs at ~5-7 ns/element on this stack (XLA TPU
   lowers it scalar), so any round that gathers prices per entry pays
   ~100 ns/bid -- slower than a host core's cache-friendly serial auction.
   Slice gathers (whole ELL rows) and plain streaming run at memory speed.
2. A round is ~15 unfusable kernels; per-kernel launch latency adds
   ~40-170 us/round of fixed overhead, so round COUNT matters as much as
   round cost.

So the solver never gathers prices per entry.  It maintains

    w[i, k] = vals_m[i, k] - price[cols[i, k]]        (the bid margins)

as device state and updates it *by column* after each round: a won column
j rewrites w at j's entry positions (a static CSC index, built once on
device) to value - new_price.  Total update work over a solve is
sum-over-wins of Kc ~ nnz-scale scatter traffic, while every round's bid
compute becomes either

    narrow tiers (C < STREAM_MIN): slice-gather w[ids] -- [C, K] rows at
        memory speed -- then top-2 / bid entirely in compact space with an
        all-pairs O(C^2) conflict resolve (no O(m) temporaries);
    wide tiers / phase starts: stream the full [n, K] w (0.2-0.5 ms at
        1M x 16) and extract the compact active slice for the resolve.

Phases may be *truncated* (``trunc``): the serial eviction chains --
measured ~82% of rounds carrying < 16 bids each -- are left to the hybrid
driver's single native host GS pass at eps_min, which is correct because
only the final phase must complete (eps-CS holds throughout; earlier
phases only precondition prices).

Scope: square effective problems (rectangular n < m goes through
auction.solve_ell's implicit-dummy path).  Deterministic tie-breaks match
auction.py: rows pick the lowest column index among maxima (ELL columns
are sorted), columns the lowest row id among max bids.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from sslap_tpu import auction as _auction
from sslap_tpu.auction import neg_sentinel

_I32_MAX = 2 ** 31 - 1

#: tiers with capacity >= this stream the full w instead of slice-gathering
STREAM_MIN = 8192
#: tiers with capacity <= this resolve conflicts all-pairs (no [m] temps)
PAIRS_MAX = 4096


class TieredState(NamedTuple):
    prices: jax.Array   # [m]
    owner: jax.Array    # [m] int32, -1 free
    sigma: jax.Array    # [n] int32, -1 free
    w: jax.Array        # [n, K] maintained bid margins
    eps: jax.Array      # scalar
    rounds: jax.Array   # int32
    phases: jax.Array   # int32


def default_tiers(n: int) -> Tuple[int, ...]:
    """Static tier capacities, descending; tiers[0] is always n."""
    tiers = [n]
    for c in (65536, 8192, 1024, 128):
        if c < n:
            tiers.append(c)
    return tuple(tiers)


def mask_vals(vals_t, valid):
    """Pre-mask transformed values: padding = neg sentinel (validity becomes
    implicit: padded slots can never win a top-2)."""
    return jnp.where(valid, vals_t, neg_sentinel(vals_t.dtype))


def csc_width(cols: np.ndarray, valid: np.ndarray, m: int) -> int:
    """Host-side max entries per column (static Kc for the device tables)."""
    cc = np.asarray(cols)[np.asarray(valid)]
    if cc.size == 0:
        return 1
    return max(int(np.bincount(cc.ravel(), minlength=m).max()), 1)


def build_csc_device(cols, valid, m: int, Kc: int):
    """Column-ELL position table on device: csc_pos [m, Kc] = flat row-ELL
    positions of each column's entries (pad n*K).  One pair sort plus
    scatters; runs once per solve (avoids shipping a [m, Kc] table through
    the slow host->device tunnel)."""
    n, K = cols.shape
    nK = n * K
    flat = jnp.arange(nK, dtype=jnp.int32)
    colkey = jnp.where(valid, cols, jnp.int32(m)).reshape(-1)
    colkey_s, flat_s = lax.sort((colkey, flat), num_keys=1)
    ones = jnp.where(colkey_s < m, 1, 0).astype(jnp.int32)
    counts = jnp.zeros((m,), jnp.int32).at[colkey_s].add(ones, mode="drop")
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts)[:-1]])
    slot = (jnp.arange(nK, dtype=jnp.int32)
            - starts.at[colkey_s].get(mode="clip"))
    row_idx = jnp.where(colkey_s < m, colkey_s, jnp.int32(m))
    slot_ok = jnp.where((colkey_s < m) & (slot < Kc), slot, jnp.int32(Kc))
    csc_pos = jnp.full((m, Kc), nK, jnp.int32).at[row_idx, slot_ok].set(
        flat_s, mode="drop")
    return csc_pos


def _merge_active(stay: jax.Array, evicted: jax.Array, C: int, n: int):
    """Merge two <= C-sized id lists (pad = n) into an ascending compacted
    list of capacity C.  Disjoint: ``stay`` lost a bid (still unassigned);
    ``evicted`` were assigned before this round."""
    cand = jnp.concatenate([stay, evicted])
    cand = lax.sort(cand)
    return cand[:C]


def _resolve(tgt, bid, ids, m, pairs: bool):
    """Per-column conflict resolution: max bid, ties -> lowest row id.
    Returns the per-bid ``won`` mask."""
    dtype = bid.dtype
    neg = neg_sentinel(dtype)
    if pairs:
        # All-pairs in compact space: i loses iff some j targets the same
        # column with a higher bid or an equal bid from a lower row id.
        same = tgt[:, None] == tgt[None, :]
        beats = same & ((bid[None, :] > bid[:, None]) |
                        ((bid[None, :] == bid[:, None]) &
                         (ids[None, :] < ids[:, None])))
        return (tgt < m) & jnp.logical_not(jnp.any(beats, axis=1))
    best = jnp.full((m,), neg, dtype).at[tgt].max(bid, mode="drop")
    best_ext = jnp.concatenate([best, jnp.asarray([neg], dtype)])
    is_best = bid == best_ext[tgt]                     # tgt=m -> False
    cand = jnp.where(is_best, ids, jnp.int32(_I32_MAX))
    winner = (jnp.full((m,), _I32_MAX, jnp.int32)
              .at[tgt].min(cand, mode="drop"))
    winner_ext = jnp.concatenate(
        [winner, jnp.asarray([_I32_MAX], jnp.int32)])
    return is_best & (winner_ext[tgt] == ids)


def _commit_update(prices, owner, sigma, w, vals_flat, csc_pos,
                   ids, tgt, bid, won, n):
    """Scatter-only commit plus the incremental w update for won columns.
    Won columns are unique (one winner each), so all scatters use unique
    indices."""
    m = prices.shape[0]
    nK = w.shape[0] * w.shape[1]
    tgt_won = jnp.where(won, tgt, jnp.int32(m))
    prev_owner = jnp.where(won, owner.at[tgt].get(mode="clip"), -1)
    prices = prices.at[tgt_won].set(jnp.where(won, bid, prices[0]),
                                    mode="drop")
    owner = owner.at[tgt_won].set(ids, mode="drop")
    sigma = sigma.at[jnp.where(won, ids, n)].set(tgt, mode="drop")
    evicted = jnp.where(prev_owner >= 0, prev_owner, jnp.int32(n))
    sigma = sigma.at[evicted].set(-1, mode="drop")

    # w update: entries of won columns get margin value - new_price.
    posW = csc_pos.at[jnp.where(won, tgt, 0)].get(mode="clip")  # [C, Kc]
    posW = jnp.where(won[:, None], posW, jnp.int32(nK))
    valW = vals_flat.at[posW].get(mode="clip")
    wf = w.reshape(-1)
    wf = wf.at[posW.reshape(-1)].set(
        (valW - bid[:, None]).reshape(-1), mode="drop")
    w = wf.reshape(w.shape)
    return prices, owner, sigma, w, evicted, prev_owner


def compact_round(
    cols, vals_m, nvalid, csc_pos,
    prices, owner, sigma, w,
    ids, eps, bigp,
    *,
    streamed: bool,
    phase_start: bool = False,
):
    """One auction round over the compacted active set ``ids`` (pad = n).

    streamed=False: slice-gather w/vals/cols rows of the active set.
    streamed=True: compute per-row bids from the full [n, K] w stream and
    extract the active slice (cost independent of C; used for wide tiers
    and the fused phase-start violator scan).

    Returns (prices, owner, sigma, w, new_ids, n_won, n_evicted).
    """
    n, K = cols.shape
    m = prices.shape[0]
    C = ids.shape[0]
    dtype = vals_m.dtype
    neg = neg_sentinel(dtype)
    live = ids < n
    vals_flat = vals_m.reshape(-1)

    def top2(wX, valsX, colsX, nvX):
        slot = jnp.argmax(wX, axis=1)
        onehot = jnp.arange(K, dtype=jnp.int32)[None, :] == slot[:, None]
        v1 = jnp.max(wX, axis=1)
        v2 = jnp.max(jnp.where(onehot, neg, wX), axis=1)
        v2 = jnp.where(nvX >= 2, v2, v1 - bigp)
        a_star = jnp.sum(jnp.where(onehot, valsX, jnp.zeros_like(valsX)),
                         axis=1)
        jstar = jnp.sum(jnp.where(onehot, colsX, 0), axis=1)
        return v1, jstar.astype(jnp.int32), a_star - v2 + eps

    real_thresh = (neg // 2 if jnp.issubdtype(dtype, jnp.integer)
                   else neg / 2)

    if streamed:
        v1_f, jstar_f, bid_f = top2(w, vals_m, cols, nvalid)
        if phase_start:
            # Padded slots carry w ~ neg - p, always below the threshold;
            # real entries stay above it (range-checked in make_transform).
            cur_hit = (cols == sigma[:, None]) & (w > real_thresh)
            cur = jnp.sum(jnp.where(cur_hit, w, jnp.zeros_like(w)), axis=1)
            viol = (sigma >= 0) & (cur < v1_f - eps)
            owner = owner.at[jnp.where(viol, sigma, m)].set(-1, mode="drop")
            sigma = jnp.where(viol, jnp.int32(-1), sigma)
        biddable_f = (sigma < 0) & (nvalid > 0)
        # Compact extraction ([C]-sized element gathers).
        tgt = jnp.where(live & biddable_f.at[ids].get(mode="clip"),
                        jstar_f.at[ids].get(mode="clip"), jnp.int32(m))
        bid = bid_f.at[ids].get(mode="clip")
    else:
        colsC = cols.at[ids].get(mode="clip")       # [C, K] slice gathers
        valsC = vals_m.at[ids].get(mode="clip")
        wC = w.at[ids].get(mode="clip")
        nvC = jnp.where(live, nvalid.at[ids].get(mode="clip"), 0)
        v1, jstar, bid = top2(wC, valsC, colsC, nvC)
        if phase_start:
            sigC = jnp.where(live, sigma.at[ids].get(mode="clip"), -1)
            cur_hit = (colsC == sigC[:, None]) & (wC > real_thresh)
            cur = jnp.sum(jnp.where(cur_hit, wC, jnp.zeros_like(wC)), axis=1)
            viol = (sigC >= 0) & (cur < v1 - eps)
            owner = owner.at[jnp.where(viol, sigC, m)].set(-1, mode="drop")
            sigma = sigma.at[jnp.where(viol, ids, n)].set(-1, mode="drop")
            unassigned = sigC < 0
            bidding = live & (nvC > 0) & (unassigned | viol)
        else:
            bidding = live & (nvC > 0)
        tgt = jnp.where(bidding, jstar, jnp.int32(m))

    won = _resolve(tgt, bid, ids, m, pairs=C <= PAIRS_MAX)
    prices, owner, sigma, w, evicted, prev_owner = _commit_update(
        prices, owner, sigma, w, vals_flat, csc_pos, ids, tgt, bid, won, n)

    stay = jnp.where((tgt < m) & jnp.logical_not(won), ids, jnp.int32(n))
    new_ids = _merge_active(stay, evicted, C, n)
    n_won = jnp.sum(won).astype(jnp.int32)
    n_evicted = jnp.sum(prev_owner >= 0).astype(jnp.int32)
    return prices, owner, sigma, w, new_ids, n_won, n_evicted


def tier_ladder(
    cols, vals_m, nvalid, csc_pos,
    prices, owner, sigma, w, ids, active, rounds, eps,
    *,
    bigp,
    tiers: Tuple[int, ...],
    threshold=0,
    max_iter,
):
    """Descend the tier ladder at fixed eps: compact rounds at capacity C
    while ``active`` exceeds max(next tier, threshold); stop once active
    <= threshold (0 = run to completion).  ``threshold`` may be traced.

    Returns (prices, owner, sigma, w, active, rounds).  The internal ids
    buffer narrows with the tiers and is rebuilt per phase by the caller.
    """
    n = sigma.shape[0]
    threshold = jnp.asarray(threshold, jnp.int32)
    carry = (prices, owner, sigma, w, ids, active, rounds, eps)
    for ti, C in enumerate(tiers):
        floor_static = tiers[ti + 1] if ti + 1 < len(tiers) else 0

        def cond(c, floor_static=floor_static):
            act, rnd = c[5], c[6]
            return (act > jnp.maximum(jnp.int32(floor_static), threshold)) \
                & (rnd < max_iter)

        def body(c, C=C):
            prices, owner, sigma, w, ids, act, rnd, eps = c
            prices, owner, sigma, w, ids, n_won, n_evi = compact_round(
                cols, vals_m, nvalid, csc_pos, prices, owner, sigma, w,
                ids, eps, bigp, streamed=C >= STREAM_MIN)
            act = act - n_won + n_evi
            return (prices, owner, sigma, w, ids, act, rnd + 1, eps)

        if C != tiers[0]:
            # Narrow the id buffer to this tier's capacity (ascending
            # prefix holds the live ids; the previous tier's cond
            # guarantees active <= C whenever this loop runs).
            prices, owner, sigma, w, ids, act, rnd, eps = carry
            ids = ids[:C]
            carry = (prices, owner, sigma, w, ids, act, rnd, eps)
        carry = lax.while_loop(cond, body, carry)
    prices, owner, sigma, w, ids, active, rounds, eps = carry
    return prices, owner, sigma, w, active, rounds


def solve_ell_tiered(
    cols: jax.Array,
    vals_t: jax.Array,
    valid: jax.Array,
    nvalid: jax.Array,
    p0: jax.Array,
    eps0,
    eps_min,
    theta,
    max_iter,
    Kc: int,
    tiers: Optional[Tuple[int, ...]] = None,
    bigp=None,
    trunc=0,
) -> _auction.SolveResult:
    """eps-scaled tiered-compaction solve for square effective problems
    (no implicit dummies).  Same result contract as auction.solve_ell.

    ``Kc`` is the static max entries per column (compact.csc_width on the
    host).  ``trunc`` > 0 truncates every phase once <= trunc rows are
    active; the hybrid driver's host GS completes the final phase (only it
    must run to completion at eps_min for correctness)."""
    n, K = cols.shape
    m = p0.shape[0]
    dtype = vals_t.dtype
    neg = neg_sentinel(dtype)
    pos = -neg
    if tiers is None:
        tiers = default_tiers(n)
    assert tiers[0] == n, "top tier must cover all rows"

    if bigp is None:
        vmax = jnp.max(jnp.where(valid, vals_t, neg))
        vmin = jnp.min(jnp.where(valid, vals_t, pos))
        one = jnp.asarray(1, dtype)
        bigp = jnp.maximum(vmax - vmin, jnp.zeros_like(one)) + one
    else:
        bigp = jnp.asarray(bigp, dtype)

    eps0 = jnp.maximum(jnp.asarray(eps0, dtype), jnp.asarray(eps_min, dtype))
    eps_min = jnp.asarray(eps_min, dtype)
    theta = jnp.asarray(theta, dtype)
    max_iter = jnp.asarray(max_iter, jnp.int32)
    all_rows = jnp.arange(n, dtype=jnp.int32)

    vals_m = mask_vals(vals_t, valid)
    csc_pos = build_csc_device(cols, valid, m, Kc)
    # Initial margins (one-time element gather; exact for warm prices too).
    w0 = vals_m - p0.astype(dtype)[cols]

    def count_active(ids):
        return jnp.sum(ids < n).astype(jnp.int32)

    def run_phase(st: TieredState, first: bool) -> TieredState:
        prices, owner, sigma, w = st.prices, st.owner, st.sigma, st.w
        # Phase-start full-width round: violator scan + first bids fused.
        ids_full = jnp.where((sigma < 0) & (nvalid > 0) | (sigma >= 0),
                             all_rows, jnp.int32(n))
        if first:
            ids_full = jnp.where(nvalid > 0, all_rows, jnp.int32(n))
        prices, owner, sigma, w, ids, n_won, n_evi = compact_round(
            cols, vals_m, nvalid, csc_pos, prices, owner, sigma, w,
            ids_full, st.eps, bigp, streamed=True, phase_start=not first)
        rounds = st.rounds + 1
        active = count_active(ids)

        prices, owner, sigma, w, active, rounds = tier_ladder(
            cols, vals_m, nvalid, csc_pos,
            prices, owner, sigma, w, ids, active, rounds, st.eps,
            bigp=bigp, tiers=tiers, threshold=trunc, max_iter=max_iter)
        return st._replace(prices=prices, owner=owner, sigma=sigma, w=w,
                           rounds=rounds, phases=st.phases + 1)

    init = TieredState(
        prices=p0.astype(dtype),
        owner=jnp.full((m,), -1, jnp.int32),
        sigma=jnp.full((n,), -1, jnp.int32),
        w=w0,
        eps=eps0,
        rounds=jnp.int32(0),
        phases=jnp.int32(0),
    )
    st = run_phase(init, first=True)

    def outer_cond(carry):
        st, done = carry
        return jnp.logical_not(done)

    def outer_body(carry):
        st, _ = carry
        new_eps = _auction._next_eps(st.eps, theta, eps_min)
        st = run_phase(st._replace(eps=new_eps), first=False)
        done = (st.eps <= eps_min) | (st.rounds >= max_iter)
        return st, done

    done0 = (st.eps <= eps_min) | (st.rounds >= max_iter)
    st, _ = lax.while_loop(outer_cond, outer_body, (st, done0))

    unassigned = jnp.sum((st.sigma < 0) & (nvalid > 0)).astype(jnp.int32)
    return _auction.SolveResult(
        sigma=st.sigma, prices=st.prices, rounds=st.rounds,
        phases=st.phases, final_eps=st.eps, unassigned=unassigned,
    )
