"""Checkpoint / resume / warm-start (SURVEY.md SS6).

Auction solver state is tiny -- (prices [m], eps scalar, round counters) --
so checkpointing is a host-side npz snapshot.  The same payload powers
*warm-starting*: reusing prices across similar instances (a classic auction
algorithm speedup for tracking workloads where costs change slightly
between frames).  Restore feeds ``AuctionSolver.solve(warm_prices=...)``
(and ``eps_start=`` to resume a partially-annealed schedule).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np


_FORMAT_VERSION = 1


def save_state(path, prices, *, eps: Optional[float] = None,
               rounds: int = 0, phases: int = 0, extra: Optional[dict] = None):
    """Snapshot solver state to ``path`` (.npz)."""
    path = Path(path)
    meta = {"version": _FORMAT_VERSION, "eps": eps, "rounds": int(rounds),
            "phases": int(phases), "extra": extra or {}}
    np.savez(path, prices=np.asarray(prices), meta=json.dumps(meta))
    return path


def load_state(path):
    """Load a snapshot: returns (prices ndarray, meta dict with
    'eps'/'rounds'/'phases'/'extra')."""
    with np.load(Path(path), allow_pickle=False) as z:
        prices = z["prices"]
        meta = json.loads(str(z["meta"]))
    if meta.get("version") != _FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version: {meta.get('version')}")
    return prices, meta
