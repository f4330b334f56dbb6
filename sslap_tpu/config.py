"""Frozen solver configuration (SURVEY.md SS6 'Config / flag system').

The reference's config surface is function kwargs only; we mirror that in
the public API (api.py) and normalize into this dataclass internally.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class AuctionConfig:
    problem: str = "min"                 # 'min' | 'max'
    eps_start: Optional[float] = None    # default: ~(cost range)/2 (scaled)
    eps_min: Optional[float] = None      # default: 1 (int) | 1/(n+1) (float)
    theta: float = 5.0                   # geometric eps divisor
    max_iter: Optional[int] = None       # Jacobi rounds cap (safety valve)
    cardinality_check: bool = True       # Hopcroft-Karp pre-check
    # Kernel/layout selection:
    use_pallas: Optional[bool] = None    # None = auto (TPU and shapes allow)
    # Distribution (parallel/sharded.py):
    mesh: Optional[object] = None
    row_axis: str = "rows"
    # Determinism contract (documented tie-break, SURVEY.md SS8.2 item 2):
    #   row picks highest value then lowest column index;
    #   column picks highest bid then lowest row index.

    def __post_init__(self):
        if self.problem not in ("min", "max"):
            raise ValueError(
                f"problem must be 'min' or 'max', got {self.problem!r}")
        if self.theta <= 1:
            raise ValueError("theta must be > 1")
