"""Tracing / profiling hooks (SURVEY.md SS6 'Tracing / profiling').

Thin wrappers over jax.profiler so callers can annotate solve phases and
dump perfetto traces without importing jax.profiler everywhere.  Throughput
counters (nnz/s, rounds/s) are computed by the benchmark harness from the
meta dict; per-round observability is the ``on_round`` debug callback in
auction.solve_ell.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional


@contextlib.contextmanager
def trace_annotation(name: str) -> Iterator[None]:
    """Named region in the device trace (viewable in perfetto/xprof)."""
    import jax.profiler
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_trace(log_dir: str, *, create_perfetto_link: bool = False
                  ) -> Iterator[None]:
    """Capture a full profiler trace around a block (SURVEY.md SS6:
    'optional perfetto dump')."""
    import jax.profiler
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def throughput_counters(nnz: int, meta: dict) -> dict:
    """Derive nnz/s and rounds/s from a solve meta dict (SURVEY.md SS6
    'nnz/s + rounds/s counters in meta')."""
    t = max(meta.get("time", 0.0), 1e-12)
    rounds = meta.get("its", 0)
    return {
        "nnz_per_s": nnz * rounds / t,
        "rounds_per_s": rounds / t,
        "time": t,
        "rounds": rounds,
    }
