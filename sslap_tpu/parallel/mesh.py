"""Mesh construction helpers (T8).

Single-slice: one 'rows' axis over all local devices (ICI).  Multi-host: a
hybrid ('hosts', 'rows') mesh where the hosts axis rides DCN; the row
partition maps shards so that the per-round price combine does its large
reduction over ICI within a slice and only the small packed result over DCN
(jax's hybrid mesh utilities order collectives that way automatically).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper for multi-host pods.  No-op when
    already initialized or single-process (SURVEY.md SS6 T8)."""
    if jax.process_count() > 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process launch


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "rows") -> Mesh:
    """1-D mesh over all (or given) devices.  For multi-host runs, uses the
    hybrid mesh helper so the axis ordering keeps intra-host neighbors
    adjacent (collectives ride ICI first, DCN last)."""
    if devices is not None:
        return Mesh(np.asarray(devices), (axis_name,))
    n_local = len(jax.local_devices())
    n_total = len(jax.devices())
    if jax.process_count() > 1 and n_total > n_local:
        dev = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(n_local,),
            dcn_mesh_shape=(jax.process_count(),),
        )
        return Mesh(dev.reshape(-1), (axis_name,))
    return Mesh(np.asarray(jax.devices()), (axis_name,))
