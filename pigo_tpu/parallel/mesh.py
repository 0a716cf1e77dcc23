"""Device mesh helpers.

The reference is single-process/single-thread (SURVEY.md section 2.4); the
TPU-native scale-out axes are:
  - "batch": data parallelism over frames/streams (the serving path),
  - "window": sharding one frame's flat pyramid-window axis across chips
    (the structural analog of sequence parallelism — the reference
    serializes ~2e5 windows; we split them over ICI).

Cascade weights are tiny (234KB-1.2MB) and always replicated in HBM.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: int | None = None, axis_name: str = "window"
) -> Mesh:
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (axis_name,))


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Multi-host setup: jax.distributed.initialize + global device count.

    Call once per host process before building meshes; with no arguments
    JAX autodetects the cluster (TPU pod environments). Frame batches shard
    over `jax.devices()` (all hosts); the all_gather of per-chip hit lists
    rides ICI within a slice and DCN across hosts. Returns the global
    device count. Safe to call on a single host (no-op)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        pass  # single-process / already initialized
    return len(jax.devices())
