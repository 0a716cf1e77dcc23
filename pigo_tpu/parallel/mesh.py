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
    device count.

    With explicit (coordinator, num_processes, process_id) arguments a
    failure to join the cluster RAISES — a caller asking for a specific
    cluster must not silently run single-host. Argument-less autodetection
    stays a safe no-op outside cluster environments. On the CPU backend
    cross-process collectives use the gloo transport (exercised by the
    2-process test, tests/test_multiprocess.py)."""
    explicit = coordinator is not None
    # read the configured platform WITHOUT initializing a backend —
    # distributed.initialize must run before the first backend use
    platforms = jax.config.jax_platforms or ""
    if explicit and "cpu" in platforms:
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # newer jax may rename/remove the knob; default then
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        if explicit:
            raise
        # autodetect path: single-process / already initialized
    return len(jax.devices())
