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
