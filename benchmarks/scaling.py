"""Multi-chip scaling benchmark: frames/sec vs mesh size.

Measures frame-data-parallel throughput of the window classifier over
1..N-device meshes and reports scaling efficiency (north-star target:
>= 0.9 from 1 chip to N, BASELINE.json). On a single-chip or CPU host this
exercises the virtual device mesh (XLA_FLAGS=--xla_force_host_platform_
device_count=8) — the structure is identical to a real multi-chip slice,
only the interconnect differs.

    PIGO_TPU_PLATFORM=cpu python -m benchmarks.scaling
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main(argv=None) -> int:
    # The TPU plugin environment may import jax at interpreter start, so the
    # JAX_PLATFORMS env var is too late — switch via config.update.
    if os.environ.get("PIGO_TPU_PLATFORM", "") == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from pigo_tpu.io.image import get_image, rgb_to_grayscale
    from pigo_tpu.parallel import ShardedFaceCascade, make_mesh
    from pigo_tpu.cascade.assets import asset_path

    img = get_image(asset_path("testdata", "sample.jpg"))
    rows, cols = img.shape[0], img.shape[1]
    gray = rgb_to_grayscale(img)

    n_dev = len(jax.devices())
    cfg = dict(min_size=60, max_size=400, shift_factor=0.2, scale_factor=1.2)
    frames_per_chip = 4
    results = []
    base_fps = None
    n = 1
    while n <= n_dev:
        mesh = make_mesh(n, "frame")
        sharded = ShardedFaceCascade(mesh)
        frames = np.broadcast_to(gray, (n * frames_per_chip, gray.size))
        plan, q, total = sharded.batch_scores(frames, rows, cols, **cfg)
        jax.block_until_ready(q)
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            plan, q, total = sharded.batch_scores(frames, rows, cols, **cfg)
            jax.block_until_ready(q)
        dt = (time.perf_counter() - t0) / iters
        fps = n * frames_per_chip / dt
        if base_fps is None:
            base_fps = fps
        eff = fps / (base_fps * n)
        entry = {
            "mesh": n,
            "frames_per_second": round(fps, 2),
            "scaling_efficiency": round(eff, 3),
            "windows_per_second": int(plan.num_windows * fps),
        }
        if jax.default_backend() == "cpu" and n > 1:
            # virtual devices share the host cores: efficiency here validates
            # the sharded program structure, not real ICI scaling
            entry["note"] = "virtual CPU mesh; efficiency not meaningful"
        results.append(entry)
        print(json.dumps(results[-1]), flush=True)
        n *= 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
