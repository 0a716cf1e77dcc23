"""Multi-chip scaling benchmark: frames/sec vs mesh size.

Measures frame-data-parallel throughput of the production window classifier
(`ShardedFaceCascade.batch_hits`, the vmapped Pallas pyramid + on-device hit
compaction under shard_map) over 1..N-device meshes and reports scaling
efficiency (north-star target: >= 0.9 from 1 chip to N, BASELINE.json).
On a single-chip or CPU host this exercises the virtual device mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) — the structure is
identical to a real multi-chip slice, only the interconnect differs.

    PIGO_TPU_PLATFORM=cpu python -m benchmarks.scaling
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def run_scaling(max_mesh: int | None = None, frames_per_chip: int = 4,
                iters: int = 3, cfg: dict | None = None,
                frame: np.ndarray | None = None) -> list[dict]:
    """Run the mesh sweep; returns (and prints) one JSON record per mesh
    size. Importable so CI can smoke-test the harness on a small mesh
    (pass a tiny `frame` + cheap `cfg` to keep interpret mode fast)."""
    import jax

    from pigo_tpu.io.image import get_image, rgb_to_grayscale
    from pigo_tpu.parallel import ShardedFaceCascade, make_mesh
    from pigo_tpu.cascade.assets import asset_path

    if frame is None:
        img = get_image(asset_path("testdata", "sample.jpg"))
        rows, cols = img.shape[0], img.shape[1]
        gray = rgb_to_grayscale(img).reshape(rows, cols)
    else:
        gray = np.asarray(frame, np.uint8)
        rows, cols = gray.shape

    n_dev = len(jax.devices())
    if max_mesh is not None:
        n_dev = min(n_dev, max_mesh)
    if cfg is None:
        cfg = dict(min_size=60, max_size=400, shift_factor=0.2,
                   scale_factor=1.2)
    results: list[dict] = []
    base_fps = None
    n = 1
    while n <= n_dev:
        mesh = make_mesh(n, "frame")
        sharded = ShardedFaceCascade(mesh)
        frames = np.broadcast_to(gray, (n * frames_per_chip, rows, cols))
        # warm up (traces + compiles the sharded program)
        dets, _ = sharded.batch_hits(frames, rows, cols, **cfg)
        t0 = time.perf_counter()
        for _ in range(iters):
            dets, total = sharded.batch_hits(frames, rows, cols, **cfg)
        dt = (time.perf_counter() - t0) / iters
        fps = n * frames_per_chip / dt
        if base_fps is None:
            base_fps = fps
        eff = fps / (base_fps * n)
        plan, _, _, _ = sharded._batch_fn(
            rows, cols, cfg["min_size"], cfg["max_size"],
            cfg["shift_factor"], cfg["scale_factor"],
        )
        entry = {
            "mesh": n,
            "frames_per_second": round(fps, 2),
            "scaling_efficiency": round(eff, 3),
            "windows_per_second": int(plan.num_windows * fps),
            "detections_frame0": int(np.asarray(dets[0]).shape[0]),
        }
        if jax.default_backend() == "cpu" and n > 1:
            # virtual devices share the host cores: efficiency here validates
            # the sharded program structure, not real ICI scaling
            entry["note"] = "virtual CPU mesh; efficiency not meaningful"
        results.append(entry)
        print(json.dumps(entry), flush=True)
        n *= 2
    return results


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
    run_scaling()
    return 0


if __name__ == "__main__":
    sys.exit(main())
