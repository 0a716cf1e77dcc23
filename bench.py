#!/usr/bin/env python
"""Headline benchmark: whole-image face detection vs the reference baseline.

Reference baseline (BASELINE.md): whole-image detection at 173,664,832 ns/op
(~173.7 ms/frame) on the published pigo-vs-GoCV benchmark. This bench runs
the same workload shape — the full detection pyramid over sample.jpg
(320x400, MinSize 20, shift 0.1, scale 1.1 => 218,449 windows) through the
dense Pallas path with per-frame host sync — and prints ONE JSON line:

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline = reference_frame_time / our_frame_time (higher is better).
"""

from __future__ import annotations

import json
import sys
import time

REFERENCE_FRAME_SECONDS = 0.173664832  # BASELINE.md / README.md:223-231


def main() -> int:
    import numpy as np

    from pigo_tpu.io.image import get_image, rgb_to_grayscale
    from pigo_tpu.models.face import FaceCascade
    from pigo_tpu.ops.cluster import cluster_detections

    img = get_image("assets/testdata/sample.jpg")
    rows, cols = img.shape[0], img.shape[1]
    gray = rgb_to_grayscale(img)

    fc = FaceCascade()
    cfg = dict(min_size=20, max_size=1000, shift_factor=0.1, scale_factor=1.1)

    # warmup / compile
    dets = fc.run_cascade(gray, rows, cols, **cfg)
    n_dets = dets.shape[0]
    clusters = cluster_detections(dets, 0.2)
    assert clusters.shape[0] >= 1, "benchmark sanity: no face found"

    for _ in range(3):
        fc.run_cascade(gray, rows, cols, **cfg)

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        fc.run_cascade(gray, rows, cols, **cfg)
    dt = (time.perf_counter() - t0) / n_iter

    plan, *_ = fc._dense_plan(rows, cols, 20, 1000, 0.1, 1.1)
    print(
        json.dumps(
            {
                "metric": "face_detection_frames_per_second",
                "value": round(1.0 / dt, 2),
                "unit": f"frames/s (full {plan.num_windows}-window pyramid, "
                        f"320x400, incl. host sync; {n_dets} raw dets)",
                "vs_baseline": round(REFERENCE_FRAME_SECONDS / dt, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
