"""Scalar-semantics oracle (NumPy) — the golden reference for parity tests.

These implementations replicate the reference's arithmetic exactly
(integer fixed-point shifts, f32 accumulation order, bintest polarities,
clamp quirks) but are NOT the production path; the JAX/Pallas kernels in
pigo_tpu.ops are tested window-by-window against these.
"""

from pigo_tpu.oracle.face import (
    oracle_classify_region,
    oracle_classify_rotated_region,
    oracle_run_cascade,
    oracle_run_cascade_scalar,
)
from pigo_tpu.oracle.pupil import (
    oracle_pupil_walk,
    oracle_pupil_rotated_walk,
    oracle_run_detector,
)
from pigo_tpu.oracle.cluster import oracle_cluster_detections

__all__ = [
    "oracle_classify_region",
    "oracle_classify_rotated_region",
    "oracle_run_cascade",
    "oracle_run_cascade_scalar",
    "oracle_pupil_walk",
    "oracle_pupil_rotated_walk",
    "oracle_run_detector",
    "oracle_cluster_detections",
]
