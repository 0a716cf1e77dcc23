"""pigo_tpu — a TPU-native object-detection framework with the capabilities of esimov/pigo.

Implements the PICO algorithm family (pixel-intensity-comparison decision-tree
cascades; arXiv:1305.4537) as dense, batched JAX/XLA/Pallas programs:

- Face detection: multi-scale sliding-window soft cascade
  (reference semantics: /root/reference/core/pigo.go).
- Pupil / eye localization: perturbation ensemble of regression-tree stages
  (reference semantics: /root/reference/core/puploc.go).
- Facial landmark points: the pupil machinery re-anchored + vertical flip
  (reference semantics: /root/reference/core/flploc.go).

The reference is sparse/sequential (per-window early exit); this framework is
dense/batched: all pyramid windows are materialized as one flat axis, trees are
evaluated as vectorized gathers + compares with exact soft-cascade masking, and
frames are sharded over a `jax.sharding.Mesh` for multi-chip scale-out.
"""

from __future__ import annotations

import importlib

__version__ = "0.1.0"

# Lazy public API: symbol -> defining module. Keeps `import pigo_tpu` cheap
# (no JAX import) for tooling that only needs the loaders or the oracle.
_EXPORTS = {
    "FaceForest": "pigo_tpu.cascade.format",
    "PupilForest": "pigo_tpu.cascade.format",
    "unpack_face_cascade": "pigo_tpu.cascade.format",
    "unpack_pupil_cascade": "pigo_tpu.cascade.format",
    "asset_path": "pigo_tpu.cascade.assets",
    "load_facefinder": "pigo_tpu.cascade.assets",
    "load_puploc": "pigo_tpu.cascade.assets",
    "load_landmark_dir": "pigo_tpu.cascade.assets",
    "FaceCascade": "pigo_tpu.models.face",
    "PupilLocalizer": "pigo_tpu.models.pupil",
    "Puploc": "pigo_tpu.models.pupil",
    "LandmarkLocalizer": "pigo_tpu.models.landmark",
    "CascadeParams": "pigo_tpu.detector",
    "ImageParams": "pigo_tpu.detector",
    "Detection": "pigo_tpu.detector",
    "FaceDetector": "pigo_tpu.detector",
    "FaceResult": "pigo_tpu.detector",
    "cluster_detections": "pigo_tpu.ops.cluster",
    "get_image": "pigo_tpu.io.image",
    "decode_image": "pigo_tpu.io.image",
    "rgb_to_grayscale": "pigo_tpu.io.image",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module 'pigo_tpu' has no attribute {name!r}")
    value = getattr(importlib.import_module(mod), name)
    globals()[name] = value
    return value


def __dir__():
    return __all__ + ["__version__"]
