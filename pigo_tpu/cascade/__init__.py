from pigo_tpu.cascade.format import (
    FaceForest,
    PupilForest,
    unpack_face_cascade,
    unpack_pupil_cascade,
)
from pigo_tpu.cascade.assets import (
    asset_path,
    load_facefinder,
    load_puploc,
    load_landmark_dir,
)

__all__ = [
    "FaceForest",
    "PupilForest",
    "unpack_face_cascade",
    "unpack_pupil_cascade",
    "asset_path",
    "load_facefinder",
    "load_puploc",
    "load_landmark_dir",
]
