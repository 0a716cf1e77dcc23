"""FaceDetector: the full face -> pupils -> landmarks pipeline.

Mirrors the reference CLI pipeline (/root/reference/cmd/pigo/main.go):
  - RunCascade + ClusterDetections with the CLI defaults,
  - per-face eye anchors (main.go:416-421, :454-458):
        left  = (row - 0.075*s, col - 0.175*s), scale 0.25*s
        right = (row - 0.075*s, col + 0.185*s), scale 0.25*s
    gated on face.Q > 5.0 and face.Scale > 50 (main.go:360, :404),
  - the 15-point landmark schedule (5 eye cascades x2 flips, 4 mouth,
    lp84 as nose via flipV; main.go:493-564),
  - JSON export schema {face:{x,y,size}, eyes:[...], landmark_points:[...]}
    (main.go:89-100), where x is the image column and y the row.

Deviation from the reference (documented): the reference CLI accumulates the
eye/landmark coordinate slices ACROSS faces, so face i's JSON contains every
eye found for faces 0..i (main.go:363-365 never resets them); here each face
reports only its own points.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax

from pigo_tpu.models.face import FaceCascade
from pigo_tpu.models.landmark import LandmarkLocalizer
from pigo_tpu.models.pupil import PupilLocalizer, Puploc
from pigo_tpu.ops.cluster import cluster_detections

# CLI constants (cmd/pigo/main.go:54, :360, :404)
PERTURBS = 63
Q_THRESH = 5.0
MIN_EYE_FACE_SCALE = 50


@dataclasses.dataclass(frozen=True)
class ImageParams:
    """Grayscale frame (reference core/pigo.go:29-34)."""

    pixels: np.ndarray  # flat uint8 [rows*dim]
    rows: int
    cols: int
    dim: int


@dataclasses.dataclass(frozen=True)
class CascadeParams:
    """Detection parameters (reference core/pigo.go:16-22; CLI defaults
    main.go:105-119)."""

    min_size: int = 20
    max_size: int = 1000
    shift_factor: float = 0.15
    scale_factor: float = 1.15


@dataclasses.dataclass(frozen=True)
class Detection:
    """One clustered face detection (reference core/pigo.go:195-200)."""

    row: int
    col: int
    scale: int
    q: float


@dataclasses.dataclass
class FaceResult:
    """Full per-face result: detection + eyes + landmark points."""

    face: Detection
    eyes: list[Puploc] = dataclasses.field(default_factory=list)
    landmarks: list[Puploc] = dataclasses.field(default_factory=list)

    def to_json_dict(self) -> dict:
        """Reference JSON schema (main.go:89-100, 394-398, 446-450):
        x = image column, y = image row; zero-valued fields are dropped to
        match Go's `omitempty` marshaling."""

        def drop_zero(d: dict) -> dict:
            return {k: v for k, v in d.items() if v != 0}

        out: dict = {
            "face": drop_zero(
                {
                    "x": self.face.col - self.face.scale // 2,
                    "y": self.face.row - self.face.scale // 2,
                    "size": self.face.scale,
                }
            )
        }
        if self.eyes:
            out["eyes"] = [
                drop_zero({"x": e.col, "y": e.row, "size": int(e.scale)})
                for e in self.eyes
            ]
        if self.landmarks:
            out["landmark_points"] = [
                drop_zero({"x": p.col, "y": p.row, "size": int(p.scale)})
                for p in self.landmarks
            ]
        return out


class FaceDetector:
    """End-to-end detector; loads the bundled cascades by default."""

    def __init__(
        self,
        face: FaceCascade | None = None,
        pupil: PupilLocalizer | None = None,
        landmarks: LandmarkLocalizer | None = None,
        *,
        with_pupils: bool = True,
        with_landmarks: bool = True,
    ):
        self.face = face if face is not None else FaceCascade()
        self.pupil = (
            pupil
            if pupil is not None
            else (PupilLocalizer() if (with_pupils or with_landmarks) else None)
        )
        self.landmarks = (
            landmarks
            if landmarks is not None
            else (LandmarkLocalizer() if with_landmarks else None)
        )

    def detect_faces(
        self,
        gray: np.ndarray,
        rows: int,
        cols: int,
        params: CascadeParams = CascadeParams(),
        angle: float = 0.0,
        iou_threshold: float = 0.15,
    ) -> list[Detection]:
        """RunCascade + ClusterDetections (main.go:350-353)."""
        dets = self.face.run_cascade(
            gray, rows, cols,
            min_size=params.min_size, max_size=params.max_size,
            shift_factor=params.shift_factor, scale_factor=params.scale_factor,
            angle=angle,
        )
        clusters = cluster_detections(dets, iou_threshold)
        return [
            Detection(row=int(r), col=int(c), scale=int(s), q=float(q))
            for r, c, s, q in clusters
        ]

    def detect(
        self,
        gray: np.ndarray,
        rows: int,
        cols: int,
        params: CascadeParams = CascadeParams(),
        angle: float = 0.0,
        iou_threshold: float = 0.15,
        perturbs: int = PERTURBS,
        key: jax.Array | None = None,
    ) -> list[FaceResult]:
        """Full pipeline: faces, then eyes + landmarks per qualifying face."""
        faces = self.detect_faces(gray, rows, cols, params, angle, iou_threshold)
        key = key if key is not None else jax.random.PRNGKey(0)
        results: list[FaceResult] = []
        for face in faces:
            if face.q <= Q_THRESH:
                continue
            res = FaceResult(face=face)
            if (
                self.pupil is not None
                and face.scale > MIN_EYE_FACE_SCALE
            ):
                key, k1, k2, k3 = jax.random.split(key, 4)
                s = face.scale
                left = self.pupil.run_detector(
                    Puploc(
                        row=face.row - int(0.075 * s),
                        col=face.col - int(0.175 * s),
                        scale=float(s) * 0.25,
                        perturbs=perturbs,
                    ),
                    gray, rows, cols, angle=angle, key=k1,
                )
                right = self.pupil.run_detector(
                    Puploc(
                        row=face.row - int(0.075 * s),
                        col=face.col + int(0.185 * s),
                        scale=float(s) * 0.25,
                        perturbs=perturbs,
                    ),
                    gray, rows, cols, angle=angle, key=k2,
                )
                if left.row > 0 and left.col > 0:
                    res.eyes.append(left)
                if right.row > 0 and right.col > 0:
                    res.eyes.append(right)
                if (
                    self.landmarks is not None
                    and left.row > 0 and left.col > 0
                    and right.row > 0 and right.col > 0
                ):
                    pts = self.landmarks.detect_points(
                        left, right, gray, rows, cols,
                        perturbs=perturbs, key=k3,
                    )
                    res.landmarks = [p for p in pts if p.row > 0 and p.col > 0]
            results.append(res)
        return results
