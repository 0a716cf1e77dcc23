"""Shared plumbing for the realtime demos.

Mirrors the structure of the reference demos (/root/reference/examples/*):
a Python + OpenCV driver loop over frames, with detection delegated to an
engine. Two engines are available:

  * "tpu"    — the JAX/Pallas pipeline (pigo_tpu.detector.FaceDetector),
  * "native" — the C++ host engine via ctypes (pigo_tpu.native), the direct
               counterpart of the reference's cgo c-shared bridges.

Frame sources: webcam (`--source 0`), video file, or a still image
(`--frames N` repeats for benchmarking). Headless environments can write the
annotated stream to a video/image with `--out`.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

PERTURBS = 63
Q_THRESH = 5.0
MIN_EYE_FACE_SCALE = 50

# Landmark roles (reference cmd/pigo/main.go:68-71; 5 eye cascades x2 flips,
# 4 mouth cascades, lp84 flipped as nose).
EYE_CASCADES = ["lp38", "lp312", "lp42", "lp44", "lp46"]
MOUTH_CASCADES = ["lp81", "lp82", "lp84", "lp93"]
NOSE_CASCADE = "lp84"


def build_argparser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--source", default="0",
                   help="webcam index, video file, or image path")
    p.add_argument("--engine", default="native", choices=("native", "tpu"),
                   help="detection engine (native C++ on host, or TPU)")
    p.add_argument("--out", default="",
                   help="write annotated output here instead of a window")
    p.add_argument("--frames", type=int, default=0,
                   help="stop after N frames (0 = until EOF/keypress)")
    p.add_argument("--min-size", type=int, default=100)
    p.add_argument("--max-size", type=int, default=600)
    p.add_argument("--shift", type=float, default=0.1)
    p.add_argument("--scale", type=float, default=1.1)
    p.add_argument("--iou", type=float, default=0.2)
    return p


class FrameSource:
    """Webcam / video / still-image frame iterator (BGR uint8)."""

    def __init__(self, source: str, max_frames: int = 0):
        import cv2

        self._cv2 = cv2
        self.max_frames = max_frames
        self._image = None
        self._cap = None
        if source.isdigit():
            self._cap = cv2.VideoCapture(int(source))
            if not self._cap.isOpened():
                raise SystemExit(
                    f"cannot open webcam {source}; pass --source <video|image>"
                )
        elif os.path.splitext(source.lower())[1] in (".jpg", ".jpeg", ".png", ".bmp"):
            self._image = cv2.imread(source)
            if self._image is None:
                raise SystemExit(f"cannot read image {source}")
            if self.max_frames == 0:
                self.max_frames = 1
        else:
            self._cap = cv2.VideoCapture(source)
            if not self._cap.isOpened():
                raise SystemExit(f"cannot open video {source}")

    def __iter__(self):
        n = 0
        while self.max_frames == 0 or n < self.max_frames:
            if self._image is not None:
                frame = self._image.copy()
            else:
                ok, frame = self._cap.read()
                if not ok:
                    return
            yield frame
            n += 1

    def release(self):
        if self._cap is not None:
            self._cap.release()


class Sink:
    """Window or file sink for annotated frames."""

    def __init__(self, out: str, title: str):
        import cv2

        self._cv2 = cv2
        self.out = out
        self.title = title
        self._writer = None
        self._last = None

    def show(self, frame) -> bool:
        """Returns False when the loop should stop (window closed / 'q')."""
        cv2 = self._cv2
        if self.out:
            ext = os.path.splitext(self.out.lower())[1]
            if ext in (".jpg", ".jpeg", ".png"):
                self._last = frame
                cv2.imwrite(self.out, frame)
            else:
                if self._writer is None:
                    h, w = frame.shape[:2]
                    self._writer = cv2.VideoWriter(
                        self.out, cv2.VideoWriter_fourcc(*"mp4v"), 20, (w, h)
                    )
                self._writer.write(frame)
            return True
        cv2.imshow(self.title, frame)
        return (cv2.waitKey(1) & 0xFF) != ord("q")

    def release(self):
        if self._writer is not None:
            self._writer.release()


class NativeEngine:
    """Full pipeline on the C++ host engine (faces -> pupils -> landmarks).

    The orchestration mirrors the reference bridge exports
    (examples/puploc/puploc.go, examples/facial_landmark/flploc.go).
    """

    def __init__(self, with_pupils=True, with_landmarks=False, seed=0):
        from pigo_tpu.cascade.assets import asset_path
        from pigo_tpu.native import NativeFaceCascade, NativePupilLocalizer, native_cluster

        self.face = NativeFaceCascade()
        self.cluster = native_cluster
        self.seed = seed
        self.pupil = None
        self.lps: dict[str, object] = {}
        if with_pupils or with_landmarks:
            self.pupil = NativePupilLocalizer()
        if with_landmarks:
            lps_dir = asset_path("cascade", "lps")
            for name in sorted(os.listdir(lps_dir)):
                with open(os.path.join(lps_dir, name), "rb") as fh:
                    self.lps[name] = NativePupilLocalizer(fh.read())

    def grayscale(self, frame_bgr: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(frame_bgr[:, :, ::-1])  # BGR -> RGB view

    def detect(self, frame_bgr: np.ndarray, *, min_size=100, max_size=600,
               shift=0.1, scale=1.1, iou=0.2) -> list[dict]:
        from pigo_tpu.native import native_grayscale

        rows, cols = frame_bgr.shape[:2]
        gray = native_grayscale(self.grayscale(frame_bgr))
        dets = self.face.run_cascade(
            gray, rows, cols, min_size=min_size, max_size=max_size,
            shift_factor=shift, scale_factor=scale)
        faces = self.cluster(dets, iou)
        results = []
        for r, c, s, q in faces:
            if q <= Q_THRESH:
                continue
            res = {"face": (int(r), int(c), int(s), float(q)),
                   "eyes": [], "landmarks": []}
            if self.pupil is not None and s > MIN_EYE_FACE_SCALE:
                left = self._eye(gray, rows, cols, r - 0.075 * s,
                                 c - 0.175 * s, 0.25 * s)
                right = self._eye(gray, rows, cols, r - 0.075 * s,
                                  c + 0.185 * s, 0.25 * s)
                for e in (left, right):
                    if e[0] > 0 and e[1] > 0:
                        res["eyes"].append(e)
                if self.lps and left[0] > 0 and right[0] > 0:
                    res["landmarks"] = self._landmarks(gray, rows, cols,
                                                       left, right)
            results.append(res)
        return results

    def _eye(self, gray, rows, cols, row, col, scale):
        starts = self.pupil.jitter(row, col, scale, PERTURBS, self.seed)
        return self.pupil.run_detector(starts, gray, rows, cols)

    def _landmarks(self, gray, rows, cols, left, right):
        pts = []
        for name in EYE_CASCADES:
            for flip in (False, True):
                pts.append(self.lps[name].landmark(
                    left[:2], right[:2], gray, rows, cols,
                    perturbs=PERTURBS, seed=self.seed, flip_v=flip))
        for name in MOUTH_CASCADES:
            pts.append(self.lps[name].landmark(
                left[:2], right[:2], gray, rows, cols,
                perturbs=PERTURBS, seed=self.seed))
        pts.append(self.lps[NOSE_CASCADE].landmark(
            left[:2], right[:2], gray, rows, cols,
            perturbs=PERTURBS, seed=self.seed, flip_v=True))
        return [p for p in pts if p[0] > 0 and p[1] > 0]


class TpuEngine:
    """Full pipeline on the JAX/Pallas TPU path."""

    def __init__(self, with_pupils=True, with_landmarks=False, seed=0):
        import jax
        from pigo_tpu.detector import FaceDetector, CascadeParams

        self._jax = jax
        self._params_cls = CascadeParams
        self.det = FaceDetector(with_pupils=with_pupils,
                                with_landmarks=with_landmarks)
        self.key = jax.random.PRNGKey(seed)

    def detect(self, frame_bgr: np.ndarray, *, min_size=100, max_size=600,
               shift=0.1, scale=1.1, iou=0.2) -> list[dict]:
        from pigo_tpu.io.image import rgb_to_grayscale

        rows, cols = frame_bgr.shape[:2]
        gray = rgb_to_grayscale(np.ascontiguousarray(frame_bgr[:, :, ::-1]))
        self.key, sub = self._jax.random.split(self.key)
        results = self.det.detect(
            gray, rows, cols,
            self._params_cls(min_size, max_size, shift, scale),
            iou_threshold=iou, key=sub)
        return [
            {
                "face": (r.face.row, r.face.col, r.face.scale, r.face.q),
                "eyes": [(e.row, e.col, e.scale) for e in r.eyes],
                "landmarks": [(p.row, p.col, p.scale) for p in r.landmarks],
            }
            for r in results
        ]


class TpuStreamEngine(TpuEngine):
    """TpuEngine served through the device-resident streaming pipeline.

    A worker thread feeds incoming frames into
    FaceDetector.detect_stream_device (ONE device round trip per frame,
    `depth` frames in flight), so concurrent callers' frames pipeline
    against each other instead of serializing full round trips — the
    serving shape of the reference's realtime WASM loop
    (wasm/canvas/canvas.go:69-112). Frames must share one shape and one
    parameter set (fixed at construction); anything else falls back to the
    direct detect() path."""

    def __init__(self, with_pupils=True, with_landmarks=True, seed=0,
                 depth=4, min_size=100, max_size=600, shift=0.1, scale=1.1,
                 iou=0.2):
        super().__init__(with_pupils=with_pupils,
                         with_landmarks=with_landmarks, seed=seed)
        import collections
        import queue
        import threading

        if self.det.pupil is None or self.det.landmarks is None:
            raise ValueError("TpuStreamEngine needs the full pipeline "
                             "(pupils + landmarks)")
        self._cfg = dict(min_size=min_size, max_size=max_size, shift=shift,
                         scale=scale, iou=iou)
        self._depth = max(1, depth)
        self._inq: queue.Queue = queue.Queue()
        self._pending = collections.deque()  # worker-thread only
        self._shape = None
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _run(self):
        """Adaptive dispatch/collect loop: dispatch every queued frame
        immediately (device-resident pipeline, async), collect the oldest
        result when the pipeline is full or no new frame is waiting — so a
        lone sequential caller gets minimum latency while concurrent
        callers' frames overlap up to `depth` deep on the device."""
        import queue as queue_mod

        from pigo_tpu.detector import PERTURBS

        params = self._params_cls(self._cfg["min_size"], self._cfg["max_size"],
                                  self._cfg["shift"], self._cfg["scale"])
        pending = self._pending
        empty = object()
        i = 0
        while True:
            try:
                item = self._inq.get(block=not pending)
            except queue_mod.Empty:
                item = empty
            if item is None:  # shutdown: drain
                while pending:
                    ticket, box = pending.popleft()
                    box["results"] = self.det._collect_frame_device(ticket)
                    box["event"].set()
                return
            if item is not empty:
                gray2d, box = item
                key = self._jax.random.fold_in(self.key, i)
                i += 1
                ticket = self.det._dispatch_frame_device(
                    gray2d, params, 0.0, self._cfg["iou"], PERTURBS, key)
                pending.append((ticket, box))
                if len(pending) < self._depth:
                    continue  # try to batch more dispatches first
            ticket, box = pending.popleft()
            box["results"] = self.det._collect_frame_device(ticket)
            box["event"].set()

    def detect(self, frame_bgr: np.ndarray, *, min_size=100, max_size=600,
               shift=0.1, scale=1.1, iou=0.2) -> list[dict]:
        import threading

        from pigo_tpu.io.image import rgb_to_grayscale

        rows, cols = frame_bgr.shape[:2]
        cfg = dict(min_size=min_size, max_size=max_size, shift=shift,
                   scale=scale, iou=iou)
        if self._shape is None:
            self._shape = (rows, cols)
        if cfg != self._cfg or (rows, cols) != self._shape:
            return super().detect(frame_bgr, **cfg)  # off-stream request
        gray = rgb_to_grayscale(
            np.ascontiguousarray(frame_bgr[:, :, ::-1])
        ).reshape(rows, cols)
        box = {"event": threading.Event(), "results": None}
        self._inq.put((gray, box))
        box["event"].wait()
        return [
            {
                "face": (r.face.row, r.face.col, r.face.scale, r.face.q),
                "eyes": [(e.row, e.col, e.scale) for e in r.eyes],
                "landmarks": [(p.row, p.col, p.scale) for p in r.landmarks],
            }
            for r in box["results"]
        ]


def make_engine(name: str, **kw):
    if name == "tpu-stream":
        return TpuStreamEngine(**kw)
    kw.pop("depth", None)
    kw.pop("min_size", None), kw.pop("max_size", None)
    kw.pop("shift", None), kw.pop("scale", None), kw.pop("iou", None)
    return NativeEngine(**kw) if name == "native" else TpuEngine(**kw)


def pupil_lean_angle(left, right) -> float:
    """Lean angle between the pupils in degrees
    (reference examples/masquerade/puploc.go:66-68)."""
    return math.atan2(right[1] - left[1], right[0] - left[0]) * 180.0 / math.pi


def draw_face_box(cv2, frame, face, color=(0, 0, 255)):
    r, c, s = int(face[0]), int(face[1]), int(face[2])
    cv2.rectangle(frame, (c - s // 2, r - s // 2), (c + s // 2, r + s // 2),
                  color, 2)


def draw_point(cv2, frame, pt, color=(0, 255, 0), radius=4):
    cv2.circle(frame, (int(pt[1]), int(pt[0])), radius, color, -1, 8, 0)


def fps_loop(args, engine, per_frame, title: str):
    """Common demo loop: source -> engine -> per_frame(frame, results) -> sink."""
    import cv2

    src = FrameSource(args.source, args.frames)
    sink = Sink(args.out, title)
    n, t0 = 0, time.perf_counter()
    try:
        for frame in src:
            results = engine.detect(
                frame, min_size=args.min_size, max_size=args.max_size,
                shift=args.shift, scale=args.scale, iou=args.iou)
            per_frame(cv2, frame, results)
            n += 1
            if not sink.show(frame):
                break
    finally:
        src.release()
        sink.release()
    dt = time.perf_counter() - t0
    if n:
        print(f"{n} frames in {dt:.2f}s ({n / dt:.1f} FPS)", file=sys.stderr)
