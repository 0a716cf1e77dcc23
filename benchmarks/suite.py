"""Benchmark suite mirroring the reference Go benchmark set.

The reference ships (but never publishes numbers for) these benchmarks
(/root/reference/core/pigo_test.go:86-143, core/puploc_test.go:83-162,
core/flploc_test.go:156-233):

    BenchmarkPigoUnpackCascade     -> unpack_cascade
    BenchmarkPigoFaceDetection     -> face_detection
    BenchmarkPigoClusterDetection  -> cluster_detection
    BenchmarkPuplocUnpackCascade   -> puploc_unpack
    BenchmarkPuplocDetectorRun     -> puploc_detector_run
    BenchmarkPuplocDetection       -> puploc_detection
    BenchmarkFlplocReadCascadeDir  -> flploc_read_dir
    BenchmarkFlplocGetLendmarkPoint-> flploc_landmark_point
    BenchmarkFlplocDetection       -> flploc_detection

Each runs on the engine selected with --engine (tpu = JAX/Pallas path,
native = C++ host engine) using the reference test config (MinSize 20,
MaxSize 1000, Shift 0.2, Scale 1.1 — core/pigo_test.go:44-50).

    python -m benchmarks.suite --engine native --filter face

Prints one JSON line per benchmark: {"name", "engine", "ns_per_op", "ops"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# reference test config (core/pigo_test.go:44-50)
CFG = dict(min_size=20, max_size=1000, shift_factor=0.2, scale_factor=1.1)
PERTURBS = 63


def timeit(fn, min_time=0.5, max_iters=1000):
    fn()  # warmup / compile
    n, t = 0, 0.0
    while t < min_time and n < max_iters:
        t0 = time.perf_counter()
        fn()
        t += time.perf_counter() - t0
        n += 1
    return t / n, n


class Suite:
    def __init__(self, engine: str):
        from pigo_tpu.cascade.assets import asset_path
        from pigo_tpu.io.image import get_image, rgb_to_grayscale

        self.engine = engine
        img = get_image(asset_path("testdata", "sample.jpg"))
        self.rows, self.cols = img.shape[0], img.shape[1]
        self.gray = rgb_to_grayscale(img)
        with open(asset_path("cascade", "facefinder"), "rb") as fh:
            self.face_bytes = fh.read()
        with open(asset_path("cascade", "puploc"), "rb") as fh:
            self.pup_bytes = fh.read()
        self.lps_dir = asset_path("cascade", "lps")

        if engine == "native":
            from pigo_tpu.native import (
                NativeFaceCascade, NativePupilLocalizer, native_cluster,
            )
            self.face = NativeFaceCascade(self.face_bytes)
            self.pupil = NativePupilLocalizer(self.pup_bytes)
            self.cluster = native_cluster
        else:
            from pigo_tpu.models.face import FaceCascade
            from pigo_tpu.models.pupil import PupilLocalizer
            from pigo_tpu.ops.cluster import cluster_detections
            self.face = FaceCascade.from_bytes(self.face_bytes)
            self.pupil = PupilLocalizer.from_bytes(self.pup_bytes)
            self.cluster = cluster_detections
        self._dets = self.face.run_cascade(self.gray, self.rows, self.cols,
                                           **CFG)
        self._face_cluster = self.cluster(self._dets, 0.1)

    # ---- face ----------------------------------------------------------

    def unpack_cascade(self):
        from pigo_tpu.cascade.format import unpack_face_cascade
        unpack_face_cascade(self.face_bytes)

    def face_detection(self):
        self.face.run_cascade(self.gray, self.rows, self.cols, **CFG)

    def cluster_detection(self):
        self.cluster(self._dets, 0.1)

    # ---- puploc --------------------------------------------------------

    def puploc_unpack(self):
        from pigo_tpu.cascade.format import unpack_pupil_cascade
        unpack_pupil_cascade(self.pup_bytes)

    def _eye_args(self):
        r, c, s = (float(v) for v in self._face_cluster[0][:3])
        return r - 0.085 * s, c - 0.185 * s, 0.45 * s

    def puploc_detector_run(self):
        row, col, scale = self._eye_args()
        if self.engine == "native":
            starts = self.pupil.jitter(row, col, scale, PERTURBS, 1)
            self.pupil.run_detector(starts, self.gray, self.rows, self.cols)
        else:
            from pigo_tpu.models.pupil import Puploc
            import jax
            self.pupil.run_detector(
                Puploc(row=int(row), col=int(col), scale=scale,
                       perturbs=PERTURBS),
                self.gray, self.rows, self.cols, key=jax.random.PRNGKey(1))

    def puploc_detection(self):
        self.face_detection()
        self.puploc_detector_run()

    # ---- flploc --------------------------------------------------------

    def flploc_read_dir(self):
        from pigo_tpu.cascade.assets import load_landmark_dir
        load_landmark_dir(self.lps_dir)

    def _eyes(self):
        r, c, s = (float(v) for v in self._face_cluster[0][:3])
        return ((r - 0.075 * s, c - 0.175 * s, 0.25 * s),
                (r - 0.075 * s, c + 0.185 * s, 0.25 * s))

    def flploc_landmark_point(self):
        left, right = self._eyes()
        if self.engine == "native":
            if not hasattr(self, "_lp42"):
                import os
                from pigo_tpu.native import NativePupilLocalizer
                with open(os.path.join(self.lps_dir, "lp42"), "rb") as fh:
                    self._lp42 = NativePupilLocalizer(fh.read())
            self._lp42.landmark(left[:2], right[:2], self.gray, self.rows,
                                self.cols, perturbs=PERTURBS, seed=1)
        else:
            import jax
            from pigo_tpu.models.landmark import LandmarkLocalizer
            from pigo_tpu.models.pupil import Puploc
            if not hasattr(self, "_flp"):
                self._flp = LandmarkLocalizer()
            le = Puploc(row=int(left[0]), col=int(left[1]), scale=left[2],
                        perturbs=PERTURBS)
            re = Puploc(row=int(right[0]), col=int(right[1]), scale=right[2],
                        perturbs=PERTURBS)
            self._flp.get_landmark_point(
                "lp42", le, re, self.gray, self.rows, self.cols,
                perturbs=PERTURBS, key=jax.random.PRNGKey(1))

    def flploc_detection(self):
        self.face_detection()
        self.flploc_landmark_point()

    ALL = [
        "unpack_cascade", "face_detection", "cluster_detection",
        "puploc_unpack", "puploc_detector_run", "puploc_detection",
        "flploc_read_dir", "flploc_landmark_point", "flploc_detection",
    ]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--engine", default="native", choices=("native", "tpu"))
    p.add_argument("--filter", default="", help="substring filter")
    p.add_argument("--min-time", type=float, default=0.5)
    args = p.parse_args(argv)

    suite = Suite(args.engine)
    for name in Suite.ALL:
        if args.filter and args.filter not in name:
            continue
        sec, ops = timeit(getattr(suite, name), min_time=args.min_time)
        print(json.dumps({
            "name": name,
            "engine": args.engine,
            "ns_per_op": int(sec * 1e9),
            "ops": ops,
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
