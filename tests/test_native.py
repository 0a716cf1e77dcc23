"""Parity tests for the native C++ host engine (native/pigo_native.cpp).

The native engine must be bit-exact vs the NumPy oracle on every surface:
cascade parsing, window classification (upright + rotated), the multi-scale
driver, IoU clustering, the pupil regression walks, the landmark anchors, and
grayscale conversion.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from pigo_tpu.cascade.assets import asset_path, load_facefinder, load_puploc
from pigo_tpu.io.image import get_image, rgb_to_grayscale
from pigo_tpu.oracle.cluster import oracle_cluster_detections
from pigo_tpu.oracle.face import (
    oracle_classify_region,
    oracle_classify_rotated_region,
    oracle_run_cascade,
)
from pigo_tpu.oracle.pupil import oracle_run_detector

native = pytest.importorskip("pigo_tpu.native")
if not native.native_available():
    pytest.skip("native engine unavailable (no g++?)", allow_module_level=True)


@pytest.fixture(scope="module")
def sample():
    img = get_image(asset_path("testdata", "sample.jpg"))
    gray = rgb_to_grayscale(img)
    return img, gray, img.shape[0], img.shape[1]


@pytest.fixture(scope="module")
def nfc():
    return native.NativeFaceCascade()


@pytest.fixture(scope="module")
def npl():
    return native.NativePupilLocalizer()


def test_face_header(nfc):
    assert nfc.depth == 6
    assert nfc.num_trees == 468


def test_bad_cascade_rejected():
    with pytest.raises(ValueError):
        native.NativeFaceCascade(b"\x00" * 32)
    with pytest.raises(ValueError):
        native.NativePupilLocalizer(b"\xff" * 8)


def test_grayscale_exact(sample):
    img, gray, _, _ = sample
    assert np.array_equal(native.native_grayscale(img), gray)


def test_grayscale_alpha_premultiply():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8)
    assert np.array_equal(native.native_grayscale(img), rgb_to_grayscale(img))


def test_classify_region_exact(sample, nfc):
    _, gray, rows, cols = sample
    forest = load_facefinder()
    rng = np.random.default_rng(1)
    for scale in (20, 51, 100):
        off = scale // 2 + 1
        rw = rng.integers(off, rows - off, size=64)
        cw = rng.integers(off, cols - off, size=64)
        want = oracle_classify_region(forest, rw, cw, scale, gray, cols)
        got = np.array([
            nfc.classify_region(int(r), int(c), scale, gray, rows, cols)
            for r, c in zip(rw, cw)
        ], dtype=np.float32)
        assert np.array_equal(got, want)


def test_classify_rotated_exact(sample, nfc):
    _, gray, rows, cols = sample
    forest = load_facefinder()
    rng = np.random.default_rng(2)
    for angle in (0.1, 0.5, 0.97):
        scale = 60
        off = scale  # keep rotated reads in range the same way the oracle does
        rw = rng.integers(off, rows - off, size=32)
        cw = rng.integers(off, cols - off, size=32)
        want = oracle_classify_rotated_region(
            forest, rw, cw, scale, angle, rows, cols, gray, cols
        )
        got = np.array([
            nfc.classify_region(int(r), int(c), scale, gray, rows, cols,
                                angle=angle)
            for r, c in zip(rw, cw)
        ], dtype=np.float32)
        assert np.array_equal(got, want)


def test_run_cascade_exact(sample, nfc):
    _, gray, rows, cols = sample
    forest = load_facefinder()
    got = nfc.run_cascade(gray, rows, cols, min_size=20, max_size=1000,
                          shift_factor=0.2, scale_factor=1.1)
    want = oracle_run_cascade(forest, gray, rows, cols, cols,
                              20, 1000, 0.2, 1.1)
    assert np.array_equal(got, want)
    assert got.shape[0] >= 1


def test_cluster_exact(sample, nfc):
    _, gray, rows, cols = sample
    dets = nfc.run_cascade(gray, rows, cols, min_size=20, max_size=1000,
                           shift_factor=0.1, scale_factor=1.1)
    for iou in (0.1, 0.2, 0.5):
        got = native.native_cluster(dets, iou)
        want = oracle_cluster_detections(dets, iou)
        assert np.array_equal(got, want)


def test_find_faces_bridge(sample, nfc):
    """cgo-bridge shape: int64 rows of (row, col, scale), q > 5 filtered."""
    _, gray, rows, cols = sample
    faces = nfc.find_faces(gray, rows, cols, min_size=20, max_size=1000,
                           shift_factor=0.1, scale_factor=1.1,
                           iou_threshold=0.2, q_thresh=5.0)
    dets = nfc.run_cascade(gray, rows, cols, min_size=20, max_size=1000,
                           shift_factor=0.1, scale_factor=1.1)
    cl = oracle_cluster_detections(dets, 0.2)
    want = cl[cl[:, 3] > 5.0][:, :3].astype(np.int64)
    assert np.array_equal(faces, want)
    assert faces.shape[0] >= 1


def test_pupil_walk_exact(sample, nfc, npl):
    _, gray, rows, cols = sample
    forest = load_puploc()
    # anchor on the detected face like the CLI does (main.go:416-421)
    face = native.native_cluster(
        nfc.run_cascade(gray, rows, cols, min_size=20, max_size=1000,
                        shift_factor=0.1, scale_factor=1.1), 0.2)[0]
    row, col, s = face[0], face[1], face[2]
    for flip_v, col_off in ((False, -0.175), (True, 0.185)):
        starts = npl.jitter(row - 0.075 * s, col + col_off * s, 0.25 * s,
                            perturbs=63, seed=7)
        got = npl.run_detector(starts, gray, rows, cols, flip_v=flip_v)
        want = oracle_run_detector(
            forest, (starts[:, 0], starts[:, 1], starts[:, 2]),
            rows, cols, gray, cols, flip_v=flip_v)
        assert got == (want[0], want[1], pytest.approx(want[2]))


def test_pupil_rotated_walk_exact(sample, npl):
    _, gray, rows, cols = sample
    forest = load_puploc()
    starts = npl.jitter(200.0, 160.0, 40.0, perturbs=31, seed=3)
    got = npl.run_detector(starts, gray, rows, cols, angle=0.3)
    want = oracle_run_detector(
        forest, (starts[:, 0], starts[:, 1], starts[:, 2]),
        rows, cols, gray, cols, angle=0.3)
    assert got == (want[0], want[1], pytest.approx(want[2]))


def test_landmark_anchor(sample, npl):
    """Anchor geometry matches core/flploc.go:37-43 + the ensemble vote."""
    _, gray, rows, cols = sample
    forest = load_puploc()
    left, right = (188.0, 133.0), (186.0, 180.0)
    got = npl.landmark(left, right, gray, rows, cols, perturbs=63, seed=11)
    dist = float(np.hypot(left[0] - right[0], left[1] - right[1]))
    row = (left[0] + right[0]) / 2.0 + 0.25 * dist
    col = (left[1] + right[1]) / 2.0 + 0.15 * dist
    starts = npl.jitter(row, col, 3.0 * dist, perturbs=63, seed=11)
    want = oracle_run_detector(
        forest, (starts[:, 0], starts[:, 1], starts[:, 2]),
        rows, cols, gray, cols)
    assert got == (want[0], want[1], pytest.approx(want[2]))


def test_jitter_deterministic(npl):
    a = npl.jitter(100.0, 100.0, 30.0, perturbs=63, seed=42)
    b = npl.jitter(100.0, 100.0, 30.0, perturbs=63, seed=42)
    c = npl.jitter(100.0, 100.0, 30.0, perturbs=63, seed=43)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    # jitter ranges (core/puploc.go:248-250)
    assert np.all(np.abs(a[:, 0] - 100.0) <= 0.15 * 30.0 * 0.5 + 1e-4)
    assert np.all((a[:, 2] >= 30.0 * 0.925 - 1e-3) & (a[:, 2] <= 30.0 * 1.075))


def test_simd_scalar_equivalence(sample):
    """The AVX-512 phased classifiers and the scalar walks must agree
    bit-for-bit (native/pigo_native.cpp `simd` namespace). The env gate is
    read once per process, so the scalar side runs in a subprocess with
    PIGO_NATIVE_SIMD=0 (which is also the escape hatch a non-AVX-512 host
    would take automatically)."""
    import json
    import subprocess
    import sys

    _, gray, rows, cols = sample
    eng = native.NativeFaceCascade()
    loc = native.NativePupilLocalizer()
    cfg = dict(min_size=20, max_size=1000, shift_factor=0.1,
               scale_factor=1.1)
    dets = {a: eng.run_cascade(gray, rows, cols, angle=a, **cfg).tolist()
            for a in (0.0, 0.125)}
    starts = loc.jitter(184.0, 152.0, 60.0, perturbs=33, seed=3)
    pup = {a: list(loc.run_detector(starts, gray, rows, cols, angle=a))
           for a in (0.0, 0.125)}

    prog = """
import json, sys
sys.path.insert(0, %r)
import numpy as np
from pigo_tpu.io.image import get_image, rgb_to_grayscale
from pigo_tpu.native import NativeFaceCascade, NativePupilLocalizer
img = get_image(%r)
rows, cols = img.shape[:2]
gray = rgb_to_grayscale(img).reshape(rows, cols)
eng = NativeFaceCascade(); loc = NativePupilLocalizer()
cfg = dict(min_size=20, max_size=1000, shift_factor=0.1, scale_factor=1.1)
dets = {str(a): eng.run_cascade(gray, rows, cols, angle=a, **cfg).tolist()
        for a in (0.0, 0.125)}
starts = loc.jitter(184.0, 152.0, 60.0, perturbs=33, seed=3)
pup = {str(a): list(loc.run_detector(starts, gray, rows, cols, angle=a))
       for a in (0.0, 0.125)}
print(json.dumps({"dets": dets, "pup": pup}))
""" % (REPO_ROOT, asset_path("testdata", "sample.jpg"))
    env = dict(os.environ, PIGO_NATIVE_SIMD="0", PIGO_TPU_PLATFORM="cpu")
    p = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                       text=True, timeout=300, env=env)
    assert p.returncode == 0, p.stderr[-800:]
    scalar = json.loads(p.stdout.splitlines()[-1])
    for a in (0.0, 0.125):
        assert scalar["dets"][str(a)] == dets[a]
        assert scalar["pup"][str(a)] == pup[a]
