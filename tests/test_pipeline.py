"""End-to-end pipeline + CLI smoke tests (reference core/pigo_test.go:68-84
and the CLI behaviors in cmd/pigo/main.go)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from pigo_tpu.detector import CascadeParams, FaceDetector
from pigo_tpu.models.face import FaceCascade

CFG = CascadeParams(min_size=60, max_size=400, shift_factor=0.3,
                    scale_factor=1.3)


@pytest.fixture(scope="module")
def detector(face_forest):
    return FaceDetector(
        face=FaceCascade(face_forest, backend="reference"),
        with_pupils=True, with_landmarks=True,
    )


def test_detect_faces_smoke(detector, sample_gray):
    """>= 1 face found on sample.jpg (core/pigo_test.go:68-84)."""
    rows, cols = sample_gray.shape
    faces = detector.detect_faces(sample_gray, rows, cols, CFG,
                                  iou_threshold=0.1)
    assert len(faces) >= 1
    best = max(faces, key=lambda f: f.q)
    # the portrait's face is centered around (205, 155), scale ~250
    assert 150 < best.row < 260
    assert 100 < best.col < 210
    assert best.scale > 100


def test_full_pipeline(detector, sample_gray):
    rows, cols = sample_gray.shape
    results = detector.detect(sample_gray, rows, cols, CFG,
                              iou_threshold=0.1, perturbs=15)
    assert len(results) >= 1
    r = results[0]
    assert len(r.eyes) == 2
    assert len(r.landmarks) == 15
    j = r.to_json_dict()
    assert set(j) == {"face", "eyes", "landmark_points"}
    assert j["face"]["size"] == r.face.scale


def test_detection_is_deterministic(detector, sample_gray):
    import jax

    rows, cols = sample_gray.shape
    a = detector.detect(sample_gray, rows, cols, CFG, perturbs=15,
                        key=jax.random.PRNGKey(7))
    b = detector.detect(sample_gray, rows, cols, CFG, perturbs=15,
                        key=jax.random.PRNGKey(7))
    assert [p.row for r in a for p in r.landmarks] == [
        p.row for r in b for p in r.landmarks
    ]


def run_cli(*args, stdin=None):
    # Hermetic like the rest of the suite: the subprocess must not inherit
    # the accelerator platform (PIGO_TPU_TEST_PLATFORM=tpu opts back in).
    # PIGO_TPU_PLATFORM (pigo_tpu/utils/platform.py) — NOT JAX_PLATFORMS:
    # deployment shims can override the env var at interpreter start, and a
    # CPU-pinned subprocess must never block on the accelerator tunnel.
    import os

    env = dict(os.environ)
    if os.environ.get("PIGO_TPU_TEST_PLATFORM", "cpu") == "cpu":
        env["PIGO_TPU_PLATFORM"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "pigo_tpu.cli", *args],
        capture_output=True, input=stdin, timeout=600, env=env,
    )


def test_cli_usage_error():
    p = run_cli("-in", "assets/testdata/sample.jpg")
    assert p.returncode == 2
    assert b"Usage" in p.stderr


def test_cli_rejects_non_cascade():
    p = run_cli("-in", "assets/testdata/sample.jpg", "-out", "empty",
                "-cf", "assets/testdata/sample.jpg")
    assert p.returncode == 1
    assert b"not valid" in p.stderr


def test_cli_json_output(tmp_path):
    out = tmp_path / "out.png"
    p = run_cli(
        "-in", "assets/testdata/sample.jpg", "-out", str(out),
        "-cf", "assets/cascade/facefinder",
        "-min", "60", "-max", "400", "-shift", "0.3", "-scale", "1.3",
        "-json", "-",
    )
    assert p.returncode == 0, p.stderr.decode()[-500:]
    payload = json.loads(p.stdout)
    assert len(payload) >= 1
    assert "face" in payload[0]
    assert out.exists() and out.stat().st_size > 1000


def test_json_accumulate_quirk():
    """-json-accumulate reproduces the reference CLI's never-reset coord
    slices (cmd/pigo/main.go:363-365, :568-572): face i's JSON carries the
    eye/landmark points of faces 0..i, and a face with none of its own
    still reports all earlier ones."""
    from pigo_tpu.cli import build_parser
    from pigo_tpu.detector import accumulate_json_payload

    e = [{"x": 10, "y": 20, "size": 3}, {"x": 30, "y": 40, "size": 3},
         {"x": 50, "y": 60, "size": 4}]
    lm = [{"x": 1, "y": 2, "size": 5}, {"x": 3, "y": 4, "size": 6}]
    payload = [
        {"face": {"x": 0, "y": 0, "size": 100}, "eyes": e[:2],
         "landmark_points": lm[:1]},
        {"face": {"x": 200, "y": 0, "size": 90}},  # nothing of its own
        {"face": {"x": 400, "y": 0, "size": 80}, "eyes": e[2:],
         "landmark_points": lm[1:]},
    ]
    acc = accumulate_json_payload(payload)
    assert acc[0] == payload[0]
    assert acc[1] == {"face": {"x": 200, "y": 0, "size": 90},
                      "eyes": e[:2], "landmark_points": lm[:1]}
    assert acc[2] == {"face": {"x": 400, "y": 0, "size": 80},
                      "eyes": e, "landmark_points": lm}
    # input payload is not mutated, per-face lists are independent copies
    assert "eyes" not in payload[1] and acc[0]["eyes"] is not acc[1]["eyes"]
    # the flag parses (off by default)
    args = build_parser().parse_args(["-in", "x", "-json-accumulate"])
    assert args.json_accumulate is True
    assert build_parser().parse_args(["-in", "x"]).json_accumulate is False


def test_detect_multi_face():
    """Two faces in one frame: the fused post stage localizes eyes and the
    full 15-point landmark set for both."""
    import jax
    from pigo_tpu.detector import CascadeParams, FaceDetector
    from pigo_tpu.io.image import get_image, rgb_to_grayscale
    from pigo_tpu.cascade.assets import asset_path

    img = get_image(asset_path("testdata", "sample.jpg"))
    rows, cols = img.shape[0], img.shape[1]
    gray = rgb_to_grayscale(img).reshape(rows, cols)
    two = np.concatenate([gray, gray], axis=1)  # side-by-side portraits
    det = FaceDetector()
    results = det.detect(
        two, rows, 2 * cols,
        CascadeParams(100, 400, 0.15, 1.15),
        iou_threshold=0.2, key=jax.random.PRNGKey(0),
    )
    assert len(results) == 2
    for r in results:
        assert len(r.eyes) == 2
        assert len(r.landmarks) == 15
    # the two faces are a translation of each other: coords differ by ~cols
    cols_found = sorted(r.face.col for r in results)
    # cluster averaging shifts slightly near the seam; allow a few pixels
    assert abs((cols_found[1] - cols_found[0]) - cols) <= 10


def test_detect_stream_matches_detect():
    """detect_stream yields exactly detect()'s per-frame results."""
    import jax
    from pigo_tpu.detector import CascadeParams, FaceDetector
    from pigo_tpu.io.image import get_image, rgb_to_grayscale
    from pigo_tpu.cascade.assets import asset_path

    img = get_image(asset_path("testdata", "sample.jpg"))
    rows, cols = img.shape[0], img.shape[1]
    gray = rgb_to_grayscale(img).reshape(rows, cols)
    frames = [np.roll(gray, i, axis=1) for i in range(3)]
    det = FaceDetector()
    params = CascadeParams(100, 400, 0.2, 1.2)
    key = jax.random.PRNGKey(7)
    streamed = list(det.detect_stream(iter(frames), params, key=key, depth=2))
    assert len(streamed) == len(frames)
    for i, (frame, got) in enumerate(zip(frames, streamed)):
        want = det.detect(frame, rows, cols, params,
                          key=jax.random.fold_in(key, i))
        assert [r.to_json_dict() for r in got] == \
               [r.to_json_dict() for r in want]


def test_detect_stream_device_matches_detect():
    """The device-resident pipeline produces the same faces (exact) and the
    same eyes/landmarks up to ensemble-RNG tolerance (the fixed face-slot
    program draws different uniforms than the per-face host program)."""
    import jax
    from pigo_tpu.detector import CascadeParams, FaceDetector
    from pigo_tpu.io.image import get_image, rgb_to_grayscale
    from pigo_tpu.cascade.assets import asset_path

    img = get_image(asset_path("testdata", "sample.jpg"))
    rows, cols = img.shape[0], img.shape[1]
    gray = rgb_to_grayscale(img).reshape(rows, cols)
    frames = [gray, np.roll(gray, 3, axis=1)]
    det = FaceDetector()
    params = CascadeParams(100, 400, 0.2, 1.2)
    key = jax.random.PRNGKey(3)
    streamed = list(det.detect_stream_device(iter(frames), params, key=key,
                                             depth=2))
    assert len(streamed) == 2
    for i, (frame, got) in enumerate(zip(frames, streamed)):
        want = det.detect(frame, rows, cols, params,
                          key=jax.random.fold_in(key, i))
        assert len(got) == len(want) >= 1
        for g, w in zip(got, want):
            assert (g.face.row, g.face.col, g.face.scale) == \
                   (w.face.row, w.face.col, w.face.scale)
            assert abs(g.face.q - w.face.q) < 1e-3
            assert len(g.eyes) == len(w.eyes)
            for ge, we in zip(g.eyes, w.eyes):
                assert abs(ge.row - we.row) <= 3 and abs(ge.col - we.col) <= 3
            assert len(g.landmarks) == len(w.landmarks)
            for gp, wp in zip(g.landmarks, w.landmarks):
                assert abs(gp.row - wp.row) <= 6 and abs(gp.col - wp.col) <= 6


def test_full_pipeline_rotated():
    """Rotated end-to-end pass (angle as fraction of 2*pi): face via the
    rotated classifiers, pupils via the rotated regression walk."""
    import jax
    from pigo_tpu.detector import CascadeParams, FaceDetector
    from pigo_tpu.io.image import get_image, rgb_to_grayscale
    from pigo_tpu.cascade.assets import asset_path

    img = get_image(asset_path("testdata", "sample.jpg"))
    rows, cols = img.shape[0], img.shape[1]
    gray = rgb_to_grayscale(img).reshape(rows, cols)
    det = FaceDetector()
    # small angle: the upright portrait should still be found
    results = det.detect(gray, rows, cols, CascadeParams(100, 400, 0.15, 1.15),
                         angle=0.03, iou_threshold=0.2,
                         key=jax.random.PRNGKey(0))
    assert len(results) >= 1
    r = results[0]
    assert 150 < r.face.row < 260 and 100 < r.face.col < 210
    assert len(r.eyes) == 2
    assert len(r.landmarks) == 15


def test_detect_stream_device_rotated(monkeypatch):
    """The device-resident pipeline on a ROTATED stream (clamp-extended
    planes + rotated patch post): faces exact vs detect(), eyes and
    landmarks within ensemble-RNG tolerance."""
    import jax
    from pigo_tpu.detector import CascadeParams, FaceDetector
    from pigo_tpu.io.image import get_image, rgb_to_grayscale
    from pigo_tpu.cascade.assets import asset_path

    monkeypatch.setenv("PIGO_TPU_POST_PATCH", "1")
    img = get_image(asset_path("testdata", "sample.jpg"))
    rows, cols = img.shape[0], img.shape[1]
    gray = rgb_to_grayscale(img).reshape(rows, cols)
    det = FaceDetector()
    params = CascadeParams(100, 400, 0.2, 1.2)
    key = jax.random.PRNGKey(3)
    streamed = list(det.detect_stream_device(iter([gray]), params,
                                             angle=0.06, key=key, depth=1))
    assert len(streamed) == 1
    want = det.detect(gray, rows, cols, params, angle=0.06,
                      key=jax.random.fold_in(key, 0))
    got = streamed[0]
    assert len(got) == len(want) >= 1
    for g, w in zip(got, want):
        assert (g.face.row, g.face.col, g.face.scale) == \
               (w.face.row, w.face.col, w.face.scale)
        assert len(g.eyes) == len(w.eyes) == 2
        for ge, we in zip(g.eyes, w.eyes):
            assert abs(ge.row - we.row) <= 3 and abs(ge.col - we.col) <= 3
        assert len(g.landmarks) == len(w.landmarks) == 15
        for gp, wp in zip(g.landmarks, w.landmarks):
            assert abs(gp.row - wp.row) <= 6 and abs(gp.col - wp.col) <= 6


def test_full_pipeline_rotated_patch_post_parity(monkeypatch):
    """The rotated MXU patch post (rotated eye walks, upright landmark
    walks) must equal the rotated gather post exactly through detect():
    same key -> identical eyes and landmarks."""
    import jax
    from pigo_tpu.detector import CascadeParams, FaceDetector
    from pigo_tpu.io.image import get_image, rgb_to_grayscale
    from pigo_tpu.cascade.assets import asset_path

    img = get_image(asset_path("testdata", "sample.jpg"))
    rows, cols = img.shape[0], img.shape[1]
    gray = rgb_to_grayscale(img).reshape(rows, cols)
    params = CascadeParams(100, 400, 0.15, 1.15)
    key = jax.random.PRNGKey(0)
    outs = []
    for flag in ("0", "1"):
        monkeypatch.setenv("PIGO_TPU_POST_PATCH", flag)
        det = FaceDetector()
        outs.append(det.detect(gray, rows, cols, params, angle=0.06,
                               iou_threshold=0.2, key=key))
    gather, patch = outs
    assert len(gather) == len(patch) >= 1
    for g, p in zip(gather, patch):
        assert (g.face.row, g.face.col, g.face.scale) == (
            p.face.row, p.face.col, p.face.scale)
        assert len(g.eyes) == len(p.eyes) == 2
        for ge, pe in zip(g.eyes, p.eyes):
            assert (ge.row, ge.col, ge.scale) == (pe.row, pe.col, pe.scale)
        assert len(g.landmarks) == len(p.landmarks) == 15
        for gl, pl in zip(g.landmarks, p.landmarks):
            assert (gl.row, gl.col, gl.scale) == (pl.row, pl.col, pl.scale)


def test_stream_edge_configs():
    """depth=0 is clamped; detect_stream_device falls back to the host
    stream for partial detector configurations instead of crashing."""
    import jax
    from pigo_tpu.detector import CascadeParams, FaceDetector
    from pigo_tpu.io.image import get_image, rgb_to_grayscale
    from pigo_tpu.cascade.assets import asset_path

    img = get_image(asset_path("testdata", "sample.jpg"))
    rows, cols = img.shape[0], img.shape[1]
    gray = rgb_to_grayscale(img).reshape(rows, cols)
    params = CascadeParams(100, 400, 0.3, 1.3)
    det_full = FaceDetector()
    outs = list(det_full.detect_stream([gray, gray], params, depth=0,
                                       key=jax.random.PRNGKey(0)))
    assert len(outs) == 2 and len(outs[0]) >= 1
    det_faces_only = FaceDetector(with_pupils=False, with_landmarks=False)
    outs = list(det_faces_only.detect_stream_device(
        [gray], params, key=jax.random.PRNGKey(0)))
    assert len(outs) == 1 and len(outs[0]) >= 1
    assert outs[0][0].eyes == []


def test_detect_stream_device_face_overflow():
    """More faces than the device program's face slots -> transparent
    fallback to the exact host pipeline (slots shrunk via device_caps to
    keep the test fast; the default is 8 slots, see
    test_detect_stream_device_crowd_no_fallback)."""
    import jax
    from pigo_tpu.detector import CascadeParams, FaceDetector
    from pigo_tpu.io.image import get_image, rgb_to_grayscale
    from pigo_tpu.cascade.assets import asset_path

    img = get_image(asset_path("testdata", "sample.jpg"))
    rows, cols = img.shape[0], img.shape[1]
    gray = rgb_to_grayscale(img).reshape(rows, cols)
    max_faces = 2
    many = np.concatenate([gray] * (max_faces + 1), axis=1)
    det = FaceDetector(device_caps=(256, 64, max_faces))
    params = CascadeParams(100, 400, 0.2, 1.2)
    key = jax.random.PRNGKey(1)
    got = list(det.detect_stream_device([many], params, key=key))[0]
    want = det.detect(many, rows, many.shape[1], params,
                      key=jax.random.fold_in(key, 0))
    assert len(got) == len(want) == max_faces + 1
    # the fallback reruns detect() with the frame's full fold_in key, so
    # eyes/landmarks (not just faces) reproduce exactly
    assert [r.to_json_dict() for r in got] == \
           [r.to_json_dict() for r in want]


def test_eye_anchor_f32_truncation():
    """Reference anchors are trunc(f32(0.175)*f32(s)) (main.go:417-458):
    at s=360 f32 gives 63 while f64 gives 62 — both host and device paths
    must use the f32 semantics (ADVICE r1)."""
    import jax.numpy as jnp
    from pigo_tpu.detector import _device_eye_anchors, _eye_anchor_offsets

    assert int(0.175 * 360) == 62  # the f64 trap this guards against
    for s, want in ((360, 63), (680, 119), (720, 126)):
        assert _eye_anchor_offsets(s)[1] == want, s
    # device anchors agree with the host offsets for every scale
    for s in (51, 100, 238, 360, 680, 720, 999):
        o_row, o_l, o_r = _eye_anchor_offsets(s)
        erow, ecol, _ = _device_eye_anchors(
            jnp.asarray([100.0]), jnp.asarray([200.0]),
            jnp.asarray([float(s)]))
        assert int(erow[0]) == 100 - o_row
        assert int(ecol[0]) == 200 - o_l and int(ecol[1]) == 200 + o_r


def test_detect_stream_pupils_only_matches_detect():
    """A pupils-only configuration (CLI -plc without -flpc) must localize
    eyes in the stream exactly like detect() (ADVICE r1: the eye stage was
    skipped entirely)."""
    import jax
    from pigo_tpu.detector import CascadeParams, FaceDetector
    from pigo_tpu.io.image import get_image, rgb_to_grayscale
    from pigo_tpu.cascade.assets import asset_path

    img = get_image(asset_path("testdata", "sample.jpg"))
    rows, cols = img.shape[0], img.shape[1]
    gray = rgb_to_grayscale(img).reshape(rows, cols)
    frames = [gray, np.roll(gray, 2, axis=1)]
    det = FaceDetector(with_landmarks=False)
    assert det.pupil is not None and det.landmarks is None
    params = CascadeParams(100, 400, 0.2, 1.2)
    key = jax.random.PRNGKey(5)
    streamed = list(det.detect_stream(iter(frames), params, key=key, depth=2))
    assert len(streamed) == 2
    for i, (frame, got) in enumerate(zip(frames, streamed)):
        want = det.detect(frame, rows, cols, params,
                          key=jax.random.fold_in(key, i))
        assert [r.to_json_dict() for r in got] == \
               [r.to_json_dict() for r in want]
        assert all(len(r.eyes) == 2 for r in got)
    # detect_stream_device falls back to the host stream for this partial
    # configuration and must inherit the fix
    dev = list(det.detect_stream_device(iter(frames), params, key=key,
                                        depth=2))
    assert [r.to_json_dict() for r in dev[0]] == \
           [r.to_json_dict() for r in streamed[0]]


def test_detect_stream_device_crowd_no_fallback(monkeypatch):
    """A 4-face frame stays on the DEVICE pipeline: it overflows the fast
    2-slot program and escalates to the larger device program
    (DEV_CAPS_ESCALATED) instead of re-running the host path (the
    reference has no face cap, core/pigo.go:246-248)."""
    import jax
    import pigo_tpu.detector as det_mod
    from pigo_tpu.detector import CascadeParams, FaceDetector
    from pigo_tpu.io.image import get_image, rgb_to_grayscale
    from pigo_tpu.cascade.assets import asset_path

    assert det_mod.DEV_CAPS_ESCALATED[2] >= 8
    img = get_image(asset_path("testdata", "sample.jpg"))
    rows, cols = img.shape[0], img.shape[1]
    gray = rgb_to_grayscale(img).reshape(rows, cols)
    four = np.concatenate([np.concatenate([gray, gray], axis=1)] * 1
                          + [np.concatenate([gray, gray], axis=1)], axis=0)
    # 2x2 grid of portraits = 4 faces
    assert four.shape == (2 * rows, 2 * cols)
    det = FaceDetector()
    # fail loudly if the device path falls back to the host pipeline
    def no_fallback(*a, **kw):
        raise AssertionError("device pipeline fell back to host detect()")
    params = CascadeParams(100, 400, 0.2, 1.2)
    key = jax.random.PRNGKey(2)
    want = det.detect(four, 2 * rows, 2 * cols, params,
                      key=jax.random.fold_in(key, 0))
    assert len(want) == 4
    monkeypatch.setattr(det, "detect", no_fallback)
    got = list(det.detect_stream_device([four], params, key=key))[0]
    assert len(got) == 4
    assert [(r.face.row, r.face.col, r.face.scale) for r in got] == \
           [(r.face.row, r.face.col, r.face.scale) for r in want]
    for g in got:
        assert len(g.eyes) == 2 and len(g.landmarks) == 15


def test_adaptive_post_sizing_state(sample_gray):
    """The device-stream program adapts to the observed stream: face-slot
    count follows the recent face count (a pad slot costs as much as a
    real face in the fused post stage), and the patch-size bound is STICKY
    under frame-to-frame face-scale jitter (every distinct bound is a
    separate compiled program; an oscillating bound was measured to cost
    an escalation round trip on alternate frames)."""
    import jax
    from pigo_tpu.detector import CascadeParams, FaceDetector

    det = FaceDetector()
    params = CascadeParams(100, 400, 0.2, 1.2)
    rows, cols = sample_gray.shape
    key = jax.random.PRNGKey(0)

    def dispatch():
        t = det._dispatch_frame_device(
            sample_gray, params, 0.0, 0.2, 63, key)
        return t[8], t[9]  # (caps, face_bound)

    # fresh detector: default slots, initial geometric bound
    caps, b_init = dispatch()
    assert caps[2] == det.device_caps[2]
    # a settled 1-face stream shrinks the program to one slot
    det._recent_face_counts.extend([1, 1, 1])
    det._recent_face_scale = 238
    caps, b0 = dispatch()
    assert caps[2] == 1
    # +-6% scale jitter must not move the bound (no program churn)
    for s in (225, 250, 238, 248):
        det._recent_face_scale = s
        _, b = dispatch()
        assert b == b0, s
    # a face that grows past the plan raises the bound immediately
    det._recent_face_scale = int(b0 / 1.1) + 60
    _, b_up = dispatch()
    assert b_up > b0
    # a much smaller face (below 70% of the bound) lowers it
    det._recent_face_scale = 100
    _, b_down = dispatch()
    assert b_down < b0
    # a 3-face burst raises the slot count (power-of-two bucket)
    det._recent_face_counts.extend([3])
    caps, _ = dispatch()
    assert caps[2] == 4


def test_detect_accepts_image_params(detector, sample_gray):
    """ImageParams (reference core/pigo.go:29-34) is a first-class input."""
    from pigo_tpu.detector import ImageParams

    rows, cols = sample_gray.shape
    ip = ImageParams(pixels=sample_gray.ravel(), rows=rows, cols=cols,
                     dim=cols)
    via_params = detector.detect_faces(ip, params=CFG, iou_threshold=0.1)
    direct = detector.detect_faces(sample_gray, rows, cols, CFG,
                                   iou_threshold=0.1)
    assert [(f.row, f.col, f.scale, f.q) for f in via_params] == \
           [(f.row, f.col, f.scale, f.q) for f in direct]
    import jax
    full = detector.detect(ip, params=CFG, perturbs=15,
                           key=jax.random.PRNGKey(1))
    want = detector.detect(sample_gray, rows, cols, CFG, perturbs=15,
                           key=jax.random.PRNGKey(1))
    assert [r.to_json_dict() for r in full] == \
           [r.to_json_dict() for r in want]


def test_init_distributed_single_host():
    """Multi-host init degrades to a clean no-op on a single host and
    reports the global device count (SURVEY.md section 2.4's
    jax.distributed.initialize equivalent; on a real pod each host calls it
    before building meshes)."""
    import jax
    from pigo_tpu.parallel import init_distributed

    assert init_distributed() == len(jax.devices())


def test_detect_patch_post_matches_gather(detector, sample_gray, monkeypatch):
    """The MXU patch-walk post stage (ops/pupil_patch.py, default on
    accelerators) produces bit-identical eyes and landmarks to the gather
    walk for the same key — including the overflow->gather retry contract."""
    import jax

    rows, cols = sample_gray.shape
    key = jax.random.PRNGKey(11)
    monkeypatch.setenv("PIGO_TPU_POST_PATCH", "0")
    want = detector.detect(sample_gray, rows, cols, CFG, perturbs=7, key=key)
    monkeypatch.setenv("PIGO_TPU_POST_PATCH", "1")
    got = detector.detect(sample_gray, rows, cols, CFG, perturbs=7, key=key)
    assert len(want) == len(got) >= 1
    for a, b in zip(want, got):
        assert a.face == b.face
        assert [(p.row, p.col, p.scale) for p in a.eyes] == [
            (p.row, p.col, p.scale) for p in b.eyes
        ]
        assert [(p.row, p.col, p.scale) for p in a.landmarks] == [
            (p.row, p.col, p.scale) for p in b.landmarks
        ]


def test_post_int8_overrides_pallas(monkeypatch):
    """PIGO_TPU_POST_INT8=1 must take precedence over
    PIGO_TPU_POST_PALLAS=1: the Pallas stage kernel has no int8 path, and
    a benchmark must never silently measure the wrong variant."""
    from pigo_tpu import detector as det_mod

    monkeypatch.setenv("PIGO_TPU_POST_PALLAS", "1")
    monkeypatch.setenv("PIGO_TPU_POST_INT8", "1")
    assert det_mod._patch_post_pallas() is False
    assert det_mod._patch_post_int8() is True
    monkeypatch.setenv("PIGO_TPU_POST_INT8", "0")
    assert det_mod._patch_post_pallas() is True


def test_pad_slot_overflow_masked(detector, sample_gray):
    """Pad face slots (device path: the fixed safe pad anchor duplicated
    from cluster 0) walk garbage landmark anchors whose ascale can exceed
    the planned patches — their overflow must be masked by face_valid so a
    1-face stream with 2+ slots never pays an escalation re-dispatch."""
    import jax
    import jax.numpy as jnp
    from pigo_tpu import detector as det_mod

    rows, cols = sample_gray.shape
    f = 2  # slot 0 real (small face), slot 1 pad (safe anchor, scale 100)
    erow, ecol, escale = det_mod._device_eye_anchors(
        jnp.asarray([210.0, 210.0], jnp.float32),
        jnp.asarray([160.0, 160.0], jnp.float32),
        jnp.asarray([55.0, 100.0], jnp.float32),  # pad slot: fixed 100
    )
    pg = detector.pupil.forest
    pupil_geom = (pg.stages, pg.trees, pg.depth, float(pg.scale_mult))
    lg = detector.landmarks.geometry
    lmk_geom = (lg.stages, lg.trees, lg.depth, float(lg.scale_mult))
    sched = detector.landmarks.point_schedule
    lmk_cids = np.tile(np.array(
        [detector.landmarks._name_to_id[n] for n, _ in sched], np.int32), f)
    lmk_flips = np.tile(np.array([fl for _, fl in sched], bool), f)
    # patches planned for a ~64 face bound: adequate for the real face,
    # too small for the pad slot's landmark ascale
    patch_cfg = det_mod._post_patch_cfg(rows, cols, 64, pupil_geom,
                                        lmk_geom)
    kw = dict(f=f, perturbs=7, rows=rows, cols=cols,
              pupil_geom=pupil_geom, lmk_geom=lmk_geom,
              lmk_cids=jnp.asarray(lmk_cids),
              lmk_flips=jnp.asarray(lmk_flips), patch_cfg=patch_cfg)
    args = (jax.random.PRNGKey(0), erow, ecol, escale,
            jnp.asarray(sample_gray, jnp.uint8).reshape(-1),
            detector.pupil.codes, detector.pupil.preds,
            detector.landmarks.codes, detector.landmarks.preds)
    masked = det_mod._fused_post_patch_impl(
        *args, face_valid=jnp.asarray([True, False]), **kw)
    assert float(masked[0, -1]) == 0.0, "pad slot overflow leaked"
    # sanity: the pad slot genuinely overflows when counted
    unmasked = det_mod._fused_post_patch_impl(*args, **kw)
    assert float(unmasked[0, -1]) == 1.0


def test_strided_image_params_fast_path(detector, sample_gray):
    """A strided frame (ImageParams.Dim > cols, core/pigo.go:29-34) runs
    through the production fast path and matches both the contiguous frame
    and the gather path bit-for-bit (VERDICT r2 missing #3)."""
    import jax
    from pigo_tpu.detector import ImageParams
    from pigo_tpu.models.face import FaceCascade

    rows, cols = sample_gray.shape
    dim = cols + 13
    strided = np.full((rows, dim), 77, np.uint8)
    strided[:, :cols] = sample_gray
    ip = ImageParams(pixels=strided.ravel(), rows=rows, cols=cols, dim=dim)

    faces = detector.detect_faces(ip, params=CFG, iou_threshold=0.1)
    want = detector.detect_faces(sample_gray, rows, cols, CFG,
                                 iou_threshold=0.1)
    assert [(f.row, f.col, f.scale, f.q) for f in faces] == \
           [(f.row, f.col, f.scale, f.q) for f in want]

    # raw cascade parity: the pallas backend de-strides and runs the fast
    # path; the gather backend handles the stride natively
    fast = FaceCascade(detector.face.forest)  # pallas backend
    dets_fast = fast.run_cascade(
        strided.ravel(), rows, cols, dim, min_size=CFG.min_size,
        max_size=CFG.max_size, shift_factor=CFG.shift_factor,
        scale_factor=CFG.scale_factor)
    dets_ref = detector.face.run_cascade(
        strided.ravel(), rows, cols, dim, min_size=CFG.min_size,
        max_size=CFG.max_size, shift_factor=CFG.shift_factor,
        scale_factor=CFG.scale_factor)
    assert np.array_equal(dets_fast, dets_ref)

    # full pipeline: strided == contiguous, including eyes + landmarks
    full = detector.detect(ip, params=CFG, perturbs=15,
                           key=jax.random.PRNGKey(1))
    direct = detector.detect(sample_gray, rows, cols, CFG, perturbs=15,
                             key=jax.random.PRNGKey(1))
    assert [r.to_json_dict() for r in full] == \
           [r.to_json_dict() for r in direct]


def test_device_patch_overflow_escalates(detector, sample_gray, monkeypatch):
    """A face larger than the dispatched patch plan must escalate through
    the patch rung (exact-bound re-dispatch, same face slots) and end with
    the same results as the host gather pipeline."""
    import jax
    from PIL import Image

    monkeypatch.setenv("PIGO_TPU_POST_PATCH", "1")
    small = np.asarray(
        Image.fromarray(sample_gray).resize((128, 128)), np.uint8)
    rows, cols = small.shape
    params = CascadeParams(min_size=60, max_size=128, shift_factor=0.2,
                           scale_factor=1.3)
    key = jax.random.PRNGKey(21)
    # deliberately dispatch with a patch plan far too small for the face
    ticket = detector._dispatch_frame_device(
        small, params, 0.0, 0.15, 7, key, face_bound=52)
    got = detector._collect_frame_device(ticket)
    monkeypatch.setenv("PIGO_TPU_POST_PATCH", "0")
    want = detector.detect(small, rows, cols, params, perturbs=7, key=key)
    assert len(got) == len(want) >= 1
    for a, b in zip(got, want):
        assert (a.face.row, a.face.col, a.face.scale) == \
               (b.face.row, b.face.col, b.face.scale)
        assert [(p.row, p.col) for p in a.eyes] == \
               [(p.row, p.col) for p in b.eyes]
        assert [(p.row, p.col) for p in a.landmarks] == \
               [(p.row, p.col) for p in b.landmarks]
