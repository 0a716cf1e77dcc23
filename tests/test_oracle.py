"""Oracle self-consistency: the vectorized NumPy oracle must agree with the
pure-scalar transliteration (the ground-truth spec of the reference
semantics, core/pigo.go:113-147)."""

import numpy as np

from pigo_tpu.oracle.cluster import oracle_cluster_detections
from pigo_tpu.oracle.face import (
    oracle_classify_region,
    oracle_run_cascade_scalar,
    pyramid_scales,
)
from pigo_tpu.ops.cluster import cluster_detections


def test_vectorized_vs_scalar(face_forest, sample_gray, rng):
    rows, cols = sample_gray.shape
    pix = sample_gray.ravel()
    for scale in (24, 60, 150):
        off = scale // 2 + 1
        rs = rng.integers(off, rows - off, 8)
        cs = rng.integers(off, cols - off, 8)
        qv = oracle_classify_region(face_forest, rs, cs, scale, pix, cols)
        for i in range(8):
            qs = oracle_run_cascade_scalar(
                face_forest, pix, rows, cols, cols, int(rs[i]), int(cs[i]), scale
            )
            assert qv[i] == np.float32(qs)


def test_pyramid_scales_progression():
    # reference scale update: scale += max(2, scale*factor - scale)
    scales = pyramid_scales(20, 1000, 1.1)
    assert scales[0] == 20
    assert all(b > a for a, b in zip(scales, scales[1:]))
    assert scales[-1] <= 1000
    # the anti-infinite-loop guard: min step of 2 (core/pigo.go:251-255)
    s9 = pyramid_scales(9, 20, 1.1)
    assert s9 == [9, 11, 13, 15, 17, 19]


def test_cluster_matches_oracle(rng):
    dets = np.stack(
        [
            rng.integers(50, 200, 40).astype(float),
            rng.integers(50, 200, 40).astype(float),
            rng.integers(40, 120, 40).astype(float),
            rng.random(40) * 50,
        ],
        axis=1,
    )
    for thr in (0.1, 0.2, 0.5):
        a = cluster_detections(dets, thr)
        b = oracle_cluster_detections(dets, thr)
        assert a.shape == b.shape
        assert np.allclose(a, b)


def test_cluster_hand_case():
    # two overlapping + one distant detection
    dets = np.array(
        [
            [100, 100, 50, 2.0],
            [102, 101, 52, 5.0],
            [300, 300, 50, 1.0],
        ],
        dtype=float,
    )
    out = cluster_detections(dets, 0.2)
    assert out.shape[0] == 2
    merged = out[out[:, 3] > 6.0]
    assert merged.shape[0] == 1
    assert merged[0, 0] == 101 and merged[0, 1] == 100  # integer mean
    assert np.isclose(merged[0, 3], 7.0)


def test_cluster_empty():
    out = cluster_detections(np.zeros((0, 4)), 0.2)
    assert out.shape == (0, 4)
