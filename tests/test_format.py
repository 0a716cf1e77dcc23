"""Cascade binary format tests (reference: core/pigo_test.go:53-58,
core/puploc_test.go:27-32, core/flploc_test.go:23-28)."""

import numpy as np
import pytest

from pigo_tpu.cascade.assets import asset_path, load_landmark_dir, load_puploc
from pigo_tpu.cascade.format import unpack_face_cascade, unpack_pupil_cascade


def test_facefinder_header(face_forest):
    assert face_forest.depth == 6
    assert face_forest.num_trees == 468
    assert face_forest.codes.shape == (468, 64, 4)
    assert face_forest.preds.shape == (468, 64)
    assert face_forest.thresh.shape == (468,)
    # node 0 is the zero pad
    assert np.all(face_forest.codes[:, 0, :] == 0)


def test_facefinder_size_formula(face_forest):
    raw = open(asset_path("cascade", "facefinder"), "rb").read()
    n, d = face_forest.num_trees, face_forest.depth
    assert len(raw) == 16 + n * (4 * 2**d - 4 + 4 * 2**d + 4)


def test_puploc_header(pupil_forest):
    assert pupil_forest.stages == 5
    assert pupil_forest.trees == 20
    assert pupil_forest.depth == 10
    assert abs(pupil_forest.scale_mult - 0.8) < 1e-6
    assert pupil_forest.codes.shape == (5, 20, 1024, 4)
    assert pupil_forest.preds.shape == (5, 20, 1024, 2)


def test_landmark_dir():
    lps = load_landmark_dir()
    assert sorted(lps) == [
        "lp312", "lp38", "lp42", "lp44", "lp46", "lp81", "lp82", "lp84", "lp93",
    ]
    for f in lps.values():
        assert (f.stages, f.trees, f.depth) == (6, 20, 9)
        assert abs(f.scale_mult - 0.7) < 1e-6


def test_truncated_face_cascade_rejected():
    raw = open(asset_path("cascade", "facefinder"), "rb").read()
    with pytest.raises(ValueError, match="truncated"):
        unpack_face_cascade(raw[: len(raw) // 2])


def test_bad_header_rejected():
    with pytest.raises(ValueError):
        unpack_face_cascade(b"\x00" * 64)
    with pytest.raises(ValueError):
        unpack_pupil_cascade(b"\xff" * 64)


def test_roundtrip_values_finite(face_forest, pupil_forest):
    assert np.isfinite(face_forest.preds).all()
    assert np.isfinite(face_forest.thresh).all()
    assert np.isfinite(pupil_forest.preds).all()
