"""Pupil/landmark parity vs oracle (shared perturbation uniforms ->
bit-identical results; reference core/puploc_test.go:34-81,
core/flploc_test.go:30-154)."""

import numpy as np
import pytest

from pigo_tpu.models.landmark import LandmarkLocalizer, landmark_anchor
from pigo_tpu.models.pupil import PupilLocalizer, Puploc
from pigo_tpu.oracle.pupil import make_perturbations, oracle_run_detector

FACE = (202, 154, 243)  # clustered face on sample.jpg


@pytest.fixture(scope="module")
def plc(pupil_forest):
    return PupilLocalizer(pupil_forest)


@pytest.fixture(scope="module")
def flp():
    return LandmarkLocalizer()


def eye_anchor(side: str):
    r, c, s = FACE
    if side == "left":
        return Puploc(r - int(0.075 * s), c - int(0.175 * s), s * 0.25, 15)
    return Puploc(r - int(0.075 * s), c + int(0.185 * s), s * 0.25, 15)


def test_pupil_exact_vs_oracle(plc, sample_gray, rng):
    rows, cols = sample_gray.shape
    for side in ("left", "right"):
        a = eye_anchor(side)
        u = rng.random((a.perturbs, 3), dtype=np.float32)
        res = plc.run_detector(a, sample_gray, rows, cols, uniforms=u)
        o_r, o_c, o_s = oracle_run_detector(
            plc.forest, make_perturbations(a.row, a.col, a.scale, u),
            rows, cols, sample_gray.ravel(), cols,
        )
        assert (res.row, res.col) == (o_r, o_c)
        assert abs(res.scale - o_s) < 1e-4
        assert res.row > 0 and res.col > 0  # eye found (smoke)


def test_pupil_rotated_exact(plc, sample_gray, rng):
    rows, cols = sample_gray.shape
    a = eye_anchor("left")
    u = rng.random((a.perturbs, 3), dtype=np.float32)
    res = plc.run_detector(a, sample_gray, rows, cols, angle=0.25, uniforms=u)
    o_r, o_c, _ = oracle_run_detector(
        plc.forest, make_perturbations(a.row, a.col, a.scale, u),
        rows, cols, sample_gray.ravel(), cols, angle=0.25,
    )
    assert (res.row, res.col) == (o_r, o_c)


def test_landmark_exact_vs_oracle(plc, flp, sample_gray, rng):
    rows, cols = sample_gray.shape
    le = plc.run_detector(eye_anchor("left"), sample_gray, rows, cols,
                          uniforms=rng.random((15, 3), dtype=np.float32))
    re = plc.run_detector(eye_anchor("right"), sample_gray, rows, cols,
                          uniforms=rng.random((15, 3), dtype=np.float32))
    u = rng.random((15, 3), dtype=np.float32)
    for flip in (False, True):
        lp = flp.get_landmark_point(
            "lp42", le, re, sample_gray, rows, cols,
            perturbs=15, flip_v=flip, uniforms=u,
        )
        arow, acol, ascale = landmark_anchor(le, re)
        o_r, o_c, _ = oracle_run_detector(
            flp.cascades["lp42"], make_perturbations(arow, acol, ascale, u),
            rows, cols, sample_gray.ravel(), cols, flip_v=flip,
        )
        assert (lp.row, lp.col) == (o_r, o_c)


def test_fifteen_landmark_points(plc, flp, sample_gray, rng):
    """The reference's strictest assertion: 2*5 eye + 4 mouth + 1 nose = 15
    landmark points detected (core/flploc_test.go:150-153)."""
    rows, cols = sample_gray.shape
    le = plc.run_detector(eye_anchor("left"), sample_gray, rows, cols,
                          uniforms=rng.random((15, 3), dtype=np.float32))
    re = plc.run_detector(eye_anchor("right"), sample_gray, rows, cols,
                          uniforms=rng.random((15, 3), dtype=np.float32))
    pts = flp.detect_points(le, re, sample_gray, rows, cols, perturbs=15)
    found = [p for p in pts if p.row > 0 and p.col > 0]
    assert len(found) == 15


def test_median_index_semantics():
    from pigo_tpu.ops.pupil_dense import median_vote
    import jax.numpy as jnp

    # round(P/2) with ties away from zero: P=63 -> index 32
    v = jnp.arange(63, dtype=jnp.float32)[None, :]
    r, c, s = median_vote(v, v, v, 63)
    assert int(r[0]) == 32
    # P=2 -> round(1.0)=1
    v2 = jnp.asarray([[5.0, 3.0]])
    r2, _, _ = median_vote(v2, v2, v2, 2)
    assert int(r2[0]) == 5  # sorted [3,5], index 1


def test_landmark_anchor_geometry():
    le = Puploc(100, 80, 20.0)
    re = Puploc(100, 140, 20.0)
    row, col, scale = landmark_anchor(le, re)
    # dist = 60 -> row = 100 + 15, col = 110 + 9, scale = 180
    assert (row, col) == (115, 119)
    assert scale == 180.0
