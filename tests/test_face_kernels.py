"""Face kernel parity: gather backend and Pallas (interpret-mode) backend
must be bit-identical to the oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from pigo_tpu.models.face import FaceCascade
from pigo_tpu.oracle.face import (
    oracle_classify_region,
    oracle_classify_rotated_region,
    oracle_run_cascade,
)

# Small, fast config for the CPU gather backend.
CFG = dict(min_size=60, max_size=400, shift_factor=0.3, scale_factor=1.3)


@pytest.fixture(scope="module")
def fc_ref(face_forest):
    return FaceCascade(face_forest, backend="reference")


@pytest.fixture(scope="module")
def fc_pallas(face_forest):
    return FaceCascade(face_forest, backend="pallas")


def test_gather_backend_exact(fc_ref, sample_gray, face_forest):
    rows, cols = sample_gray.shape
    dets = fc_ref.run_cascade(sample_gray, rows, cols, **CFG)
    oracle = oracle_run_cascade(
        face_forest, sample_gray.ravel(), rows, cols, cols,
        CFG["min_size"], CFG["max_size"], CFG["shift_factor"],
        CFG["scale_factor"],
    )
    assert dets.shape == oracle.shape
    assert np.array_equal(dets[:, :3], oracle[:, :3])
    assert np.array_equal(
        dets[:, 3].astype(np.float32), oracle[:, 3].astype(np.float32)
    )
    assert dets.shape[0] > 0  # smoke: sample.jpg contains a face


def test_gather_backend_rotated_exact(fc_ref, sample_gray, face_forest):
    rows, cols = sample_gray.shape
    angle = 0.25
    dets = fc_ref.run_cascade(sample_gray, rows, cols, angle=angle, **CFG)
    oracle = oracle_run_cascade(
        face_forest, sample_gray.ravel(), rows, cols, cols,
        CFG["min_size"], CFG["max_size"], CFG["shift_factor"],
        CFG["scale_factor"], angle=angle,
    )
    assert dets.shape == oracle.shape
    assert np.array_equal(dets[:, :3], oracle[:, :3])


def test_pallas_interpret_single_scale(fc_pallas, sample_gray, face_forest):
    """One small scale through the Pallas kernel in interpret mode."""
    from pigo_tpu.ops import face_pallas as fp

    rows, cols = sample_gray.shape
    plan = fp.build_dense_plan(face_forest, rows, cols, 150, 170, 0.4, 1.3)
    sps = [sp for sp in plan.scales if not sp.fallback]
    assert sps, "expected at least one dense scale"
    sp = sps[0]
    q = np.asarray(
        fp.scale_scores(
            jnp.asarray(sample_gray, jnp.float32), sp, face_forest,
            jnp.asarray(sp.tables.reshape(-1)),
            jnp.asarray(face_forest.preds.reshape(-1)),
            jnp.asarray(face_forest.thresh),
            interpret=True,
        )
    )
    rr = np.arange(sp.offset, rows - sp.offset + 1, sp.step)
    cc = np.arange(sp.offset, cols - sp.offset + 1, sp.step)
    qo = oracle_classify_region(
        face_forest, np.repeat(rr, cc.size), np.tile(cc, rr.size),
        sp.scale, sample_gray.ravel(), cols,
    ).reshape(rr.size, cc.size).astype(np.float32)
    assert np.array_equal(q, qo)


def test_rotated_classifier_quirks(face_forest, sample_gray):
    """The rotated path must clamp columns with nrows-1 (reference quirk)."""
    rows, cols = sample_gray.shape
    # windows near the right edge where col + offset would exceed nrows-1
    rs = np.array([60, 200])
    cs = np.array([300, 310])
    q = oracle_classify_rotated_region(
        face_forest, rs, cs, 100, 0.5, rows, cols, sample_gray.ravel(), cols
    )
    assert q.shape == (2,)  # runs without out-of-range indexing


def test_tiny_image_no_windows(fc_pallas):
    tiny = np.zeros((10, 10), np.uint8)
    dets = fc_pallas.run_cascade(tiny, 10, 10)
    assert dets.shape == (0, 4)
