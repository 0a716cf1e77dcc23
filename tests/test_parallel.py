"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Window-axis sharding + all_gather must reproduce the single-chip detections
exactly; frame data parallelism must scale counts linearly."""

import numpy as np
import pytest
import jax


requires_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

CFG = dict(min_size=100, max_size=400, shift_factor=0.3, scale_factor=1.4)


@pytest.fixture(scope="module")
def sharded(face_forest):
    from pigo_tpu.models.face import FaceCascade
    from pigo_tpu.parallel import ShardedFaceCascade, make_mesh

    mesh = make_mesh(8, "window")
    return ShardedFaceCascade(
        mesh, FaceCascade(face_forest, backend="reference")
    )


@requires_mesh
def test_window_sharded_matches_oracle(sharded, sample_gray, face_forest):
    from pigo_tpu.oracle.face import oracle_run_cascade

    rows, cols = sample_gray.shape
    dets = sharded.window_sharded_hits(sample_gray, rows, cols, **CFG)
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


@requires_mesh
def test_window_sharded_cluster(sharded, sample_gray):
    rows, cols = sample_gray.shape
    clusters = sharded.detect(sample_gray, rows, cols, **CFG)
    assert clusters.shape[0] >= 1


@requires_mesh
def test_batch_dp_counts(sharded, sample_gray):
    rows, cols = sample_gray.shape
    single = sharded.window_sharded_hits(sample_gray, rows, cols, **CFG)
    frames = np.broadcast_to(sample_gray.ravel(), (8, rows * cols))
    plan, q, total = sharded.batch_scores(frames, rows, cols, **CFG)
    assert int(total) == 8 * single.shape[0]
    assert q.shape[0] == 8


@requires_mesh
def test_batch_not_divisible_raises(sharded, sample_gray):
    rows, cols = sample_gray.shape
    frames = np.broadcast_to(sample_gray.ravel(), (3, rows * cols))
    with pytest.raises(ValueError, match="not divisible"):
        sharded.batch_scores(frames, rows, cols, **CFG)
