"""On-device clustering parity vs the host/oracle implementation."""

import numpy as np
import pytest

from pigo_tpu.oracle.cluster import oracle_cluster_detections
from pigo_tpu.ops.cluster_device import cluster_device_host


def random_dets(rng, n):
    rows = rng.integers(20, 380, n)
    cols = rng.integers(20, 300, n)
    scales = rng.integers(20, 200, n)
    q = rng.uniform(0.1, 90.0, n).astype(np.float32)
    return np.stack([rows, cols, scales, q.astype(np.float64)], axis=1)


@pytest.mark.parametrize("n", [0, 1, 7, 60])
@pytest.mark.parametrize("iou", [0.1, 0.2, 0.5])
def test_device_cluster_matches_oracle(rng, n, iou):
    dets = random_dets(rng, n)
    got = cluster_device_host(dets, iou, capacity=64)
    want = oracle_cluster_detections(dets, iou)
    assert got.shape == want.shape
    if n:
        # row/col/scale are exact integers; q is an f32 sum in a different
        # reduction order -> last-ulp tolerance
        assert np.array_equal(got[:, :3], want[:, :3])
        np.testing.assert_allclose(got[:, 3], want[:, 3], rtol=1e-6)


def test_device_cluster_real_hits(sample_gray, face_forest):
    from pigo_tpu.models.face import FaceCascade

    rows, cols = sample_gray.shape
    fc = FaceCascade(face_forest)
    dets = fc.run_cascade(sample_gray, rows, cols, min_size=60, max_size=400,
                          shift_factor=0.2, scale_factor=1.2)
    got = cluster_device_host(dets, 0.2, capacity=128)
    want = oracle_cluster_detections(dets, 0.2)
    assert np.array_equal(got[:, :3], want[:, :3])
    np.testing.assert_allclose(got[:, 3], want[:, 3], rtol=1e-6)


def test_device_cluster_capacity_guard():
    with pytest.raises(ValueError):
        cluster_device_host(np.zeros((10, 4)), 0.2, capacity=4)
