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


# ---------------------------------------------------------------- patch walk


def _gather_vs_patch(codes, preds, cid, r0, c0, s0, flips, u, gray, geom,
                     patch_sizes):
    """Run both formulations on identical uniforms; return (ref, got, ovf)."""
    import jax.numpy as jnp
    from pigo_tpu.ops import pupil_dense, pupil_patch

    rows, cols = gray.shape
    stages, trees, depth, smul = geom
    ref = np.asarray(pupil_dense.ensemble(
        codes, preds, cid, r0, c0, s0, flips, u,
        jnp.asarray(gray, jnp.uint8).reshape(-1),
        stages=stages, trees=trees, depth=depth, nrows=rows, ncols=cols,
        dim=cols, scale_mult=smul, rotated=False, angle_idx=0))
    got, ovf = pupil_patch.ensemble_patch(
        codes, preds, cid, r0, c0, s0, flips, u,
        jnp.asarray(gray, jnp.uint8).reshape(rows, cols),
        stages=stages, trees=trees, depth=depth, nrows=rows, ncols=cols,
        scale_mult=smul, patch_sizes=patch_sizes)
    return ref, np.asarray(got), np.asarray(ovf)


def test_patch_walk_pupil_exact(plc, sample_gray):
    """The MXU patch formulation (ops/pupil_patch.py) is bit-exact vs the
    gather walk for non-overflowing pupil groups, flips included."""
    import jax
    import jax.numpy as jnp
    from pigo_tpu.ops import pupil_patch

    rows, cols = sample_gray.shape
    g = plc.forest
    geom = (g.stages, g.trees, g.depth, float(g.scale_mult))
    G, P = 4, 15
    u = jax.random.uniform(jax.random.PRNGKey(3), (G, P, 3), jnp.float32)
    r0 = jnp.asarray([185.0, 182.0, 60.0, 250.0], jnp.float32)
    c0 = jnp.asarray([112.0, 203.0, 100.0, 60.0], jnp.float32)
    s0 = jnp.asarray([59.5, 59.5, 30.0, 45.0], jnp.float32)
    flips = jnp.asarray([False, True, False, True])
    sizes = pupil_patch.stage_patch_sizes(
        60.0, stages=g.stages, scale_mult=float(g.scale_mult),
        nrows=rows, ncols=cols)
    ref, got, ovf = _gather_vs_patch(
        plc.codes, plc.preds, jnp.zeros(G, jnp.int32), r0, c0, s0, flips, u,
        sample_gray, geom, tuple(sizes))
    assert not ovf.any()
    assert np.array_equal(ref, got)


def test_patch_walk_landmarks_exact(flp, sample_gray):
    """Landmark cascades (9 forests via cascade id) through the patch walk
    match the gather walk bit-for-bit."""
    import jax
    import jax.numpy as jnp
    from pigo_tpu.ops import pupil_patch

    rows, cols = sample_gray.shape
    lg = flp.geometry
    geom = (lg.stages, lg.trees, lg.depth, float(lg.scale_mult))
    G, P = 6, 15
    u = jax.random.uniform(jax.random.PRNGKey(5), (G, P, 3), jnp.float32)
    cid = jnp.asarray([0, 3, 5, 8, 2, 7], jnp.int32)
    r0 = jnp.asarray([200.0, 150.0, 260.0, 180.0, 140.0, 300.0], jnp.float32)
    c0 = jnp.asarray([160.0, 140.0, 200.0, 150.0, 250.0, 180.0], jnp.float32)
    s0 = jnp.asarray([150.0, 120.0, 90.0, 150.0, 60.0, 120.0], jnp.float32)
    flips = jnp.asarray([False, True, False, True, False, False])
    sizes = pupil_patch.stage_patch_sizes(
        150.0, stages=lg.stages, scale_mult=float(lg.scale_mult),
        nrows=rows, ncols=cols)
    ref, got, ovf = _gather_vs_patch(
        flp.codes, flp.preds, cid, r0, c0, s0, flips, u, sample_gray, geom,
        tuple(sizes))
    assert not ovf.any()
    assert np.array_equal(ref, got)


def test_patch_walk_rotated_exact(plc, sample_gray):
    """The rotated patch walk (quantized qsin/qcos probe transform, `<=`
    polarity quirk, wider rotated reach) is bit-exact vs the rotated
    gather walk (pupil_dense rotated branch, puploc.go:174-215) given
    identical uniforms, across angles and flips."""
    import jax
    import jax.numpy as jnp
    from pigo_tpu.ops import pupil_dense, pupil_patch

    rows, cols = sample_gray.shape
    g = plc.forest
    G, P = 4, 15
    u = jax.random.uniform(jax.random.PRNGKey(11), (G, P, 3), jnp.float32)
    cid = jnp.zeros(G, jnp.int32)
    r0 = jnp.asarray([185.0, 182.0, 90.0, 250.0], jnp.float32)
    c0 = jnp.asarray([112.0, 203.0, 120.0, 90.0], jnp.float32)
    s0 = jnp.asarray([59.5, 59.5, 40.0, 45.0], jnp.float32)
    flips = jnp.asarray([False, True, False, True])
    sizes = tuple(pupil_patch.stage_patch_sizes(
        60.0, stages=g.stages, scale_mult=float(g.scale_mult),
        nrows=rows, ncols=cols, rotated=True))
    for angle_idx in (4, 8, 31):
        ref = np.asarray(pupil_dense.ensemble(
            plc.codes, plc.preds, cid, r0, c0, s0, flips, u,
            jnp.asarray(sample_gray, jnp.uint8).reshape(-1),
            stages=g.stages, trees=g.trees, depth=g.depth, nrows=rows,
            ncols=cols, dim=cols, scale_mult=float(g.scale_mult),
            rotated=True, angle_idx=angle_idx))
        got, ovf = pupil_patch.ensemble_patch(
            plc.codes, plc.preds, cid, r0, c0, s0, flips, u,
            jnp.asarray(sample_gray, jnp.uint8).reshape(rows, cols),
            stages=g.stages, trees=g.trees, depth=g.depth, nrows=rows,
            ncols=cols, scale_mult=float(g.scale_mult), patch_sizes=sizes,
            rotated=True, angle_idx=angle_idx)
        assert not np.asarray(ovf).any(), angle_idx
        assert np.array_equal(ref, np.asarray(got)), angle_idx


def test_patch_walk_int8_exact(plc, flp, sample_gray):
    """The int8 MXU variant (pixels shifted by -128 into s8, s8 x s8 -> i32
    matmul-gathers) is bit-identical to the default walk: the shift cancels
    in every px1 > px2 bintest compare and each one-hot product has exactly
    one s8 term, so no rounding or overflow can occur."""
    import jax
    import jax.numpy as jnp
    from pigo_tpu.ops import pupil_patch

    rows, cols = sample_gray.shape
    img2d = jnp.asarray(sample_gray, jnp.uint8).reshape(rows, cols)
    for casc, cid0, s0v in ((plc, 0, 59.5), (flp, 4, 120.0)):
        g = getattr(casc, "forest", None) or casc.geometry
        G, P = 3, 15
        u = jax.random.uniform(jax.random.PRNGKey(7), (G, P, 3), jnp.float32)
        cid = jnp.full((G,), cid0, jnp.int32)
        r0 = jnp.asarray([185.0, 150.0, 250.0], jnp.float32)
        c0 = jnp.asarray([112.0, 203.0, 160.0], jnp.float32)
        s0 = jnp.full((G,), s0v, jnp.float32)
        flips = jnp.asarray([False, True, False])
        sizes = tuple(pupil_patch.stage_patch_sizes(
            float(s0v) + 1.0, stages=g.stages,
            scale_mult=float(g.scale_mult), nrows=rows, ncols=cols))
        kw = dict(stages=g.stages, trees=g.trees, depth=g.depth,
                  nrows=rows, ncols=cols, scale_mult=float(g.scale_mult),
                  patch_sizes=sizes)
        args = (casc.codes, casc.preds, cid, r0, c0, s0, flips, u, img2d)
        ref, ovf_ref = pupil_patch.ensemble_patch(*args, **kw)
        got, ovf = pupil_patch.ensemble_patch(*args, int8=True, **kw)
        assert not np.asarray(ovf_ref).any()
        assert np.array_equal(np.asarray(ovf_ref), np.asarray(ovf))
        assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_patch_walk_overflow_flag(plc, sample_gray):
    """A patch too small for the walk's reach must raise the group overflow
    flag (the caller's cue to re-run through the exact gather path) instead
    of silently returning wrong positions."""
    import jax
    import jax.numpy as jnp
    from pigo_tpu.ops import pupil_patch

    rows, cols = sample_gray.shape
    g = plc.forest
    P = 15
    u = jax.random.uniform(jax.random.PRNGKey(4), (1, P, 3), jnp.float32)
    got, ovf = pupil_patch.ensemble_patch(
        plc.codes, plc.preds, jnp.zeros(1, jnp.int32),
        jnp.asarray([185.0], jnp.float32), jnp.asarray([112.0], jnp.float32),
        jnp.asarray([300.0], jnp.float32),  # reach ~150 >> patch half 64
        jnp.zeros(1, bool), u,
        jnp.asarray(sample_gray, jnp.uint8).reshape(rows, cols),
        stages=g.stages, trees=g.trees, depth=g.depth, nrows=rows,
        ncols=cols, scale_mult=float(g.scale_mult),
        patch_sizes=(128,) * g.stages)
    assert bool(np.asarray(ovf)[0])


def test_pallas_walk_matches_patch_walk(plc, flp, sample_gray):
    """The fused Pallas stage kernel (ops/pupil_pallas.py, interpret mode on
    CPU) is bit-exact vs the jnp patch walk — which the tests above pin to
    the gather walk — including the overflow flags."""
    import jax
    import jax.numpy as jnp
    from pigo_tpu.ops import pupil_patch

    rows, cols = sample_gray.shape
    img2d = jnp.asarray(sample_gray, jnp.uint8).reshape(rows, cols)
    P = 15

    g = plc.forest
    u = jax.random.uniform(jax.random.PRNGKey(3), (4, P, 3), jnp.float32)
    args = (plc.codes, plc.preds, jnp.zeros(4, jnp.int32),
            jnp.asarray([185.0, 182.0, 60.0, 250.0], jnp.float32),
            jnp.asarray([112.0, 203.0, 100.0, 60.0], jnp.float32),
            jnp.asarray([59.5, 59.5, 30.0, 45.0], jnp.float32),
            jnp.asarray([False, True, False, True]), u, img2d)
    sizes = pupil_patch.stage_patch_sizes(
        60.0, stages=g.stages, scale_mult=float(g.scale_mult),
        nrows=rows, ncols=cols)
    kw = dict(stages=g.stages, trees=g.trees, depth=g.depth, nrows=rows,
              ncols=cols, scale_mult=float(g.scale_mult),
              patch_sizes=tuple(sizes))
    ref, ovf_ref = pupil_patch.ensemble_patch(*args, **kw)
    got, ovf = pupil_patch.ensemble_pallas(*args, interpret=True, **kw)
    assert np.array_equal(np.asarray(ref), np.asarray(got))
    assert np.array_equal(np.asarray(ovf_ref), np.asarray(ovf))

    lg = flp.geometry
    u2 = jax.random.uniform(jax.random.PRNGKey(9), (6, P, 3), jnp.float32)
    args2 = (flp.codes, flp.preds, jnp.asarray([0, 3, 5, 8, 2, 7], jnp.int32),
             jnp.asarray([200.0, 150.0, 260.0, 180.0, 140.0, 300.0],
                         jnp.float32),
             jnp.asarray([160.0, 140.0, 200.0, 150.0, 250.0, 180.0],
                         jnp.float32),
             jnp.asarray([150.0, 120.0, 90.0, 150.0, 60.0, 120.0],
                         jnp.float32),
             jnp.asarray([False, True, False, True, False, False]), u2, img2d)
    sizes2 = pupil_patch.stage_patch_sizes(
        150.0, stages=lg.stages, scale_mult=float(lg.scale_mult),
        nrows=rows, ncols=cols)
    kw2 = dict(stages=lg.stages, trees=lg.trees, depth=lg.depth, nrows=rows,
               ncols=cols, scale_mult=float(lg.scale_mult),
               patch_sizes=tuple(sizes2))
    ref2, ovfr2 = pupil_patch.ensemble_patch(*args2, **kw2)
    got2, ovf2 = pupil_patch.ensemble_pallas(*args2, interpret=True, **kw2)
    assert np.array_equal(np.asarray(ref2), np.asarray(got2))
    assert np.array_equal(np.asarray(ovfr2), np.asarray(ovf2))
