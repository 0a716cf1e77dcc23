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
    # scales below TAIL_MIN_WINDOWS route to the tail fallback; scale 20 at
    # shift 0.1 (~28k windows) always stays dense.
    plan = fp.build_dense_plan(face_forest, rows, cols, 20, 25, 0.1, 1.3)
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


def test_pallas_mxu_read_exact(sample_gray, face_forest, monkeypatch):
    """The MXU sub-alignment read (one-hot [TILE_R, 2*TILE_R] matmul in
    place of the dynamic sublane roll, PIGO_TPU_MXU_READ=1) must be
    bit-exact vs the oracle — the one-hot has a single unit f32 term per
    output row, so no rounding can occur."""
    from pigo_tpu.ops import face_pallas as fp

    monkeypatch.setenv("PIGO_TPU_MXU_READ", "1")
    rows, cols = sample_gray.shape
    plan = fp.build_dense_plan(face_forest, rows, cols, 20, 25, 0.1, 1.3)
    sp = next(sp for sp in plan.scales if not sp.fallback)
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


def test_rotated_classifier_quirks():
    """The rotated path must clamp COLUMNS with nrows-1, not ncols-1
    (reference quirk, core/pigo.go:167-171): on a tall image an edge
    window's column read runs past the row end into the NEXT row.

    Hand-constructed value assertion: a synthetic 1-tree depth-1 forest
    whose single node reads (angle=0.25, i.e. 90 deg: qcos=0, qsin=256)
        px1 at col c + (127*scale >> 8)  -> raw col 49 on a 32-wide image
        px2 at (r, c)
    With the quirk, px1 clamps to min(nrows-1=63, 49) = 49 and wraps to
    pixel (r+1, 17) = 0 -> bintest 1 -> leaf +3 -> score 13.
    A 'corrected' ncols-1 clamp would read (r, 31) = 255 -> bintest 0 ->
    leaf -1 -> score 9. The oracle must return 13."""
    from pigo_tpu.cascade.format import FaceForest

    rows, cols = 64, 32
    scale, angle = 60, 0.25
    r, c = 10, 20
    codes = np.zeros((1, 2, 4), np.int8)
    codes[0, 1] = (127, 0, 0, 0)  # node 1: (code_r1, code_c1, code_r2, code_c2)
    preds = np.array([[-1.0, 3.0]], np.float32)  # leaf[bit]
    thresh = np.array([-10.0], np.float32)  # never early-exits
    forest = FaceForest(depth=1, codes=codes, preds=preds, thresh=thresh)

    pix = np.full(rows * cols, 100, np.uint8)
    pix[r * cols + 49] = 0    # the quirk-wrapped read: (r+1, col 17)
    pix[r * cols + 31] = 255  # what a 'corrected' clamp would read: (r, 31)

    # sanity: the node's rotated column offset is 127*60*256 >> 16 -> col 49
    assert c + ((127 * scale * 256) >> 16) == 49 > cols - 1

    q = oracle_classify_rotated_region(
        forest, np.array([r]), np.array([c]), scale, angle, rows, cols,
        pix, cols,
    )
    assert q[0] == np.float32(3.0 - (-10.0))  # quirk: bintest 1 -> 13
    # a corrected ncols-1 clamp would instead read 255 -> bintest 0 -> 9,
    # so the input provably discriminates the two clamps
    assert q[0] != np.float32(-1.0 - (-10.0))


def test_tail_cutoff_boundary_routing(face_forest):
    """A scale with EXACTLY TAIL_MIN_WINDOWS windows is fully evaluated on
    the dense Pallas path (the cutoff is strict-less-than); one window
    fewer switches to tree-prefix mode (PREFIX_TREES trees on device,
    survivors finished on host) — and both produce oracle-exact
    detections."""
    from pigo_tpu.ops import face_pallas as fp

    rng = np.random.default_rng(7)
    # scale 20 at shift 0.1: step 2, offset 11
    # rows=212 -> nr=96; cols=148 -> nc=64 -> 96*64 = 6144 = TAIL_MIN_WINDOWS
    assert fp.TAIL_MIN_WINDOWS == 6144
    for cols, want_prefix in ((148, False), (146, True)):
        rows = 212
        img = rng.integers(0, 256, (rows, cols), dtype=np.uint8)
        plan = fp.build_dense_plan(face_forest, rows, cols, 20, 20, 0.1, 1.1)
        assert len(plan.scales) == 1
        sp = plan.scales[0]
        nwin = sp.nr_real * sp.nc_real
        assert (nwin == 6144) == (not want_prefix)
        assert not sp.fallback
        assert sp.prefix_trees == (fp.PREFIX_TREES if want_prefix else 0)
        fc = FaceCascade(face_forest, backend="pallas", prefix=True)
        dets = fc.run_cascade(img, rows, cols, min_size=20, max_size=20,
                              shift_factor=0.1, scale_factor=1.1)
        oracle = oracle_run_cascade(
            face_forest, img.ravel(), rows, cols, cols, 20, 20, 0.1, 1.1)
        assert dets.shape == oracle.shape
        assert np.array_equal(dets, oracle)


def test_tiny_image_no_windows(fc_pallas):
    tiny = np.zeros((10, 10), np.uint8)
    dets = fc_pallas.run_cascade(tiny, 10, 10)
    assert dets.shape == (0, 4)


def test_sparse_hits_batch_exact(sample_gray, face_forest):
    """Batched fast path must match per-frame run_cascade exactly, including
    frames that differ (vmap correctness) and the native/gather tail merge."""
    fc = FaceCascade(face_forest, backend="pallas")
    rows, cols = sample_gray.shape
    cfg = dict(min_size=60, max_size=400, shift_factor=0.2,
               scale_factor=1.3)
    shifted = np.roll(sample_gray, 7, axis=1)
    frames = np.stack([sample_gray, shifted, sample_gray])
    outs = fc.sparse_hits_batch(frames, **cfg)
    assert len(outs) == 3
    for frame, dets in zip(frames, outs):
        want = fc.run_cascade(frame, rows, cols, **cfg)
        assert np.array_equal(dets, want)
    assert np.array_equal(outs[0], outs[2])


def test_sparse_hits_batch_rotated_exact(sample_gray, face_forest):
    """Batched rotated fast path: the clamp-extended plane gather must be
    vmap-correct (per-frame planes from per-frame pixels) and match the
    single-frame rotated path exactly."""
    fc = FaceCascade(face_forest, backend="pallas")
    rows, cols = sample_gray.shape
    cfg = dict(min_size=60, max_size=400, shift_factor=0.2,
               scale_factor=1.3)
    shifted = np.roll(sample_gray, 7, axis=1)
    frames = np.stack([sample_gray, shifted])
    outs = fc.sparse_hits_batch(frames, angle=0.25, **cfg)
    assert len(outs) == 2
    for frame, dets in zip(frames, outs):
        want = fc.run_cascade(frame, rows, cols, angle=0.25, **cfg)
        assert np.array_equal(dets, want)


def test_native_tail_matches_gather_tail(sample_gray, face_forest, monkeypatch):
    """Tail scales produce identical hits through the host C++ engine and
    the gather kernel (PIGO_TPU_NO_NATIVE toggles the route; prefix mode
    off, as in interpret-mode defaults)."""
    rows, cols = sample_gray.shape
    cfg = dict(min_size=100, max_size=300, shift_factor=0.2,
               scale_factor=1.25)
    from pigo_tpu.cascade.assets import asset_path
    with open(asset_path("cascade", "facefinder"), "rb") as fh:
        raw = fh.read()
    fc_nat = FaceCascade.from_bytes(raw, backend="pallas")
    plan, *_ = fc_nat._dense_plan(rows, cols, cfg["min_size"],
                                  cfg["max_size"], cfg["shift_factor"],
                                  cfg["scale_factor"])
    assert plan.has_fallback, "config should exercise the tail route"
    dets_nat = fc_nat.run_cascade(sample_gray, rows, cols, **cfg)
    assert fc_nat._native is not None, "native tail engine was not used"
    monkeypatch.setenv("PIGO_TPU_NO_NATIVE", "1")
    fc_gather = FaceCascade.from_bytes(raw, backend="pallas")
    dets_gather = fc_gather.run_cascade(sample_gray, rows, cols, **cfg)
    assert fc_gather._native is None
    assert np.array_equal(dets_nat, dets_gather)


def test_stream_hits_parity_and_order(sample_gray, face_forest):
    """Streaming pipeline yields per-frame results identical to run_cascade,
    in input order, for any depth."""
    fc = FaceCascade(face_forest, backend="pallas")
    rows, cols = sample_gray.shape
    cfg = dict(min_size=60, max_size=400, shift_factor=0.2, scale_factor=1.3)
    frames = [np.roll(sample_gray, i, axis=1) for i in range(5)]
    wants = [fc.run_cascade(f, rows, cols, **cfg) for f in frames]
    for depth in (1, 3, 8):
        outs = list(fc.stream_hits(iter(frames), depth=depth, **cfg))
        assert len(outs) == len(frames)
        for got, want in zip(outs, wants):
            assert np.array_equal(got, want)


def test_angle_sweep(sample_gray, face_forest):
    """Rotated sweep (BASELINE config #2): per-angle results match the
    single-angle path, and cross-angle clustering keeps the face."""
    from pigo_tpu.ops.cluster import cluster_detections

    fc = FaceCascade(face_forest, backend="pallas")
    rows, cols = sample_gray.shape
    cfg = dict(min_size=100, max_size=400, shift_factor=0.2,
               scale_factor=1.25)
    angles = [0.0, 0.03, 0.97]
    sweep = fc.run_cascade_sweep(sample_gray, rows, cols, angles, **cfg)
    assert sweep.shape[1] == 5
    for a in angles:
        want = fc.run_cascade(sample_gray, rows, cols, angle=a, **cfg)
        got = sweep[sweep[:, 4] == a][:, :4]
        assert np.array_equal(got, want)
    clusters = fc.detect_sweep(sample_gray, rows, cols, angles,
                               iou_threshold=0.01, **cfg)
    assert clusters.shape[0] >= 1
    best = clusters[np.argmax(clusters[:, 3])]
    assert 150 < best[0] < 260 and 100 < best[1] < 210


def test_hit_capacity_overflow_reread(sample_gray, face_forest, monkeypatch):
    """When the packed hit list overflows, the dense re-read path must
    produce the same detections. Dense-scale hits require small faces, so
    the frame is tiled with downscaled portraits."""
    from PIL import Image

    tiny_face = np.asarray(
        Image.fromarray(sample_gray).resize((18, 22)), np.uint8
    )
    # a few small faces on a plain background: enough hits to overflow the
    # shrunken capacity while most tiles still exit early (interpret mode)
    frame = np.full((200, 176), 200, np.uint8)
    for r0 in (30, 100):
        for c0 in (20, 75, 130):
            frame[r0:r0 + 22, c0:c0 + 18] = tiny_face
    rows, cols = frame.shape
    cfg = dict(min_size=20, max_size=26, shift_factor=0.1, scale_factor=1.2)
    fc_ref2 = FaceCascade(face_forest, backend="pallas")
    want = fc_ref2.run_cascade(frame, rows, cols, **cfg)
    assert want.shape[0] > 4, "frame must yield >4 dense hits"
    monkeypatch.setattr(FaceCascade, "HIT_CAPACITY", 4)
    fc_tiny = FaceCascade(face_forest, backend="pallas")
    got = fc_tiny.run_cascade(frame, rows, cols, **cfg)
    assert np.array_equal(got, want)


def test_pallas_rotated_exact(face_forest, sample_gray, monkeypatch):
    """TPU-resident rotated cascade: the dense phase-decimated kernel runs
    each scale's FULL reference grid with rotated node tables
    (window-independent offsets — (r*65536 + off) >> 16 == r + (off >> 16))
    over clamp-extended planes that bake the reference's edge clamps
    (core/pigo.go:167-171) into the plane values, and the result is
    bit-exact vs the rotated oracle — with no host border-band scan at any
    angle. Covers both the native tail and the NO_NATIVE oracle fallback."""
    from pigo_tpu.ops import face_pallas as fp

    monkeypatch.setattr(fp, "TAIL_MIN_WINDOWS", 512)
    frame = sample_gray[::2, ::2].copy()
    rows, cols = frame.shape
    cfg = dict(min_size=20, max_size=200, shift_factor=0.1, scale_factor=1.3)
    for no_native in (False, True):
        if no_native:
            monkeypatch.setenv("PIGO_TPU_NO_NATIVE", "1")
        fc = FaceCascade(backend="pallas")
        for angle in (0.25, 0.97):  # 0.97: near-maximal clamp reach
            aidx = int(32 * angle)
            plan, *_ = fc._dense_plan(rows, cols, cfg["min_size"],
                                      cfg["max_size"], cfg["shift_factor"],
                                      cfg["scale_factor"], aidx)
            assert any(not sp.fallback for sp in plan.scales)
            # the clamp-extension leaves no window for the host band scan
            assert plan.border_bands.shape[0] == 0
            assert all(sp.ext_rows > 0 for sp in plan.scales
                       if not sp.fallback)
            dets = fc.run_cascade(frame, rows, cols, angle=angle, **cfg)
            want = oracle_run_cascade(
                face_forest, frame.ravel(), rows, cols, cols,
                cfg["min_size"], cfg["max_size"], cfg["shift_factor"],
                cfg["scale_factor"], angle=angle)
            assert dets.shape == want.shape, (no_native, angle)
            assert np.array_equal(dets[:, :3], want[:, :3]), (no_native, angle)
            assert np.array_equal(dets[:, 3].astype(np.float32),
                                  want[:, 3].astype(np.float32))


def test_pallas_rotated_wide_frame_quirk(face_forest, sample_gray,
                                         monkeypatch):
    """On a WIDE frame (ncols > nrows) the reference clamps rotated column
    reads with nrows-1 — INSIDE the image (core/pigo.go:167-171): windows
    near the right edge read column nrows-1 regardless of how much farther
    right the probe points. The clamp-extended planes must reproduce this
    bit-exactly vs the oracle (these windows were host-band territory
    before the extension; now the dense kernel decides them)."""
    from pigo_tpu.ops import face_pallas as fp

    monkeypatch.setattr(fp, "TAIL_MIN_WINDOWS", 512)
    monkeypatch.setenv("PIGO_TPU_NO_NATIVE", "1")
    frame = np.ascontiguousarray(sample_gray[::2, ::2].T)  # wide: r < c
    rows, cols = frame.shape
    assert cols > rows
    cfg = dict(min_size=40, max_size=160, shift_factor=0.15,
               scale_factor=1.3)
    fc = FaceCascade(backend="pallas")
    for angle in (0.2, 0.5):
        dets = fc.run_cascade(frame, rows, cols, angle=angle, **cfg)
        want = oracle_run_cascade(
            face_forest, frame.ravel(), rows, cols, cols,
            cfg["min_size"], cfg["max_size"], cfg["shift_factor"],
            cfg["scale_factor"], angle=angle)
        assert dets.shape == want.shape, angle
        assert np.array_equal(dets[:, :3], want[:, :3]), angle
        assert np.array_equal(dets[:, 3].astype(np.float32),
                              want[:, 3].astype(np.float32)), angle


def test_strided_rotated_tall_frame_exact(face_forest, sample_gray):
    """A TALL rotated strided frame (rows > cols, dim > cols) must match
    the oracle on the ORIGINAL strided buffer: the reference's nrows-1
    column clamp reads stride-PAD bytes there (flat index r*dim + c with
    c in [cols, nrows-1]), so destriding would silently substitute wrapped
    next-row pixels — this case must route through the stride-honoring
    gather backend."""
    rows, cols, dim = 120, 60, 72
    strided = np.full((rows, dim), 7, np.uint8)  # recognizable pad bytes
    strided[:, :cols] = sample_gray[:rows, :cols]
    fc = FaceCascade(face_forest, backend="pallas")
    cfg = dict(min_size=30, max_size=100, shift_factor=0.2,
               scale_factor=1.3)
    for angle in (0.125, 0.5):
        got = fc.run_cascade(strided.ravel(), rows, cols, dim,
                             angle=angle, **cfg)
        want = oracle_run_cascade(
            face_forest, strided.ravel(), rows, cols, dim,
            cfg["min_size"], cfg["max_size"], cfg["shift_factor"],
            cfg["scale_factor"], angle=angle)
        assert got.shape == want.shape, angle
        assert np.array_equal(got, want), angle


def test_native_run_band_matches_oracle(face_forest, sample_gray):
    """The native border-band scan (full grid minus interior rectangle)
    equals an explicit oracle scan of the same windows."""
    from pigo_tpu import native as nat
    from pigo_tpu.oracle.face import oracle_classify_rotated_region

    if not nat.native_available():
        import pytest

        pytest.skip("native engine unavailable")
    rows, cols = sample_gray.shape
    scale, angle, shift = 80, 0.25, 0.2
    k = max(int(shift * scale), 1)
    offset = scale // 2 + 1
    band = np.array([[scale, 61, 301, 61, 221]], np.int32)
    eng = nat.NativeFaceCascade()
    got = eng.run_band(sample_gray.ravel(), rows, cols, band,
                       shift_factor=shift, angle=angle)
    rr = np.arange(offset, rows - offset + 1, k, dtype=np.int64)
    cc = np.arange(offset, cols - offset + 1, k, dtype=np.int64)
    inside = (((rr >= 61) & (rr <= 301))[:, None]
              & ((cc >= 61) & (cc <= 221))[None, :])
    rw = np.repeat(rr, cc.size)[~inside.ravel()]
    cw = np.tile(cc, rr.size)[~inside.ravel()]
    q = oracle_classify_rotated_region(
        face_forest, rw, cw, scale, angle, rows, cols, sample_gray.ravel(),
        cols)
    hit = q > 0.0
    want = np.stack([rw[hit], cw[hit], np.full(hit.sum(), scale), q[hit]],
                    axis=1).astype(np.float64)
    assert got.shape == want.shape
    assert np.array_equal(got[:, :3], want[:, :3])
    assert np.array_equal(got[:, 3].astype(np.float32),
                          want[:, 3].astype(np.float32))


@pytest.mark.parametrize("no_native", [False, True])
def test_prefix_mode_oracle_exact(sample_gray, face_forest, monkeypatch,
                                  no_native):
    """Tree-prefix tail scales (device evaluates PREFIX_TREES trees, host
    finishes the marked survivors — native classify_batch or the NO_NATIVE
    oracle) are oracle-exact end to end, and the full score read
    (window_scores) resolves the marks too. Small opt-in config: interpret
    mode cannot afford full prefix pyramids, which is why FaceCascade
    defaults prefix off on CPU."""
    from PIL import Image

    from pigo_tpu.ops import face_pallas as fp

    if no_native:
        monkeypatch.setenv("PIGO_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(fp, "TAIL_MIN_WINDOWS", 512)
    # a face at scale ~33 so the prefix scales have real survivors
    face = np.asarray(
        Image.fromarray(sample_gray).resize((30, 37)), np.uint8)
    frame = np.full((96, 88), 190, np.uint8)
    frame[30:67, 28:58] = face
    rows, cols = frame.shape
    cfg = dict(min_size=20, max_size=60, shift_factor=0.1, scale_factor=1.3)
    fc = FaceCascade(face_forest, backend="pallas", prefix=True)
    plan, _, dense_fn_full, d2g = fc._dense_plan(
        rows, cols, cfg["min_size"], cfg["max_size"], cfg["shift_factor"],
        cfg["scale_factor"])
    assert [sp.scale for sp in plan.scales if sp.prefix_trees], \
        "config should produce tree-prefix scales"
    dets = fc.run_cascade(frame, rows, cols, **cfg)
    oracle = oracle_run_cascade(
        face_forest, frame.ravel(), rows, cols, cols,
        cfg["min_size"], cfg["max_size"], cfg["shift_factor"],
        cfg["scale_factor"])
    assert dets.shape == oracle.shape and dets.shape[0] >= 1
    assert np.array_equal(dets[:, :3], oracle[:, :3])
    assert np.array_equal(dets[:, 3].astype(np.float32),
                          oracle[:, 3].astype(np.float32))
    assert not (dets[:, 3] >= fp.PREFIX_MARK / 2).any()
    # a q>0 hit AT a prefix scale survived the 32-tree device pass by
    # definition -> the host finish was genuinely exercised
    prefix_scales = {sp.scale for sp in plan.scales if sp.prefix_trees}
    assert any(int(s_) in prefix_scales for s_ in dets[:, 2]), \
        "no detection on a prefix scale; survivors untested"
    coords, q = fc.window_scores(frame, rows, cols, cols,
                                 cfg["min_size"], cfg["max_size"],
                                 cfg["shift_factor"], cfg["scale_factor"])
    assert not (q >= fp.PREFIX_MARK / 2).any()
    hit = q > 0
    assert np.array_equal(coords[hit], oracle[:, :3].astype(coords.dtype))


@pytest.mark.parametrize("no_native", [False, True])
def test_dense_tree_cap_oracle_exact(sample_gray, face_forest, monkeypatch,
                                     no_native):
    """Dense-scale device tree cap (PIGO_TPU_TREE_CAP / ScalePlan.tree_cap):
    every dense scale stops after K trees, survivors get PREFIX_MARK and
    are finished exactly — on-device gather resolve first, host backstop
    (native classify_batch / NO_NATIVE oracle) beyond RESOLVE_CAP. The cap
    only short-circuits the monotone soft-cascade exit
    (reference core/pigo.go:139-141), so results stay oracle-exact."""
    from PIL import Image

    from pigo_tpu.models import face as face_mod
    from pigo_tpu.ops import face_pallas as fp

    if no_native:
        monkeypatch.setenv("PIGO_TPU_NO_NATIVE", "1")
    monkeypatch.setenv("PIGO_TPU_TREE_CAP", "8")
    # the opt-in on-device gather resolver (default off: measured ~89
    # us/window on v5e, models/face._resolve_consts) + the host backstop
    # beyond RESOLVE_CAP are both exercised here
    monkeypatch.setenv("PIGO_TPU_DEVICE_RESOLVE", "1")
    monkeypatch.setattr(fp, "TAIL_MIN_WINDOWS", 512)
    face = np.asarray(
        Image.fromarray(sample_gray).resize((30, 37)), np.uint8)
    frame = np.full((96, 88), 190, np.uint8)
    frame[30:67, 28:58] = face
    rows, cols = frame.shape
    cfg = dict(min_size=20, max_size=60, shift_factor=0.1, scale_factor=1.3)
    oracle = oracle_run_cascade(
        face_forest, frame.ravel(), rows, cols, cols,
        cfg["min_size"], cfg["max_size"], cfg["shift_factor"],
        cfg["scale_factor"])
    assert oracle.shape[0] >= 1
    # tiny resolve capacity: survivors beyond it exercise the host
    # _resolve_marked backstop in the same run as the device resolve
    monkeypatch.setattr(face_mod.FaceCascade, "RESOLVE_CAP", 16)
    fc = FaceCascade(face_forest, backend="pallas")
    plan, *_ = fc._dense_plan(
        rows, cols, cfg["min_size"], cfg["max_size"], cfg["shift_factor"],
        cfg["scale_factor"])
    capped = [sp for sp in plan.scales if sp.tree_cap]
    assert capped, "config should produce capped dense scales"
    assert all(sp.tree_cap == 8 and not sp.prefix_trees for sp in capped)
    dets = fc.run_cascade(frame, rows, cols, **cfg)
    assert np.array_equal(dets[:, :3], oracle[:, :3])
    assert np.array_equal(dets[:, 3].astype(np.float32),
                          oracle[:, 3].astype(np.float32))
    assert not (dets[:, 3] >= fp.PREFIX_MARK / 2).any()
    # batched path shares the capped plan + resolver
    outs = fc.sparse_hits_batch(np.stack([frame, frame]), **cfg)
    for o in outs:
        assert np.array_equal(o, dets)
    # a non-multiple-of-4 request rounds up (kernel evaluates 4-tree
    # chunks); explicit 0 disables capping entirely
    assert fc._resolved_cap(9) == 12 and fc._resolved_cap(0) == 0
    plan0, *_ = fc._dense_plan(
        rows, cols, cfg["min_size"], cfg["max_size"], cfg["shift_factor"],
        cfg["scale_factor"], tree_cap=0)
    assert all(sp.tree_cap == 0 for sp in plan0.scales)
