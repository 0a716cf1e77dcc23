"""FaceDetector: the full face -> pupils -> landmarks pipeline.

Mirrors the reference CLI pipeline (/root/reference/cmd/pigo/main.go):
  - RunCascade + ClusterDetections with the CLI defaults,
  - per-face eye anchors (main.go:416-421, :454-458):
        left  = (row - 0.075*s, col - 0.175*s), scale 0.25*s
        right = (row - 0.075*s, col + 0.185*s), scale 0.25*s
    gated on face.Q > 5.0 and face.Scale > 50 (main.go:360, :404),
  - the 15-point landmark schedule (5 eye cascades x2 flips, 4 mouth,
    lp84 as nose via flipV; main.go:493-564),
  - JSON export schema {face:{x,y,size}, eyes:[...], landmark_points:[...]}
    (main.go:89-100), where x is the image column and y the row.

Deviation from the reference (documented): the reference CLI accumulates the
eye/landmark coordinate slices ACROSS faces, so face i's JSON contains every
eye found for faces 0..i (main.go:363-365 never resets them); here each face
reports only its own points by default. `accumulate_json_payload` (CLI flag
`-json-accumulate`) reproduces the reference quirk bug-for-bug when byte-level
JSON parity is needed.
"""

from __future__ import annotations

import collections
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pigo_tpu.models.face import FaceCascade
from pigo_tpu.models.landmark import LandmarkLocalizer
from pigo_tpu.models.pupil import PupilLocalizer, Puploc
from pigo_tpu.ops.cluster import cluster_detections

# CLI constants (cmd/pigo/main.go:54, :360, :404)
PERTURBS = 63
Q_THRESH = 5.0
MIN_EYE_FACE_SCALE = 50


@dataclasses.dataclass(frozen=True)
class ImageParams:
    """Grayscale frame (reference core/pigo.go:29-34). Accepted by
    FaceDetector.detect/detect_faces in place of (gray, rows, cols)."""

    pixels: np.ndarray  # flat uint8 [rows*dim]
    rows: int
    cols: int
    dim: int


def _coerce_image(gray, rows, cols):
    """(gray, rows, cols) or an ImageParams -> (pixels, rows, cols, dim)."""
    if isinstance(gray, ImageParams):
        return gray.pixels, gray.rows, gray.cols, gray.dim
    return gray, rows, cols, None


@dataclasses.dataclass(frozen=True)
class CascadeParams:
    """Detection parameters (reference core/pigo.go:16-22; CLI defaults
    main.go:105-119)."""

    min_size: int = 20
    max_size: int = 1000
    shift_factor: float = 0.15
    scale_factor: float = 1.15


@dataclasses.dataclass(frozen=True)
class Detection:
    """One clustered face detection (reference core/pigo.go:195-200)."""

    row: int
    col: int
    scale: int
    q: float


@dataclasses.dataclass
class FaceResult:
    """Full per-face result: detection + eyes + landmark points."""

    face: Detection
    eyes: list[Puploc] = dataclasses.field(default_factory=list)
    landmarks: list[Puploc] = dataclasses.field(default_factory=list)

    def to_json_dict(self) -> dict:
        """Reference JSON schema (main.go:89-100, 394-398, 446-450):
        x = image column, y = image row; zero-valued fields are dropped to
        match Go's `omitempty` marshaling."""

        def drop_zero(d: dict) -> dict:
            return {k: v for k, v in d.items() if v != 0}

        out: dict = {
            "face": drop_zero(
                {
                    "x": self.face.col - self.face.scale // 2,
                    "y": self.face.row - self.face.scale // 2,
                    "size": self.face.scale,
                }
            )
        }
        if self.eyes:
            out["eyes"] = [
                drop_zero({"x": e.col, "y": e.row, "size": int(e.scale)})
                for e in self.eyes
            ]
        if self.landmarks:
            out["landmark_points"] = [
                drop_zero({"x": p.col, "y": p.row, "size": int(p.scale)})
                for p in self.landmarks
            ]
        return out


def accumulate_json_payload(payload: list[dict]) -> list[dict]:
    """Reproduce the reference CLI's cross-face accumulation quirk
    bug-for-bug: `drawFaces` allocates one eyesCoords/landmarkCoords slice
    for the whole image and never resets them between faces
    (cmd/pigo/main.go:363-365), and each face's detection struct snapshots
    the grown slice (main.go:568-572) — so face i's JSON carries every eye
    and landmark point found for faces 0..i. A face with no eyes of its own
    still reports all earlier ones. Off by default (each face reports only
    its own points); the CLI's `-json-accumulate` flag turns it on."""
    eyes: list[dict] = []
    lms: list[dict] = []
    out: list[dict] = []
    for d in payload:
        d = dict(d)
        eyes.extend(d.pop("eyes", []))
        lms.extend(d.pop("landmark_points", []))
        if eyes:
            d["eyes"] = list(eyes)
        if lms:
            d["landmark_points"] = list(lms)
        out.append(d)
    return out


def _eye_anchor_offsets(s: int) -> tuple[int, int, int]:
    """Reference eye-anchor offsets for face scale s, computed in float32
    exactly like Go (cmd/pigo/main.go:417-458): `int(0.075*float32(s))`
    multiplies in f32 (the untyped constant adopts float32), then truncates.
    f64 would differ by one pixel at s in {360, 680, 720}."""
    f = np.float32
    return (int(f(0.075) * f(s)), int(f(0.175) * f(s)), int(f(0.185) * f(s)))


def _device_eye_anchors(frows, fcols, fscales):
    """Eye anchors from face rows (cmd/pigo/main.go:416-458) computed on
    device. trunc(f32(0.175) * f32(s)) reproduces the reference's f32
    arithmetic bit-exactly (and matches the host `_eye_anchor_offsets`)."""
    s = fscales.astype(jnp.float32)
    erow = jnp.repeat(frows.astype(jnp.float32)
                      - jnp.trunc(jnp.float32(0.075) * s), 2)
    off_l = jnp.trunc(jnp.float32(0.175) * s)
    off_r = jnp.trunc(jnp.float32(0.185) * s)
    ecol = jnp.stack(
        [fcols.astype(jnp.float32) - off_l,
         fcols.astype(jnp.float32) + off_r], axis=1
    ).reshape(-1)
    escale = jnp.repeat(s * jnp.float32(0.25), 2)
    return erow, ecol, escale


def _fused_post_impl(
    key, erow, ecol, escale, pixels,
    pcodes, ppreds, lcodes, lpreds,
    *, f, perturbs, rows, cols, dim, angle_idx, rotated,
    pupil_geom, lmk_geom, lmk_cids, lmk_flips,
):
    """Eyes + landmarks for F faces as ONE XLA program.

    Takes the 2F eye anchors (erow/ecol/escale) precomputed — exactly, in
    f64, by host callers (cmd/pigo/main.go:416-458 semantics) or on device
    by _device_detect_impl. Both perturbation ensembles, the landmark anchor
    (core/flploc.go:37-43), and all medians run on device; the host receives
    a single [3, 2F + 15F] result. On a high-latency host link this
    collapses the per-face call cascade of the reference (2 + 15 sequential
    RunDetector calls) into one round trip."""
    import jax.numpy as jnp
    from pigo_tpu.ops import pupil_dense

    k_eyes, k_lmk = jax.random.split(key)
    npts = lmk_cids.shape[0] // f if f else 0

    u_eyes = jax.random.uniform(k_eyes, (2 * f, perturbs, 3), jnp.float32)
    sg, tg, dg, mg = pupil_geom
    eyes = pupil_dense._ensemble_impl(
        pcodes, ppreds, jnp.zeros(2 * f, jnp.int32), erow, ecol, escale,
        jnp.zeros(2 * f, bool), u_eyes, pixels,
        stages=sg, trees=tg, depth=dg, nrows=rows, ncols=cols, dim=dim,
        scale_mult=mg, rotated=rotated, angle_idx=angle_idx,
    )  # [3, 2F]

    # ---- landmark anchors from the voted pupils ----
    # truncate the voted medians like the host Puploc(int(row), int(col))
    # construction before the anchor geometry (core/flploc.go:37-43)
    ler, lec = jnp.trunc(eyes[0, 0::2]), jnp.trunc(eyes[1, 0::2])
    rer, rec = jnp.trunc(eyes[0, 1::2]), jnp.trunc(eyes[1, 1::2])
    dist = jnp.sqrt((ler - rer) ** 2 + (lec - rec) ** 2)
    arow = jnp.trunc((ler + rer) / 2.0 + 0.25 * dist)
    acol = jnp.trunc((lec + rec) / 2.0 + 0.15 * dist)
    ascale = 3.0 * dist
    u_lmk = jax.random.uniform(k_lmk, (f * npts, perturbs, 3), jnp.float32)
    sg, tg, dg, mg = lmk_geom
    lmk = pupil_dense._ensemble_impl(
        lcodes, lpreds, lmk_cids,
        jnp.repeat(arow, npts), jnp.repeat(acol, npts),
        jnp.repeat(ascale, npts), lmk_flips, u_lmk, pixels,
        stages=sg, trees=tg, depth=dg, nrows=rows, ncols=cols, dim=dim,
        scale_mult=mg, rotated=False, angle_idx=0,
    )  # [3, F*npts]
    return jnp.concatenate([eyes, lmk], axis=1)  # [3, 2F + F*npts]


_fused_post = jax.jit(
    _fused_post_impl,
    static_argnames=(
        "f", "perturbs", "rows", "cols", "dim", "angle_idx", "rotated",
        "pupil_geom", "lmk_geom",
    ),
)


# Landmark anchor scale is 3x the refined eye distance (core/flploc.go:41);
# measured on real faces dist ~= 0.36 * face scale, so anchors stay under
# ~1.1x the face scale. The patch-walk default plans for 1.3x with the exact
# per-probe overflow check as the safety net (ops/pupil_patch.py).
ASCALE_BOUND_FACTOR = 1.3


from pigo_tpu.ops.face_pallas import _round_up  # noqa: E402 (shared helper)


def _use_patch_post() -> bool:
    """The MXU patch walk replaces the gather walk on real accelerators;
    on the CPU test backend its dense one-hot matmuls are far slower than
    gathers, so it stays opt-in there (PIGO_TPU_POST_PATCH=1/0 overrides)."""
    import os

    env = os.environ.get("PIGO_TPU_POST_PATCH")
    if env is not None:
        return env != "0"
    from pigo_tpu.utils.platform import backend_platform

    return backend_platform() != "cpu"


def _patch_max_side() -> int:
    """Largest planned patch side the MXU patch walk is allowed; bigger
    plans route to the gather walk. The walk's cost is quadratic in the
    patch side while the gather walk's is scale-independent. Measured on
    v5e (round-5 sweep, detect_stream_device, 48-frame means): at the
    512 cap the sample full pipeline runs 26.2 vs 67.4 ms on gather
    (2.6x) and crowd8 254 vs 636 ms (2.5x); web640's landmark patches
    plan above 512 either way, so it keeps the gather walk (32.2 ms both
    arms — the right engine there: its 768/1024-bucket patches measured
    1101 ms in round 4). The previous 256 default silently routed every
    realistic face (landmark patches plan at ~1.3x face scale) back to
    the gather walk, costing the 2.6x."""
    import os

    return int(os.environ.get("PIGO_TPU_PATCH_MAX_SIDE", "512"))


def _post_patch_cfg(rows, cols, max_face_scale, pupil_geom, lmk_geom,
                    rotated=False):
    """Static per-stage patch sizes for the MXU patch walk, from a face
    scale bound known at dispatch. Returns ((pupil sizes), (lmk sizes)),
    or None when the plan's largest patch exceeds _patch_max_side() — the
    caller must then use the gather walk, which is cheaper there.
    rotated widens the EYE patches for the rotated probe reach; landmark
    walks are always upright (reference cmd/pigo/main.go:493-564)."""
    from pigo_tpu.ops import pupil_patch

    ps, pt, pd, pm = pupil_geom
    ls, lt, ld, lm = lmk_geom
    esize = pupil_patch.stage_patch_sizes(
        0.25 * float(max_face_scale), stages=ps, scale_mult=pm,
        nrows=rows, ncols=cols, rotated=rotated)
    lsize = pupil_patch.stage_patch_sizes(
        ASCALE_BOUND_FACTOR * float(max_face_scale), stages=ls,
        scale_mult=lm, nrows=rows, ncols=cols)
    if max(esize + lsize) > _patch_max_side():
        return None
    return esize, lsize


def _fused_post_patch_impl(
    key, erow, ecol, escale, pixels,
    pcodes, ppreds, lcodes, lpreds,
    *, f, perturbs, rows, cols,
    pupil_geom, lmk_geom, lmk_cids, lmk_flips, patch_cfg, pallas=False,
    int8=False, rotated=False, angle_idx=0, face_valid=None,
):
    """Eyes + landmarks via the MXU patch walk (ops/pupil_patch.py;
    pallas=True runs the fused stage kernel, ops/pupil_pallas.py) — one XLA
    program, bit-exact vs _fused_post_impl when no group overflows its
    patches. For rotated frames only the EYE walks rotate (the reference
    always walks landmarks upright); patch_cfg must then carry
    rotated-reach eye sizes (_post_patch_cfg). Returns [3, 2F + 15F + 1]
    with the any-group overflow flag broadcast into the last column; the
    caller must re-run overflowed frames through the gather path."""
    import functools

    from pigo_tpu.ops import pupil_patch

    # the hand-fused Pallas stage kernel is upright-only; rotated eye
    # walks use the jnp patch formulation either way
    walk = (pupil_patch._ensemble_pallas_impl if pallas and not rotated
            else functools.partial(pupil_patch._ensemble_patch_impl,
                                   int8=int8))
    k_eyes, k_lmk = jax.random.split(key)
    npts = lmk_cids.shape[0] // f if f else 0
    img2d = pixels.reshape(rows, cols)
    esizes, lsizes = patch_cfg

    u_eyes = jax.random.uniform(k_eyes, (2 * f, perturbs, 3), jnp.float32)
    sg, tg, dg, mg = pupil_geom
    ekw = dict(rotated=True, angle_idx=angle_idx) if rotated else {}
    eyes, e_ovf = walk(
        pcodes, ppreds, jnp.zeros(2 * f, jnp.int32), erow, ecol, escale,
        jnp.zeros(2 * f, bool), u_eyes, img2d,
        stages=sg, trees=tg, depth=dg, nrows=rows, ncols=cols,
        scale_mult=mg, patch_sizes=esizes, **ekw,
    )  # [3, 2F]

    # landmark anchors from the voted pupils (same math as _fused_post_impl)
    ler, lec = jnp.trunc(eyes[0, 0::2]), jnp.trunc(eyes[1, 0::2])
    rer, rec = jnp.trunc(eyes[0, 1::2]), jnp.trunc(eyes[1, 1::2])
    dist = jnp.sqrt((ler - rer) ** 2 + (lec - rec) ** 2)
    arow = jnp.trunc((ler + rer) / 2.0 + 0.25 * dist)
    acol = jnp.trunc((lec + rec) / 2.0 + 0.15 * dist)
    ascale = 3.0 * dist
    u_lmk = jax.random.uniform(k_lmk, (f * npts, perturbs, 3), jnp.float32)
    sg, tg, dg, mg = lmk_geom
    lmk, l_ovf = walk(
        lcodes, lpreds, lmk_cids,
        jnp.repeat(arow, npts), jnp.repeat(acol, npts),
        jnp.repeat(ascale, npts), lmk_flips, u_lmk, img2d,
        stages=sg, trees=tg, depth=dg, nrows=rows, ncols=cols,
        scale_mult=mg, patch_sizes=lsizes,
    )  # [3, F*npts]
    if face_valid is not None:
        # pad/invalid face slots (device path: the fixed safe pad anchor)
        # walk garbage anchors whose results are discarded — their patch
        # overflows must not force an escalation re-dispatch
        e_ovf = e_ovf & jnp.repeat(face_valid, 2)
        l_ovf = l_ovf & jnp.repeat(face_valid, npts)
    ovf = (jnp.any(e_ovf) | jnp.any(l_ovf)).astype(jnp.float32)
    # one fetchable array: [3, 2F + 15F + 1], overflow in the last column
    return jnp.concatenate(
        [eyes, lmk, jnp.broadcast_to(ovf, (3, 1))], axis=1
    )


_fused_post_patch = jax.jit(
    _fused_post_patch_impl,
    static_argnames=(
        "f", "perturbs", "rows", "cols", "pupil_geom", "lmk_geom",
        "patch_cfg", "pallas", "int8", "rotated", "angle_idx",
    ),
)


def _patch_post_pallas() -> bool:
    """Whether the post stage runs the fused Pallas stage kernels
    (ops/pupil_pallas.py) instead of the jnp patch walk. Default OFF: on
    v5e the XLA-scheduled jnp walk measures FASTER than the hand-fused
    kernel (13.0 vs 22.1 ms at 2 face slots — XLA overlaps the one-hot
    builds with the matmul-gathers better than the Mosaic schedule).
    PIGO_TPU_POST_PALLAS=1 opts in, e.g. for hardware where HBM, not
    issue scheduling, bounds the walk. The Pallas kernel has no int8
    path: PIGO_TPU_POST_INT8=1 takes precedence (the jnp s8 walk runs)
    so a benchmark never silently measures the wrong variant."""
    import os

    return (os.environ.get("PIGO_TPU_POST_PALLAS") == "1"
            and not _patch_post_int8())


def _patch_post_int8() -> bool:
    """Whether the patch walk's pixel matmul-gathers run in int8 on the MXU
    (ops/pupil_patch.py: pixels shifted by -128 fit s8 exactly; bintest
    compares are shift-invariant, so results stay bit-identical while the
    s8 path runs at twice the bf16 MXU rate with half the HBM traffic).
    Default ON — measured on v5e (round-5 sweep): sample full pipeline
    26.90 -> 26.15 ms/frame, crowd8 254.1 -> 249.7; bit-exactness is
    test-pinned (tests/test_pupil.py::test_patch_walk_int8_exact).
    PIGO_TPU_POST_INT8=0 restores the bf16 formulation."""
    import os

    return os.environ.get("PIGO_TPU_POST_INT8", "1") != "0"


def _attach_post(res, eyes, lmk, i, npts, perturbs):
    """Attach face i's voted eyes and landmark points to a FaceResult,
    applying the reference validity gates (eye coords > 0 before landmarks
    count, cmd/pigo/main.go:422-470)."""
    left = Puploc(row=int(eyes[0, 2 * i]), col=int(eyes[1, 2 * i]),
                  scale=float(eyes[2, 2 * i]), perturbs=perturbs)
    right = Puploc(row=int(eyes[0, 2 * i + 1]),
                   col=int(eyes[1, 2 * i + 1]),
                   scale=float(eyes[2, 2 * i + 1]), perturbs=perturbs)
    if left.row > 0 and left.col > 0:
        res.eyes.append(left)
    if right.row > 0 and right.col > 0:
        res.eyes.append(right)
    if left.row > 0 and left.col > 0 and right.row > 0 and right.col > 0:
        res.landmarks = [
            p for p in (
                Puploc(row=int(lmk[0, i, j]), col=int(lmk[1, i, j]),
                       scale=float(lmk[2, i, j]), perturbs=perturbs)
                for j in range(npts)
            )
            if p.row > 0 and p.col > 0
        ]


# Default capacities of the device-resident frame program (_device_detect):
# dense hits + host-tail detections entering on-device clustering, and the
# fixed face-slot count of the fused post stage. The fused eyes+landmarks
# work scales with the SLOT count (measured 640x480 full pipeline: 61.9
# ms/frame at 2 slots vs 227.5 at 8), so the default program stays small
# and frames that overflow it ESCALATE to a second, larger device program
# (DEV_CAPS_ESCALATED) — one extra round trip for crowd frames, never a
# host fallback until even 16 faces overflow (the reference has no
# detection cap, core/pigo.go:246-248). Override per detector via
# FaceDetector(device_caps=...).
DEV_DENSE_CAP = 256
DEV_TAIL_CAP = 64
DEV_MAX_FACES = 2
DEV_CAPS_ESCALATED = (1024, 128, 16)


def _device_detect_impl(
    packed, tail, tail_n, rows_w, cols_w, scale_w, d2g, key, pixels,
    pcodes, ppreds, lcodes, lpreds,
    *, hit_cap, iou_threshold, perturbs, rows, cols, angle_idx, rotated,
    pupil_geom, lmk_geom, lmk_cids, lmk_flips,
    dense_cap=DEV_DENSE_CAP, tail_cap=DEV_TAIL_CAP, max_faces=DEV_MAX_FACES,
    patch_cfg=None, patch_pallas=False, patch_int8=False,
):
    """The WHOLE post-kernel frame pipeline as ONE XLA program.

    Decodes the dense kernels' packed hit list, merges the host-tail
    detections (uploaded, H2D is cheap), clusters on device, gates faces
    (q > 5, scale > 50, reference cmd/pigo/main.go:360,404), and runs the
    fused eyes+landmarks stage — so the host needs exactly ONE device round
    trip per frame. Differences vs the host path are tolerance-level only:
    cluster tie order for equal q and f32 q-sum reduction order."""
    from pigo_tpu.ops.cluster_device import cluster_device

    cc = dense_cap + tail_cap
    # ---- decode dense hits ----
    count = packed[0].astype(jnp.int32)
    idx = packed[1 : 1 + hit_cap].astype(jnp.int32)
    qv = packed[1 + hit_cap :]
    dense_valid = idx >= 0
    gidx = d2g[jnp.clip(idx, 0, d2g.shape[0] - 1)]
    gidx = jnp.clip(gidx, 0, rows_w.shape[0] - 1)
    dn = jnp.stack(
        [rows_w[gidx].astype(jnp.float32), cols_w[gidx].astype(jnp.float32),
         scale_w[gidx].astype(jnp.float32), qv], axis=1,
    )[:dense_cap]
    dense_valid = dense_valid[:dense_cap]
    # ---- merge the host tail ----
    tail_valid = jnp.arange(tail_cap) < tail_n
    dets = jnp.concatenate([dn, tail.astype(jnp.float32)])
    valid = jnp.concatenate([dense_valid, tail_valid])
    # hit-capacity overflow only; face-slot overflow is decided on the host
    # from the returned n_faces so the ladder can size slots EXACTLY
    overflow = (count > dense_cap) | (tail_n > tail_cap)

    # ---- cluster + face gating ----
    clusters, cvalid = cluster_device(
        dets, valid, jnp.float32(iou_threshold), capacity=cc
    )
    keep = cvalid & (clusters[:, 3] > jnp.float32(Q_THRESH))
    n_faces = jnp.sum(keep.astype(jnp.int32))
    slots = jnp.nonzero(keep, size=max_faces, fill_value=-1)[0]
    fvalid = slots >= 0
    faces = clusters[jnp.clip(slots, 0)]  # [max_faces, 4]
    eyed = fvalid & (faces[:, 2] > jnp.float32(MIN_EYE_FACE_SCALE))

    # ---- fused eyes + landmarks over the fixed face slots ----
    erow, ecol, escale = _device_eye_anchors(
        faces[:, 0], faces[:, 1],
        jnp.where(eyed, faces[:, 2], jnp.float32(100.0)),  # safe pad anchor
    )
    povf = jnp.float32(0.0)
    if patch_cfg is not None:
        # MXU patch walk (rotated eye walks included); a patch overflow is
        # flagged SEPARATELY from the capacity overflow so the ladder can
        # grow patches without paying for more face slots (and vice versa)
        post_full = _fused_post_patch_impl(
            key, erow, ecol, escale,
            pixels, pcodes, ppreds, lcodes, lpreds,
            f=max_faces, perturbs=perturbs, rows=rows, cols=cols,
            pupil_geom=pupil_geom, lmk_geom=lmk_geom,
            lmk_cids=lmk_cids, lmk_flips=lmk_flips, patch_cfg=patch_cfg,
            pallas=patch_pallas, int8=patch_int8,
            rotated=rotated, angle_idx=angle_idx, face_valid=eyed,
        )
        post = post_full[:, :-1]
        povf = post_full[0, -1]
    else:
        post = _fused_post_impl(
            key, erow, ecol, escale,
            pixels, pcodes, ppreds, lcodes, lpreds,
            f=max_faces, perturbs=perturbs, rows=rows, cols=cols, dim=cols,
            angle_idx=angle_idx, rotated=rotated,
            pupil_geom=pupil_geom, lmk_geom=lmk_geom,
            lmk_cids=lmk_cids, lmk_flips=lmk_flips,
        )  # [3, 2F + F*npts]
    flags = jnp.stack([
        overflow.astype(jnp.float32), povf, n_faces.astype(jnp.float32),
    ])
    return jnp.concatenate([
        flags, faces.reshape(-1), fvalid.astype(jnp.float32),
        eyed.astype(jnp.float32), post.reshape(-1),
    ])


_device_detect = jax.jit(
    _device_detect_impl,
    static_argnames=(
        "hit_cap", "iou_threshold", "perturbs", "rows", "cols", "angle_idx",
        "rotated", "pupil_geom", "lmk_geom", "dense_cap", "tail_cap",
        "max_faces", "patch_cfg", "patch_pallas", "patch_int8",
    ),
)


class FaceDetector:
    """End-to-end detector; loads the bundled cascades by default."""

    def __init__(
        self,
        face: FaceCascade | None = None,
        pupil: PupilLocalizer | None = None,
        landmarks: LandmarkLocalizer | None = None,
        *,
        with_pupils: bool = True,
        with_landmarks: bool = True,
        device_caps: tuple[int, int, int] | None = None,
    ):
        # (dense_cap, tail_cap, max_faces) for the device-resident frame
        # program; frames exceeding them escalate to a re-sized program
        self.device_caps = (
            device_caps if device_caps is not None
            else (DEV_DENSE_CAP, DEV_TAIL_CAP, DEV_MAX_FACES)
        )
        # adaptive sizing state (streams exploit temporal coherence):
        # face-slot count follows the max face count of the last 8 frames
        # (power-of-two buckets bound the number of compiled programs);
        # the patch-size bound is STICKY — raised immediately when a frame
        # needs more, lowered only when the need drops well below it —
        # because every distinct bound is a separate compiled program and
        # an oscillating bound was measured to cost an extra dispatch on
        # every other frame (patch overflow -> escalation round trip).
        self._auto_caps = device_caps is None
        self._recent_face_scale = 0
        self._recent_face_counts: "collections.deque[int]" = (
            collections.deque(maxlen=8))
        self._face_bound = 0
        self._bound_floor = 0  # ratchet: min bound after a patch overflow
        self.face = face if face is not None else FaceCascade()
        self.pupil = (
            pupil
            if pupil is not None
            else (PupilLocalizer() if (with_pupils or with_landmarks) else None)
        )
        self.landmarks = (
            landmarks
            if landmarks is not None
            else (LandmarkLocalizer() if with_landmarks else None)
        )

    def detect_faces(
        self,
        gray: np.ndarray | ImageParams,
        rows: int | None = None,
        cols: int | None = None,
        params: CascadeParams = CascadeParams(),
        angle: float = 0.0,
        iou_threshold: float = 0.15,
    ) -> list[Detection]:
        """RunCascade + ClusterDetections (main.go:350-353)."""
        gray, rows, cols, dim = _coerce_image(gray, rows, cols)
        dets = self.face.run_cascade(
            gray, rows, cols, dim,
            min_size=params.min_size, max_size=params.max_size,
            shift_factor=params.shift_factor, scale_factor=params.scale_factor,
            angle=angle,
        )
        clusters = cluster_detections(dets, iou_threshold)
        return [
            Detection(row=int(r), col=int(c), scale=int(s), q=float(q))
            for r, c, s, q in clusters
        ]

    def detect(
        self,
        gray: np.ndarray | ImageParams,
        rows: int | None = None,
        cols: int | None = None,
        params: CascadeParams = CascadeParams(),
        angle: float = 0.0,
        iou_threshold: float = 0.15,
        perturbs: int = PERTURBS,
        key: jax.Array | None = None,
    ) -> list[FaceResult]:
        """Full pipeline: faces, then eyes + landmarks per qualifying face.

        All eye anchors of the frame are refined in ONE vectorized walk, then
        all landmark points of all faces in another — two device dispatches
        per frame regardless of face count (the reference makes
        2 + 15 sequential RunDetector calls per face,
        cmd/pigo/main.go:422-564)."""
        gray, rows, cols, dim = _coerce_image(gray, rows, cols)
        face_src = gray
        if dim is not None and dim != cols:
            # De-stride once (exact — see models/face.destride) and run the
            # whole pipeline contiguous. Exception: TALL rotated frames
            # keep the stride for FACE detection — the rotated cascade's
            # nrows-1 column clamp reads stride-pad bytes there
            # (run_cascade routes that case to the stride-honoring gather
            # backend). The POST stage is stride-insensitive either way:
            # the pupil/landmark walks clamp columns with ncols-1, so
            # their reads never touch pad columns.
            from pigo_tpu.models.face import destride

            if dim < cols:
                raise ValueError(f"dim {dim} < cols {cols}")
            contiguous = destride(gray, rows, cols, dim)
            if not (angle > 0.0 and rows > cols):
                face_src = contiguous
            else:
                face_src = ImageParams(
                    pixels=np.asarray(gray).reshape(-1), rows=rows,
                    cols=cols, dim=dim)
            gray = contiguous
        faces = self.detect_faces(face_src, rows, cols, params, angle,
                                  iou_threshold)
        key = key if key is not None else jax.random.PRNGKey(0)
        results = [
            FaceResult(face=face) for face in faces if face.q > Q_THRESH
        ]
        if self.pupil is None:
            return results
        eyed = [
            res for res in results if res.face.scale > MIN_EYE_FACE_SCALE
        ]
        if not eyed:
            return results
        key, k_post = jax.random.split(key)
        self._detect_fused(eyed, gray, rows, cols, angle, perturbs, k_post)
        return results

    def _detect_fused(self, eyed, gray, rows, cols, angle, perturbs, key):
        """Eyes + landmarks for all qualifying faces in one device call."""
        return self._collect_post(
            self._dispatch_post(eyed, gray, rows, cols, angle, perturbs, key)
        )

    def detect_stream(
        self,
        frames,  # iterable of [rows, cols] uint8 grayscale frames
        params: CascadeParams = CascadeParams(),
        angle: float = 0.0,
        iou_threshold: float = 0.15,
        perturbs: int = PERTURBS,
        key: jax.Array | None = None,
        depth: int = 4,
    ):
        """Streaming full pipeline: face-stage and post-stage device work of
        consecutive frames overlap with each other and with host transfers.
        Yields the per-frame list[FaceResult] in input order. Frame i's
        results equal `detect(frame_i, key=jax.random.fold_in(key, i))`.

        Per steady-state frame the host makes ONE device round trip: the
        face-hit fetch of frame i and the post-result fetch of frame i-depth
        are combined into a single jax.device_get (each transfer alone costs
        a full link round trip)."""
        import collections

        key = key if key is not None else jax.random.PRNGKey(0)
        fc = self.face
        kw = dict(min_size=params.min_size, max_size=params.max_size,
                  shift_factor=params.shift_factor,
                  scale_factor=params.scale_factor)
        faceq: collections.deque = collections.deque()
        postq: collections.deque = collections.deque()

        def advance_face(due):
            """Fetch frame j's face hits (+ the due post result, one round
            trip), then dispatch frame j's post stage."""
            frame, j, ticket = faceq.popleft()
            fetch = []
            if ticket[0] is not None:
                fetch.append(ticket[0])
            if due is not None and due[1] is not None:
                fetch.append(due[1][0])
            vals = jax.device_get(fetch) if fetch else []
            packed = vals.pop(0) if ticket[0] is not None else None
            if due is not None and due[1] is not None:
                self._collect_post(due[1], out=vals.pop(0))
            dets = cluster_detections(
                fc._collect_single(ticket, packed=packed), iou_threshold
            )
            results = [
                FaceResult(face=Detection(row=int(r), col=int(c),
                                          scale=int(s), q=float(q)))
                for r, c, s, q in dets
                if q > Q_THRESH
            ]
            k_frame, k_post = jax.random.split(jax.random.fold_in(key, j))
            eyed = [
                res for res in results
                if res.face.scale > MIN_EYE_FACE_SCALE
            ]
            if self.pupil is None or not eyed:
                postq.append((results, None))
            else:
                postq.append((
                    results,
                    self._dispatch_post(eyed, frame, frame.shape[-2],
                                        frame.shape[-1], angle, perturbs,
                                        k_post),
                ))

        depth = max(1, depth)
        for i, frame in enumerate(frames):
            rows, cols = frame.shape[-2], frame.shape[-1]
            faceq.append(
                (frame, i,
                 fc._dispatch_single(frame, rows, cols, **kw))
            )
            # postq grows by at most one per advance_face, so popping once
            # whenever it reaches `depth` keeps len(postq) <= depth
            if len(faceq) >= 2:
                due = postq.popleft() if len(postq) >= depth else None
                advance_face(due)
                if due is not None:
                    yield due[0]
        while faceq:
            due = postq.popleft() if postq else None
            advance_face(due)
            if due is not None:
                yield due[0]
        while postq:
            results, ticket = postq.popleft()
            if ticket is not None:
                self._collect_post(ticket)
            yield results

    def detect_stream_device(
        self,
        frames,  # iterable of [rows, cols] uint8 grayscale frames
        params: CascadeParams = CascadeParams(),
        angle: float = 0.0,
        iou_threshold: float = 0.15,
        perturbs: int = PERTURBS,
        key: jax.Array | None = None,
        depth: int = 4,
        stats=None,  # optional pigo_tpu.utils.profiling.PipelineStats
    ):
        """Device-resident streaming pipeline: per frame, the dense kernels,
        on-device clustering, face gating, and the fused eyes+landmarks stage
        run as device programs with ONE host round trip; only the sparse tail
        scan stays on host (overlapped). Frames whose hit/face counts exceed
        the device capacities transparently fall back to the host pipeline.

        Cluster tie order (equal q) and f32 q sums may differ from
        `detect()` at tolerance level; coordinates match."""
        import collections

        if self.pupil is None or self.landmarks is None:
            # the device program bakes in both forests; fall back to the
            # host streaming pipeline for partial configurations
            yield from self.detect_stream(
                frames, params, angle, iou_threshold, perturbs, key,
                depth=depth,
            )
            return
        key = key if key is not None else jax.random.PRNGKey(0)
        depth = max(1, depth)
        if stats is None:
            from pigo_tpu.utils.profiling import PipelineStats

            stats = PipelineStats()  # unobserved but keeps one code path
        q: collections.deque = collections.deque()
        for i, frame in enumerate(frames):
            with stats.stage("dispatch", items=1):
                q.append(self._dispatch_frame_device(
                    frame, params, angle, iou_threshold, perturbs,
                    jax.random.fold_in(key, i)))
            if len(q) >= depth:
                with stats.stage("collect", items=1):
                    out = self._collect_frame_device(q.popleft())
                yield out
        while q:
            with stats.stage("collect", items=1):
                out = self._collect_frame_device(q.popleft())
            yield out

    def _dispatch_frame_device(self, frame, params, angle, iou_threshold,
                               perturbs, key, caps=None, face_bound=None):
        # `key` is the frame's full fold_in(key, i); the device program uses
        # the second split half (matching detect()'s key, k_post = split(key))
        # and the UN-split key rides the ticket so an overflow fallback to
        # detect() reproduces the exact same perturbation uniforms.
        _, k_post = jax.random.split(key)
        fc = self.face
        if caps is None:
            caps = self.device_caps
            if self._auto_caps and self._recent_face_counts:
                # follow the stream's face count (the fused post work is
                # linear in SLOTS, not faces: a pad slot costs as much as a
                # real one); power-of-two buckets keep program count low
                want = max(1, max(self._recent_face_counts))
                slots = 1 << (want - 1).bit_length()
                caps = (caps[0], caps[1],
                        min(max(slots, 1), DEV_CAPS_ESCALATED[2]))
        rows, cols = frame.shape[-2], frame.shape[-1]
        cfg = (params.min_size, params.max_size, params.shift_factor,
               params.scale_factor)
        angle_idx0 = int(32.0 * min(angle, 1.0)) if angle > 0.0 else 0
        # prefix=False: the on-device clustering of this pipeline cannot
        # escalate tree-prefix survivors to the host, so tail scales route
        # to the host engine wholesale here
        plan, dense_fn, dense_fn_full, d2g = fc._dense_plan(
            rows, cols, *cfg, angle_idx0, prefix=False, tree_cap=0)
        arrays = fc.device_plan_arrays(rows, cols, *cfg, angle_idx0,
                                       prefix=False, tree_cap=0)
        img2d = jnp.asarray(frame, jnp.uint8).reshape(rows, cols)
        cap = fc.HIT_CAPACITY
        if d2g.size:
            packed = dense_fn(img2d)
        else:
            empty = np.zeros(1 + 2 * cap, np.float32)
            empty[1 : 1 + cap] = -1.0
            packed = jnp.asarray(empty)
        dense_cap, tail_cap, max_faces = caps
        tail_np = np.zeros((tail_cap, 4), np.float32)
        tail_n = 0
        if plan.has_fallback:
            host_pix = frame if isinstance(frame, np.ndarray) else np.asarray(img2d)
            fb = fc._fallback_hits(host_pix, plan, rows, cols, *cfg,
                                   angle=angle)
            tail_n = fb.shape[0]
            tail_np[: min(tail_n, tail_cap)] = fb[:tail_cap]
        pg = self.pupil.forest
        lg = self.landmarks.geometry
        sched = self.landmarks.point_schedule
        lmk_cids = np.tile(
            np.array([self.landmarks._name_to_id[n] for n, _ in sched],
                     np.int32), max_faces)
        lmk_flips = np.tile(np.array([fl for _, fl in sched], bool),
                            max_faces)
        rotated = angle > 0.0
        angle_idx = int(32.0 * min(angle, 1.0)) if rotated else 0
        pupil_geom = (pg.stages, pg.trees, pg.depth, float(pg.scale_mult))
        lmk_geom = (lg.stages, lg.trees, lg.depth, float(lg.scale_mult))
        # exact face-scale ceiling: no cluster can exceed the largest
        # pyramid scale, so patches planned for it can never overflow from
        # face size alone (only from pathological pupil distances)
        exact_bound = int(max((sp.scale for sp in plan.scales), default=0))
        if face_bound is None:
            # default program plans patches ADAPTIVELY: streams have
            # temporal coherence, so plan for ~1.1x the largest face seen
            # recently. The bound is STICKY (only lowered when the need
            # drops below 70% of it): every distinct bound is a separate
            # compiled program, and a bound that tracks frame-to-frame
            # face jitter was measured to patch-overflow on alternate
            # frames, paying an escalation round trip each time. A face
            # that outgrows the plan escalates to an exact_bound
            # re-dispatch WITHOUT paying for more face slots.
            recent = getattr(self, "_recent_face_scale", 0)
            if recent:
                need = min(exact_bound,
                           max(_round_up(int(1.1 * recent), 32),
                               int(params.min_size)))
            else:
                need = min(exact_bound, max(
                    int(0.5 * min(rows, cols)), int(params.min_size)))
            cur = self._face_bound
            if cur and need <= cur and need > 0.7 * cur:
                face_bound = min(cur, exact_bound)
            else:
                face_bound = need
            # a bound that patch-overflowed must never be re-tried: the
            # ratchet floor (2x the failed bound, set at escalation time)
            # guarantees progress even when the overflow came from a
            # landmark anchor exceeding the ASCALE_BOUND_FACTOR estimate,
            # which the face-scale-derived `need` can never see
            face_bound = min(max(face_bound, self._bound_floor),
                             exact_bound)
            self._face_bound = face_bound
        patch_cfg = None
        if _use_patch_post() and exact_bound > 0:
            patch_cfg = _post_patch_cfg(rows, cols, face_bound, pupil_geom,
                                        lmk_geom, rotated=rotated)
        fut = _device_detect(
            packed, jnp.asarray(tail_np), jnp.int32(tail_n),
            arrays["rows_w"], arrays["cols_w"], arrays["scale_w"],
            arrays["d2g"], k_post, img2d.reshape(-1),
            self.pupil.codes, self.pupil.preds,
            self.landmarks.codes, self.landmarks.preds,
            hit_cap=cap, iou_threshold=float(iou_threshold),
            perturbs=perturbs, rows=rows, cols=cols,
            angle_idx=angle_idx, rotated=rotated,
            pupil_geom=pupil_geom, lmk_geom=lmk_geom,
            lmk_cids=jnp.asarray(lmk_cids), lmk_flips=jnp.asarray(lmk_flips),
            dense_cap=dense_cap, tail_cap=tail_cap, max_faces=max_faces,
            patch_cfg=patch_cfg, patch_pallas=_patch_post_pallas(),
            patch_int8=_patch_post_int8(),
        )
        try:
            fut.copy_to_host_async()
        except AttributeError:
            pass
        return (fut, frame, params, angle, iou_threshold, perturbs, key,
                len(sched), caps, face_bound, exact_bound)

    def _collect_frame_device(self, ticket) -> list[FaceResult]:
        (fut, frame, params, angle, iou_threshold, perturbs, key,
         npts, caps, face_bound, exact_bound) = ticket
        out = np.asarray(fut)  # the frame's single round trip
        mf = caps[2]
        hit_ovf = out[0] > 0.0
        patch_ovf = out[1] > 0.0
        n_faces = int(out[2])
        face_ovf = n_faces > mf
        if hit_ovf or patch_ovf or face_ovf:
            # Escalate ONLY the overflowed dimension (one extra round trip,
            # still device-resident): hit overflows grow the dense/tail
            # caps, face overflows grow the slot count to EXACTLY cover the
            # device-reported face count (power-of-two bucket), walk-patch
            # overflows re-plan patches for the exact face-scale ceiling —
            # growing one must not pay for the others (a 16-slot big-patch
            # program is ~100x the post work of the default).
            bigger = list(caps)
            if hit_ovf:
                bigger[0] = max(DEV_CAPS_ESCALATED[0], caps[0])
                bigger[1] = max(DEV_CAPS_ESCALATED[1], caps[1])
            if face_ovf:
                slots = 1 << (n_faces - 1).bit_length()
                if slots > DEV_CAPS_ESCALATED[2]:
                    rows, cols = frame.shape[-2], frame.shape[-1]
                    return self.detect(frame, rows, cols, params, angle,
                                       iou_threshold, perturbs, key)
                bigger[2] = max(slots, caps[2])
                self._recent_face_counts.append(n_faces)
            bigger = tuple(bigger)
            bound = exact_bound if patch_ovf else face_bound
            if patch_ovf:
                # later frames must not re-try the failed bound: ratchet
                # the floor geometrically (converges in <= log2 steps)
                self._bound_floor = max(self._bound_floor,
                                        min(2 * face_bound, exact_bound))
                self._face_bound = max(self._face_bound, bound)
            if bigger != tuple(caps) or bound != face_bound:
                return self._collect_frame_device(self._dispatch_frame_device(
                    frame, params, angle, iou_threshold, perturbs, key,
                    caps=bigger, face_bound=bound))
            rows, cols = frame.shape[-2], frame.shape[-1]
            return self.detect(frame, rows, cols, params, angle,
                               iou_threshold, perturbs, key)
        off = 3
        faces = out[off : off + 4 * mf].reshape(mf, 4)
        off += 4 * mf
        fvalid = out[off : off + mf] > 0.0
        off += mf
        eyed = out[off : off + mf] > 0.0
        off += mf
        post = out[off:].reshape(3, 2 * mf + mf * npts)
        eyes, lmk = post[:, : 2 * mf], post[:, 2 * mf :].reshape(3, mf, npts)
        results = []
        for i in range(mf):
            if not fvalid[i]:
                continue
            res = FaceResult(face=Detection(
                row=int(faces[i, 0]), col=int(faces[i, 1]),
                scale=int(faces[i, 2]), q=float(faces[i, 3])))
            if eyed[i]:
                _attach_post(res, eyes, lmk, i, npts, perturbs)
            results.append(res)
        # feed the adaptive sizing state for later frames
        self._recent_face_counts.append(len(results))
        if results:
            self._recent_face_scale = max(r.face.scale for r in results)
        return results

    def _dispatch_post(self, eyed, gray, rows, cols, angle, perturbs, key):
        """Async half: dispatch the fused eyes+landmarks program (or, for a
        pupils-only configuration, the eyes-only ensemble)."""
        f = len(eyed)
        pg = self.pupil.forest
        rotated = angle > 0.0
        angle_idx = int(32.0 * min(angle, 1.0)) if rotated else 0
        # reference-exact f32 anchor truncation (main.go:416-458), shared
        # with the device path (_eye_anchor_offsets docstring)
        erow, ecol, escale = [], [], []
        for r in eyed:
            o_row, o_l, o_r = _eye_anchor_offsets(r.face.scale)
            erow += [r.face.row - o_row] * 2
            ecol += [r.face.col - o_l, r.face.col + o_r]
            escale += [float(r.face.scale) * 0.25] * 2
        if self.landmarks is None:
            # pupils-only: same uniforms as run_detector_multi(key=key)
            from pigo_tpu.ops import pupil_dense

            u = jax.random.uniform(key, (2 * f, perturbs, 3), jnp.float32)
            fut = pupil_dense.ensemble(
                self.pupil.codes, self.pupil.preds,
                jnp.zeros(2 * f, jnp.int32),
                jnp.asarray(erow, jnp.float32),
                jnp.asarray(ecol, jnp.float32),
                jnp.asarray(escale, jnp.float32),
                jnp.zeros(2 * f, bool), u,
                jnp.asarray(gray, jnp.uint8).reshape(-1),
                stages=pg.stages, trees=pg.trees, depth=pg.depth,
                nrows=rows, ncols=cols, dim=cols,
                scale_mult=float(pg.scale_mult),
                rotated=rotated, angle_idx=angle_idx,
            )
            try:
                fut.copy_to_host_async()
            except AttributeError:
                pass
            return (fut, eyed, f, 0, perturbs, None)
        lg = self.landmarks.geometry
        sched = self.landmarks.point_schedule
        npts = len(sched)
        lmk_cids = np.tile(
            np.array([self.landmarks._name_to_id[n] for n, _ in sched],
                     np.int32), f)
        lmk_flips = np.tile(np.array([fl for _, fl in sched], bool), f)
        pupil_geom = (pg.stages, pg.trees, pg.depth, float(pg.scale_mult))
        lmk_geom = (lg.stages, lg.trees, lg.depth, float(lg.scale_mult))
        args = (
            key,
            jnp.asarray(erow, jnp.float32),
            jnp.asarray(ecol, jnp.float32),
            jnp.asarray(escale, jnp.float32),
            jnp.asarray(gray, jnp.uint8).reshape(-1),
            self.pupil.codes, self.pupil.preds,
            self.landmarks.codes, self.landmarks.preds,
        )
        kw = dict(
            f=f, perturbs=perturbs, rows=rows, cols=cols,
            pupil_geom=pupil_geom, lmk_geom=lmk_geom,
            lmk_cids=jnp.asarray(lmk_cids), lmk_flips=jnp.asarray(lmk_flips),
        )
        retry = None
        patch_cfg = None
        if _use_patch_post():
            # fast path: MXU patch walk (ops/pupil_patch.py, rotated eye
            # walks included); patch sizes come from the largest qualifying
            # face (None when that exceeds _patch_max_side — gather is
            # cheaper there), and a group that outruns its patches retries
            # on the exact gather path
            patch_cfg = _post_patch_cfg(
                rows, cols, max(r.face.scale for r in eyed),
                pupil_geom, lmk_geom, rotated=rotated)
        if patch_cfg is not None:
            fut = _fused_post_patch(*args, patch_cfg=patch_cfg,
                                    pallas=_patch_post_pallas(),
                                    int8=_patch_post_int8(),
                                    rotated=rotated, angle_idx=angle_idx,
                                    **kw)
            retry = (args, kw, angle_idx, rotated)
        else:
            fut = _fused_post(
                *args, dim=cols, angle_idx=angle_idx, rotated=rotated, **kw)
        try:
            fut.copy_to_host_async()
        except AttributeError:
            pass
        return (fut, eyed, f, npts, perturbs, retry)

    def _collect_post(self, ticket, out=None):
        """Blocking half: fetch the [3, 2F + F*npts (+1)] result and attach.

        `out` lets a caller supply the already-fetched array (from a batched
        jax.device_get). Patch-walk tickets carry an overflow column and the
        gather-path retry args: a frame whose walk outran its patches is
        re-run exactly (one extra round trip, rare)."""
        fut, eyed, f, npts, perturbs, retry = ticket
        if out is None:
            out = np.asarray(fut)  # one round trip
        if retry is not None:
            if out[0, -1] > 0.0:  # patch overflow -> exact gather path
                args, kw, angle_idx, rotated = retry
                out = np.asarray(_fused_post(
                    *args, dim=kw["cols"], angle_idx=angle_idx,
                    rotated=rotated, **kw
                ))
            else:
                out = out[:, :-1]
        eyes, lmk = out[:, : 2 * f], out[:, 2 * f :].reshape(3, f, npts)
        for i, res in enumerate(eyed):
            _attach_post(res, eyes, lmk, i, npts, perturbs)
        return eyed
