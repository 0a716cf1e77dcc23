"""Patch-resident MXU formulation of the pupil/landmark regression walk.

Reference semantics: /root/reference/core/puploc.go classifyRegion
(:106-154) and RunDetector (:239-277) — the same walk `ops/pupil_dense.py`
implements with data-dependent gathers. XLA lowers those gathers to serial
element loops on TPU (measured ~60 ms/frame for the fused eyes+landmarks
ensemble at 2 face slots), which made the post stage the anti-TPU bottleneck
of the full pipeline (docs/PERFORMANCE.md round-3 lever #2).

TPU-native reformulation (this module):

  * Every probe of a walk group (one anchor x P perturbs) stays within a
    bounded reach of the group's anchor: stage-k probes read pixels at most
    ~0.61 * s_k from the current mean anchor (|code| <= 127 -> offset
    <= s/2, plus the perturbation spread). Before each stage the group
    re-extracts a square image PATCH around its mean anchor; all pixel
    probes of the stage become patch-local.
  * A patch-local pixel read is a one-hot matmul: row selection is a
    [probes, Hp] one-hot times the [Hp, Wp] patch on the MXU (exact — each
    output has exactly one unit term and uint8 pixels are exact in
    bfloat16, the same argument as the face kernel's split plane layout),
    column selection a one-hot multiply + lane reduction on the VPU. No
    data-dependent gather remains in the hot loop.
  * Tree-node code words and leaf predictions are fetched the same way:
    the level-l nodes of a tree occupy a contiguous [2^l-1, 2^(l+1)-1)
    slice of the heap, so a one-hot over at most 2^depth lanes with an
    integer masked-sum reduction reads them exactly (int32 / single-term
    f32 — no rounding anywhere).
  * The walk itself is unchanged: truncation toward zero, round-half-away
    scale, per-axis clamps, `p1 > p2` polarity, strict left-to-right f32
    tree accumulation, median at round(P/2) — bit-exact vs
    `pupil_dense._walk_impl` given identical uniforms (tests/test_pupil.py).

Clamp/overflow contract: probe addresses are clamped to the image exactly
like the reference BEFORE patch-localization. A probe whose clamped address
falls outside the group's patch sets the group's overflow flag (returned to
the caller); its in-patch address is clamped so the program stays total, and
the caller must re-run overflowed groups through the exact gather path
(`pupil_dense`). Patch sizes shrink with the per-stage scale multiplier, so
stage 0 dominates the MXU cost.

The rotated walk (angle > 0, puploc.go:174-215) is the same formulation
with rotated probe offsets (16.16 fixed-point qsin/qcos transform, `<=`
polarity quirk) and a wider per-stage reach ((|cos|+|sin|) * 127/256 *
s <= 0.71 * s vs 0.50 upright); only the EYE walks rotate — landmark
walks are always upright (cmd/pigo/main.go:493-564 semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pigo_tpu.ops import pupil_dense


def _bucket(x: int, max_patch: int) -> int:
    """Round a required patch side up to a lane-friendly bucket."""
    for b in (128, 256, 384, 512, 640, 768, 1024):
        if b >= x:
            return min(b, max_patch)
    return max_patch


def stage_patch_sizes(
    s0_max: float, *, stages: int, scale_mult: float, nrows: int, ncols: int,
    rotated: bool = False,
) -> tuple[int, ...]:
    """Per-stage patch sides for a walk whose start scale is at most s0_max.

    Required half-width at stage k: probes reach (127/256) * s of the
    anchor upright, (|cos|+|sin|) * (127/256) * s <= 0.71 * s rotated;
    anchors are jittered +-0.075 * s0 and s itself up to 1.075 * s0 * m^k.
    Drift between stages re-centers the patch, so only the per-stage reach
    matters; blowups are caught by the exact overflow flag, not the
    estimate."""
    max_patch = max(
        _bucket(nrows, 1024), _bucket(ncols, 1024)
    )
    reach = 0.75 if rotated else 0.53
    sizes = []
    for k in range(stages):
        s_k = 1.075 * float(s0_max) * float(scale_mult) ** k
        half = reach * s_k + 0.075 * float(s0_max) + 4.0
        sizes.append(_bucket(int(2 * half) + 2, max_patch))
    return tuple(sizes)


def _extract_patches(img_pad, orow, ocol, hp, wp):
    """[G] dynamic slices of the zero-padded image -> [G, hp, wp]."""
    return jax.vmap(
        lambda r, c: jax.lax.dynamic_slice(img_pad, (r, c), (hp, wp))
    )(orow, ocol)


def _masked_isum(onehot, table):
    """Exact int32 one-hot read: sum of the single selected word."""
    return jnp.sum(jnp.where(onehot, table, 0), axis=-1)


def _masked_fsum(onehot, table):
    """Exact f32 one-hot read (single nonzero term)."""
    return jnp.sum(jnp.where(onehot, table, jnp.float32(0.0)), axis=-1)


def _walk_patch_impl(
    codes, preds, casc_id, r0, c0, s0, col_sign, img2d,
    *, stages, trees, depth, nrows, ncols, scale_mult, patch_sizes,
    int8=False, rotated=False, angle_idx=0,
):
    """The walk on [G, P] starts. Returns (r, c, s, overflow[G]).

    rotated=True uses the quantized-rotation probe transform and the `<=`
    bintest polarity (reference puploc.go:174-215 quirks), mirroring
    pupil_dense._walk_impl's rotated branch; patch_sizes must then come
    from stage_patch_sizes(rotated=True) (wider reach).

    codes: packed int32 [NC * S * T * 2^depth] (pupil_dense.pack_codes
    layout); preds: f32 [NC * S * T * 2^depth * 2]; casc_id [G] int32;
    r0/c0/s0 [G, P] f32; col_sign [G] int32; img2d uint8 [nrows, ncols].

    int8=True runs the pixel matmul-gathers in int8 on the MXU: pixels are
    stored shifted by -128 (uint8 - 128 fits s8 exactly), the one-hot is
    s8 unit rows, and the s8 x s8 -> i32 product reproduces the shifted
    pixel exactly. The walk only COMPARES pixel pairs, and px1 > px2 is
    invariant under the shared shift, so results are bit-identical; the
    s8 MXU path runs at twice the bf16 rate with half the HBM traffic."""
    g, p = r0.shape
    t = trees
    leaves = 1 << depth
    nodes = leaves  # per-tree code stride (last slot is an unused pad)
    nc = codes.shape[0] // (stages * t * nodes)
    codes_v = codes.reshape(nc, stages, t, nodes)
    preds_v = preds.reshape(nc, stages, t, leaves, 2)
    smul = jnp.float32(scale_mult)
    sign_f = col_sign.astype(jnp.float32)[:, None]
    cs = col_sign[:, None, None]  # [G,1,1]
    cid = casc_id.astype(jnp.int32)

    max_hp = max(patch_sizes)
    img_pad = img2d
    if nrows < max_hp or ncols < max_hp:
        img_pad = jnp.pad(
            img2d, ((0, max(0, max_hp - nrows)), (0, max(0, max_hp - ncols)))
        )
    if int8:
        img_x = (img_pad.astype(jnp.int16) - 128).astype(jnp.int8)
    else:
        img_x = img_pad.astype(jnp.bfloat16)

    r, c, s = r0, c0, s0
    overflow = jnp.zeros((g,), bool)

    for k in range(stages):
        hp = wp = patch_sizes[k]
        # patch origin from the group mean anchor (any center is correct;
        # the in-patch check below is exact)
        mr = jnp.mean(r, axis=1).astype(jnp.int32)
        mc = jnp.mean(c, axis=1).astype(jnp.int32)
        orow = jnp.clip(mr - hp // 2, 0, max(nrows - hp, 0))
        ocol = jnp.clip(mc - wp // 2, 0, max(ncols - wp, 0))
        patches = _extract_patches(img_x, orow, ocol, hp, wp)  # [G,hp,wp]

        if rotated:
            qsin = (s * pupil_dense.QSIN_TABLE[angle_idx]).astype(
                jnp.int32)[:, :, None]  # [G,P,1]
            qcos = (s * pupil_dense.QCOS_TABLE[angle_idx]).astype(
                jnp.int32)[:, :, None]
            ri = (65536 * r.astype(jnp.int32))[:, :, None]
            ci = (65536 * c.astype(jnp.int32))[:, :, None]
            si = None
        else:
            ri = (256 * r.astype(jnp.int32))[:, :, None]  # [G,P,1]
            ci = (256 * c.astype(jnp.int32))[:, :, None]
            si = pupil_dense.round_away(s).astype(jnp.int32)[:, :, None]

        # per-stage code table [G, T, nodes] via the cascade id (NC <= 9)
        ctab = codes_v[cid, k]  # [G, T, nodes]
        ptab = preds_v[cid, k]  # [G, T, leaves, 2]

        idx = jnp.zeros((g, p, t), jnp.int32)
        ok = jnp.ones((g, p, t), bool)
        for lvl in range(depth):
            n_l = 1 << lvl
            base = n_l - 1
            tbl_l = ctab[:, :, base : base + n_l]  # [G, T, n_l]
            loc = (idx - base)[..., None]  # [G,P,T,1]
            onehot = loc == jnp.arange(n_l, dtype=jnp.int32)
            w = _masked_isum(onehot, tbl_l[:, None])  # [G,P,T] int32
            k0, k1, k2, k3 = pupil_dense._unpack4(w)
            if rotated:
                # quantized rotation, 16.16 fixed point; max-before-shift
                # like the reference (puploc.go:181-190)
                col1 = cs * k1
                col2 = cs * k3
                r1 = jnp.clip(
                    jnp.maximum(0, ri + qcos * k0 - qsin * col1) >> 16,
                    0, nrows - 1)
                c1 = jnp.clip(
                    jnp.maximum(0, ci + qsin * k0 + qcos * col1) >> 16,
                    0, ncols - 1)
                r2 = jnp.clip(
                    jnp.maximum(0, ri + qcos * k2 - qsin * col2) >> 16,
                    0, nrows - 1)
                c2 = jnp.clip(
                    jnp.maximum(0, ci + qsin * k2 + qcos * col2) >> 16,
                    0, ncols - 1)
            else:
                r1 = jnp.clip((ri + k0 * si) >> 8, 0, nrows - 1)
                r2 = jnp.clip((ri + k2 * si) >> 8, 0, nrows - 1)
                c1 = jnp.clip((ci + cs * k1 * si) >> 8, 0, ncols - 1)
                c2 = jnp.clip((ci + cs * k3 * si) >> 8, 0, ncols - 1)
            lr1 = r1 - orow[:, None, None]
            lr2 = r2 - orow[:, None, None]
            lc1 = c1 - ocol[:, None, None]
            lc2 = c2 - ocol[:, None, None]
            ok = ok & (lr1 >= 0) & (lr1 < hp) & (lc1 >= 0) & (lc1 < wp)
            ok = ok & (lr2 >= 0) & (lr2 < hp) & (lc2 >= 0) & (lc2 < wp)
            lr = jnp.clip(
                jnp.stack([lr1, lr2], axis=1).reshape(g, 2 * p * t), 0, hp - 1
            )
            lc = jnp.clip(
                jnp.stack([lc1, lc2], axis=1).reshape(g, 2 * p * t), 0, wp - 1
            )
            oh_eq = lr[..., None] == jnp.arange(hp, dtype=jnp.int32)
            oh_cols = lc[..., None] == jnp.arange(wp, dtype=jnp.int32)
            if int8:
                rowsel = jnp.einsum(
                    "gph,ghw->gpw", oh_eq.astype(jnp.int8), patches,
                    preferred_element_type=jnp.int32,
                )  # [G, 2PT, wp] exact shifted pixels (one s8 term each)
                px = _masked_isum(oh_cols, rowsel)  # [G, 2PT] px - 128
            else:
                rowsel = jnp.einsum(
                    "gph,ghw->gpw", oh_eq.astype(jnp.bfloat16), patches,
                    preferred_element_type=jnp.bfloat16,
                )  # [G, 2PT, wp] — exact even in bf16: one unit uint8 term
                # per output (and halving this, the walk's largest buffer,
                # matters: the jnp path is HBM-bound on it)
                px = _masked_fsum(
                    oh_cols, rowsel.astype(jnp.float32)
                )  # [G, 2PT] exact u8 values
            px = px.reshape(g, 2, p, t)
            # both compares are invariant under the int8 path's shared -128
            # shift; rotated uses the reference's `<=` polarity quirk
            if rotated:
                b = (px[:, 0] <= px[:, 1]).astype(jnp.int32)
            else:
                b = (px[:, 0] > px[:, 1]).astype(jnp.int32)
            idx = 2 * idx + 1 + b
        overflow = overflow | jnp.any(~ok, axis=(1, 2))

        leaf = (idx - (leaves - 1))[..., None]  # [G,P,T,1]
        oh_leaf = leaf == jnp.arange(leaves, dtype=jnp.int32)
        dr_t = _masked_fsum(oh_leaf, ptab[:, None, :, :, 0])  # [G,P,T]
        dc_t = sign_f[..., None] * _masked_fsum(oh_leaf, ptab[:, None, :, :, 1])
        # strict left-to-right f32 accumulation over trees (reference order)
        dr = dr_t[:, :, 0]
        dc = dc_t[:, :, 0]
        for j in range(1, t):
            dr = dr + dr_t[:, :, j]
            dc = dc + dc_t[:, :, j]
        r = r + dr * s
        c = c + dc * s
        s = s * smul
    return r, c, s, overflow


def _ensemble_patch_impl(
    codes, preds, casc_id, rows0, cols0, scales0, flips, u, img2d,
    *, stages, trees, depth, nrows, ncols, scale_mult, patch_sizes,
    int8=False, rotated=False, angle_idx=0,
):
    """Fused jitter -> patch walk -> median. Mirrors
    pupil_dense._ensemble_impl but returns (medians [3, G], overflow [G])."""
    g, p = u.shape[0], u.shape[1]
    r0, c0, s0 = pupil_dense.make_perturbations(
        rows0[:, None], cols0[:, None], scales0[:, None], u
    )
    col_sign = jnp.where(flips, -1, 1).astype(jnp.int32)
    r, c, s, overflow = _walk_patch_impl(
        codes, preds, casc_id.astype(jnp.int32), r0, c0, s0, col_sign, img2d,
        stages=stages, trees=trees, depth=depth, nrows=nrows, ncols=ncols,
        scale_mult=scale_mult, patch_sizes=patch_sizes, int8=int8,
        rotated=rotated, angle_idx=angle_idx,
    )
    rm, cm, sm = pupil_dense.median_vote(r, c, s, p)
    return jnp.stack([rm, cm, sm]), overflow


ensemble_patch = jax.jit(
    _ensemble_patch_impl,
    static_argnames=(
        "stages", "trees", "depth", "nrows", "ncols", "scale_mult",
        "patch_sizes", "int8", "rotated", "angle_idx",
    ),
)


# ------------------------------------------------------- Pallas fast path


def _walk_pallas_impl(
    codes, preds, casc_id, r0, c0, s0, col_sign, img2d,
    *, stages, trees, depth, nrows, ncols, scale_mult, patch_sizes,
    interpret=False,
):
    """The same walk with each stage fused into the Pallas kernel
    (ops/pupil_pallas.py) — bit-exact vs `_walk_patch_impl` (tested), which
    is itself bit-exact vs the gather walk. The XLA glue per stage:
    anchor/state arithmetic, patch extraction, leaf-delta application."""
    from pigo_tpu.ops import pupil_pallas

    g, p = r0.shape
    t = trees
    leaves = 1 << depth
    nodes = leaves
    nc = codes.shape[0] // (stages * t * nodes)
    codes_v = codes.reshape(nc, stages, t, nodes)
    preds_v = preds.reshape(nc, stages, t, leaves, 2)
    smul = jnp.float32(scale_mult)
    sign_f = col_sign.astype(jnp.float32)[:, None]
    cid = casc_id.astype(jnp.int32)

    max_hp = max(patch_sizes)
    img_pad = img2d
    if nrows < max_hp or ncols < max_hp:
        img_pad = jnp.pad(
            img2d, ((0, max(0, max_hp - nrows)), (0, max(0, max_hp - ncols)))
        )
    img_bf = img_pad.astype(jnp.bfloat16)

    pad = pupil_pallas.P_PAD - p
    if pad < 0:
        raise ValueError(f"perturbs {p} > P_PAD {pupil_pallas.P_PAD}")

    r, c, s = r0, c0, s0
    overflow = jnp.zeros((g,), bool)
    for k in range(stages):
        hp = wp = patch_sizes[k]
        mr = jnp.mean(r, axis=1).astype(jnp.int32)
        mc = jnp.mean(c, axis=1).astype(jnp.int32)
        orow = jnp.clip(mr - hp // 2, 0, max(nrows - hp, 0))
        ocol = jnp.clip(mc - wp // 2, 0, max(ncols - wp, 0))
        patches = _extract_patches(img_bf, orow, ocol, hp, wp)
        origins = jnp.stack([orow, ocol], axis=1)  # [G, 2]

        ri = 256 * r.astype(jnp.int32)
        ci = 256 * c.astype(jnp.int32)
        si = pupil_dense.round_away(s).astype(jnp.int32)
        csi = col_sign[:, None] * si
        anchors = jnp.stack([ri, ci, si, csi], axis=-1)  # [G, P, 4]
        anchors = jnp.pad(anchors, ((0, 0), (0, pad), (0, 0)),
                          mode="edge")  # pad rows stay in-bounds

        ptab = preds_v[cid, k]  # [G, T, leaves, 2]
        res = pupil_pallas.walk_stage(
            origins, patches, codes_v[cid, k],
            ptab[..., 0], ptab[..., 1],
            anchors, trees=t, depth=depth, nrows=nrows, ncols=ncols,
            interpret=interpret,
        )  # [G, P_PAD, 4]
        dr = res[:, :p, 0]
        dc = sign_f * res[:, :p, 1]  # exact: +-1 multiply after the f32 sum
        overflow = overflow | jnp.any(res[:, :p, 2] <= 0.0, axis=1)
        r = r + dr * s
        c = c + dc * s
        s = s * smul
    return r, c, s, overflow


def _ensemble_pallas_impl(
    codes, preds, casc_id, rows0, cols0, scales0, flips, u, img2d,
    *, stages, trees, depth, nrows, ncols, scale_mult, patch_sizes,
    interpret=False,
):
    """Fused jitter -> Pallas patch walk -> median; drop-in for
    `_ensemble_patch_impl`."""
    g, p = u.shape[0], u.shape[1]
    r0, c0, s0 = pupil_dense.make_perturbations(
        rows0[:, None], cols0[:, None], scales0[:, None], u
    )
    col_sign = jnp.where(flips, -1, 1).astype(jnp.int32)
    r, c, s, overflow = _walk_pallas_impl(
        codes, preds, casc_id.astype(jnp.int32), r0, c0, s0, col_sign, img2d,
        stages=stages, trees=trees, depth=depth, nrows=nrows, ncols=ncols,
        scale_mult=scale_mult, patch_sizes=patch_sizes, interpret=interpret,
    )
    rm, cm, sm = pupil_dense.median_vote(r, c, s, p)
    return jnp.stack([rm, cm, sm]), overflow


ensemble_pallas = jax.jit(
    _ensemble_pallas_impl,
    static_argnames=(
        "stages", "trees", "depth", "nrows", "ncols", "scale_mult",
        "patch_sizes", "interpret",
    ),
)
