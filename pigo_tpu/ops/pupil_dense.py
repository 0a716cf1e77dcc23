"""Batched pupil/landmark regression-tree walks (JAX).

Reference semantics: /root/reference/core/puploc.go classifyRegion
(:106-154), classifyRotatedRegion (:157-217), RunDetector (:239-277).

Unlike the face cascade (dense pyramid grid), the pupil walk drifts its
anchor after every stage, so pixel addresses are data-dependent — a gather
workload by nature. The TPU formulation batches every independent axis into
one flat run axis B = (#detector runs) x (#perturbations) and vectorizes the
walk: all B walkers advance together through the static (stage, tree, level)
schedule with one packed-code gather and two pixel gathers per level.

Multiple cascades of identical geometry (the 9 landmark cascades, stacked on
a leading axis) are handled by a per-run cascade id folded into the gather
index, so one call localizes every landmark of every face at once.

Exactness notes (all preserved):
  - int(r) truncation toward zero, round-half-away-from-zero for the scale,
  - bintest `p1 > p2` upright vs `px1 <= px2` rotated (reference quirk),
  - per-axis clamps; flipV negates column codes and dc,
  - f32 accumulation order over trees within a stage,
  - per-axis median at index round(P/2) over the perturbation ensemble.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pigo_tpu.cascade.format import PupilForest

QCOS_TABLE = jnp.asarray(
    [256, 251, 236, 212, 181, 142, 97, 49, 0, -49, -97, -142, -181, -212,
     -236, -251, -256, -251, -236, -212, -181, -142, -97, -49, 0, 49, 97,
     142, 181, 212, 236, 251, 256], jnp.float32,
)
QSIN_TABLE = jnp.asarray(
    [0, 49, 97, 142, 181, 212, 236, 251, 256, 251, 236, 212, 181, 142, 97,
     49, 0, -49, -97, -142, -181, -212, -236, -251, -256, -251, -236, -212,
     -181, -142, -97, -49, 0], jnp.float32,
)


def pack_codes(forest: PupilForest) -> np.ndarray:
    """int8 [S,T,L,4] -> int32 [S,T,L] with bytes (c0,c1,c2,c3) packed
    big-endian; decoded in-graph with sign-extending shifts."""
    c = forest.codes.astype(np.int64) & 0xFF
    packed = (c[..., 0] << 24) | (c[..., 1] << 16) | (c[..., 2] << 8) | c[..., 3]
    return packed.astype(np.uint32).view(np.int32)


def _unpack4(word):
    """Sign-extending byte decode of a packed code word."""
    c0 = word >> 24
    c1 = (word << 8) >> 24
    c2 = (word << 16) >> 24
    c3 = (word << 24) >> 24
    return c0, c1, c2, c3


def round_away(x):
    """Go math.Round: half away from zero."""
    return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))


def _walk_impl(
    codes, preds, casc_id, r0, c0, s0, col_sign, pixels,
    *, stages, trees, depth, nrows, ncols, dim, scale_mult, rotated, angle_idx,
):
    leaves = 1 << depth
    sign_f = col_sign.astype(jnp.float32)
    base_c = casc_id * (stages * trees * leaves)
    smul = jnp.float32(scale_mult)

    tree_ix = jnp.arange(trees, dtype=jnp.int32)[None, :]  # [1, T]

    def stage_step(i, state):
        r, c, s = state
        if rotated:
            qsin = (s * QSIN_TABLE[angle_idx]).astype(jnp.int32)[:, None]
            qcos = (s * QCOS_TABLE[angle_idx]).astype(jnp.int32)[:, None]
            ri = (65536 * r.astype(jnp.int32))[:, None]
            ci = (65536 * c.astype(jnp.int32))[:, None]
        else:
            ri = (256 * r.astype(jnp.int32))[:, None]
            ci = (256 * c.astype(jnp.int32))[:, None]
            si = round_away(s).astype(jnp.int32)[:, None]
        cs = col_sign[:, None]

        # All T trees of the stage walk in lockstep on a [B, T] lane grid:
        # only the depth levels are sequential (the reference's per-tree loop
        # is independent across trees within a stage, puploc.go:115-147).
        node_base = base_c[:, None] + (i * trees + tree_ix) * leaves  # [B, T]

        def level_step(_, idx):
            w = codes[node_base + idx]
            k0, k1, k2, k3 = _unpack4(w)
            if rotated:
                col1 = cs * k1
                col2 = cs * k3
                r1 = jnp.clip(
                    jnp.maximum(0, ri + qcos * k0 - qsin * col1) >> 16,
                    0, nrows - 1,
                )
                c1 = jnp.clip(
                    jnp.maximum(0, ci + qsin * k0 + qcos * col1) >> 16,
                    0, ncols - 1,
                )
                r2 = jnp.clip(
                    jnp.maximum(0, ri + qcos * k2 - qsin * col2) >> 16,
                    0, nrows - 1,
                )
                c2 = jnp.clip(
                    jnp.maximum(0, ci + qsin * k2 + qcos * col2) >> 16,
                    0, ncols - 1,
                )
                # one fused gather for both probe pixels (gather ops are the
                # latency unit of this walk)
                px = pixels[jnp.stack([r1 * dim + c1, r2 * dim + c2])]
                # rotated bintest polarity quirk (puploc.go:193-199)
                b = (px[0] <= px[1]).astype(jnp.int32)
            else:
                r1 = jnp.clip((ri + k0 * si) >> 8, 0, nrows - 1)
                r2 = jnp.clip((ri + k2 * si) >> 8, 0, nrows - 1)
                c1 = jnp.clip((ci + cs * k1 * si) >> 8, 0, ncols - 1)
                c2 = jnp.clip((ci + cs * k3 * si) >> 8, 0, ncols - 1)
                px = pixels[jnp.stack([r1 * dim + c1, r2 * dim + c2])]
                b = (px[0] > px[1]).astype(jnp.int32)
            return 2 * idx + 1 + b

        idx0 = jnp.zeros_like(node_base)
        idx = jax.lax.fori_loop(0, depth, level_step, idx0)
        leaf = idx - (leaves - 1)
        lut = (node_base + leaf) * 2
        dr_t = preds[lut]  # [B, T]
        dc_t = sign_f[:, None] * preds[lut + 1]
        # strict left-to-right f32 accumulation over trees (reference order)
        dr = dr_t[:, 0]
        dc = dc_t[:, 0]
        for j in range(1, trees):
            dr = dr + dr_t[:, j]
            dc = dc + dc_t[:, j]
        return r + dr * s, c + dc * s, s * smul

    r, c, s = r0, c0, s0
    for i in range(stages):  # few stages; per-stage closure over ri/ci/si
        r, c, s = stage_step(i, (r, c, s))
    return r, c, s


walk = jax.jit(
    _walk_impl,
    static_argnames=(
        "stages", "trees", "depth", "nrows", "ncols", "dim", "scale_mult",
        "rotated", "angle_idx",
    ),
)


def _ensemble_impl(
    codes, preds, casc_id, rows0, cols0, scales0, flips, u, pixels,
    *, stages, trees, depth, nrows, ncols, dim, scale_mult, rotated,
    angle_idx,
):
    """Fused ensemble: jitter -> walk -> per-group median, one XLA program.

    casc_id/rows0/cols0/scales0/flips: [G] per-group; u: [G, P, 3] uniforms.
    Returns [3, G] f32 medians (row, col, scale). Keeping the whole ensemble
    in ONE jit matters on high-latency hosts: the eager op chain around the
    walk otherwise costs dozens of dispatch round trips per frame."""
    g, p = u.shape[0], u.shape[1]
    r0, c0, s0 = make_perturbations(
        rows0[:, None], cols0[:, None], scales0[:, None], u
    )
    col_sign = jnp.where(flips, -1, 1).astype(jnp.int32)
    cs = jnp.repeat(col_sign, p)
    cid = jnp.repeat(casc_id.astype(jnp.int32), p)
    r, c, s = _walk_impl(
        codes, preds, cid, r0.reshape(-1), c0.reshape(-1), s0.reshape(-1),
        cs, pixels,
        stages=stages, trees=trees, depth=depth, nrows=nrows, ncols=ncols,
        dim=dim, scale_mult=scale_mult, rotated=rotated, angle_idx=angle_idx,
    )
    rm, cm, sm = median_vote(
        r.reshape(g, p), c.reshape(g, p), s.reshape(g, p), p
    )
    return jnp.stack([rm, cm, sm])


ensemble = jax.jit(
    _ensemble_impl,
    static_argnames=(
        "stages", "trees", "depth", "nrows", "ncols", "dim", "scale_mult",
        "rotated", "angle_idx",
    ),
)


def make_perturbations(row, col, scale, u):
    """Jittered start triples from uniforms u [..., 3] (puploc.go:248-250).

    row/col/scale may be scalars or arrays broadcastable against u[..., 0].
    All math in f32 to match the reference exactly given identical uniforms.
    """
    u = u.astype(jnp.float32)
    row = jnp.float32(row) if np.isscalar(row) else row.astype(jnp.float32)
    col = jnp.float32(col) if np.isscalar(col) else col.astype(jnp.float32)
    scale = jnp.float32(scale) if np.isscalar(scale) else scale.astype(jnp.float32)
    rows = row + scale * jnp.float32(0.15) * (jnp.float32(0.5) - u[..., 0])
    cols = col + scale * jnp.float32(0.15) * (jnp.float32(0.5) - u[..., 1])
    scales = scale * (jnp.float32(0.925) + jnp.float32(0.15) * u[..., 2])
    return rows, cols, scales


def median_vote(r, c, s, perturbs: int):
    """Per-axis median at index round(P/2) (puploc.go:266-276), clamped.

    r/c/s: [..., P]. Returns ([...], [...], [...]) median triples."""
    mid = min(int(np.floor(perturbs / 2.0 + 0.5)), perturbs - 1)
    return (
        jnp.sort(r, axis=-1)[..., mid],
        jnp.sort(c, axis=-1)[..., mid],
        jnp.sort(s, axis=-1)[..., mid],
    )
