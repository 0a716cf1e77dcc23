"""Dense face-cascade classifier: all pyramid windows batched on device.

The reference walks one window at a time with per-window early exit
(/root/reference/core/pigo.go:113-191, 212-258). Here the full flat window
axis is evaluated with vectorized gathers; the soft cascade's early exit is
reproduced EXACTLY by a sticky fail mask: after each tree t the running f32
sum is compared to thresh[t], and a window that ever fails reports -1.0.
Float32 accumulation is strict left-to-right (unrolled adds inside a
lax.scan over tree blocks), so scores are bit-identical to the scalar oracle.

Two classifier paths, mirroring the reference:
  - upright: precomputed flat pixel offsets, `pixels[base + off]`, no clamping
    (the pyramid margins guarantee in-bounds, as in the reference),
  - rotated: quantized sin/cos fixed-point rotation with the reference's
    clamp quirk (columns clamped by nrows-1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pigo_tpu.cascade.format import FaceForest

# Trees per scan step; unrolled inside the scan body to keep the graph small
# while preserving strict left-to-right accumulation.
TREE_BLOCK = 12


def pad_trees(forest: FaceForest, block: int = TREE_BLOCK):
    """Pad the forest's tree axis to a multiple of `block` with neutral trees.

    A neutral tree has zero codes (compares a pixel with itself), zero leaf
    predictions, and a -inf threshold, so it changes neither the running sum
    nor the early-exit mask.
    """
    t = forest.num_trees
    t_pad = -(-t // block) * block
    codes = np.zeros((t_pad,) + forest.codes.shape[1:], forest.codes.dtype)
    codes[:t] = forest.codes
    preds = np.zeros((t_pad, forest.num_leaves), np.float32)
    preds[:t] = forest.preds
    thresh = np.full((t_pad,), -np.inf, np.float32)
    thresh[:t] = forest.thresh
    return codes, preds, thresh, t_pad


@functools.partial(
    jax.jit, static_argnames=("depth", "num_leaves", "t_pad", "block")
)
def classify_windows(
    pixels: jax.Array,  # uint8 [N] flat grayscale image
    base: jax.Array,  # int32 [Wp] r*dim + c per window
    scale_idx: jax.Array,  # int32 [Wp]
    off1: jax.Array,  # int32 [S, T_pad, L] flat pixel offsets
    off2: jax.Array,  # int32 [S, T_pad, L]
    preds: jax.Array,  # f32 [T_pad, L]
    thresh: jax.Array,  # f32 [T_pad]
    thresh_last: jax.Array,  # f32 [] == thresh[num_trees-1] of the real forest
    *,
    depth: int,
    num_leaves: int,
    t_pad: int,
    block: int = TREE_BLOCK,
) -> jax.Array:
    """Exact dense classifier. Returns f32 scores [Wp] (-1.0 on early exit)."""
    l = num_leaves
    off1_f = off1.reshape(-1)
    off2_f = off2.reshape(-1)
    preds_f = preds.reshape(-1)
    tab_base = scale_idx * (t_pad * l)  # [Wp]

    def tree_step(t, out, fail):
        idx = jnp.ones_like(base)
        lin0 = tab_base + t * l
        for _ in range(depth):
            lin = lin0 + idx
            p1 = pixels[base + off1_f[lin]]
            p2 = pixels[base + off2_f[lin]]
            idx = 2 * idx + (p1 <= p2).astype(jnp.int32)
        pred = preds_f[t * l + (idx - l)]
        out = out + pred
        fail = fail | (out <= thresh[t])
        return out, fail

    def body(carry, blk):
        out, fail = carry
        t0 = blk * block
        for i in range(block):
            out, fail = tree_step(t0 + i, out, fail)
        return (out, fail), None

    out0 = jnp.zeros(base.shape, jnp.float32)
    fail0 = jnp.zeros(base.shape, jnp.bool_)
    (out, fail), _ = jax.lax.scan(
        body, (out0, fail0), jnp.arange(t_pad // block, dtype=jnp.int32)
    )
    return jnp.where(fail, jnp.float32(-1.0), out - thresh_last)


@functools.partial(
    jax.jit,
    static_argnames=("depth", "num_leaves", "t_pad", "nrows", "dim", "block"),
)
def classify_windows_rotated(
    pixels: jax.Array,  # uint8 [N]
    rows_w: jax.Array,  # int32 [Wp]
    cols_w: jax.Array,  # int32 [Wp]
    scale_idx: jax.Array,  # int32 [Wp]
    rot: jax.Array,  # int32 [4, S, T_pad, L] rotation numerators
    preds: jax.Array,  # f32 [T_pad, L]
    thresh: jax.Array,  # f32 [T_pad]
    thresh_last: jax.Array,
    *,
    depth: int,
    num_leaves: int,
    t_pad: int,
    nrows: int,
    dim: int,
    block: int = TREE_BLOCK,
) -> jax.Array:
    """Rotated-window dense classifier (reference core/pigo.go:150-191).

    Preserves the reference's clamp quirk: both axes clamp with nrows-1.
    """
    l = num_leaves
    rot_f = rot.reshape(4, -1)
    preds_f = preds.reshape(-1)
    tab_base = scale_idx * (t_pad * l)
    r16 = rows_w * 65536
    c16 = cols_w * 65536
    hi = jnp.int32(nrows - 1)

    def coord(base16, numer):
        v = jnp.maximum(0, base16 + numer) >> 16
        return jnp.abs(jnp.minimum(hi, v))

    def tree_step(t, out, fail):
        idx = jnp.ones_like(scale_idx)
        lin0 = tab_base + t * l
        for _ in range(depth):
            lin = lin0 + idx
            r1 = coord(r16, rot_f[0, lin])
            c1 = coord(c16, rot_f[1, lin])
            r2 = coord(r16, rot_f[2, lin])
            c2 = coord(c16, rot_f[3, lin])
            p1 = pixels[r1 * dim + c1]
            p2 = pixels[r2 * dim + c2]
            idx = 2 * idx + (p1 <= p2).astype(jnp.int32)
        pred = preds_f[t * l + (idx - l)]
        out = out + pred
        fail = fail | (out <= thresh[t])
        return out, fail

    def body(carry, blk):
        out, fail = carry
        t0 = blk * block
        for i in range(block):
            out, fail = tree_step(t0 + i, out, fail)
        return (out, fail), None

    out0 = jnp.zeros(scale_idx.shape, jnp.float32)
    fail0 = jnp.zeros(scale_idx.shape, jnp.bool_)
    (out, fail), _ = jax.lax.scan(
        body, (out0, fail0), jnp.arange(t_pad // block, dtype=jnp.int32)
    )
    return jnp.where(fail, jnp.float32(-1.0), out - thresh_last)
