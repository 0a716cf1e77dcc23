"""Pallas TPU kernel for the pupil/landmark regression-walk stage.

Same math as `ops/pupil_patch.py` (the jnp MXU-patch formulation of the
reference walk, core/puploc.go:106-154/239-277), fused into one kernel per
(cascade stage x patch geometry) so the one-hot operands never round-trip
through HBM — the jnp version is HBM-bound on its materialized [probes,
patch] one-hots (measured 13 ms at 2 face slots); this kernel keeps them in
VMEM/registers and feeds the MXU back-to-back [128, Hp] x [Hp, Wp]
per-tree matmul-gathers.

Design notes (all static shapes, no dynamic rolls -> none of the Mosaic
dynamic-slice/rotate quirks apply):

  * Grid = (G,): one program per walk group (anchor x P perturbs). Blocked
    inputs: the group's image patch [Hp, Wp] bf16, its cascade's stage
    tables (codes [T, nodes] int32, preds [T, leaves] f32 x2), its anchor
    state [P, 4] int32, its patch origin (SMEM).
  * Perturbs live on SUBLANES ([P=64 rows, .] layouts) so the per-tree
    one-hot pixel operand [2P, Hp] is a cheap sublane concat and the
    matmul output splits back into the two probe pixels with static
    sublane slices.
  * Tree-node code words / leaf preds read via one-hot masked sums over
    the level slice of the heap (exact int32 / single-term f32, see
    pupil_patch.py); the data-dependent pixel read is the per-tree matmul
    against the patch (exact in bf16: one unit term, uint8 pixels).
  * The walk's exactness contract is unchanged: int32 address math with
    the reference's truncations and clamps, `p1 > p2` polarity, strict
    left-to-right f32 tree accumulation, exact in-patch overflow flag.

Outputs per group: [P, 4] f32 = (dr_sum, dc_sum_unsigned, ok, pad); the
XLA caller applies the column sign (exact: +-1 multiply commutes with the
f32 sum), advances (r, c, s), and re-extracts next-stage patches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P_PAD = 64  # perturbation rows per group (63 real + 1 dead pad row)


@functools.lru_cache(maxsize=None)
def _stage_kernel(trees: int, depth: int, hp: int, wp: int, nrows: int,
                  ncols: int, nodes: int):
    leaves = 1 << depth

    def kernel(orig_ref, patch_ref, ctab_ref, pr_ref, pc_ref, anch_ref,
               out_ref):
        g = pl.program_id(0)
        orow = orig_ref[g, 0]
        ocol = orig_ref[g, 1]
        patch = patch_ref[0]  # [hp, wp] bf16
        ri = anch_ref[0, :, 0:1]  # [P, 1] int32
        ci = anch_ref[0, :, 1:2]
        si = anch_ref[0, :, 2:3]
        csi = anch_ref[0, :, 3:4]  # col_sign * si

        lane_t = jax.lax.broadcasted_iota(jnp.int32, (P_PAD, trees), 1)
        idx = jnp.zeros((P_PAD, trees), jnp.int32)
        ok = jnp.ones((P_PAD, 1), jnp.float32)

        rows_all = 2 * trees * P_PAD  # one matmul row per probe pixel
        iota_hp = jax.lax.broadcasted_iota(jnp.int32, (rows_all, hp), 1)
        iota_wp = jax.lax.broadcasted_iota(jnp.int32, (rows_all, wp), 1)

        for lvl in range(depth):
            n_l = 1 << lvl
            base = n_l - 1
            iota_n = jax.lax.broadcasted_iota(jnp.int32, (P_PAD, n_l), 1)
            # per-tree scalar-ish prep (tiny [P, 1] vectors), then ONE
            # [2*T*P, hp] x [hp, wp] matmul-gather per level: the MXU sees
            # a single large operand instead of `trees` small serialized
            # matmuls stalling on the VPU one-hot builds between them.
            lrs, lcs = [], []
            for t in range(trees):
                loc = idx[:, t : t + 1] - base  # [P, 1]
                tbl = ctab_ref[0, t, base : base + n_l]  # [n_l] int32
                w = jnp.sum(
                    jnp.where(loc == iota_n, tbl[None, :], 0),
                    axis=1, keepdims=True,
                )  # [P, 1] int32 — the packed code word
                k0 = w >> 24
                k1 = (w << 8) >> 24
                k2 = (w << 16) >> 24
                k3 = (w << 24) >> 24
                r1 = jnp.clip((ri + k0 * si) >> 8, 0, nrows - 1)
                r2 = jnp.clip((ri + k2 * si) >> 8, 0, nrows - 1)
                c1 = jnp.clip((ci + k1 * csi) >> 8, 0, ncols - 1)
                c2 = jnp.clip((ci + k3 * csi) >> 8, 0, ncols - 1)
                lrs += [r1, r2]
                lcs += [c1, c2]
            lr = jnp.concatenate(lrs, axis=0) - orow  # [2TP, 1]
            lc = jnp.concatenate(lcs, axis=0) - ocol
            inb = (lr >= 0) & (lr < hp) & (lc >= 0) & (lc < wp)
            lr = jnp.clip(lr, 0, hp - 1)
            lc = jnp.clip(lc, 0, wp - 1)
            oh = (lr == iota_hp).astype(jnp.bfloat16)  # [2TP, hp]
            rowsel = jnp.dot(
                oh, patch, preferred_element_type=jnp.float32
            )  # [2TP, wp] — each row = the probe's patch row
            px = jnp.sum(
                jnp.where(lc == iota_wp, rowsel, jnp.float32(0.0)),
                axis=1, keepdims=True,
            )  # [2TP, 1] exact uint8 values
            for t in range(trees):
                o = 2 * t * P_PAD
                okb = inb[o : o + P_PAD] & inb[o + P_PAD : o + 2 * P_PAD]
                ok = ok * okb.astype(jnp.float32)
                b = (
                    px[o : o + P_PAD] > px[o + P_PAD : o + 2 * P_PAD]
                ).astype(jnp.int32)  # [P, 1]
                idx = jnp.where(lane_t == t, 2 * idx + 1 + b, idx)

        # leaf predictions, strict left-to-right f32 sum over trees
        leaf = idx - (leaves - 1)  # [P, T]
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (P_PAD, leaves), 1)
        dr = jnp.zeros((P_PAD, 1), jnp.float32)
        dc = jnp.zeros((P_PAD, 1), jnp.float32)
        for t in range(trees):
            oh_l = leaf[:, t : t + 1] == iota_l  # [P, leaves]
            dr = dr + jnp.sum(
                jnp.where(oh_l, pr_ref[0, t][None, :], jnp.float32(0.0)),
                axis=1, keepdims=True,
            )
            dc = dc + jnp.sum(
                jnp.where(oh_l, pc_ref[0, t][None, :], jnp.float32(0.0)),
                axis=1, keepdims=True,
            )
        out_ref[0] = jnp.concatenate([dr, dc, ok, ok], axis=1)  # [P, 4]

    return kernel


@functools.lru_cache(maxsize=None)
def _stage_call(g: int, trees: int, depth: int, hp: int, wp: int,
                nrows: int, ncols: int, nodes: int, interpret: bool):
    kernel = _stage_kernel(trees, depth, hp, wp, nrows, ncols, nodes)
    leaves = 1 << depth

    def call(origins, patches, ctab, ptab_r, ptab_c, anchors):
        return pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # origins [G, 2]
                pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, trees, nodes), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, trees, leaves), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, trees, leaves), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, P_PAD, 4), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, P_PAD, 4), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((g, P_PAD, 4), jnp.float32),
            interpret=interpret,
        )(origins, patches, ctab, ptab_r, ptab_c, anchors)

    return jax.jit(call) if interpret else call


def walk_stage(origins, patches, ctab, ptab_r, ptab_c, anchors, *,
               trees, depth, nrows, ncols, interpret=False):
    """One cascade stage for G groups.

    origins [G, 2] i32 (patch row/col origin); patches [G, hp, wp] bf16;
    ctab [G, T, nodes] i32 packed codes; ptab_r/ptab_c [G, T, leaves] f32;
    anchors [G, P_PAD, 4] i32 = (ri, ci, si, col_sign*si) with pad rows
    free to hold anything in-bounds. Returns [G, P_PAD, 4] f32 =
    (dr, dc_unsigned, ok, ok)."""
    g, hp, wp = patches.shape
    nodes = ctab.shape[2]
    call = _stage_call(g, trees, depth, hp, wp, nrows, ncols, nodes,
                       interpret)
    return call(origins, patches, ctab, ptab_r, ptab_c, anchors)
