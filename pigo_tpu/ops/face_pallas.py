"""Pallas TPU kernel for the dense face cascade — the production fast path.

Architecture (the TPU-native inversion of /root/reference/core/pigo.go:113-258):

The reference walks one window at a time, 6 data-dependent pixel pairs per
tree, early-exiting per window. TPUs cannot random-access per lane, so this
kernel converts every pixel access into dense vector reads:

1. **Phase decimation.** Windows at scale s sit on a grid with stride
   k = step. The image is rearranged into k*k decimated planes
   P[a, b, u, v] = img[u*k + a, v*k + b]. A tree node's pixel offsets
   (dr, dc) = ((code*s) >> 8) are window-independent, so the node's pixel for
   EVERY window (i, j) of the grid is P[a, b, u0 + i, v0 + j] with
   (a, u0) = divmod(offset + dr, k), (b, v0) = divmod(offset + dc, k):
   one contiguous block of one plane.

2. **Chunked plane layout.** Mosaic's dynamic lane rotate only handles
   <= 256-lane vectors with shifts <= 128, so planes are stored as
   256-wide column chunks at stride 128, stacked along rows:
   ext[c*R + r, :] = planes[r, 128c : 128c + 256]. A node read becomes a
   16-row slice from an 8-aligned dynamic sublane start, a sublane roll by
   the row remainder, and a lane roll by v0 % 128 — all verified-exact
   primitives. Node scalars are packed in SMEM as
   ((chunk*R + plane_row) << 7) | (v0 % 128).

3. **Bottom-up tree evaluation.** Instead of walking root->leaf (data-
   dependent), evaluate all 2^depth-1 node comparisons densely and reduce
   leaf values upward: v[n] = bits[n] ? v[2n+1] : v[2n]: 63 compares +
   63 selects per tree for depth 6, zero gathers; bit-identical to the walk.

4. **Exact early exit.** A lax.while_loop over trees carries the strict
   left-to-right f32 running sum and a sticky per-window fail mask
   (out <= thresh[t] -> -1.0, reference core/pigo.go:139-141); the loop
   terminates as soon as every window in the 8x128 tile has failed.
   Measured on the reference cascade this skips ~94% of all tree work.

Scales whose plane layout exceeds the VMEM budget are evaluated on a finer
grid whose step divides k (extra grid points discarded), or fall back to the
exact gather kernel (ops/face_dense.py) for the large-scale tail.

Kernel geometry is bucketed (plane rows and tile counts rounded up) so many
scales share one compiled kernel; per-scale counts travel in SMEM.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pigo_tpu.cascade.format import FaceForest
from pigo_tpu.ops.windows import pyramid_scales

LANE = 128
SUBLANE = 8
# Window-tile height (16 rows x 128 lanes of grid positions per kernel
# step). The per-node scalar address work (SMEM loads, shifts, roll amounts)
# is independent of tile height, and it is the kernel's bottleneck — taller
# tiles halve it per window. Node reads become 32-row slabs (power-of-two
# sublane-tile counts; 24-row dynamic rotates miscompile on Mosaic). Measured
# 1.45x over 8-row tiles on the headline pyramid despite the coarser
# early-exit granularity.
TILE_R = 16
CHUNK = 2 * LANE  # plane chunk width (max reliable dynamic-roll vector)
# VMEM budget for one scale's chunked planes (bytes). The planes are the
# kernel's only large VMEM resident (tables live in SMEM, tiles are 8x128),
# so most of the chip's ~128MB VMEM is available; 64MB keeps headroom for
# Mosaic's own buffers and covers 1080p plane layouts at d == step.
PLANES_VMEM_BUDGET = 64 * 1024 * 1024
# Scales with few real windows are routed to a fallback engine: their tiles
# are mostly padding, yet large-scale windows survive the soft cascade
# longest (measured on the 320x400 headline pyramid: the <1024-window tail
# was ~35% of all tile-tree-steps for <1.5% of the windows; raising the
# cutoff to 2048 moves another ~18% of tile-steps — scales with only a few
# 16x128 tiles, where one surviving window stalls the whole scale — onto the
# overlapped host engine).
TAIL_MIN_WINDOWS = 6144


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class ScalePlan:
    """Static geometry + node tables for one pyramid scale."""

    scale: int
    step: int  # reference step k
    eval_step: int  # kernel evaluation step d (divides k)
    subsample: int  # k // d: real windows are every m-th grid point
    offset: int
    nr: int  # evaluation-grid rows
    nc: int  # evaluation-grid cols
    nr_real: int  # reference-grid rows (== nr when subsample == 1)
    nc_real: int
    prg: int  # plane rows per phase
    chunk_stride: int  # R = d*d*prg (plane rows before chunking)
    n_chunks: int
    n_row_tiles: int
    n_col_tiles: int
    total_rows: int  # chunked plane rows incl. tail, 1024-bucketed
    tables: np.ndarray  # int32 [T, 2^depth-1, 2] packed node reads
    fallback: bool  # True -> exact gather kernel handles this scale


@dataclasses.dataclass(frozen=True)
class DensePlan:
    rows: int
    cols: int
    scales: list[ScalePlan]
    num_windows: int  # total real windows, reference scan order
    rows_w: np.ndarray  # int32 [num_windows] real window coordinates,
    cols_w: np.ndarray  # in reference scan order (scale-major, row, col)
    scale_w: np.ndarray

    @property
    def has_fallback(self) -> bool:
        return any(sp.fallback for sp in self.scales)


def _build_scale_tables(
    forest: FaceForest, scale: int, d: int, offset: int, prg: int, r_stride: int
) -> np.ndarray:
    """Packed SMEM node tables for one scale at evaluation step d."""
    codes = forest.codes.astype(np.int64)  # [T, L, 4]
    s = int(scale)

    def pack(code_r, code_c):
        dr = (code_r * s) >> 8
        dc = (code_c * s) >> 8
        gr = offset + dr  # global image coords of the node read for window (0,0)
        gc = offset + dc
        plane_row = ((gr % d) * d + (gc % d)) * prg + gr // d
        v0 = gc // d
        s1 = (v0 >> 7) * r_stride + plane_row
        return (s1 << 7) | (v0 & 127)

    p1 = pack(codes[:, 1:, 0], codes[:, 1:, 1])
    p2 = pack(codes[:, 1:, 2], codes[:, 1:, 3])
    packed = np.stack([p1, p2], axis=-1)
    if packed.max() >= (1 << 31):
        raise ValueError("scale table packing overflow")
    return packed.astype(np.int32)  # [T, L-1, 2]


def build_dense_plan(
    forest: FaceForest,
    rows: int,
    cols: int,
    min_size: int,
    max_size: int,
    shift_factor: float,
    scale_factor: float,
) -> DensePlan:
    """Host-side planner: per-scale geometry, decimation choice, node tables."""
    plans: list[ScalePlan] = []
    rws, cws, sws = [], [], []
    s_max = 128  # |code| <= 128: node offsets reach ((+-128)*s) >> 8
    for scale in pyramid_scales(min_size, max_size, scale_factor):
        k = int(max(shift_factor * scale, 1.0))
        offset = scale // 2 + 1
        nr_real = (rows - 2 * offset) // k + 1
        nc_real = (cols - 2 * offset) // k + 1
        if nr_real <= 0 or nc_real <= 0:
            continue
        rr = np.arange(offset, rows - offset + 1, k, dtype=np.int32)
        cc = np.arange(offset, cols - offset + 1, k, dtype=np.int32)
        rws.append(np.repeat(rr, nc_real))
        cws.append(np.tile(cc, nr_real))
        sws.append(np.full(nr_real * nc_real, scale, np.int32))

        if nr_real * nc_real < TAIL_MIN_WINDOWS:
            plans.append(
                ScalePlan(
                    scale=scale, step=k, eval_step=k, subsample=1,
                    offset=offset, nr=nr_real, nc=nc_real, nr_real=nr_real,
                    nc_real=nc_real, prg=0, chunk_stride=0, n_chunks=0,
                    n_row_tiles=0, n_col_tiles=0, total_rows=0,
                    tables=np.zeros((0,), np.int32), fallback=True,
                )
            )
            continue

        # Largest divisor of k whose plane layout fits VMEM wins: it minimizes
        # the fine-grid blowup m^2 (reads may spill across plane boundaries
        # into unused rows, so planes carry no per-plane margin — only one
        # global tail margin appended by _make_planes).
        chosen = None
        for d in sorted((x for x in range(1, k + 1) if k % x == 0), reverse=True):
            m = k // d
            nr = (nr_real - 1) * m + 1
            nc = (nc_real - 1) * m + 1
            dr_max = (s_max * scale) >> 8
            nrt = _round_up(nr, TILE_R) // TILE_R
            nct = _round_up(nc, LANE) // LANE
            # Planes carry only the rows real windows read; pad-window and
            # 16-row-aligned over-reads spill into the next plane (or the
            # global tail), which is harmless since those values are unused.
            prg = (offset + dr_max) // d + nr + 1
            v0_max = (offset + dr_max) // d
            r_stride = d * d * prg
            n_chunks = (v0_max >> 7) + nct
            tail = (nrt * TILE_R - nr) + 2 * TILE_R
            # planes rows bucketed (1024, coarser when large) so many scales
            # share one compiled kernel specialization (R travels in SMEM)
            raw_rows = n_chunks * r_stride + tail
            total_rows = _round_up(raw_rows, 1024 if raw_rows <= 8192 else 4096)
            vmem = total_rows * CHUNK * 4
            if (total_rows << 7) >= (1 << 31):
                continue  # packing limit
            if vmem <= PLANES_VMEM_BUDGET:
                chosen = (d, m, nr, nc, prg, r_stride, n_chunks, nrt, nct,
                          total_rows)
                break
        if chosen is None:
            plans.append(
                ScalePlan(
                    scale=scale, step=k, eval_step=k, subsample=1, offset=offset,
                    nr=nr_real, nc=nc_real, nr_real=nr_real, nc_real=nc_real,
                    prg=0, chunk_stride=0, n_chunks=0, n_row_tiles=0,
                    n_col_tiles=0, total_rows=0,
                    tables=np.zeros((0,), np.int32), fallback=True,
                )
            )
            continue
        d, m, nr, nc, prg, r_stride, n_chunks, nrt, nct, total_rows = chosen
        plans.append(
            ScalePlan(
                scale=scale, step=k, eval_step=d, subsample=m, offset=offset,
                nr=nr, nc=nc, nr_real=nr_real, nc_real=nc_real,
                prg=prg, chunk_stride=r_stride, n_chunks=n_chunks,
                n_row_tiles=nrt, n_col_tiles=nct, total_rows=total_rows,
                tables=_build_scale_tables(forest, scale, d, offset, prg, r_stride),
                fallback=False,
            )
        )
    if rws:
        rows_w = np.concatenate(rws)
        cols_w = np.concatenate(cws)
        scale_w = np.concatenate(sws)
    else:
        rows_w = cols_w = scale_w = np.zeros(0, np.int32)
    return DensePlan(
        rows=rows, cols=cols, scales=plans, num_windows=rows_w.size,
        rows_w=rows_w, cols_w=cols_w, scale_w=scale_w,
    )


def _make_planes(img_f32: jax.Array, sp: ScalePlan) -> jax.Array:
    """[rows, cols] f32 -> chunked decimated planes [n_chunks*R, 256]."""
    d = sp.eval_step
    pc_base = sp.n_chunks * LANE + LANE  # base plane cols before chunking
    h = sp.prg * d
    w = pc_base * d
    rows = min(img_f32.shape[0], h)
    cols = min(img_f32.shape[1], w)
    padded = jnp.zeros((h, w), jnp.float32)
    padded = jax.lax.dynamic_update_slice(padded, img_f32[:rows, :cols], (0, 0))
    planes = padded.reshape(sp.prg, d, pc_base, d).transpose(1, 3, 0, 2)
    planes = planes.reshape(sp.chunk_stride, pc_base)
    chunks = [
        planes[:, c * LANE : c * LANE + CHUNK] for c in range(sp.n_chunks)
    ]
    chunks.append(
        jnp.zeros(
            (sp.total_rows - sp.n_chunks * sp.chunk_stride, CHUNK), jnp.float32
        )
    )
    return jnp.concatenate(chunks, axis=0)  # [total_rows (1024-bucketed), 256]


@functools.lru_cache(maxsize=None)
def _kernel_body(t_num: int, depth: int, thresh_last: float):
    """Shared kernel builder; bucketed geometry => few distinct compilations.

    SMEM inputs: meta [3] = (nr, nc, chunk_stride R); tables
    [T*(2^depth-1)*2] packed nodes; preds [T*2^depth]; thresh [T].
    VMEM: planes [n_chunks*R + tail (1024-bucketed), 256].

    The while_loop body evaluates CHUNK_TREES trees per iteration (largest of
    4/2/1 dividing t_num): the loop-condition min-reduction over the fail
    mask costs more than the <=3 extra trees a tile may overshoot, and the
    overshoot cannot change results (the fail mask is sticky and the f32
    running sum is only read at the recorded exit state).
    """
    chunk_trees = 4 if t_num % 4 == 0 else (2 if t_num % 2 == 0 else 1)

    def kernel(meta_ref, tables_ref, preds_ref, thresh_ref, planes_ref, q_ref):
        tr = pl.program_id(0)
        ct = pl.program_id(1)
        row0 = tr * TILE_R + ct * meta_ref[2]
        nr = meta_ref[0]
        nc = meta_ref[1]

        lane_ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, LANE), 1)
        row_ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, LANE), 0)
        # fail mask carried as f32 (Mosaic can't carry i1 vectors in loops)
        pad_mask = (
            ((lane_ix + ct * LANE) >= nc) | ((row_ix + tr * TILE_R) >= nr)
        ).astype(jnp.float32)

        def read(packed):
            row = (packed >> 7) + row0
            vrem = packed & 127
            # Mosaic requires 8-aligned dynamic sublane starts: read 2*TILE_R
            # rows from the aligned base, then roll the remainder away.
            ra = pl.multiple_of((row >> 3) * SUBLANE, SUBLANE)
            wide = planes_ref[pl.ds(ra, 2 * TILE_R), :]
            # slice the rows away before the lane roll (halves its width)
            wide = pltpu.roll(wide, -(row & (SUBLANE - 1)), 0)[:TILE_R, :]
            return pltpu.roll(wide, -vrem, 1)[:, :LANE]

        nleaf = 2 ** depth

        def one_tree(t, out, fail):
            base = t * (nleaf - 1)
            bits = []
            for n in range(1, nleaf):
                p1 = tables_ref[(base + n - 1) * 2]
                p2 = tables_ref[(base + n - 1) * 2 + 1]
                bits.append(read(p1) <= read(p2))
            # Bottom-up leaf-value reduction (bit-identical to the walk).
            half = nleaf // 2
            vals = [
                jnp.where(
                    bits[half + m - 1],
                    preds_ref[t * nleaf + 2 * m + 1],
                    preds_ref[t * nleaf + 2 * m],
                )
                for m in range(half)
            ]
            for lvl in range(depth - 2, -1, -1):
                lo = 2 ** lvl
                vals = [
                    jnp.where(bits[lo + m - 1], vals[2 * m + 1], vals[2 * m])
                    for m in range(lo)
                ]
            out = out + vals[0]
            fail = jnp.maximum(fail, (out <= thresh_ref[t]).astype(jnp.float32))
            return out, fail

        def tree_step(carry):
            t, out, fail = carry
            for j in range(chunk_trees):
                out, fail = one_tree(t + j, out, fail)
            return t + chunk_trees, out, fail

        def cond(carry):
            t, _, fail = carry
            return (t < t_num) & (jnp.min(fail) < 1.0)

        out0 = jnp.zeros((TILE_R, LANE), jnp.float32)
        _, out, fail = jax.lax.while_loop(
            cond, tree_step, (jnp.int32(0), out0, pad_mask)
        )
        q_ref[:] = jnp.where(
            fail > 0.0, jnp.float32(-1.0), out - jnp.float32(thresh_last)
        )

    return kernel


def scale_scores(
    img_f32: jax.Array,
    sp: ScalePlan,
    forest: FaceForest,
    tables: jax.Array,  # int32 [T*(2^depth-1)*2] (flattened sp.tables)
    preds: jax.Array,  # f32 [T*2^depth]
    thresh: jax.Array,  # f32 [T]
    interpret: bool = False,
) -> jax.Array:
    """Dense scores [nr_real, nc_real] for one scale."""
    planes = _make_planes(img_f32, sp)
    kernel = _kernel_body(
        forest.num_trees,
        forest.depth,
        float(forest.thresh[forest.num_trees - 1]),
    )
    meta = jnp.asarray([sp.nr, sp.nc, sp.chunk_stride], jnp.int32)
    q = pl.pallas_call(
        kernel,
        grid=(sp.n_row_tiles, sp.n_col_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_R, LANE), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (sp.n_row_tiles * TILE_R, sp.n_col_tiles * LANE), jnp.float32
        ),
        interpret=interpret,
    )(meta, tables, preds, thresh, planes)
    q = q[: sp.nr, : sp.nc]
    if sp.subsample > 1:
        q = q[:: sp.subsample, :: sp.subsample]
    return q


def pyramid_scores(
    img_u8: jax.Array,  # uint8/any [rows, cols]
    plan: DensePlan,
    forest: FaceForest,
    tables: dict[int, jax.Array],  # per-scale flattened tables
    preds: jax.Array,
    thresh: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Scores for every real non-fallback pyramid window, in plan order.

    Fallback scales (if any) are NOT included — the caller routes them
    through the exact gather kernel (see models/face.py)."""
    img_f32 = img_u8.astype(jnp.float32)
    parts = []
    for sp in plan.scales:
        if sp.fallback:
            continue
        q = scale_scores(
            img_f32, sp, forest, tables[sp.scale], preds, thresh, interpret
        )
        parts.append(q.reshape(-1))
    if not parts:
        return jnp.zeros((0,), jnp.float32)
    return jnp.concatenate(parts)
