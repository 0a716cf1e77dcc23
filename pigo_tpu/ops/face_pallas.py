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
import os

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


def _tail_cutoff() -> int:
    """Host-tail routing cutoff in windows (PIGO_TPU_TAIL_MIN_WINDOWS
    overrides TAIL_MIN_WINDOWS). Plans cache per FaceCascade instance, so a
    changed env value takes effect on new instances / uncached plans."""
    env = os.environ.get("PIGO_TPU_TAIL_MIN_WINDOWS")
    return int(env) if env else TAIL_MIN_WINDOWS


# Cost-balanced host share (host-tail mode only, prefix=False): beyond the
# per-launch TAIL_MIN_WINDOWS floor, keep routing the SMALLEST remaining
# scales to the host engine while the cumulative host share of the plan's
# windows stays under this fraction. Why a fraction and not a bigger
# cutoff: a fixed window-count cutoff cannot serve both workload shapes —
# 32768 is the measured 1080p optimum (71.8 -> 56.3 ms, ~20% host share)
# but routes 100% of the 320x400 headline pyramid to the host. The AVX-512
# host engine (~65 ns/window) runs UNDER the in-flight device compute, so
# the balance point is where the host's share of windows costs about as
# much wall time as the device's share; measured minimum at 30% on both
# pyramid shapes (swept 12.5/20/25/30/35/45%, docs/PERFORMANCE.md round 5:
# headline 10.16/9.58/9.05/8.57/11.39/9.33 ms, 1080p
# 57.7/50.9/46.2/44.8/48.2/48.9 ms).
HOST_SHARE_TARGET = 0.3


def _host_share_target() -> float:
    env = os.environ.get("PIGO_TPU_HOST_SHARE")
    return float(env) if env else HOST_SHARE_TARGET
# Device tree cap for DENSE (non-tail) scales: 0 = off, K > 0 caps every
# dense scale's soft-cascade walk at K trees. A window failing within K
# trees is exactly the reference's -1 (the soft-cascade exit is monotone:
# once the running sum drops below a tree's threshold the walk is over,
# core/pigo.go:139-141), so capping only AFFECTS survivors — they get
# PREFIX_MARK and are finished exactly by the on-device gather classifier
# (models/face._resolve_consts) or the host backstop. Why: the dense
# kernel pays the MAX tree-death over each 16x128-window tile, and rare
# long-surviving windows (the 1080p early-exit floor, docs/PERFORMANCE.md)
# drag whole tiles through hundreds of trees for work the resolver does in
# ~0.65 us/window. Rounded up to a multiple of 4 (the kernel evaluates
# 4-tree chunks; an unaligned cap would read past the trimmed tables).
TREE_CAP = 0


def _dense_tree_cap() -> int:
    """Dense-scale device tree cap (PIGO_TPU_TREE_CAP overrides TREE_CAP).
    Resolved at plan-build time; plans cache per FaceCascade instance."""
    env = os.environ.get("PIGO_TPU_TREE_CAP")
    cap = int(env) if env is not None else TREE_CAP
    return _round_up(cap, 4) if cap > 0 else 0


# Tree-prefix mode for sparse tail scales: the device evaluates only the
# first PREFIX_TREES trees densely (a fixed, small number of tile steps —
# no straggler stall), marks the few surviving windows with PREFIX_MARK in
# the score output, and the host finishes ONLY those windows exactly
# (measured on the headline pyramid: 26.4k tail windows -> 406 survivors
# after 32 trees). This keeps >99% of all windows' outcomes fully
# device-decided without the one-window-stalls-a-scale pathology that made
# whole tail scales host-routed in round 1.
PREFIX_TREES = 32
PREFIX_MARK = 1e30
# Scales below this window count stay on the host tail engine even in
# prefix mode: their per-kernel launch + planes cost exceeds the host's
# cost for a few hundred windows. 0 = prefix everything.
PREFIX_MIN_WINDOWS = 0
# Prefix scales must also have a COMPACT plane layout: at large scales the
# k*k decimation blows up (few windows, huge stride), so planes above this
# budget route the scale to the host wholesale instead (it has only a
# handful of windows there anyway).
PREFIX_VMEM_BUDGET = 8 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _use_mxu_read() -> bool:
    """Sub-align node reads with a one-hot [TILE_R, 2*TILE_R] matmul on the
    otherwise-idle MXU instead of a dynamic sublane roll (the kernel is
    vector-issue bound; the roll is its widest vector op). Exact: the
    one-hot has a single unit term per output row and the f32 matmul of
    unit weights reproduces the plane values bit-for-bit.
    PIGO_TPU_MXU_READ=0/1 overrides. Default ON for real accelerators —
    measured on v5e (round-5 sweep, 64-frame streamed means): headline
    10.22 -> 9.69 ms/frame, 1080p worst-case 76.3 -> 71.6 ms, rotated 45
    deg 18.1 -> 17.5 ms, all bit-exact. CPU (the interpret-mode test
    backend) keeps the roll formulation: dense one-hot matmuls are much
    slower than rolls there."""
    env = os.environ.get("PIGO_TPU_MXU_READ")
    if env is not None:
        return env != "0"
    from pigo_tpu.utils.platform import backend_platform

    return backend_platform() != "cpu"


def _read_builder(planes_ref, row0, mxu_read):
    """The packed-node read shared by the dense and fused-prefix kernels:
    SMEM word -> [TILE_R, LANE] window values (docstring at module top)."""

    def read(packed):
        row = (packed >> 7) + row0
        vrem = packed & 127
        srem = row & (SUBLANE - 1)
        # Mosaic requires 8-aligned dynamic sublane starts: read 2*TILE_R
        # rows from the aligned base, then remove the remainder.
        ra = pl.multiple_of((row >> 3) * SUBLANE, SUBLANE)
        wide = planes_ref[pl.ds(ra, 2 * TILE_R), :]
        if mxu_read:
            # one-hot row selection on the MXU: out[i, :] = wide[srem+i, :]
            d = (
                jax.lax.broadcasted_iota(jnp.int32, (TILE_R, 2 * TILE_R), 1)
                - jax.lax.broadcasted_iota(jnp.int32, (TILE_R, 2 * TILE_R), 0)
            )
            rsel = (d == srem).astype(jnp.float32)
            aligned = jax.lax.dot_general(
                rsel, wide, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            # slice the rows away before the lane roll (halves its width)
            aligned = pltpu.roll(wide, -srem, 0)[:TILE_R, :]
        return pltpu.roll(aligned, -vrem, 1)[:, :LANE]

    return read


@dataclasses.dataclass(frozen=True)
class ScalePlan:
    """Static geometry + node tables for one pyramid scale.

    For rotated plans (angle_idx > 0) the planes are built from a
    CLAMP-EXTENDED virtual image: the reference's rotated read
    (core/pigo.go:167-171) is exactly
    `img[clip(r+dr, 0, nrows-1), clip(c+dc, 0, nrows-1)]`
    (max-before-shift == the lower clip, min(nrows-1, .) == the upper clip
    on BOTH axes — the column quirk), i.e. a read of an edge-replicated
    image at the UNCLAMPED coordinate. Building the planes from that
    extension (`ext_*` fields) makes every node read window-independent
    over the FULL reference grid, so rotated scales run entirely on the
    device with no host border-band scan. `r0`/`c0` remain the grid
    origin; the packed tables live in the shifted frame (+ext_mr/+ext_mc)."""

    scale: int
    step: int  # reference step k
    eval_step: int  # kernel evaluation step d (divides k)
    subsample: int  # k // d: real windows are every m-th grid point
    offset: int
    nr: int  # evaluation-grid rows
    nc: int  # evaluation-grid cols
    nr_real: int  # interior reference-grid rows (== nr when subsample == 1)
    nc_real: int
    prg: int  # plane rows per phase
    chunk_stride: int  # R = d*d*prg (plane rows before chunking)
    n_chunks: int
    n_row_tiles: int
    n_col_tiles: int
    total_rows: int  # chunked plane rows incl. tail, 1024-bucketed
    tables: np.ndarray  # int32 [T, 2^depth-1, 2] packed node reads
    fallback: bool  # True -> tail engine handles the whole scale
    r0: int = 0  # interior origin (reference-grid window center)
    c0: int = 0
    col_groups: int = 1  # 128-lane window-column groups per kernel tile
    prefix_trees: int = 0  # >0: evaluate only this many trees on device
    # >0: dense-scale device tree cap (module docstring at TREE_CAP);
    # distinct from prefix_trees so capped scales keep their own per-scale
    # kernel call instead of joining the fused tail-prefix groups
    tree_cap: int = 0
    plane_cols: int = 0  # pcb: plane columns per column phase
    i_lo: int = 0  # interior origin as full-grid indices
    j_lo: int = 0
    nr_full: int = 0  # full reference-grid extent (row/col window counts)
    nc_full: int = 0
    # clamp-extension geometry (rotated scales; 0 = planes from the raw
    # image): the planes read a virtual image V[r, c] =
    # img[clip(r - ext_mr, 0, nrows-1), clip(c - ext_mc, 0, nrows-1)]
    # of shape [ext_rows, ext_cols]
    ext_mr: int = 0
    ext_mc: int = 0
    ext_rows: int = 0
    ext_cols: int = 0

    @property
    def has_border(self) -> bool:
        """True when the host must scan border windows of this scale."""
        return (not self.fallback) and (
            self.nr_real != self.nr_full or self.nc_real != self.nc_full
        )


@dataclasses.dataclass(frozen=True)
class DensePlan:
    rows: int
    cols: int
    scales: list[ScalePlan]
    num_windows: int  # total real windows, reference scan order
    rows_w: np.ndarray  # int32 [num_windows] real window coordinates,
    cols_w: np.ndarray  # in reference scan order (scale-major, row, col)
    scale_w: np.ndarray
    angle_idx: int = 0  # quantized rotation index int(32*angle); 0 = upright

    @property
    def has_fallback(self) -> bool:
        return any(sp.fallback or sp.has_border for sp in self.scales)

    @property
    def border_bands(self) -> np.ndarray:
        """int32 [B, 5] rows (scale, r_lo, r_hi, c_lo, c_hi): per dense
        scale with a border, the INTERIOR window-center rectangle
        (inclusive) the device already covers — the host band scan runs the
        scale's full reference grid EXCLUDING this rectangle."""
        rows = [
            (sp.scale, sp.r0, sp.r0 + (sp.nr_real - 1) * sp.step,
             sp.c0, sp.c0 + (sp.nc_real - 1) * sp.step)
            for sp in self.scales
            if sp.has_border
        ]
        return np.asarray(rows, np.int32).reshape(-1, 5)


# Quantized 256-scaled rotation tables (reference core/pigo.go:156-157),
# duplicated from oracle/face.py by design: the golden fixtures
# (tests/golden/) catch a correlated edit.
QCOS_TABLE = np.array(
    [256, 251, 236, 212, 181, 142, 97, 49, 0, -49, -97, -142, -181, -212,
     -236, -251, -256, -251, -236, -212, -181, -142, -97, -49, 0, 49, 97,
     142, 181, 212, 236, 251, 256], dtype=np.int64)
QSIN_TABLE = np.array(
    [0, 49, 97, 142, 181, 212, 236, 251, 256, 251, 236, 212, 181, 142, 97,
     49, 0, -49, -97, -142, -181, -212, -236, -251, -256, -251, -236, -212,
     -181, -142, -97, -49, 0], dtype=np.int64)


def _node_offsets(forest: FaceForest, scale: int, angle_idx: int):
    """Per-node integer pixel offsets ((dr1, dc1), (dr2, dc2)), each
    [T, L-1]. Upright: (code*s) >> 8 (core/pigo.go:119-135). Rotated:
    (qcos*code_r -/+ qsin*code_c) >> 16 with the quantized tables
    (core/pigo.go:156-171) — exact because (r*65536 + num) >> 16
    == r + (num >> 16) for the arithmetic shift, so the offset is
    window-independent wherever the clamps cannot trigger."""
    codes = forest.codes.astype(np.int64)  # [T, L, 4]
    s = int(scale)
    if angle_idx == 0:
        return (
            ((codes[:, 1:, 0] * s) >> 8, (codes[:, 1:, 1] * s) >> 8),
            ((codes[:, 1:, 2] * s) >> 8, (codes[:, 1:, 3] * s) >> 8),
        )
    qs = s * int(QSIN_TABLE[angle_idx])
    qc = s * int(QCOS_TABLE[angle_idx])
    return (
        ((qc * codes[:, 1:, 0] - qs * codes[:, 1:, 1]) >> 16,
         (qs * codes[:, 1:, 0] + qc * codes[:, 1:, 1]) >> 16),
        ((qc * codes[:, 1:, 2] - qs * codes[:, 1:, 3]) >> 16,
         (qs * codes[:, 1:, 2] + qc * codes[:, 1:, 3]) >> 16),
    )


def _build_scale_tables(
    forest: FaceForest, scale: int, d: int, r0: int, c0: int, prg: int,
    pcb: int, r_stride: int, angle_idx: int = 0,
) -> np.ndarray:
    """Packed SMEM node tables for one scale at evaluation step d, window
    grid origin (r0, c0)."""

    (dr1, dc1), (dr2, dc2) = _node_offsets(forest, scale, angle_idx)

    def pack(dr, dc):
        gr = r0 + dr  # global image coords of the node read for window (0,0)
        gc = c0 + dc
        # Split layout: row phases stack on plane ROWS, column phases on
        # plane COLUMNS — so _make_planes can build the planes as a cheap
        # block transpose (rows) + one exact bf16 one-hot matmul on the MXU
        # (columns) instead of lane-granularity shuffles.
        plane_row = (gr % d) * prg + gr // d
        v0 = (gc % d) * pcb + gc // d
        s1 = (v0 >> 7) * r_stride + plane_row
        return (s1 << 7) | (v0 & 127)

    packed = np.stack([pack(dr1, dc1), pack(dr2, dc2)], axis=-1)
    if packed.max() >= (1 << 31) or packed.min() < 0:
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
    angle_idx: int = 0,
    prefix: bool = True,
    tree_cap: int | None = None,
) -> DensePlan:
    """Host-side planner: per-scale geometry, decimation choice, node tables.

    angle_idx > 0 plans the rotated cascade (core/pigo.go:150-191): the
    dense kernel covers each scale's interior window rectangle — where the
    quantized-rotation clamps can never trigger, so node reads stay
    window-independent — and the border band routes to the host tail scan.

    prefix=True (default) keeps sparse tail scales on the device in
    tree-prefix mode (PREFIX_TREES trees densely, survivors escalated to
    the host via PREFIX_MARK); prefix=False routes them to the host tail
    engine wholesale — used by the device-resident frame pipeline, whose
    on-device clustering cannot escalate marked windows.

    tree_cap (None = the TREE_CAP / PIGO_TPU_TREE_CAP default) caps every
    DENSE scale's device walk at that many trees; survivors escalate via
    PREFIX_MARK exactly like tail-prefix survivors. Callers that cannot
    escalate marks (the device-resident pipeline, the sharded band path)
    must pass tree_cap=0 explicitly.
    """
    cap = _dense_tree_cap() if tree_cap is None else (
        _round_up(tree_cap, 4) if tree_cap > 0 else 0
    )
    if cap >= forest.num_trees:
        cap = 0
    # Host-routing pre-pass: every scale below the per-launch floor goes to
    # the host; in host-tail mode (prefix=False) the cost-balance budget
    # then promotes the smallest remaining scales until the host share
    # reaches HOST_SHARE_TARGET (break at the first scale that would
    # overshoot — host work must stay the cheap-window end of the pyramid).
    geo = []
    for scale in pyramid_scales(min_size, max_size, scale_factor):
        k = int(max(shift_factor * scale, 1.0))
        offset = scale // 2 + 1
        nr_full = (rows - 2 * offset) // k + 1
        nc_full = (cols - 2 * offset) // k + 1
        if nr_full > 0 and nc_full > 0:
            geo.append((scale, nr_full * nc_full))
    cutoff = _tail_cutoff()
    host_scales = {s for s, w in geo if w < cutoff}
    total_w = sum(w for _, w in geo)
    if not prefix and total_w:
        share = _host_share_target()
        cum = sum(w for s, w in geo if s in host_scales)
        for s, w in sorted(
            (g for g in geo if g[0] not in host_scales),
            key=lambda g: (g[1], g[0]),
        ):
            if (cum + w) / total_w > share:
                break
            host_scales.add(s)
            cum += w
    plans: list[ScalePlan] = []
    rws, cws, sws = [], [], []
    s_max = 128  # |code| <= 128: node offsets reach ((+-128)*s) >> 8
    for scale in pyramid_scales(min_size, max_size, scale_factor):
        k = int(max(shift_factor * scale, 1.0))
        offset = scale // 2 + 1
        nr_full = (rows - 2 * offset) // k + 1
        nc_full = (cols - 2 * offset) // k + 1
        if nr_full <= 0 or nc_full <= 0:
            continue
        rr = np.arange(offset, rows - offset + 1, k, dtype=np.int32)
        cc = np.arange(offset, cols - offset + 1, k, dtype=np.int32)
        rws.append(np.repeat(rr, nc_full))
        cws.append(np.tile(cc, nr_full))
        sws.append(np.full(nr_full * nc_full, scale, np.int32))

        def fallback_plan():
            return ScalePlan(
                scale=scale, step=k, eval_step=k, subsample=1,
                offset=offset, nr=nr_full, nc=nc_full, nr_real=nr_full,
                nc_real=nc_full, prg=0, chunk_stride=0, n_chunks=0,
                n_row_tiles=0, n_col_tiles=0, total_rows=0,
                tables=np.zeros((0,), np.int32), fallback=True,
                r0=offset, c0=offset, i_lo=0, j_lo=0,
                nr_full=nr_full, nc_full=nc_full,
            )

        i_lo = j_lo = 0
        nr_int, nc_int = nr_full, nc_full
        r0 = c0 = offset
        if angle_idx == 0:
            # upright reads never clamp: the raw image serves the planes
            dr_hi = dc_hi = (s_max * scale) >> 8  # conservative reach
            ext_mr = ext_mc = ext_rows = ext_cols = 0
        else:
            (dr1, dc1), (dr2, dc2) = _node_offsets(forest, scale, angle_idx)
            dr_lo = int(min(dr1.min(), dr2.min()))
            dr_hi = int(max(dr1.max(), dr2.max()))
            dc_lo = int(min(dc1.min(), dc2.min()))
            dc_hi = int(max(dc1.max(), dc2.max()))
            # Clamp-extension (class docstring): planes read the
            # edge-replicated virtual image, so the FULL grid is interior.
            # Margins cover the extreme reads of the extreme real windows.
            ext_mr = max(0, -(offset + dr_lo))
            ext_mc = max(0, -(offset + dc_lo))
            ext_rows = (ext_mr + offset + (nr_full - 1) * k + dr_hi + 1)
            ext_cols = (ext_mc + offset + (nc_full - 1) * k + dc_hi + 1)
        # table-packing origin lives in the extended (shifted) frame
        r0p = r0 + ext_mr
        c0p = c0 + ext_mc

        sparse_tail = scale in host_scales
        if sparse_tail and (
            not prefix or nr_int * nc_int < PREFIX_MIN_WINDOWS
        ):
            plans.append(fallback_plan())
            continue

        # Largest divisor of k whose plane layout fits VMEM wins: it minimizes
        # the fine-grid blowup m^2 (reads may spill across plane boundaries
        # into unused rows, so planes carry no per-plane margin — only one
        # global tail margin appended by _make_planes).
        chosen = None
        for d in sorted((x for x in range(1, k + 1) if k % x == 0), reverse=True):
            m = k // d
            nr = (nr_int - 1) * m + 1
            nc = (nc_int - 1) * m + 1
            nrt = _round_up(nr, TILE_R) // TILE_R
            # Column groups widen tiles by reading chunk +g at identical
            # roll amounts (shared scalar addressing). Measured on v5e the
            # kernel is vector-issue bound, not scalar bound, so cg=2 LOSES
            # (~10% on the 1080p pyramid) — keep single-group tiles; the
            # machinery stays for hardware where the scalar unit dominates.
            cg = 1
            nct = _round_up(nc, cg * LANE) // (cg * LANE)
            # Planes carry only the rows real windows read; pad-window and
            # 16-row-aligned over-reads spill into the next plane (or the
            # global tail), which is harmless since those values are unused.
            prg = (r0p + dr_hi) // d + nr + 1
            # chunk stride (d*prg in the split layout) must be 8-aligned so
            # the +g*R group reads keep Mosaic's 8-aligned sublane starts
            while (d * prg) % SUBLANE:
                prg += 1
            # plane columns per column phase; reads for real windows stay
            # inside one phase block (margin mirrors prg)
            pcb = (c0p + dc_hi) // d + nc + 1
            v0_max = (d - 1) * pcb + (c0p + dc_hi) // d
            r_stride = d * prg
            n_chunks = (v0_max >> 7) + cg * nct
            tail = (nrt * TILE_R - nr) + 2 * TILE_R
            # planes rows bucketed (1024, coarser when large) so many scales
            # share one compiled kernel specialization (R travels in SMEM)
            raw_rows = n_chunks * r_stride + tail
            total_rows = _round_up(raw_rows, 1024 if raw_rows <= 8192 else 4096)
            vmem = total_rows * CHUNK * 4
            if (total_rows << 7) >= (1 << 31):
                continue  # packing limit
            budget = PREFIX_VMEM_BUDGET if sparse_tail else PLANES_VMEM_BUDGET
            if vmem <= budget:
                chosen = (d, m, nr, nc, prg, pcb, r_stride, n_chunks, nrt,
                          nct, total_rows, cg)
                break
        if chosen is None:
            plans.append(fallback_plan())
            continue
        (d, m, nr, nc, prg, pcb, r_stride, n_chunks, nrt, nct, total_rows,
         cg) = chosen
        plans.append(
            ScalePlan(
                scale=scale, step=k, eval_step=d, subsample=m, offset=offset,
                nr=nr, nc=nc, nr_real=nr_int, nc_real=nc_int,
                prg=prg, chunk_stride=r_stride, n_chunks=n_chunks,
                n_row_tiles=nrt, n_col_tiles=nct, total_rows=total_rows,
                tables=_build_scale_tables(forest, scale, d, r0p, c0p, prg,
                                           pcb, r_stride, angle_idx),
                fallback=False, r0=r0, c0=c0, i_lo=i_lo, j_lo=j_lo,
                nr_full=nr_full, nc_full=nc_full, col_groups=cg,
                prefix_trees=PREFIX_TREES if sparse_tail else 0,
                tree_cap=0 if sparse_tail else cap,
                plane_cols=pcb, ext_mr=ext_mr, ext_mc=ext_mc,
                ext_rows=ext_rows, ext_cols=ext_cols,
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
        rows_w=rows_w, cols_w=cols_w, scale_w=scale_w, angle_idx=angle_idx,
    )


@functools.lru_cache(maxsize=None)
def _col_perm(d: int, pcb: int, cols: int, width: int) -> np.ndarray:
    """Source image column for each plane column o = b*pcb + v (reads
    img[:, v*d + b]); -1 for padding columns (o >= d*pcb or source >= cols)."""
    o = np.arange(width, dtype=np.int64)
    b, v = o // pcb, o % pcb
    src = v * d + b
    src[(o >= d * pcb) | (src >= cols)] = -1
    return src.astype(np.int32)


def _make_planes(img_f32: jax.Array, sp: ScalePlan) -> jax.Array:
    """[rows, cols] f32 -> chunked decimated planes [n_chunks*R, 256].

    Split layout (see _build_scale_tables.pack): ROW phases via a cheap
    lane-contiguous block transpose, COLUMN phases via one one-hot matmul
    on the MXU — exact in bf16 (pixels are integers <= 255, the one-hot
    has a single unit term per output) and ~10x cheaper than the
    lane-granularity k*k shuffle it replaces.

    Rotated scales (sp.ext_rows > 0) read the clamp-extended virtual image
    V[r, c] = img[clip(r - ext_mr, 0, nrows-1), clip(c - ext_mc, 0, nrows-1)]
    — BOTH axes clip with nrows-1, the reference's column-clamp quirk
    (core/pigo.go:167-171) — which bakes every possible clamp into the
    plane values so the kernels' window-independent reads stay bit-exact
    over the full reference grid (ScalePlan docstring)."""
    if sp.ext_rows:
        nrows, ncols = img_f32.shape
        hi = nrows - 1  # nrows-1 clamps BOTH axes (quirk)
        ri = jnp.clip(jnp.arange(sp.ext_rows) - sp.ext_mr, 0, hi)
        ci = jnp.clip(jnp.arange(sp.ext_cols) - sp.ext_mc, 0, hi)
        # FLAT index like the reference (r*dim + c): on tall frames a
        # clamped column in (ncols-1, nrows-1] wraps into the next pixel
        # row — faithful here; the final clip only guards the absurd
        # aspect ratios (nrows >~ offset*ncols) where the reference would
        # read past its buffer.
        flat = ri[:, None] * ncols + ci[None, :]
        img_f32 = img_f32.reshape(-1)[jnp.clip(flat, 0, nrows * ncols - 1)]
    d = sp.eval_step
    prg = sp.prg
    h = prg * d
    rows = min(img_f32.shape[0], h)
    cols = img_f32.shape[1]
    padded = jnp.zeros((h, cols), jnp.float32)
    padded = jax.lax.dynamic_update_slice(padded, img_f32[:rows, :], (0, 0))
    # row decimation: [prg, d, C] -> [d, prg, C] (last dim contiguous)
    rowdec = padded.reshape(prg, d, cols).transpose(1, 0, 2)
    rowdec = rowdec.reshape(d * prg, cols)
    # column decimation as a permutation matmul on the MXU
    width = sp.n_chunks * LANE + LANE  # covers every chunk's 256-col read
    perm = jnp.asarray(_col_perm(d, sp.plane_cols, cols, width))
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (cols, width), 0) == perm[None, :]
    ).astype(jnp.bfloat16)
    planes = jnp.dot(rowdec.astype(jnp.bfloat16), onehot,
                     preferred_element_type=jnp.float32)
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
def _kernel_body(t_num: int, depth: int, thresh_last: float,
                 col_groups: int = 1, mxu_read: bool = False):
    """Shared kernel builder; bucketed geometry => few distinct compilations.

    SMEM inputs: meta [7] = (nr, nc, chunk_stride R, row-tile offset,
    last real row-tile index, tree limit, last real col-tile index);
    tables [T*(2^depth-1)*2] packed nodes; preds [T*2^depth]; thresh [T].
    A tree limit below the forest size selects prefix mode: windows still
    alive after `limit` trees get PREFIX_MARK instead of a final score
    (the host finishes them). Grid dims are BUCKETED so many scales share
    one compiled kernel: pad grid positions clamp onto the last real tile
    (keeping reads in-bounds) and start fully-failed, so they cost one
    loop-condition check and their output rows/cols are sliced away.
    VMEM: planes [n_chunks*R + tail (1024-bucketed), 256].

    The row-tile offset shards the window grid: a device evaluating the
    row-tile band [off, off+grid_rows) passes meta[3]=off; grid position tr
    maps to global row tile min(tr+off, meta[4]) (the clamp keeps pad tiles
    past the real grid reading in-bounds plane rows — their outputs are
    either masked by the pad mask or sliced away by the caller).

    The while_loop body evaluates CHUNK_TREES trees per iteration (largest of
    4/2/1 dividing t_num): the loop-condition min-reduction over the fail
    mask costs more than the <=3 extra trees a tile may overshoot, and the
    overshoot cannot change results (the fail mask is sticky and the f32
    running sum is only read at the recorded exit state).
    """
    chunk_trees = 4 if t_num % 4 == 0 else (2 if t_num % 2 == 0 else 1)

    cgl = col_groups * LANE  # tile width in window columns

    def kernel(meta_ref, tables_ref, preds_ref, thresh_ref, planes_ref, q_ref):
        is_pad = (
            (pl.program_id(0) + meta_ref[3] > meta_ref[4])
            | (pl.program_id(1) > meta_ref[6])
        )
        tr = jnp.minimum(pl.program_id(0) + meta_ref[3], meta_ref[4])
        ct = jnp.minimum(pl.program_id(1), meta_ref[6])
        row0 = tr * TILE_R + ct * (col_groups * meta_ref[2])
        nr = meta_ref[0]
        nc = meta_ref[1]

        lane_ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, cgl), 1)
        row_ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, cgl), 0)
        # fail mask carried as f32 (Mosaic can't carry i1 vectors in loops);
        # pad tiles start fully failed -> the while loop never runs
        pad_mask = (
            ((lane_ix + ct * cgl) >= nc) | ((row_ix + tr * TILE_R) >= nr)
            | is_pad
        ).astype(jnp.float32)

        read1 = _read_builder(planes_ref, row0, mxu_read)

        def read(packed):
            # Column group g serves window columns [g*128, g*128+128) of the
            # tile: same plane column remainder, chunk shifted by g — so the
            # scalar address/roll-amount work is shared across groups and
            # only the (vector) loads and rolls replicate.
            if col_groups == 1:
                return read1(packed)
            row = (packed >> 7) + row0
            vrem = packed & 127
            srem = row & (SUBLANE - 1)
            # Mosaic requires 8-aligned dynamic sublane starts: read 2*TILE_R
            # rows from the aligned base, then roll the remainder away.
            # chunk_stride is 8-aligned by the planner, so +g*R stays aligned.
            ra = pl.multiple_of((row >> 3) * SUBLANE, SUBLANE)
            parts = []
            for g in range(col_groups):
                # chunk_stride is 8-aligned by the planner; assert it to
                # Mosaic (it cannot prove alignment through the SMEM load)
                rag = pl.multiple_of(ra + g * meta_ref[2], SUBLANE)
                wide = planes_ref[pl.ds(rag, 2 * TILE_R), :]
                # slice the rows away before the lane roll (halves its width)
                wide = pltpu.roll(wide, -srem, 0)[:TILE_R, :]
                parts.append(pltpu.roll(wide, -vrem, 1)[:, :LANE])
            return jnp.concatenate(parts, axis=1)

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

        limit = meta_ref[5]

        def cond(carry):
            t, _, fail = carry
            return (t < limit) & (jnp.min(fail) < 1.0)

        out0 = jnp.zeros((TILE_R, cgl), jnp.float32)
        _, out, fail = jax.lax.while_loop(
            cond, tree_step, (jnp.int32(0), out0, pad_mask)
        )
        final = jnp.where(
            limit < t_num,  # prefix mode: survivors escalate to the host
            jnp.float32(PREFIX_MARK),
            out - jnp.float32(thresh_last),
        )
        q_ref[:] = jnp.where(fail > 0.0, jnp.float32(-1.0), final)

    return kernel


def scale_scores(
    img_f32: jax.Array,
    sp: ScalePlan,
    forest: FaceForest,
    tables: jax.Array,  # int32 [T*(2^depth-1)*2] (flattened sp.tables)
    preds: jax.Array,  # f32 [T*2^depth]
    thresh: jax.Array,  # f32 [T]
    interpret: bool = False,
    tile_off: jax.Array | int = 0,
    n_row_tiles: int | None = None,
) -> jax.Array:
    """Dense scores for one scale.

    Default: the full eval grid, returned as [nr_real, nc_real] (subsampled
    to the reference grid). With `tile_off`/`n_row_tiles` a caller (the
    window-sharded multi-chip path) evaluates only the row-tile band
    [tile_off, tile_off + n_row_tiles) and receives the RAW padded block
    [n_row_tiles*TILE_R, n_col_tiles*LANE] — slicing/subsampling is then
    the caller's job (tile_off may be a traced per-device value)."""
    planes = _make_planes(img_f32, sp)
    banded = n_row_tiles is not None
    # Grid dims are bucketed (pad tiles die in one loop-condition check) so
    # many scales share one compiled kernel specialization.
    nrt = n_row_tiles if banded else _bucket_tiles(sp.n_row_tiles)
    nct = sp.n_col_tiles if banded else _bucket_tiles(sp.n_col_tiles)
    limit = sp.prefix_trees or sp.tree_cap or forest.num_trees
    meta = jnp.concatenate([
        jnp.asarray([sp.nr, sp.nc, sp.chunk_stride], jnp.int32),
        jnp.asarray(tile_off, jnp.int32).reshape(1),
        jnp.asarray([sp.n_row_tiles - 1, limit, sp.n_col_tiles - 1],
                    jnp.int32),
    ])
    call = _scale_call(
        nrt, nct, sp.total_rows, sp.col_groups,
        forest.num_trees, forest.depth,
        float(forest.thresh[forest.num_trees - 1]), interpret,
        _use_mxu_read(),
    )
    q = call(meta, tables, preds, thresh, planes)
    if banded:
        return q
    q = q[: sp.nr, : sp.nc]
    if sp.subsample > 1:
        q = q[:: sp.subsample, :: sp.subsample]
    return q


def _bucket_tiles(n: int) -> int:
    """Round a grid dimension up so many scales share one compiled kernel
    (pad tiles cost one loop-condition check each)."""
    if n <= 4:
        return n
    if n <= 16:
        return _round_up(n, 4)
    return _round_up(n, 8)


@functools.lru_cache(maxsize=None)
def _scale_call(nrt, nct, total_rows, cg, t_num, depth, thresh_last,
                interpret, mxu_read=False):
    """Shared, geometry-keyed scale evaluator.

    In interpret mode the returned callable is jitted: per-instance jits
    would recompile identical small modules for every FaceCascade/config a
    test builds, while jitting ALL of a plan's kernels into one XLA:CPU
    module crashes the compiler (observed segfault) and fully-eager
    interpretation is ~50x slower. On TPU the callable stays bare so the
    caller's single whole-pyramid jit keeps per-frame dispatch collapsed."""
    kernel = _kernel_body(t_num, depth, thresh_last, cg, mxu_read)
    cgl = cg * LANE

    def call(meta, tables, preds, thresh, planes):
        return pl.pallas_call(
            kernel,
            grid=(nrt, nct),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TILE_R, cgl), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(
                (nrt * TILE_R, nct * cgl), jnp.float32
            ),
            interpret=interpret,
        )(meta, tables, preds, thresh, planes)

    return jax.jit(call) if interpret else call


@functools.lru_cache(maxsize=None)
def _multi_kernel_body(t_limit: int, depth: int, mxu_read: bool = False):
    """Tree-prefix kernel over the CONCATENATED tail scales: one pallas
    call for every prefix scale of a pyramid (round-3 lever: the ~20
    per-scale launches dominate host-free mode's gap to the host-tail
    config). Per grid step the tile's geometry rides in SMEM:
    meta[i*8 : i*8+8] = (tr, ct, nr, nc, R, planes_off, table_off, valid).

    The node-read machinery is the dense kernel's (same packed scalar
    format, 2*TILE_R slab + rolls); every window either fails (-1) or
    survives `t_limit` trees and gets PREFIX_MARK for the host finisher."""
    chunk_trees = 4 if t_limit % 4 == 0 else (2 if t_limit % 2 == 0 else 1)
    nleaf = 2 ** depth

    def kernel(meta_ref, tables_ref, preds_ref, thresh_ref, planes_ref,
               q_ref):
        i = pl.program_id(0)
        tr = meta_ref[i * 8 + 0]
        ct = meta_ref[i * 8 + 1]
        nr = meta_ref[i * 8 + 2]
        nc = meta_ref[i * 8 + 3]
        chunk_stride = meta_ref[i * 8 + 4]
        planes_off = meta_ref[i * 8 + 5]
        table_off = meta_ref[i * 8 + 6]
        is_pad = meta_ref[i * 8 + 7] == 0
        row0 = tr * TILE_R + ct * chunk_stride + planes_off

        lane_ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, LANE), 1)
        row_ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, LANE), 0)
        pad_mask = (
            ((lane_ix + ct * LANE) >= nc) | ((row_ix + tr * TILE_R) >= nr)
            | is_pad
        ).astype(jnp.float32)

        read = _read_builder(planes_ref, row0, mxu_read)

        def one_tree(t, out, fail):
            base = table_off + t * (nleaf - 1) * 2
            bits = []
            for n in range(1, nleaf):
                p1 = tables_ref[base + (n - 1) * 2]
                p2 = tables_ref[base + (n - 1) * 2 + 1]
                bits.append(read(p1) <= read(p2))
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
            fail = jnp.maximum(
                fail, (out <= thresh_ref[t]).astype(jnp.float32)
            )
            return out, fail

        def tree_step(carry):
            t, out, fail = carry
            for j in range(chunk_trees):
                out, fail = one_tree(t + j, out, fail)
            return t + chunk_trees, out, fail

        def cond(carry):
            t, _, fail = carry
            return (t < t_limit) & (jnp.min(fail) < 1.0)

        out0 = jnp.zeros((TILE_R, LANE), jnp.float32)
        _, out, fail = jax.lax.while_loop(
            cond, tree_step, (jnp.int32(0), out0, pad_mask)
        )
        q_ref[:] = jnp.where(
            fail > 0.0, jnp.float32(-1.0), jnp.float32(PREFIX_MARK)
        )

    return kernel


@functools.lru_cache(maxsize=None)
def _multi_call(n_tiles: int, total_rows: int, t_limit: int, depth: int,
                interpret: bool, mxu_read: bool = False):
    kernel = _multi_kernel_body(t_limit, depth, mxu_read)

    def call(meta, tables, preds, thresh, planes):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TILE_R, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n_tiles * TILE_R, LANE), jnp.float32
            ),
            interpret=interpret,
        )(meta, tables, preds, thresh, planes)

    return jax.jit(call) if interpret else call


# group budgets for the fused prefix call: the concatenated planes must fit
# VMEM whole (no DMA path on this Mosaic), per-scale 32-tree tables ride
# SMEM. Scales beyond a group's budget start the next group.
PREFIX_GROUP_VMEM = 12 * 1024 * 1024
PREFIX_GROUP_SMEM_TABLES = 48 * 1024  # int32 words (~192KB)


def prefix_groups(plan: DensePlan) -> list[list[ScalePlan]]:
    """Pack the plan's prefix scales into fused-call groups under the VMEM
    (planes) and SMEM (tables) budgets, preserving plan order."""
    groups: list[list[ScalePlan]] = []
    cur: list[ScalePlan] = []
    vmem = words = 0
    for sp in plan.scales:
        if sp.fallback or not sp.prefix_trees:
            continue
        v = sp.total_rows * CHUNK * 4
        w = sp.prefix_trees * (2 ** _tree_depth(sp) - 1) * 2
        if cur and (vmem + v > PREFIX_GROUP_VMEM
                    or words + w > PREFIX_GROUP_SMEM_TABLES):
            groups.append(cur)
            cur, vmem, words = [], 0, 0
        cur.append(sp)
        vmem += v
        words += w
    if cur:
        groups.append(cur)
    return groups


def _tree_depth(sp: ScalePlan) -> int:
    # tables are [T, 2^depth - 1, 2]
    return int(np.log2(sp.tables.shape[1] + 1))


def _bucket_grid(n: int) -> int:
    """Round the fused call's tile count up so nearby configs share one
    compiled kernel (pad tiles die in one loop-condition check)."""
    return max(8, _round_up(n, 8))


def prefix_group_scores(
    img_f32: jax.Array,
    group: list[ScalePlan],
    forest: FaceForest,
    tables_cat: jax.Array,  # int32 concat of the group's trimmed tables
    preds: jax.Array,
    thresh: jax.Array,
    interpret: bool = False,
) -> list[jax.Array]:
    """Evaluate every scale of one prefix group in ONE pallas call.

    Returns the per-scale subsampled [nr_real, nc_real] score blocks in
    group order (PREFIX_MARK survivors / -1 failures)."""
    t_limit = group[0].prefix_trees
    depth = forest.depth
    metas = []
    planes_parts = []
    planes_off = 0
    table_off = 0
    tile_ranges = []
    for sp in group:
        assert sp.prefix_trees == t_limit
        t0 = len(metas)
        for tr in range(sp.n_row_tiles):
            for ct in range(sp.n_col_tiles):
                metas.append((tr, ct, sp.nr, sp.nc, sp.chunk_stride,
                              planes_off, table_off, 1))
        tile_ranges.append((t0, len(metas)))
        planes_parts.append(_make_planes(img_f32, sp))
        planes_off += sp.total_rows
        table_off += t_limit * (2 ** depth - 1) * 2
    n_tiles = _bucket_grid(len(metas))
    while len(metas) < n_tiles:
        metas.append((0, 0, 0, 0, 0, 0, 0, 0))
    meta = jnp.asarray(np.asarray(metas, np.int32).reshape(-1))
    planes = jnp.concatenate(planes_parts, axis=0)
    call = _multi_call(n_tiles, planes_off, t_limit, depth, interpret,
                       _use_mxu_read())
    q = call(meta, tables_cat, preds, thresh, planes)
    outs = []
    for sp, (t0, t1) in zip(group, tile_ranges):
        blk = q[t0 * TILE_R : t1 * TILE_R].reshape(
            sp.n_row_tiles, sp.n_col_tiles, TILE_R, LANE
        )
        blk = blk.transpose(0, 2, 1, 3).reshape(
            sp.n_row_tiles * TILE_R, sp.n_col_tiles * LANE
        )
        blk = blk[: sp.nr, : sp.nc]
        if sp.subsample > 1:
            blk = blk[:: sp.subsample, :: sp.subsample]
        outs.append(blk)
    return outs


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
    through the exact gather kernel (see models/face.py). Tree-prefix tail
    scales are evaluated in fused multi-scale calls (prefix_group_scores);
    `tables` must hold the TRIMMED (first prefix_trees) tables for them."""
    img_f32 = img_u8.astype(jnp.float32)
    grouped: dict[int, jax.Array] = {}
    for group in prefix_groups(plan):
        tcat = jnp.concatenate([tables[sp.scale] for sp in group])
        outs = prefix_group_scores(
            img_f32, group, forest, tcat, preds, thresh, interpret
        )
        for sp, q in zip(group, outs):
            grouped[sp.scale] = q
    parts = []
    for sp in plan.scales:
        if sp.fallback:
            continue
        if sp.scale in grouped:
            q = grouped[sp.scale]
        else:
            q = scale_scores(
                img_f32, sp, forest, tables[sp.scale], preds, thresh,
                interpret,
            )
        parts.append(q.reshape(-1))
    if not parts:
        return jnp.zeros((0,), jnp.float32)
    return jnp.concatenate(parts)
