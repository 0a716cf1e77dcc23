"""Window-grid planner: the pyramid flattened to one static window axis.

The reference serializes ~2e5 windows in nested loops
(/root/reference/core/pigo.go:226-255). TPU-first design instead materializes
every (scale, row, col) window of the pyramid as a flat, padded table with
static shape per (image size, params) — jit-cache friendly, shardable, and
tileable over a Pallas grid.

Exactness note: for s >= 0 and any code in [-128, 127],
    ((r*256 + code*s) >> 8) == r + ((code*s) >> 8)
because r*256 is a multiple of 256 and >> is an arithmetic (floor) shift.
Hence per-scale node pixel offsets are window-independent and the classifier's
pixel access is `pixels[base_w + off[scale_idx, tree, node]]`.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from pigo_tpu.cascade.format import FaceForest
from pigo_tpu.oracle.face import QCOS_TABLE, QSIN_TABLE

# Pad the flat window axis to a multiple of this (8 sublanes x 128 lanes).
WINDOW_PAD = 1024


@dataclasses.dataclass(frozen=True)
class WindowPlan:
    """Flat pyramid-window table + per-scale gather tables (host numpy).

    Shapes: Wp = padded window count, S = #scales, T = #trees, L = 2^depth.
        rows_w / cols_w / base / scale_idx: int32 [Wp]
        num_windows: true (unpadded) window count
        scales: int32 [S] pyramid scale per scale_idx
        off1 / off2: int32 [S, T, L] flat pixel offsets (upright path)
        rot:   int32 [4, S, T, L] fixed-point rotation offsets
               (r1, c1, r2, c2 numerators) or None for upright plans
    """

    rows: int
    cols: int
    dim: int
    num_windows: int
    rows_w: np.ndarray
    cols_w: np.ndarray
    base: np.ndarray
    scale_idx: np.ndarray
    scales: np.ndarray
    off1: np.ndarray | None
    off2: np.ndarray | None
    rot: np.ndarray | None
    angle_idx: int  # int(32*angle); 0 => upright plan

    @property
    def padded_windows(self) -> int:
        return self.base.shape[0]


def pyramid_scales(min_size: int, max_size: int, scale_factor: float) -> list[int]:
    """Reference scale progression (core/pigo.go:226,255)."""
    scales = []
    scale = int(min_size)
    while scale <= max_size:
        scales.append(scale)
        scale = int(scale + max(2.0, scale * scale_factor - scale))
    return scales


def build_window_plan(
    forest: FaceForest,
    rows: int,
    cols: int,
    dim: int,
    min_size: int,
    max_size: int,
    shift_factor: float,
    scale_factor: float,
    angle: float = 0.0,
    scales_override: list[int] | None = None,
) -> WindowPlan:
    """Enumerate the pyramid exactly as RunCascade does and build gather tables.

    scales_override restricts the plan to an explicit scale list (used to route
    individual scales through this exact-gather path when the dense Pallas
    kernel cannot host them in VMEM).
    """
    if angle > 1.0:
        angle = 1.0
    angle_idx = int(32.0 * angle) if angle > 0.0 else 0

    scales = (
        list(scales_override)
        if scales_override is not None
        else pyramid_scales(min_size, max_size, scale_factor)
    )
    rws, cws, sids = [], [], []
    kept_scales = []
    for s in scales:
        step = int(max(shift_factor * s, 1.0))
        offset = s // 2 + 1
        rr = np.arange(offset, rows - offset + 1, step, dtype=np.int32)
        cc = np.arange(offset, cols - offset + 1, step, dtype=np.int32)
        if rr.size == 0 or cc.size == 0:
            continue
        sid = len(kept_scales)
        kept_scales.append(s)
        rws.append(np.repeat(rr, cc.size))
        cws.append(np.tile(cc, rr.size))
        sids.append(np.full(rr.size * cc.size, sid, dtype=np.int32))

    if not kept_scales:
        kept_scales = [int(min_size)]
        rws = [np.zeros(0, dtype=np.int32)]
        cws = [np.zeros(0, dtype=np.int32)]
        sids = [np.zeros(0, dtype=np.int32)]

    rows_w = np.concatenate(rws).astype(np.int32)
    cols_w = np.concatenate(cws).astype(np.int32)
    scale_idx = np.concatenate(sids).astype(np.int32)
    n = rows_w.shape[0]
    n_pad = max(WINDOW_PAD, math.ceil(max(n, 1) / WINDOW_PAD) * WINDOW_PAD)

    # Pads point at the image center with the smallest scale: always in-bounds.
    pad_r, pad_c = rows // 2, cols // 2
    rows_w = np.concatenate(
        [rows_w, np.full(n_pad - n, pad_r, dtype=np.int32)]
    )
    cols_w = np.concatenate(
        [cols_w, np.full(n_pad - n, pad_c, dtype=np.int32)]
    )
    scale_idx = np.concatenate([scale_idx, np.zeros(n_pad - n, dtype=np.int32)])
    base = rows_w.astype(np.int64) * dim + cols_w.astype(np.int64)

    scales_arr = np.asarray(kept_scales, dtype=np.int64)
    codes = forest.codes.astype(np.int64)  # [T, L, 4]
    s_col = scales_arr[:, None, None]

    if angle_idx == 0:
        # off = ((code_r * s) >> 8) * dim + ((code_c * s) >> 8)
        dr1 = (codes[None, :, :, 0] * s_col) >> 8
        dc1 = (codes[None, :, :, 1] * s_col) >> 8
        dr2 = (codes[None, :, :, 2] * s_col) >> 8
        dc2 = (codes[None, :, :, 3] * s_col) >> 8
        off1 = (dr1 * dim + dc1).astype(np.int32)
        off2 = (dr2 * dim + dc2).astype(np.int32)
        rot = None
    else:
        # Rotated path (core/pigo.go:150-191): 16.16 fixed point,
        #   r1 = abs(min(nrows-1, max(0, 65536*r + qcos*c0 - qsin*c1) >> 16))
        # The window-independent numerators qcos*c0 -/+ qsin*c1 are tabulated.
        qsin = scales_arr * int(QSIN_TABLE[angle_idx])
        qcos = scales_arr * int(QCOS_TABLE[angle_idx])
        qs = qsin[:, None, None]
        qc = qcos[:, None, None]
        c0 = codes[None, :, :, 0]
        c1 = codes[None, :, :, 1]
        c2 = codes[None, :, :, 2]
        c3 = codes[None, :, :, 3]
        rot = np.stack(
            [
                qc * c0 - qs * c1,  # r1 numerator
                qs * c0 + qc * c1,  # c1 numerator
                qc * c2 - qs * c3,  # r2 numerator
                qs * c2 + qc * c3,  # c2 numerator
            ]
        ).astype(np.int32)
        off1 = off2 = None

    return WindowPlan(
        rows=rows,
        cols=cols,
        dim=dim,
        num_windows=n,
        rows_w=rows_w,
        cols_w=cols_w,
        base=base.astype(np.int32),
        scale_idx=scale_idx,
        scales=scales_arr.astype(np.int32),
        off1=off1,
        off2=off2,
        rot=rot,
        angle_idx=angle_idx,
    )
