"""LandmarkLocalizer: facial landmark points (reference core/flploc.go).

The 9 shipped landmark cascades share one geometry (6 stages x 20 trees x
depth 9), so they are stacked on a leading cascade axis and every landmark of
every face is localized in ONE vectorized walk — the TPU-native equivalent of
the reference's per-cascade GetLandmarkPoint loop
(/root/reference/cmd/pigo/main.go:493-564).

Landmark roles follow the reference CLI: 5 eye cascades run twice (flipV for
the right side), 4 mouth cascades once, and lp84 doubles as the nose via
flipV (main.go:68-71, :549) — 15 points per face.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from pigo_tpu.cascade.assets import (
    EYE_CASCADES,
    MOUTH_CASCADES,
    NOSE_CASCADE,
    load_landmark_dir,
)
from pigo_tpu.cascade.format import PupilForest
from pigo_tpu.models.pupil import Puploc
from pigo_tpu.ops import pupil_dense
from pigo_tpu.utils.config import ensure_compilation_cache


def landmark_anchor(left_eye: Puploc, right_eye: Puploc) -> tuple[int, int, float]:
    """Anchor geometry from the two pupils (core/flploc.go:37-43)."""
    dx = (left_eye.row - right_eye.row) ** 2
    dy = (left_eye.col - right_eye.col) ** 2
    dist = math.sqrt(dx + dy)
    row = (left_eye.row + right_eye.row) / 2.0 + 0.25 * dist
    col = (left_eye.col + right_eye.col) / 2.0 + 0.15 * dist
    scale = 3.0 * dist
    return int(row), int(col), float(scale)


class LandmarkLocalizer:
    """Stacked landmark regression forests, one vectorized walk per frame."""

    def __init__(self, cascades: dict[str, PupilForest] | None = None):
        ensure_compilation_cache()
        self.cascades = cascades if cascades is not None else load_landmark_dir()
        self.names = sorted(self.cascades)
        ref = self.cascades[self.names[0]]
        for name, f in self.cascades.items():
            if (f.stages, f.trees, f.depth, f.scale_mult) != (
                ref.stages, ref.trees, ref.depth, ref.scale_mult
            ):
                raise ValueError(f"landmark cascade {name} geometry mismatch")
        self.geometry = ref
        self.codes = jnp.asarray(
            np.stack(
                [pupil_dense.pack_codes(self.cascades[n]) for n in self.names]
            ).reshape(-1)
        )
        self.preds = jnp.asarray(
            np.stack([self.cascades[n].preds for n in self.names]).reshape(-1)
        )
        self._name_to_id = {n: i for i, n in enumerate(self.names)}
        # The reference CLI's 15-point schedule: (cascade, flipV) per point.
        self.point_schedule: list[tuple[str, bool]] = (
            [(n, False) for n in EYE_CASCADES]
            + [(n, True) for n in EYE_CASCADES]
            + [(n, False) for n in MOUTH_CASCADES]
            + [(NOSE_CASCADE, True)]
        )

    def run_batch(
        self,
        casc_ids: jax.Array,  # int32 [B]
        starts: tuple[jax.Array, jax.Array, jax.Array],  # f32 [B]
        flips: jax.Array,  # bool [B]
        pixels: np.ndarray | jax.Array,
        rows: int,
        cols: int,
        dim: int | None = None,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        dim = cols if dim is None else dim
        r0, c0, s0 = (jnp.asarray(v, jnp.float32) for v in starts)
        col_sign = jnp.where(jnp.asarray(flips, bool), -1, 1).astype(jnp.int32)
        pix = jnp.asarray(pixels, jnp.uint8).reshape(-1)
        g = self.geometry
        return pupil_dense.walk(
            self.codes, self.preds, jnp.asarray(casc_ids, jnp.int32),
            r0, c0, s0, col_sign, pix,
            stages=g.stages, trees=g.trees, depth=g.depth,
            nrows=rows, ncols=cols, dim=dim,
            scale_mult=float(g.scale_mult), rotated=False, angle_idx=0,
        )

    def get_landmark_point(
        self,
        name: str,
        left_eye: Puploc,
        right_eye: Puploc,
        pixels: np.ndarray | jax.Array,
        rows: int,
        cols: int,
        dim: int | None = None,
        perturbs: int = 63,
        flip_v: bool = False,
        key: jax.Array | None = None,
        uniforms: np.ndarray | None = None,
    ) -> Puploc:
        """One landmark point from one cascade (core/flploc.go:36-57)."""
        row, col, scale = landmark_anchor(left_eye, right_eye)
        if uniforms is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            u = jax.random.uniform(key, (perturbs, 3), jnp.float32)
        else:
            u = jnp.asarray(uniforms, jnp.float32)
        med = self._ensemble(
            np.array([self._name_to_id[name]], np.int32),
            np.array([row], np.float32), np.array([col], np.float32),
            np.array([scale], np.float32), np.array([flip_v], bool),
            u[None], pixels, rows, cols, dim,
        )
        return Puploc(row=int(med[0, 0]), col=int(med[1, 0]),
                      scale=float(med[2, 0]), perturbs=perturbs)

    def _ensemble(self, casc_id, rows0, cols0, scales0, flips, u, pixels,
                  rows, cols, dim):
        """One fused device call: jitter -> walk -> median. Returns np [3, G]."""
        dim = cols if dim is None else dim
        g = self.geometry
        med = pupil_dense.ensemble(
            self.codes, self.preds, jnp.asarray(casc_id),
            jnp.asarray(rows0), jnp.asarray(cols0), jnp.asarray(scales0),
            jnp.asarray(flips), jnp.asarray(u, jnp.float32),
            jnp.asarray(pixels, jnp.uint8).reshape(-1),
            stages=g.stages, trees=g.trees, depth=g.depth,
            nrows=rows, ncols=cols, dim=dim,
            scale_mult=float(g.scale_mult), rotated=False, angle_idx=0,
        )
        return np.asarray(med)  # one host transfer

    def detect_points(
        self,
        left_eye: Puploc,
        right_eye: Puploc,
        pixels: np.ndarray | jax.Array,
        rows: int,
        cols: int,
        dim: int | None = None,
        perturbs: int = 63,
        key: jax.Array | None = None,
    ) -> list[Puploc]:
        """All 15 landmark points of one face in a single vectorized walk."""
        return self.detect_points_multi(
            [(left_eye, right_eye)], pixels, rows, cols, dim,
            perturbs=perturbs, key=key,
        )[0]

    def detect_points_multi(
        self,
        eye_pairs: list[tuple[Puploc, Puploc]],
        pixels: np.ndarray | jax.Array,
        rows: int,
        cols: int,
        dim: int | None = None,
        perturbs: int = 63,
        key: jax.Array | None = None,
    ) -> list[list[Puploc]]:
        """The full 15-point schedule for F faces in ONE vectorized walk +
        ONE host fetch (the multi-face serving entry point)."""
        f = len(eye_pairs)
        if f == 0:
            return []
        npts = len(self.point_schedule)
        anchors = np.array(
            [landmark_anchor(le, re) for le, re in eye_pairs], np.float32
        )  # [F, 3]
        key = key if key is not None else jax.random.PRNGKey(0)
        u = jax.random.uniform(key, (f * npts, perturbs, 3), jnp.float32)
        cid = np.array(
            [self._name_to_id[n] for n, _ in self.point_schedule], np.int32
        )
        flips = np.array([fl for _, fl in self.point_schedule], bool)
        med = self._ensemble(
            np.tile(cid, f),
            np.repeat(anchors[:, 0], npts), np.repeat(anchors[:, 1], npts),
            np.repeat(anchors[:, 2], npts), np.tile(flips, f),
            u, pixels, rows, cols, dim,
        ).reshape(3, f, npts)
        return [
            [
                Puploc(row=int(med[0, i, j]), col=int(med[1, i, j]),
                       scale=float(med[2, i, j]), perturbs=perturbs)
                for j in range(npts)
            ]
            for i in range(f)
        ]
