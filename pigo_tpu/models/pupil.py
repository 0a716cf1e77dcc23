"""PupilLocalizer: pupil/eye localization (reference core/puploc.go).

Public surface mirrors the reference:
    NewPuplocCascade().UnpackCascade(bytes) -> PupilLocalizer.from_bytes
    (*PuplocCascade).RunDetector(...)       -> PupilLocalizer.run_detector

Determinism: the reference jitters perturbations with the global math/rand
(nondeterministic). Here jitter comes from an explicit jax.random key (or
caller-provided uniforms), so runs are reproducible; statistical behavior
matches the reference, and given identical uniforms the refined positions are
bit-identical to the scalar oracle.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pigo_tpu.cascade.assets import load_puploc
from pigo_tpu.cascade.format import PupilForest, unpack_pupil_cascade
from pigo_tpu.ops import pupil_dense
from pigo_tpu.utils.config import ensure_compilation_cache


@dataclasses.dataclass
class Puploc:
    """Pupil localization anchor/result (reference core/puploc.go:14-19)."""

    row: int
    col: int
    scale: float
    perturbs: int = 63


class PupilLocalizer:
    """Regression forest resident on device, batched perturbation ensemble."""

    def __init__(self, forest: PupilForest | None = None):
        ensure_compilation_cache()
        self.forest = forest if forest is not None else load_puploc()
        self.codes = jnp.asarray(pupil_dense.pack_codes(self.forest).reshape(-1))
        self.preds = jnp.asarray(self.forest.preds.reshape(-1))

    @classmethod
    def from_bytes(cls, packet: bytes) -> "PupilLocalizer":
        return cls(unpack_pupil_cascade(packet))

    @classmethod
    def from_file(cls, path: str) -> "PupilLocalizer":
        with open(path, "rb") as fh:
            return cls.from_bytes(fh.read())

    def run_batch(
        self,
        starts: tuple[jax.Array, jax.Array, jax.Array],  # f32 [B] each
        flips: jax.Array,  # bool/int [B]
        pixels: np.ndarray | jax.Array,
        rows: int,
        cols: int,
        dim: int | None = None,
        angle: float = 0.0,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Refine B (row, col, scale) starts in one vectorized walk."""
        dim = cols if dim is None else dim
        r0, c0, s0 = (jnp.asarray(v, jnp.float32) for v in starts)
        col_sign = jnp.where(jnp.asarray(flips, bool), -1, 1).astype(jnp.int32)
        casc_id = jnp.zeros(r0.shape, jnp.int32)
        pix = jnp.asarray(pixels, jnp.uint8).reshape(-1)
        rotated = angle > 0.0
        angle_idx = int(32.0 * min(angle, 1.0)) if rotated else 0
        return pupil_dense.walk(
            self.codes, self.preds, casc_id, r0, c0, s0, col_sign, pix,
            stages=self.forest.stages, trees=self.forest.trees,
            depth=self.forest.depth, nrows=rows, ncols=cols, dim=dim,
            scale_mult=float(self.forest.scale_mult),
            rotated=rotated, angle_idx=angle_idx,
        )

    def run_detector(
        self,
        pl: Puploc,
        pixels: np.ndarray | jax.Array,
        rows: int,
        cols: int,
        dim: int | None = None,
        angle: float = 0.0,
        flip_v: bool = False,
        key: jax.Array | None = None,
        uniforms: np.ndarray | None = None,
    ) -> Puploc:
        """Perturbation ensemble + median vote (core/puploc.go:239-277).

        `uniforms` [P, 3] overrides the RNG (used for oracle parity tests)."""
        p = pl.perturbs
        if uniforms is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            u = jax.random.uniform(key, (p, 3), jnp.float32)
        else:
            u = jnp.asarray(uniforms, jnp.float32)
        med = self._ensemble(
            np.zeros(1, np.int32),
            np.array([pl.row], np.float32), np.array([pl.col], np.float32),
            np.array([pl.scale], np.float32),
            np.array([flip_v], bool), u[None], pixels, rows, cols, dim, angle,
        )
        return Puploc(row=int(med[0, 0]), col=int(med[1, 0]),
                      scale=float(med[2, 0]), perturbs=p)

    def _ensemble(self, casc_id, rows0, cols0, scales0, flips, u, pixels,
                  rows, cols, dim, angle):
        """One fused device call: jitter -> walk -> median. Returns np [3, G]."""
        dim = cols if dim is None else dim
        rotated = angle > 0.0
        angle_idx = int(32.0 * min(angle, 1.0)) if rotated else 0
        med = pupil_dense.ensemble(
            self.codes, self.preds, jnp.asarray(casc_id),
            jnp.asarray(rows0), jnp.asarray(cols0), jnp.asarray(scales0),
            jnp.asarray(flips), jnp.asarray(u, jnp.float32),
            jnp.asarray(pixels, jnp.uint8).reshape(-1),
            stages=self.forest.stages, trees=self.forest.trees,
            depth=self.forest.depth, nrows=rows, ncols=cols, dim=dim,
            scale_mult=float(self.forest.scale_mult),
            rotated=rotated, angle_idx=angle_idx,
        )
        return np.asarray(med)  # one host transfer

    def run_detector_multi(
        self,
        pls: list[Puploc],
        pixels: np.ndarray | jax.Array,
        rows: int,
        cols: int,
        dim: int | None = None,
        angle: float = 0.0,
        flips: list[bool] | None = None,
        key: jax.Array | None = None,
    ) -> list[Puploc]:
        """All G anchors' ensembles in ONE vectorized walk + ONE host fetch.

        Serving entry point: over a high-latency host<->device link the
        per-call round trips dominate RunDetector, so a frame's pupils (and a
        multi-face frame's 2F eye anchors) are refined together."""
        g = len(pls)
        if g == 0:
            return []
        p = pls[0].perturbs
        if any(pl.perturbs != p for pl in pls):
            raise ValueError("run_detector_multi requires uniform perturbs")
        key = key if key is not None else jax.random.PRNGKey(0)
        u = jax.random.uniform(key, (g, p, 3), jnp.float32)
        med = self._ensemble(
            np.zeros(g, np.int32),
            np.array([pl.row for pl in pls], np.float32),
            np.array([pl.col for pl in pls], np.float32),
            np.array([pl.scale for pl in pls], np.float32),
            np.zeros(g, bool) if flips is None else np.asarray(flips, bool),
            u, pixels, rows, cols, dim, angle,
        )
        return [
            Puploc(row=int(med[0, i]), col=int(med[1, i]),
                   scale=float(med[2, i]), perturbs=p)
            for i in range(g)
        ]
