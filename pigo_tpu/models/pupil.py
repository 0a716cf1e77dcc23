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
        r0, c0, s0 = pupil_dense.make_perturbations(
            float(pl.row), float(pl.col), float(pl.scale), u
        )
        flips = jnp.full((p,), flip_v, bool)
        r, c, s = self.run_batch((r0, c0, s0), flips, pixels, rows, cols, dim, angle)
        rm, cm, sm = pupil_dense.median_vote(r, c, s, p)
        return Puploc(row=int(rm), col=int(cm), scale=float(sm), perturbs=p)
