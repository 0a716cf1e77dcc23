"""Multi-chip detection via jax.sharding + shard_map.

Two strategies (cascade weights always replicated — they are 234KB):

1. **Window sharding** (`window_sharded_hits`): one frame's flat pyramid
   window axis is split across the mesh; each chip classifies its window
   shard against the replicated image, compacts its local hits to a fixed-
   capacity list, and the lists are all-gathered over ICI for global
   clustering. This is the structural analog of sequence parallelism for
   the PICO workload (SURVEY.md section 5).

2. **Frame data parallelism** (`batch_scores`): a batch of frames is sharded
   over the mesh; each chip runs the full pyramid on its local frames; a
   psum provides the global detection count. No cross-frame communication
   is needed (clustering is per frame).

Both are built on the gather-backend classifier (pure jnp) so they compile
on any mesh, including the 8-virtual-device CPU mesh used in tests and the
driver's multi-chip dry run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from pigo_tpu.models.face import FaceCascade
from pigo_tpu.ops import face_dense
from pigo_tpu.ops.cluster import cluster_detections


class ShardedFaceCascade:
    """FaceCascade scaled over a device mesh."""

    def __init__(self, mesh: Mesh, face: FaceCascade | None = None,
                 hit_capacity: int = 512):
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.n = mesh.devices.size
        self.face = face if face is not None else FaceCascade(backend="reference")
        self.cap = hit_capacity
        self._fns: dict[tuple, object] = {}

    # ---------------------------------------------------- window sharding

    def _window_fn(self, rows, cols, dim, min_size, max_size, shift, scale_f):
        key = ("win", rows, cols, dim, min_size, max_size, shift, scale_f)
        if key in self._fns:
            return self._fns[key]
        fc = self.face
        plan, dev = fc._gather_plan(
            rows, cols, dim, min_size, max_size, shift, scale_f
        )
        wp = plan.padded_windows
        pad_to = -(-wp // self.n) * self.n
        extra = pad_to - wp

        def padded(name):
            arr = np.asarray(dev[name])
            if extra:
                arr = np.concatenate([arr, np.repeat(arr[-1:], extra, 0)])
            return jnp.asarray(arr)

        base = padded("base")
        scale_idx = padded("scale_idx")
        axis, n, cap = self.axis, self.n, self.cap

        def shard_body(pix, base_l, sidx_l, off1, off2, preds, thresh, tl):
            # Each chip classifies its window shard against the replicated
            # frame, then compacts local hits to a fixed-capacity list.
            q = face_dense.classify_windows(
                pix, base_l, sidx_l, off1, off2, preds, thresh, tl,
                depth=fc.forest.depth, num_leaves=fc.forest.num_leaves,
                t_pad=fc.t_pad, block=fc.block,
            )
            hits = q > 0.0
            shard = jax.lax.axis_index(axis)
            local0 = shard * (pad_to // n)
            idx = jnp.nonzero(hits, size=cap, fill_value=-1)[0]
            gidx = jnp.where(idx >= 0, idx + local0, -1)
            qv = q[idx]
            count = jnp.sum(hits.astype(jnp.int32))
            # all-gather the per-chip hit lists over ICI for global clustering
            gidx_all = jax.lax.all_gather(gidx, axis)
            qv_all = jax.lax.all_gather(qv, axis)
            total = jax.lax.psum(count, axis)
            return gidx_all, qv_all, total

        mapped = shard_map(
            shard_body, mesh=self.mesh,
            in_specs=(P(), P(self.axis), P(self.axis), P(), P(), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )

        @jax.jit
        def run(pix):
            return mapped(
                pix, base, scale_idx, dev["off1"], dev["off2"],
                fc.preds_g, fc.thresh_g, fc.thresh_last,
            )

        entry = (plan, run)
        self._fns[key] = entry
        return entry

    def window_sharded_hits(
        self, pixels, rows, cols, *, min_size=20, max_size=1000,
        shift_factor=0.1, scale_factor=1.1,
    ) -> np.ndarray:
        """Detections [N, 4] (row, col, scale, q) from a mesh-sharded pass."""
        plan, run = self._window_fn(
            rows, cols, cols, min_size, max_size, shift_factor, scale_factor
        )
        pix = jnp.asarray(pixels, jnp.uint8).reshape(-1)
        gidx, qv, total = jax.device_get(run(pix))
        gidx = gidx.reshape(-1)
        qv = qv.reshape(-1)
        valid = (gidx >= 0) & (gidx < plan.num_windows)
        gidx = gidx[valid].astype(np.int64)
        qv = qv[valid]
        order = np.argsort(gidx, kind="stable")  # reference scan order
        gidx, qv = gidx[order], qv[order]
        n = plan.num_windows
        return np.stack(
            [
                plan.rows_w[:n][gidx].astype(np.float64),
                plan.cols_w[:n][gidx].astype(np.float64),
                plan.scales[plan.scale_idx[:n][gidx]].astype(np.float64),
                qv.astype(np.float64),
            ],
            axis=1,
        )

    def detect(self, pixels, rows, cols, *, iou_threshold=0.2, **kw):
        dets = self.window_sharded_hits(pixels, rows, cols, **kw)
        return cluster_detections(dets, iou_threshold)

    # ------------------------------------------------ frame data parallel

    def _batch_fn(self, rows, cols, min_size, max_size, shift, scale_f):
        key = ("batch", rows, cols, min_size, max_size, shift, scale_f)
        if key in self._fns:
            return self._fns[key]
        fc = self.face
        plan, dev = fc._gather_plan(
            rows, cols, cols, min_size, max_size, shift, scale_f
        )

        def one_frame(pix):
            return face_dense.classify_windows(
                pix, dev["base"], dev["scale_idx"], dev["off1"], dev["off2"],
                fc.preds_g, fc.thresh_g, fc.thresh_last,
                depth=fc.forest.depth, num_leaves=fc.forest.num_leaves,
                t_pad=fc.t_pad, block=fc.block,
            )

        axis = self.axis

        def shard_body(pix_local):  # [B/n, rows*cols]
            q = jax.vmap(one_frame)(pix_local)
            total = jax.lax.psum(jnp.sum((q > 0).astype(jnp.int32)), axis)
            return q, total

        mapped = shard_map(
            shard_body, mesh=self.mesh,
            in_specs=(P(self.axis),), out_specs=(P(self.axis), P()),
            check_vma=False,
        )
        entry = (plan, jax.jit(mapped))
        self._fns[key] = entry
        return entry

    def batch_scores(
        self, frames, rows, cols, *, min_size=20, max_size=1000,
        shift_factor=0.1, scale_factor=1.1,
    ):
        """Scores [B, Wp] for a frame batch sharded over the mesh.

        B must be a multiple of the mesh size."""
        frames = jnp.asarray(frames, jnp.uint8).reshape(-1, rows * cols)
        if frames.shape[0] % self.n:
            raise ValueError(
                f"batch {frames.shape[0]} not divisible by mesh size {self.n}"
            )
        plan, run = self._batch_fn(
            rows, cols, min_size, max_size, shift_factor, scale_factor
        )
        q, total = run(frames)
        return plan, q, total
