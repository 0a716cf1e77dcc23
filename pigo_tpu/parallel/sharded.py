"""Multi-chip detection via jax.sharding + shard_map — on the PRODUCTION
Pallas kernels (the same code path as FaceCascade.sparse_hits).

Two strategies (cascade weights always replicated — they are 234KB):

1. **Window sharding** (`window_sharded_hits`): one frame's pyramid window
   grid is split across the mesh by row-tile bands — each chip runs the
   dense phase-decimated Pallas kernel (ops/face_pallas.py) over its band
   of every dense scale (the kernel's SMEM meta carries the band's tile
   offset), compacts its local hits on device to a fixed-capacity
   (index, score) list, and the lists are all-gathered over ICI. A psum'd
   per-chip overflow flag triggers an exact dense re-read on the host
   (mirroring the single-chip overflow path, models/face.py). This is the
   structural analog of sequence parallelism for the PICO workload
   (SURVEY.md section 5); the reference scales nothing — its RunCascade
   hot loop (core/pigo.go:212-258) is single-threaded.

2. **Frame data parallelism** (`batch_hits`): a batch of frames is sharded
   over the mesh; each chip runs the full per-frame Pallas pyramid + hit
   compaction on its local frames (vmapped `dense_sparse`, the exact
   serving kernel chain). Per-frame results decode through the same
   `_decode_hits` as the single-chip path — including the per-frame
   capacity-overflow dense re-read and the host-tail merge.

Fallback (sparse-tail) scales are handled by the host tail engine exactly
as in the single-chip path and merged in reference scan order.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from pigo_tpu.models.face import FaceCascade
from pigo_tpu.ops import face_pallas
from pigo_tpu.ops.cluster import cluster_detections


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


class ShardedFaceCascade:
    """FaceCascade scaled over a device mesh (Pallas fast path)."""

    def __init__(self, mesh: Mesh, face: FaceCascade | None = None,
                 hit_capacity: int = 1024):
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.n = mesh.devices.size
        self.face = face if face is not None else FaceCascade()
        self.cap = hit_capacity
        self._fns: dict[tuple, object] = {}

    # ---------------------------------------------------- window sharding

    def _window_fn(self, rows, cols, min_size, max_size, shift, scale_f):
        key = ("win", rows, cols, min_size, max_size, shift, scale_f)
        if key in self._fns:
            return self._fns[key]
        fc = self.face
        # tree_cap=0: per-band scale_scores calls here would mark capped
        # survivors for escalation mid-shard_map; keep bands exact instead
        plan, _, dense_fn_full, d2g = fc._dense_plan(
            rows, cols, min_size, max_size, shift, scale_f, tree_cap=0
        )
        raw_key = ("raw", rows, cols, min_size, max_size, shift, scale_f,
                   0, fc.prefix, 0)
        _, _, tables_dev = fc._batch_fns[raw_key]
        dense_scales = [sp for sp in plan.scales if not sp.fallback]
        n, axis, cap = self.n, self.axis, self.cap
        interpret = fc.interpret
        forest = fc.forest

        # static per-scale band geometry: device d evaluates row tiles
        # [d*nrt_local, (d+1)*nrt_local) of every dense scale
        geo = []
        woff = 0  # offset into the dense-window concat (d2g positions)
        for sp in dense_scales:
            geo.append((sp, _ceil_div(sp.n_row_tiles, n), woff))
            woff += sp.nr_real * sp.nc_real

        def shard_body(img2d, tables, preds, thresh):
            d = jax.lax.axis_index(axis)
            img_f32 = img2d.astype(jnp.float32)
            q_parts, idx_parts = [], []
            for sp, nrt_local, off in geo:
                qb = face_pallas.scale_scores(
                    img_f32, sp, forest, tables[sp.scale], preds, thresh,
                    interpret, tile_off=d * nrt_local, n_row_tiles=nrt_local,
                )  # raw [nrt_local*16, nct*128] band block
                h, w = qb.shape
                lr = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
                lc = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
                gr = d * (nrt_local * face_pallas.TILE_R) + lr
                m = sp.subsample
                valid = (gr < sp.nr) & (lc < sp.nc)
                if m > 1:
                    valid &= (gr % m == 0) & (lc % m == 0)
                widx = off + (gr // m) * sp.nc_real + (lc // m)
                q_parts.append(qb.reshape(-1))
                idx_parts.append(
                    jnp.where(valid, widx, -1).reshape(-1).astype(jnp.int32)
                )
            q_all = jnp.concatenate(q_parts)
            idx_all = jnp.concatenate(idx_parts)
            hits = (q_all > jnp.float32(0.0)) & (idx_all >= 0)
            count = jnp.sum(hits.astype(jnp.int32))
            pos = jnp.nonzero(hits, size=cap, fill_value=-1)[0]
            gidx = jnp.where(pos >= 0, idx_all[jnp.clip(pos, 0)], -1)
            qv = q_all[jnp.clip(pos, 0)]
            # all-gather the per-chip hit lists over ICI; psum the exact
            # count so the host can detect per-chip capacity overflow
            gidx_all = jax.lax.all_gather(gidx, axis)
            qv_all = jax.lax.all_gather(qv, axis)
            total = jax.lax.psum(count, axis)
            overflow = jax.lax.psum((count > cap).astype(jnp.int32), axis)
            return gidx_all, qv_all, total, overflow

        mapped = shard_map(
            shard_body, mesh=self.mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )

        @jax.jit
        def run(img2d):
            return mapped(img2d, tables_dev, fc.preds_flat, fc.thresh_flat)

        entry = (plan, run, dense_fn_full, d2g)
        self._fns[key] = entry
        return entry

    def window_sharded_hits(
        self, pixels, rows, cols, *, min_size=20, max_size=1000,
        shift_factor=0.1, scale_factor=1.1,
    ) -> np.ndarray:
        """Detections [N, 4] (row, col, scale, q), reference scan order,
        from a mesh-sharded pass over the production Pallas kernels.
        Bit-exact vs the single-chip `sparse_hits`."""
        plan, run, dense_fn_full, d2g = self._window_fn(
            rows, cols, min_size, max_size, shift_factor, scale_factor
        )
        if plan.num_windows == 0:
            return np.zeros((0, 4), dtype=np.float64)
        fc = self.face
        img2d = jnp.asarray(pixels, jnp.uint8).reshape(rows, cols)
        host_pix = np.asarray(
            pixels if isinstance(pixels, np.ndarray) else img2d, np.uint8
        ).reshape(rows, cols)
        if d2g.size:
            fut = run(img2d)
        else:
            fut = None
        fb = None
        if plan.has_fallback:
            fb = fc._fallback_hits(host_pix, plan, rows, cols, min_size,
                                   max_size, shift_factor, scale_factor)
        if fut is None:
            dets = np.zeros((0, 4), np.float64)
        else:
            gidx, qv, total, overflow = jax.device_get(fut)
            if int(overflow) > 0:
                # a chip's hit list overflowed: exact dense re-read on host
                # (single-chip kernels; same recovery as models/face.py)
                q_dense = np.asarray(dense_fn_full(img2d))
                sel = q_dense > 0.0
                didx = np.nonzero(sel)[0]
                qv = q_dense[sel]
            else:
                gidx = gidx.reshape(-1)
                qv = qv.reshape(-1)
                valid = gidx >= 0
                didx = gidx[valid].astype(np.int64)
                qv = qv[valid]
                order = np.argsort(didx, kind="stable")  # scan order
                didx, qv = didx[order], qv[order]
            gl = d2g[didx]
            dets = np.stack(
                [
                    plan.rows_w[gl].astype(np.float64),
                    plan.cols_w[gl].astype(np.float64),
                    plan.scale_w[gl].astype(np.float64),
                    qv.astype(np.float64),
                ],
                axis=1,
            )
            # exact host finish for tree-prefix survivors
            dets = fc._resolve_marked(dets, host_pix, plan.angle_idx / 32.0)
        if fb is not None and fb.shape[0]:
            dets = np.concatenate([dets, fb])
            order = np.argsort(dets[:, 2], kind="stable")
            dets = dets[order]
        return dets

    def detect(self, pixels, rows, cols, *, iou_threshold=0.2, **kw):
        dets = self.window_sharded_hits(pixels, rows, cols, **kw)
        return cluster_detections(dets, iou_threshold)

    # ------------------------------------------------ frame data parallel

    def _batch_fn(self, rows, cols, min_size, max_size, shift, scale_f):
        key = ("batch", rows, cols, min_size, max_size, shift, scale_f)
        if key in self._fns:
            return self._fns[key]
        fc = self.face
        # tree_cap=0: the DP collect path fetches packed hits without the
        # per-frame host pixels a capped-survivor host backstop would need
        plan, _, dense_fn_full, d2g = fc._dense_plan(
            rows, cols, min_size, max_size, shift, scale_f, tree_cap=0
        )
        raw_key = ("raw", rows, cols, min_size, max_size, shift, scale_f,
                   0, fc.prefix, 0)
        dense_sparse, _, tables_dev = fc._batch_fns[raw_key]
        axis = self.axis

        def shard_body(frames_local, tables, preds, thresh):
            packed = jax.vmap(
                lambda f: dense_sparse(f, tables, preds, thresh)
            )(frames_local)
            total = jax.lax.psum(
                jnp.sum(packed[:, 0].astype(jnp.int32)), axis
            )
            return packed, total

        mapped = shard_map(
            shard_body, mesh=self.mesh,
            in_specs=(P(self.axis), P(), P(), P()),
            out_specs=(P(self.axis), P()),
            check_vma=False,
        )

        @jax.jit
        def run(frames):
            return mapped(frames, tables_dev, fc.preds_flat, fc.thresh_flat)

        entry = (plan, run, dense_fn_full, d2g)
        self._fns[key] = entry
        return entry

    def batch_hits(
        self, frames, rows, cols, *, min_size=20, max_size=1000,
        shift_factor=0.1, scale_factor=1.1,
    ) -> tuple[list[np.ndarray], int]:
        """Frame-DP serving pass: B frames sharded over the mesh, each chip
        running the full per-frame Pallas pyramid + on-device hit
        compaction. Returns (per-frame [Ni, 4] hit lists identical to
        `sparse_hits`, psum'd raw dense-hit count). B must be a multiple of
        the mesh size."""
        fc = self.face
        frames = jnp.asarray(frames, jnp.uint8).reshape(-1, rows, cols)
        b = frames.shape[0]
        if b % self.n:
            raise ValueError(
                f"batch {b} not divisible by mesh size {self.n}"
            )
        plan, run, dense_fn_full, d2g = self._batch_fn(
            rows, cols, min_size, max_size, shift_factor, scale_factor
        )
        if plan.num_windows == 0:
            return [np.zeros((0, 4), np.float64) for _ in range(b)], 0
        cap = fc.HIT_CAPACITY
        if d2g.size:
            packed_all, total = jax.device_get(run(frames))
        else:
            packed_all = np.zeros((b, 1 + 2 * cap), np.float32)
            packed_all[:, 1 : 1 + cap] = -1.0
            total = 0
        host_frames = np.asarray(frames)  # one fetch for the whole batch
        fbs = None
        if plan.has_fallback:
            fbs = [
                fc._fallback_hits(host_frames[i], plan, rows, cols,
                                  min_size, max_size, shift_factor,
                                  scale_factor)
                for i in range(b)
            ]
        dets = [
            fc._decode_hits(
                packed_all[i], fbs[i] if fbs is not None else None, plan,
                d2g, dense_fn_full, frames[i], host_frames[i],
            )
            for i in range(b)
        ]
        return dets, int(total)
