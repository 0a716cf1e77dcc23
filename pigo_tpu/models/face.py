"""FaceCascade: device-resident PICO face detector.

Public surface mirrors the reference library API (core/pigo.go):
    NewPigo().Unpack(bytes)       -> FaceCascade.from_bytes
    (*Pigo).RunCascade(cp, angle) -> FaceCascade.run_cascade(...)
    (*Pigo).ClusterDetections     -> pigo_tpu.ops.cluster.cluster_detections

Two device backends, both bit-exact vs the scalar reference semantics:
  - "pallas"    (default, upright): dense phase-decimated Pallas kernel with
                tile-level early exit (ops/face_pallas.py)
  - "reference" (gather-based jnp kernel, ops/face_dense.py): used for the
                rotated path, for scales the Pallas planner routes to
                fallback, and as an independent cross-check in tests
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pigo_tpu.cascade.assets import load_facefinder
from pigo_tpu.cascade.format import FaceForest, unpack_face_cascade
from pigo_tpu.ops import face_dense, face_pallas
from pigo_tpu.ops.cluster import cluster_detections
from pigo_tpu.ops.windows import WindowPlan, build_window_plan
from pigo_tpu.utils.config import ensure_compilation_cache


def destride(pixels, rows: int, cols: int, dim: int):
    """Flat [rows*dim] buffer with row stride dim -> contiguous
    [rows*cols] (reference ImageParams.Dim, core/pigo.go:29-34). Exact for
    every classifier: no window read can reach column >= cols."""
    if isinstance(pixels, np.ndarray):
        return np.ascontiguousarray(
            pixels.reshape(rows, dim)[:, :cols]
        ).reshape(-1)
    return jnp.asarray(pixels).reshape(rows, dim)[:, :cols].reshape(-1)


class FaceCascade:
    """Face-detection forest resident on device, with plan/kernel caching."""

    def __init__(
        self,
        forest: FaceForest | None = None,
        block: int = face_dense.TREE_BLOCK,
        backend: str = "pallas",
        interpret: bool | None = None,
        raw: bytes | None = None,
        prefix: bool | None = None,
    ):
        ensure_compilation_cache()
        if forest is None:
            from pigo_tpu.cascade.assets import asset_path
            with open(asset_path("cascade", "facefinder"), "rb") as fh:
                raw = fh.read()
            forest = unpack_face_cascade(raw)
        self.forest = forest
        # Raw cascade bytes let the host tail engine share the exact model;
        # None (custom in-memory forest) disables the native tail path.
        self._raw = raw
        self._native = None
        self._native_failed = False
        self.block = block
        self.backend = backend
        # Pallas interpret mode: automatic on non-TPU backends (CPU tests).
        from pigo_tpu.utils.platform import backend_platform

        self.interpret = (
            interpret
            if interpret is not None
            else backend_platform() not in ("tpu", "axon")
        )
        # Tree-prefix tail mode: sparse tail scales stay on device
        # (PREFIX_TREES trees densely, survivors finished on host by the
        # vectorized oracle). Measured on the headline pyramid: 79.3 fps at
        # 99.7% device-resident windows vs 94.8 fps with the C++ host tail
        # engine — so the default uses the host engine when it exists and
        # prefix mode when it does not (PIGO_TPU_NO_NATIVE / no g++), which
        # replaces round 1's catastrophic gather fallback (7 fps there).
        # Interpret mode defaults off: XLA:CPU chokes on the ~20 extra
        # kernel compilations (CI covers prefix with small opt-in configs).
        if prefix is None:
            import os

            if self.interpret:
                prefix = False
            elif os.environ.get("PIGO_TPU_NO_NATIVE") or raw is None:
                prefix = True
            else:
                from pigo_tpu.native import native_available

                prefix = not native_available()
        self.prefix = prefix
        codes_p, preds_p, thresh_p, t_pad = face_dense.pad_trees(self.forest, block)
        self.t_pad = t_pad
        self._padded = FaceForest(
            depth=self.forest.depth, codes=codes_p, preds=preds_p, thresh=thresh_p
        )
        # gather-path device constants
        self.preds_g = jnp.asarray(preds_p)
        self.thresh_g = jnp.asarray(thresh_p)
        # pallas-path device constants
        self.preds_flat = jnp.asarray(self.forest.preds.reshape(-1))
        self.thresh_flat = jnp.asarray(self.forest.thresh)
        self.thresh_last = jnp.float32(self.forest.thresh[self.forest.num_trees - 1])
        self._gather_plans: dict[tuple, tuple[WindowPlan, dict[str, jax.Array]]] = {}
        self._dense_plans: dict[tuple, tuple[face_pallas.DensePlan, object]] = {}
        self._batch_fns: dict[tuple, object] = {}

    @classmethod
    def from_bytes(cls, packet: bytes, **kw) -> "FaceCascade":
        return cls(unpack_face_cascade(packet), raw=packet, **kw)

    @classmethod
    def from_file(cls, path: str, **kw) -> "FaceCascade":
        with open(path, "rb") as fh:
            return cls.from_bytes(fh.read(), **kw)

    # -------------------------------------------------------- gather backend

    def _gather_plan(self, rows, cols, dim, min_size, max_size, shift, scale_f,
                     angle=0.0, scales_override=None):
        key = (rows, cols, dim, min_size, max_size, shift, scale_f,
               int(32 * angle) if angle > 0 else 0,
               tuple(scales_override) if scales_override else None)
        hit = self._gather_plans.get(key)
        if hit is not None:
            return hit
        plan = build_window_plan(
            self._padded, rows, cols, dim, min_size, max_size, shift, scale_f,
            angle, scales_override,
        )
        dev: dict[str, jax.Array] = {
            "base": jnp.asarray(plan.base),
            "rows_w": jnp.asarray(plan.rows_w),
            "cols_w": jnp.asarray(plan.cols_w),
            "scale_idx": jnp.asarray(plan.scale_idx),
        }
        if plan.angle_idx == 0:
            dev["off1"] = jnp.asarray(plan.off1)
            dev["off2"] = jnp.asarray(plan.off2)
        else:
            dev["rot"] = jnp.asarray(plan.rot)
        self._gather_plans[key] = (plan, dev)
        return plan, dev

    def _gather_scores(self, pix_flat, rows, cols, dim, min_size, max_size,
                       shift, scale_f, angle=0.0, scales_override=None):
        plan, dev = self._gather_plan(
            rows, cols, dim, min_size, max_size, shift, scale_f, angle,
            scales_override,
        )
        if plan.angle_idx == 0:
            q = face_dense.classify_windows(
                pix_flat, dev["base"], dev["scale_idx"], dev["off1"], dev["off2"],
                self.preds_g, self.thresh_g, self.thresh_last,
                depth=self.forest.depth, num_leaves=self.forest.num_leaves,
                t_pad=self.t_pad, block=self.block,
            )
        else:
            q = face_dense.classify_windows_rotated(
                pix_flat, dev["rows_w"], dev["cols_w"], dev["scale_idx"],
                dev["rot"], self.preds_g, self.thresh_g, self.thresh_last,
                depth=self.forest.depth, num_leaves=self.forest.num_leaves,
                t_pad=self.t_pad, nrows=rows, dim=dim, block=self.block,
            )
        return plan, q

    # -------------------------------------------------------- pallas backend

    # Fixed capacity for the sparse device->host hit list. Real frames yield
    # tens of raw hits; an overflow (count > cap) triggers a dense re-read.
    HIT_CAPACITY = 4096

    def _resolved_cap(self, tree_cap=None) -> int:
        """Effective dense-scale tree cap (see ops/face_pallas.TREE_CAP):
        env/default when None, rounded to the kernel's 4-tree chunk, zeroed
        when it would not trim the forest. Part of the plan cache key so a
        changed PIGO_TPU_TREE_CAP never aliases a cached plan."""
        if tree_cap is None:
            cap = face_pallas._dense_tree_cap()
        elif tree_cap > 0:
            cap = face_pallas._round_up(tree_cap, 4)
        else:
            cap = 0
        return 0 if cap >= self.forest.num_trees else cap

    def _dense_plan(self, rows, cols, min_size, max_size, shift, scale_f,
                    angle_idx=0, prefix=None, tree_cap=None):
        prefix = self.prefix if prefix is None else prefix
        cap = self._resolved_cap(tree_cap)
        key = (rows, cols, min_size, max_size, shift, scale_f, angle_idx,
               prefix, cap)
        hit = self._dense_plans.get(key)
        if hit is not None:
            return hit
        plan = face_pallas.build_dense_plan(
            self.forest, rows, cols, min_size, max_size, shift, scale_f,
            angle_idx, prefix, tree_cap=cap,
        )
        # Tables/preds are passed as runtime ARGUMENTS (device-resident
        # handles), not closure constants: some runtimes re-ship executable
        # constants on every call, which would dominate frame latency.
        # prefix scales ship only their first prefix_trees tables: the
        # kernels never read past the tree limit, and the fused multi-scale
        # prefix call (face_pallas.prefix_group_scores) requires the
        # trimmed stride for its per-scale table offsets
        tables_dev = {
            sp.scale: jnp.asarray(
                (sp.tables[: (sp.prefix_trees or sp.tree_cap)]
                 if (sp.prefix_trees or sp.tree_cap)
                 else sp.tables).reshape(-1)
            )
            for sp in plan.scales
            if not sp.fallback
        }
        interpret = self.interpret
        cap = self.HIT_CAPACITY
        # dense window index -> global plan window index (the dense kernel
        # covers each scale's interior rectangle; for upright plans that is
        # the whole grid, for rotated plans the border band is excluded)
        maps = []
        off = 0
        for sp in plan.scales:
            if not sp.fallback:
                ii = (sp.i_lo + np.arange(sp.nr_real, dtype=np.int64))
                jj = sp.j_lo + np.arange(sp.nc_real, dtype=np.int64)
                maps.append(
                    (off + ii[:, None] * sp.nc_full + jj[None, :]).ravel()
                )
            off += sp.nr_full * sp.nc_full
        dense_to_global = (
            np.concatenate(maps) if maps else np.zeros(0, np.int64)
        )
        resolve = self._resolve_consts(plan, dense_to_global)

        def scores(img2d, tables, preds, thresh):
            # In interpret mode each scale's kernel call is a small shared
            # jit (face_pallas._scale_call) — the outer chain stays eager
            # (one module with 20+ kernels crashes XLA:CPU; see below).
            return face_pallas.pyramid_scores(
                img2d, plan, self.forest, tables, preds, thresh, interpret
            )

        def dense_sparse_impl(img2d, tables, preds, thresh):
            # Sparse on-device compaction: ship only (index, score) hits to
            # the host instead of the full dense score vector. Packed into a
            # single f32 array -> one host transfer (indices < 2^24 are f32-
            # exact).
            q = scores(img2d, tables, preds, thresh)
            hits = q > 0.0
            count = jnp.sum(hits.astype(jnp.int32))
            idx = jnp.nonzero(hits, size=cap, fill_value=-1)[0]
            qv = q[idx]
            if resolve is not None:
                # OPT-IN (PIGO_TPU_DEVICE_RESOLVE=1): tree-prefix survivors
                # finish ON DEVICE via the exact gather classifier. Default
                # off — measured ~89 us/window on v5e makes the static
                # RESOLVE_CAP slots cost ~183 ms/frame (_resolve_consts);
                # marks normally ride the packed hit list to the host
                # finish (_resolve_marked) instead.
                qv, idx = resolve(img2d, idx, qv)
            return jnp.concatenate(
                [count[None].astype(jnp.float32), idx.astype(jnp.float32), qv]
            )

        # In interpret mode (CPU tests) the pyramid stays EAGER: jitting
        # 20+ unrolled while-loop kernels into one XLA:CPU module crashes
        # the compiler (observed segfault); on TPU the single jit is what
        # collapses per-frame dispatch overhead.
        dense_sparse = (jax.jit(dense_sparse_impl) if not interpret
                        else dense_sparse_impl)
        dense_full_jit = jax.jit(scores) if not interpret else scores

        def dense_fn(img2d):
            return dense_sparse(img2d, tables_dev, self.preds_flat, self.thresh_flat)

        def dense_fn_full(img2d):
            return dense_full_jit(img2d, tables_dev, self.preds_flat, self.thresh_flat)

        # batched variant keeps the tables as runtime arguments too (vmap
        # only over the frame axis); a vmap over the closure dense_fn would
        # bake them into the executable as constants
        vm = jax.vmap(dense_sparse_impl, in_axes=(0, None, None, None))
        dense_sparse_batch = jax.jit(vm) if not interpret else vm

        def dense_fn_batch(frames):
            return dense_sparse_batch(
                frames, tables_dev, self.preds_flat, self.thresh_flat
            )

        self._batch_fns[key] = dense_fn_batch
        # raw (unjitted) kernel-chain + device tables, for the multi-chip
        # path (parallel/sharded.py) to re-stage under shard_map
        self._batch_fns[("raw",) + key] = (dense_sparse, scores, tables_dev)

        entry = (plan, dense_fn, dense_fn_full, dense_to_global)
        self._dense_plans[key] = entry
        return entry

    # ------------------------------------------------- prefix-mode escalation

    # Device survivor-resolve capacity: tree-prefix marks beyond this fall
    # back to the host oracle (_resolve_marked). The headline pyramid peaks
    # at ~400 marks/frame; the gather classify costs ~0.65 us/window of
    # device time, so 2048 slots add well under a millisecond. Interpret
    # mode (CPU tests) shrinks the pad so the eager gather classify does
    # not dominate the suite.
    RESOLVE_CAP = 2048

    def _resolve_consts(self, plan, d2g):
        """Build the on-device tree-prefix survivor resolver for `plan`.

        OPT-IN (PIGO_TPU_DEVICE_RESOLVE=1, read at plan-build time): the
        resolver replaces PREFIX_MARK scores in the packed hit list with
        exact full-forest scores from the gather classifier
        (ops/face_dense.classify_windows[_rotated]) inside the same device
        program — no host oracle, no extra round trip. MEASURED on v5e
        (round 5): the gather classify costs ~89 us/window, so the static
        RESOLVE_CAP=2048 slots add ~183 ms to EVERY frame whether or not
        any window is marked — a 20x pessimization of any plan that
        carries prefix/capped scales. The default (None) routes marks to
        the host finish instead (_resolve_marked: native classify_batch or
        the vectorized NumPy oracle, ~400 survivors in ~1 ms). Offset
        tables follow the reference read semantics exactly
        (core/pigo.go:113-147 upright, 150-191 rotated; same construction
        as ops/windows.build_window_plan)."""
        import os

        if os.environ.get("PIGO_TPU_DEVICE_RESOLVE", "0") != "1":
            return None
        svals = sorted({
            sp.scale for sp in plan.scales
            if (sp.prefix_trees or sp.tree_cap) and not sp.fallback
        })
        if not svals:
            return None
        rows, cols = plan.rows, plan.cols
        rcap = min(256, self.RESOLVE_CAP) if self.interpret else self.RESOLVE_CAP
        svals_np = np.asarray(svals, np.int64)
        codes = self._padded.codes.astype(np.int64)  # [T_pad, L, 4]
        s_col = svals_np[:, None, None]
        if plan.angle_idx == 0:
            dr1 = (codes[None, :, :, 0] * s_col) >> 8
            dc1 = (codes[None, :, :, 1] * s_col) >> 8
            dr2 = (codes[None, :, :, 2] * s_col) >> 8
            dc2 = (codes[None, :, :, 3] * s_col) >> 8
            ro1 = jnp.asarray((dr1 * cols + dc1).astype(np.int32))
            ro2 = jnp.asarray((dr2 * cols + dc2).astype(np.int32))
            rrot = None
        else:
            from pigo_tpu.oracle.face import QCOS_TABLE, QSIN_TABLE

            qs = (svals_np * int(QSIN_TABLE[plan.angle_idx]))[:, None, None]
            qc = (svals_np * int(QCOS_TABLE[plan.angle_idx]))[:, None, None]
            c0, c1 = codes[None, :, :, 0], codes[None, :, :, 1]
            c2, c3 = codes[None, :, :, 2], codes[None, :, :, 3]
            rrot = jnp.asarray(np.stack([
                qc * c0 - qs * c1, qs * c0 + qc * c1,
                qc * c2 - qs * c3, qs * c2 + qc * c3,
            ]).astype(np.int32))
            ro1 = ro2 = None
        # per-global-window resolve-table row (valid for prefix windows;
        # any other window a pad slot decodes to is classified and then
        # discarded by the mark mask)
        srow_dev = jnp.asarray(np.clip(
            np.searchsorted(svals_np, plan.scale_w), 0, len(svals) - 1
        ).astype(np.int32))
        rows_dev = jnp.asarray(plan.rows_w.astype(np.int32))
        cols_dev = jnp.asarray(plan.cols_w.astype(np.int32))
        d2g_dev = jnp.asarray(d2g.astype(np.int32)) if d2g.size else None
        mark_lo = jnp.float32(face_pallas.PREFIX_MARK / 2)
        depth, leaves = self.forest.depth, self.forest.num_leaves
        t_pad, block = self.t_pad, self.block
        preds_g, thresh_g = self.preds_g, self.thresh_g
        thresh_last = self.thresh_last

        def resolve(img2d, idx, qv):
            marked = (idx >= 0) & (qv >= mark_lo)
            take = jnp.argsort(~marked)[:rcap]  # stable: marked slots first
            tm = marked[take]
            didx = jnp.clip(idx[take], 0)
            gidx = d2g_dev[didx] if d2g_dev is not None else didx
            rw, cw = rows_dev[gidx], cols_dev[gidx]
            pix = img2d.reshape(-1)
            if rrot is None:
                qf = face_dense.classify_windows(
                    pix, rw * cols + cw, srow_dev[gidx], ro1, ro2,
                    preds_g, thresh_g, thresh_last,
                    depth=depth, num_leaves=leaves, t_pad=t_pad, block=block,
                )
            else:
                qf = face_dense.classify_windows_rotated(
                    pix, rw, cw, srow_dev[gidx], rrot,
                    preds_g, thresh_g, thresh_last,
                    depth=depth, num_leaves=leaves, t_pad=t_pad,
                    nrows=rows, dim=cols, block=block,
                )
            qv = qv.at[take].set(jnp.where(tm, qf, qv[take]))
            idx = idx.at[take].set(
                jnp.where(tm & (qf <= 0.0), -1, idx[take]))
            return qv, idx

        return resolve

    def _classify_exact_host(self, img2d, coords, angle=0.0) -> np.ndarray:
        """Exact f32 cascade scores for explicit windows int [N, 3]
        (row, col, scale): the native engine when available, otherwise the
        vectorized NumPy oracle. Finishes the few windows the device's
        tree-prefix pass left undecided (ops/face_pallas.PREFIX_TREES)."""
        coords = np.asarray(coords, np.int32).reshape(-1, 3)
        if coords.shape[0] == 0:
            return np.zeros(0, np.float32)
        pix = np.asarray(img2d, np.uint8)
        rows, cols = pix.shape[-2], pix.shape[-1]
        nat = self._native_tail()
        if nat is not None:
            return nat.classify_batch(pix.ravel(), rows, cols, coords, angle)
        from pigo_tpu.oracle.face import (oracle_classify_region,
                                          oracle_classify_rotated_region)

        out = np.empty(coords.shape[0], np.float32)
        for s in np.unique(coords[:, 2]):
            m = coords[:, 2] == s
            if angle > 0.0:
                out[m] = oracle_classify_rotated_region(
                    self.forest, coords[m, 0], coords[m, 1], int(s),
                    min(angle, 1.0), rows, cols, pix.ravel(), cols)
            else:
                out[m] = oracle_classify_region(
                    self.forest, coords[m, 0], coords[m, 1], int(s),
                    pix.ravel(), cols)
        return out

    def _resolve_marked(self, dets, img2d, angle=0.0) -> np.ndarray:
        """Replace PREFIX_MARK placeholder scores in [N, 4] detection rows
        with exact host-computed scores; drop rows that turn out q <= 0."""
        if dets.shape[0] == 0:
            return dets
        marked = dets[:, 3] >= face_pallas.PREFIX_MARK / 2
        if not marked.any():
            return dets
        q = self._classify_exact_host(
            img2d, dets[marked, :3].astype(np.int32), angle)
        dets = dets.copy()
        dets[marked, 3] = q.astype(np.float64)
        return dets[dets[:, 3] > 0.0]

    # ---------------------------------------------------------- native tail

    def _native_tail(self):
        """Host C++ engine for the sparse tail scales (see
        ops/face_pallas.TAIL_MIN_WINDOWS); None when unavailable/disabled."""
        import os

        if (
            self._native_failed
            or self._raw is None
            or os.environ.get("PIGO_TPU_NO_NATIVE")
        ):
            return None
        if self._native is None:
            try:
                from pigo_tpu.native import NativeFaceCascade

                self._native = NativeFaceCascade(self._raw)
            except Exception:
                self._native_failed = True
                return None
        return self._native

    def _fallback_hits(self, img2d, plan, rows, cols, min_size, max_size,
                       shift_factor, scale_factor, angle=0.0) -> np.ndarray:
        """Hits for the plan's host-side windows — whole fallback scales
        (rotated border bands no longer exist: the clamp-extended planes
        run the full grid on device, ops/face_pallas.ScalePlan). Host C++
        engine when available (overlaps the in-flight device computation),
        otherwise the exact gather kernel / vectorized NumPy oracle.
        Returns [N, 4] float64 rows."""
        fb_scales = [sp.scale for sp in plan.scales if sp.fallback]
        nat = self._native_tail()
        parts = []
        if nat is not None:
            pix = np.asarray(img2d, np.uint8).ravel()
            if fb_scales:
                parts.append(nat.run_scales(
                    pix, rows, cols, np.asarray(fb_scales, np.int32),
                    shift_factor=shift_factor, angle=angle,
                ))
            return (np.concatenate(parts) if parts
                    else np.zeros((0, 4), np.float64))
        # cast like every other path: non-uint8 host input must not reach
        # the gather kernel raw (its compares would see untruncated values)
        if fb_scales:
            fb_plan, fb_q = self._gather_scores(
                jnp.asarray(img2d, jnp.uint8).reshape(-1), rows, cols, cols,
                min_size, max_size, shift_factor, scale_factor, angle,
                fb_scales,
            )
            fb_q = np.asarray(fb_q)[: fb_plan.num_windows]
            hit = fb_q > 0.0
            n = fb_plan.num_windows
            parts.append(np.stack(
                [
                    fb_plan.rows_w[:n][hit].astype(np.float64),
                    fb_plan.cols_w[:n][hit].astype(np.float64),
                    fb_plan.scales[fb_plan.scale_idx[:n][hit]].astype(
                        np.float64),
                    fb_q[hit].astype(np.float64),
                ],
                axis=1,
            ))
        return (np.concatenate(parts) if parts
                else np.zeros((0, 4), np.float64))

    def device_plan_arrays(self, rows, cols, min_size, max_size,
                           shift_factor, scale_factor, angle_idx=0,
                           prefix=None, tree_cap=None):
        """Device-resident (row, col, scale) tables for every plan window +
        the dense->global index map — lets downstream XLA programs decode the
        packed hit list without a host round trip."""
        prefix = self.prefix if prefix is None else prefix
        key = ("dev", rows, cols, min_size, max_size, shift_factor,
               scale_factor, angle_idx, prefix, self._resolved_cap(tree_cap))
        hit = self._batch_fns.get(key)
        if hit is not None:
            return hit
        plan, _, _, d2g = self._dense_plan(
            rows, cols, min_size, max_size, shift_factor, scale_factor,
            angle_idx, prefix, tree_cap,
        )
        arrays = {
            "rows_w": jnp.asarray(plan.rows_w, jnp.int32),
            "cols_w": jnp.asarray(plan.cols_w, jnp.int32),
            "scale_w": jnp.asarray(plan.scale_w, jnp.int32),
            "d2g": jnp.asarray(
                d2g if d2g.size else np.zeros(1, np.int64), jnp.int32
            ),
        }
        self._batch_fns[key] = arrays
        return arrays

    # ------------------------------------------------------------- detection

    def window_scores(
        self,
        pixels: np.ndarray | jax.Array,
        rows: int,
        cols: int,
        dim: int,
        min_size: int,
        max_size: int,
        shift_factor: float,
        scale_factor: float,
        angle: float = 0.0,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Scores for every pyramid window, reference scan order.

        Returns (host coords [Nw, 3] = (row, col, scale), scores [Nw] f32).
        """
        use_pallas = (
            self.backend == "pallas" and angle <= 0.0 and dim == cols
        )
        if not use_pallas:
            plan, q = self._gather_scores(
                jnp.asarray(pixels, jnp.uint8).reshape(-1),
                rows, cols, dim, min_size, max_size, shift_factor, scale_factor,
                angle,
            )
            n = plan.num_windows
            coords = np.stack(
                [plan.rows_w[:n], plan.cols_w[:n], plan.scales[plan.scale_idx[:n]]],
                axis=1,
            )
            return coords, np.asarray(q)[:n]

        plan, _, dense_fn_full, d2g = self._dense_plan(
            rows, cols, min_size, max_size, shift_factor, scale_factor
        )
        img2d = jnp.asarray(pixels, jnp.uint8).reshape(rows, cols)
        q_dense = np.asarray(dense_fn_full(img2d))
        marked = q_dense >= face_pallas.PREFIX_MARK / 2
        if marked.any():  # exact host finish for tree-prefix survivors
            coords_m = np.stack(
                [plan.rows_w[d2g[marked]], plan.cols_w[d2g[marked]],
                 plan.scale_w[d2g[marked]]], axis=1)
            q_dense = q_dense.copy()
            q_dense[marked] = self._classify_exact_host(
                np.asarray(img2d), coords_m)

        coords = np.stack([plan.rows_w, plan.cols_w, plan.scale_w], axis=1)
        q_full = np.full(plan.num_windows, -1.0, np.float32)
        q_full[d2g] = q_dense
        if plan.has_fallback:
            fb_scales = [sp.scale for sp in plan.scales if sp.fallback]
            fb_plan, fb_q = self._gather_scores(
                img2d.reshape(-1), rows, cols, cols, min_size, max_size,
                shift_factor, scale_factor, 0.0, fb_scales,
            )
            fb_q = np.asarray(fb_q)[: fb_plan.num_windows]
            fb_mask = np.ones(plan.num_windows, bool)
            fb_mask[d2g] = False
            q_full[fb_mask] = fb_q
        return coords, q_full

    def sparse_hits(
        self,
        pixels: np.ndarray | jax.Array,
        rows: int,
        cols: int,
        *,
        min_size: int = 20,
        max_size: int = 1000,
        shift_factor: float = 0.1,
        scale_factor: float = 1.1,
        angle: float = 0.0,
    ) -> np.ndarray:
        """Fast path: dense kernels + on-device hit compaction.

        Returns [N, 4] (row, col, scale, q) with q > 0, reference scan order.
        Only ships the sparse hit list over the host link (the full dense
        score vector stays on device). For angle > 0 the dense kernels run
        the rotated cascade on each scale's interior window rectangle and
        the host scans the clamp-affected border bands."""
        return self._collect_single(
            self._dispatch_single(pixels, rows, cols, min_size, max_size,
                                  shift_factor, scale_factor, angle)
        )

    def _dispatch_single(self, pixels, rows, cols, min_size, max_size,
                         shift_factor, scale_factor, angle=0.0):
        """Async half of sparse_hits: H2D + kernel dispatch + D2H enqueue are
        all non-blocking; the host tail engine runs while the device works.
        Returns an opaque ticket for _collect_single."""
        angle = min(angle, 1.0)
        angle_idx = int(32.0 * angle) if angle > 0.0 else 0
        plan, dense_fn, dense_fn_full, d2g = self._dense_plan(
            rows, cols, min_size, max_size, shift_factor, scale_factor,
            angle_idx,
        )
        if plan.num_windows == 0:  # image smaller than the minimum face size
            return (None, None, plan, d2g, dense_fn_full, None, None)
        img2d = jnp.asarray(pixels, jnp.uint8).reshape(rows, cols)
        # Host pixels for the tail engine and the tree-prefix survivor
        # finish, WITHOUT a per-frame device round trip at collect time
        # (callers normally hand us numpy frames; a device-array input pays
        # one fetch here, at dispatch, where it can overlap).
        host_pix = (
            pixels if isinstance(pixels, np.ndarray) else np.asarray(img2d)
        )
        host_pix = np.asarray(host_pix, np.uint8).reshape(rows, cols)
        if d2g.size == 0:  # every scale routed to the fallback engine
            fut = None
        else:
            fut = dense_fn(img2d)  # async dispatch; fetch after the tail
            try:
                fut.copy_to_host_async()
            except AttributeError:
                pass
        fb = None
        if plan.has_fallback:
            fb = self._fallback_hits(host_pix, plan, rows, cols, min_size,
                                     max_size, shift_factor, scale_factor,
                                     angle)
        return (fut, fb, plan, d2g, dense_fn_full, img2d, host_pix)

    def _collect_single(self, ticket, packed=None) -> np.ndarray:
        """Blocking half of sparse_hits: fetch + unpack + tail merge.

        `packed` lets a caller supply the already-fetched hit list (e.g.
        from a batched jax.device_get combining several transfers into one
        host-link round trip)."""
        fut, fb, plan, d2g, dense_fn_full, img2d, host_pix = ticket
        if plan.num_windows == 0:
            return np.zeros((0, 4), dtype=np.float64)
        cap = self.HIT_CAPACITY
        if packed is not None:
            pass
        elif fut is None:
            # no dense scales: empty hit list (idx slots must be -1 — a zero
            # index would read as a valid hit at window 0)
            packed = np.concatenate([
                np.zeros(1, np.float32), np.full(cap, -1.0, np.float32),
                np.zeros(cap, np.float32),
            ])
        else:
            packed = np.asarray(fut)
        return self._decode_hits(packed, fb, plan, d2g, dense_fn_full, img2d,
                                 host_pix)

    def _decode_hits(self, packed, fb, plan, d2g, dense_fn_full, img2d,
                     host_pix=None):
        """Unpack one frame's packed hit list and merge the tail detections
        in reference scan order. Shared by the single, batched, and
        streaming collect paths."""
        cap = self.HIT_CAPACITY
        count = int(packed[0])
        if count > cap:  # capacity overflow: dense re-read (rare)
            q_dense = np.asarray(dense_fn_full(img2d))
            sel = q_dense > 0.0
            idx_valid = np.nonzero(sel)[0]
            qv_valid = q_dense[sel]
        else:
            idx = packed[1 : 1 + cap].astype(np.int64)
            valid = idx >= 0
            idx_valid = idx[valid]
            qv_valid = packed[1 + cap :][valid].astype(np.float32)
        gidx = d2g[idx_valid] if d2g.size else idx_valid
        dets = np.stack(
            [
                plan.rows_w[gidx].astype(np.float64),
                plan.cols_w[gidx].astype(np.float64),
                plan.scale_w[gidx].astype(np.float64),
                qv_valid.astype(np.float64),
            ],
            axis=1,
        )
        # exact host finish for tree-prefix survivors (PREFIX_MARK rows)
        dets = self._resolve_marked(
            dets, img2d if host_pix is None else host_pix,
            plan.angle_idx / 32.0)
        if fb is not None and fb.shape[0]:
            # Merge keeping reference scan order (scale-major, then row,
            # then col): window coords are unique per scale, so a lexsort
            # restores the global order even when host border-band hits
            # interleave with the device's interior hits within one scale
            # (rotated plans).
            dets = np.concatenate([dets, fb])
            order = np.lexsort((dets[:, 1], dets[:, 0], dets[:, 2]))
            dets = dets[order]
        return dets

    def _dispatch_batch(self, frames, min_size, max_size, shift_factor,
                        scale_factor, angle=0.0):
        """Async half of the batched fast path: dispatch the vmapped dense
        kernels (non-blocking) and run the host tail engine. Returns an
        opaque ticket for _collect_batch."""
        angle = min(angle, 1.0)
        angle_idx = int(32.0 * angle) if angle > 0.0 else 0
        frames_in = frames
        frames = jnp.asarray(frames, jnp.uint8)
        b, rows, cols = frames.shape
        key = (rows, cols, min_size, max_size, shift_factor, scale_factor,
               angle_idx, self.prefix, self._resolved_cap())
        plan, dense_fn, dense_fn_full, d2g = self._dense_plan(
            rows, cols, min_size, max_size, shift_factor, scale_factor,
            angle_idx,
        )
        if plan.num_windows == 0:
            return (None, None, None, b, plan, d2g, dense_fn_full, frames)
        batch_fn = self._batch_fns[key]  # registered by _dense_plan
        fut = batch_fn(frames) if d2g.size else None  # async dispatch
        if fut is not None:
            try:
                fut.copy_to_host_async()
            except AttributeError:  # older jax Array without async copy
                pass
        # Host copy for the tail engine + the tree-prefix survivor finish,
        # without per-frame device round trips at collect time.
        host_frames = np.asarray(
            frames_in if isinstance(frames_in, np.ndarray) else frames,
            np.uint8,
        ).reshape(b, rows, cols)
        fbs = None
        if plan.has_fallback:
            fbs = [
                self._fallback_hits(host_frames[i], plan, rows, cols,
                                    min_size, max_size, shift_factor,
                                    scale_factor, angle)
                for i in range(b)
            ]
        return (fut, fbs, None, b, plan, d2g, dense_fn_full, frames,
                host_frames)

    def _collect_batch(self, ticket) -> list[np.ndarray]:
        """Blocking half: fetch the packed hit lists and unpack per frame."""
        fut, fbs, _, b, plan, d2g, dense_fn_full, frames, host_frames = ticket
        cap = self.HIT_CAPACITY
        if plan.num_windows == 0:
            return [np.zeros((0, 4), dtype=np.float64) for _ in range(b)]
        if fut is not None:
            packed = np.asarray(fut)
        else:
            # empty per-frame hit lists (idx slots -1, see _collect_single)
            packed = np.zeros((b, 1 + 2 * cap), np.float32)
            packed[:, 1 : 1 + cap] = -1.0
        return [
            self._decode_hits(
                packed[i], fbs[i] if fbs is not None else None, plan, d2g,
                dense_fn_full, frames[i], host_frames[i],
            )
            for i in range(b)
        ]

    def sparse_hits_batch(
        self,
        frames: np.ndarray | jax.Array,  # [B, rows, cols] uint8
        *,
        min_size: int = 20,
        max_size: int = 1000,
        shift_factor: float = 0.1,
        scale_factor: float = 1.1,
        angle: float = 0.0,
    ) -> list[np.ndarray]:
        """Batched fast path: one device dispatch + one host fetch for B
        frames (vmapped dense kernels + hit compaction). The per-call host
        dispatch and transfer latency is amortized over the batch — this is
        the throughput-serving entry point. Returns per-frame [Ni, 4]
        (row, col, scale, q) lists, reference scan order."""
        return self._collect_batch(
            self._dispatch_batch(frames, min_size, max_size, shift_factor,
                                 scale_factor, angle)
        )

    def stream_hits(
        self,
        frames,  # iterable of [rows, cols] uint8 frames
        *,
        min_size: int = 20,
        max_size: int = 1000,
        shift_factor: float = 0.1,
        scale_factor: float = 1.1,
        angle: float = 0.0,
        depth: int = 8,
    ):
        """Streaming pipeline: keeps up to `depth` frames in flight so H2D
        uploads, kernels, and D2H hit-list copies all overlap; the host tail
        engine runs under the device compute. Yields per-frame [Ni, 4] hit
        arrays in input order. This is the serving loop for realtime
        pipelines (the reference's WASM render loop equivalent,
        wasm/canvas/canvas.go:69-112); steady-state throughput is bounded by
        device compute, not by the host link latency."""
        import collections

        kw = dict(min_size=min_size, max_size=max_size,
                  shift_factor=shift_factor, scale_factor=scale_factor,
                  angle=angle)
        inflight: collections.deque = collections.deque()
        for frame in frames:
            rows, cols = frame.shape[-2], frame.shape[-1]
            inflight.append(
                self._dispatch_single(frame, rows, cols, **kw)
            )
            if len(inflight) >= depth:
                yield self._collect_single(inflight.popleft())
        while inflight:
            yield self._collect_single(inflight.popleft())

    def run_cascade(
        self,
        pixels: np.ndarray | jax.Array,
        rows: int,
        cols: int,
        dim: int | None = None,
        *,
        min_size: int = 20,
        max_size: int = 1000,
        shift_factor: float = 0.1,
        scale_factor: float = 1.1,
        angle: float = 0.0,
    ) -> np.ndarray:
        """Multi-scale detection pass. Returns [N, 4] (row, col, scale, q>0)
        in the reference's scan order (scale-major, then row, then col)."""
        dim = cols if dim is None else dim
        if self.backend == "pallas" and dim != cols and (
            angle == 0.0 or rows <= cols
        ):
            # Strided frames (reference ImageParams.Dim, core/pigo.go:29-34)
            # de-stride exactly: every classifier read lands in [0, cols)
            # (upright offsets |(code*s)>>8| < s/2 against the s/2+1 window
            # margin; rotated reads clamp columns with nrows-1 <= cols-1
            # when rows <= cols), so dropping the dim-cols pad columns
            # changes no pixel any window can touch. The fast path then
            # runs the contiguous frame. TALL rotated strided frames
            # (rows > cols) are excluded: there the reference's nrows-1
            # column clamp reads stride-PAD bytes (flat index r*dim + c
            # with c in [cols, nrows-1]), which destriding would replace
            # with wrapped next-row pixels — those route to the gather
            # backend below, which honors the stride natively.
            if dim < cols:
                raise ValueError(f"dim {dim} < cols {cols}")
            pixels = destride(pixels, rows, cols, dim)
            dim = cols
        if self.backend == "pallas" and dim == cols:
            # Upright AND rotated pyramids run on the device: the rotated
            # cascade's node reads are window-independent away from the
            # clamp-affected borders (see ops/face_pallas.build_dense_plan),
            # so the same dense kernels cover each scale's interior and the
            # host scans only the border bands + sparse tail scales.
            return self.sparse_hits(
                pixels, rows, cols, min_size=min_size, max_size=max_size,
                shift_factor=shift_factor, scale_factor=scale_factor,
                angle=angle,
            )
        coords, q = self.window_scores(
            pixels, rows, cols, dim, min_size, max_size,
            shift_factor, scale_factor, angle,
        )
        hit = q > 0.0
        if not hit.any():
            return np.zeros((0, 4), dtype=np.float64)
        return np.concatenate(
            [coords[hit].astype(np.float64), q[hit, None].astype(np.float64)],
            axis=1,
        )

    def run_cascade_sweep(
        self,
        pixels: np.ndarray | jax.Array,
        rows: int,
        cols: int,
        angles,  # iterable of angles in [0, 1] (fractions of 2*pi)
        *,
        min_size: int = 20,
        max_size: int = 1000,
        shift_factor: float = 0.1,
        scale_factor: float = 1.1,
    ) -> np.ndarray:
        """In-plane rotated detection sweep (BASELINE config #2): the full
        pyramid at every angle, concatenated as [N, 5] rows
        (row, col, scale, q, angle). Every angle's dense kernels run on the
        device; each dispatch is asynchronous, so the host border/tail
        scans of angle i overlap the device work of angle i (and the
        in-flight transfers of earlier angles). Cluster the result with a
        small IoU threshold to merge the same face found at neighboring
        angles."""
        kw = dict(min_size=min_size, max_size=max_size,
                  shift_factor=shift_factor, scale_factor=scale_factor)
        angles = list(angles)
        if self.backend == "pallas":
            tickets = [
                self._dispatch_single(pixels, rows, cols, angle=max(a, 0.0),
                                      **kw)
                for a in angles
            ]
            parts = []
            for a, ticket in zip(angles, tickets):
                dets = self._collect_single(ticket)
                parts.append(np.concatenate(
                    [dets, np.full((dets.shape[0], 1), max(a, 0.0))], axis=1))
        else:
            parts = []
            for a in angles:
                dets = self.run_cascade(pixels, rows, cols,
                                        angle=max(a, 0.0), **kw)
                parts.append(np.concatenate(
                    [dets, np.full((dets.shape[0], 1), max(a, 0.0))], axis=1))
        if not parts:
            return np.zeros((0, 5), dtype=np.float64)
        return np.concatenate(parts)

    def detect_sweep(
        self,
        pixels: np.ndarray | jax.Array,
        rows: int,
        cols: int,
        angles,
        *,
        iou_threshold: float = 0.01,
        **kw,
    ) -> np.ndarray:
        """Angle sweep + cross-angle IoU clustering -> clusters [M, 4]."""
        dets = self.run_cascade_sweep(pixels, rows, cols, angles, **kw)
        return cluster_detections(dets[:, :4], iou_threshold)

    def detect(
        self,
        pixels: np.ndarray | jax.Array,
        rows: int,
        cols: int,
        dim: int | None = None,
        *,
        min_size: int = 20,
        max_size: int = 1000,
        shift_factor: float = 0.1,
        scale_factor: float = 1.1,
        angle: float = 0.0,
        iou_threshold: float = 0.2,
    ) -> np.ndarray:
        """run_cascade + ClusterDetections in one call -> clusters [M, 4]."""
        dets = self.run_cascade(
            pixels, rows, cols, dim,
            min_size=min_size, max_size=max_size,
            shift_factor=shift_factor, scale_factor=scale_factor, angle=angle,
        )
        return cluster_detections(dets, iou_threshold)
