"""On-device IoU clustering (fixed capacity).

Same union semantics as the host implementation (ops/cluster.py; reference
core/pigo.go:262-308): ascending-q stable order, each unvisited seed unions
every detection with IoU > threshold (including already-clustered ones),
cluster = integer-truncated mean (row, col, scale) and summed q.

Differences from the host path (documented, both tolerance-level):
  * the IoU-vs-threshold comparison runs in f32 (TPUs have no f64); the
    numerators/denominators are exact integers so only an IoU that equals
    the threshold to within one f32 ulp can flip,
  * the q sum uses XLA's reduction order instead of strict ascending order
    (last-ulp f32 differences).
Row/col/scale outputs are exact integers.

Used for device-resident pipelines (cluster without shipping the hit list
to the host) and for global clustering after a cross-chip all_gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("capacity",))
def cluster_device(
    dets: jax.Array,  # f32 [CC, 4] (row, col, scale, q); pad rows arbitrary
    valid: jax.Array,  # bool [CC]
    iou_threshold: jax.Array | float,
    *,
    capacity: int,
) -> tuple[jax.Array, jax.Array]:
    """Returns (clusters f32 [CC, 4], cluster_valid bool [CC]).

    Cluster slots follow the ascending-q order of their seed detections, so
    compacting the valid slots reproduces the host function's output order.
    """
    cc = capacity
    q_sort = jnp.where(valid, dets[:, 3], jnp.inf)
    order = jnp.argsort(q_sort, stable=True)  # ascending q, invalid last
    d = dets[order]
    v = valid[order]

    r = d[:, 0].astype(jnp.int32)
    c = d[:, 1].astype(jnp.int32)
    s = d[:, 2].astype(jnp.int32)
    q = d[:, 3]

    # Pairwise IoU with exact integer intersection/union terms, scaled by 4
    # to avoid the s/2 half-pixel fractions (square boxes, s^2-sum union).
    r2 = 2 * r
    c2 = 2 * c
    over_r = jnp.maximum(
        0,
        jnp.minimum(r2[:, None] + s[:, None], r2[None, :] + s[None, :])
        - jnp.maximum(r2[:, None] - s[:, None], r2[None, :] - s[None, :]),
    )
    over_c = jnp.maximum(
        0,
        jnp.minimum(c2[:, None] + s[:, None], c2[None, :] + s[None, :])
        - jnp.maximum(c2[:, None] - s[:, None], c2[None, :] - s[None, :]),
    )
    inter4 = (over_r * over_c).astype(jnp.float32)
    union4 = (
        4 * (s[:, None] * s[:, None] + s[None, :] * s[None, :])
    ).astype(jnp.float32) - inter4
    member_mx = (inter4 > jnp.float32(iou_threshold) * union4) & v[None, :]

    def body(i, state):
        assigned, out, out_valid = state
        act = v[i] & ~assigned[i]
        member = member_mx[i] & act
        nn = jnp.sum(member.astype(jnp.int32))
        nn_safe = jnp.maximum(nn, 1)
        rr = jnp.sum(jnp.where(member, r, 0)) // nn_safe
        ccm = jnp.sum(jnp.where(member, c, 0)) // nn_safe
        ss = jnp.sum(jnp.where(member, s, 0)) // nn_safe
        qq = jnp.sum(jnp.where(member, q, 0.0))
        row = jnp.where(
            act & (nn > 0),
            jnp.stack([rr.astype(jnp.float32), ccm.astype(jnp.float32),
                       ss.astype(jnp.float32), qq]),
            out[i],
        )
        out = out.at[i].set(row)
        out_valid = out_valid.at[i].set(act & (nn > 0))
        assigned = assigned | member
        return assigned, out, out_valid

    assigned0 = jnp.zeros(cc, bool)
    out0 = jnp.zeros((cc, 4), jnp.float32)
    ov0 = jnp.zeros(cc, bool)
    _, out, out_valid = jax.lax.fori_loop(0, cc, body, (assigned0, out0, ov0))
    return out, out_valid


def cluster_device_host(dets: np.ndarray, iou_threshold: float,
                        capacity: int = 256) -> np.ndarray:
    """Convenience wrapper: host [N, 4] in -> clustered host [M, 4] out via
    the device kernel (pads to `capacity`; N must be <= capacity)."""
    dets = np.asarray(dets, np.float64).reshape(-1, 4)
    n = dets.shape[0]
    if n > capacity:
        raise ValueError(f"{n} detections exceed device capacity {capacity}")
    buf = np.zeros((capacity, 4), np.float32)
    buf[:n] = dets
    valid = np.zeros(capacity, bool)
    valid[:n] = True
    out, ov = cluster_device(
        jnp.asarray(buf), jnp.asarray(valid), float(iou_threshold),
        capacity=capacity,
    )
    out, ov = np.asarray(out), np.asarray(ov)
    return out[ov].astype(np.float64)
