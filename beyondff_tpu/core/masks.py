"""Boolean-mask algebra: pairwise IoU on the MXU, connected components by
log-step matmul squaring.

The reference computes mask IoU as a dense float matmul on cuBLAS
(reference: tools/projection_2d_to_3d.py:149-166, tools/refinement.py:69-90)
and connected components by O(n) repeated matmuls
(projection_2d_to_3d.py:250-274). Here IoU is a chunked bf16/f32 matmul that
streams the (I, N) mask matrix through the MXU in N-chunks (bounded memory for
100k+ point scenes), and components converge in ceil(log2(I)) boolean matmul
squarings instead of I multiplications.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------- pairwise IoU
@functools.partial(jax.jit, static_argnames=("chunk",))
def pairwise_iou(
    a: jnp.ndarray,  # (Ia, N) bool
    b: Optional[jnp.ndarray] = None,  # (Ib, N) bool; None -> a vs a
    chunk: int = 65536,
) -> jnp.ndarray:
    """(Ia, Ib) float32 IoU. intersection/union with union==0 -> nan (like 0/0)."""
    if b is None:
        b = a
    n = a.shape[1]
    nchunks = max(1, math.ceil(n / chunk))
    pad = nchunks * chunk - n
    af = jnp.pad(a, ((0, 0), (0, pad))).astype(jnp.float32)
    bf = jnp.pad(b, ((0, 0), (0, pad))).astype(jnp.float32)
    af = af.reshape(a.shape[0], nchunks, chunk).transpose(1, 0, 2)
    bf = bf.reshape(b.shape[0], nchunks, chunk).transpose(1, 0, 2)

    def step(acc, ab):
        ac, bc = ab
        return acc + jnp.dot(ac, bc.T, preferred_element_type=jnp.float32), None

    inter, _ = jax.lax.scan(step, jnp.zeros((a.shape[0], b.shape[0]), jnp.float32), (af, bf))
    area_a = jnp.sum(a, axis=1, dtype=jnp.float32)
    area_b = jnp.sum(b, axis=1, dtype=jnp.float32)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / union


# device dispatch below this many multiply-accumulates; under it, one-core
# numpy beats a jit round-trip (and avoids per-shape recompiles)
_DEVICE_MAC_THRESHOLD = 2e8
_ROW_BUCKET = 128  # row counts padded to multiples -> bounded compile cache


def mask_iou(a: np.ndarray, b: Optional[np.ndarray] = None, use_device: Optional[bool] = None) -> np.ndarray:
    """(Ia, Ib) float32 IoU with automatic numpy/device dispatch.

    Device shapes are padded to row buckets so arbitrary instance counts reuse
    a small set of compiled programs; padded rows produce nan (0/0) and are
    sliced off.
    """
    a = np.asarray(a).astype(bool)
    b_arr = a if b is None else np.asarray(b).astype(bool)
    ia, ib, n = a.shape[0], b_arr.shape[0], a.shape[1] if a.ndim == 2 else 0
    if ia == 0 or ib == 0:
        return np.zeros((ia, ib), np.float32)
    if use_device is None:
        use_device = ia * ib * n > _DEVICE_MAC_THRESHOLD
    if not use_device:
        af = a.astype(np.float32)
        bf = af if b is None else b_arr.astype(np.float32)
        inter = af @ bf.T
        union = af.sum(1)[:, None] + bf.sum(1)[None, :] - inter
        with np.errstate(invalid="ignore", divide="ignore"):
            return inter / union
    pa = -ia % _ROW_BUCKET
    pb = -ib % _ROW_BUCKET
    a_p = np.pad(a, ((0, pa), (0, 0)))
    b_p = a_p if b is None else np.pad(b_arr, ((0, pb), (0, 0)))
    from beyondff_tpu.kernels import dispatch

    if dispatch.on_tpu():
        from beyondff_tpu.kernels import mask_iou as kiou

        out = np.asarray(kiou.pad_and_iou(jnp.asarray(a_p),
                                          None if b is None else jnp.asarray(b_p)))
    else:
        out = np.asarray(pairwise_iou(jnp.asarray(a_p), None if b is None else jnp.asarray(b_p)))
    return out[:ia, :ib]


def pairwise_iou_np(a: np.ndarray, b: Optional[np.ndarray] = None) -> np.ndarray:
    """NumPy oracle with identical semantics (float64 accumulate)."""
    a = np.asarray(a, dtype=np.float64)
    b = a if b is None else np.asarray(b, dtype=np.float64)
    inter = a @ b.T
    union = a.sum(1)[:, None] + b.sum(1)[None, :] - inter
    with np.errstate(invalid="ignore", divide="ignore"):
        return inter / union


# ------------------------------------------------------- connected components
@jax.jit
def connected_components(adj: jnp.ndarray) -> jnp.ndarray:
    """Component id (= min member index) per node of an undirected graph.

    ``adj`` is a (I, I) bool adjacency matrix; self-loops are added here.
    Reachability closes in ceil(log2(I)) squarings R <- R | R@R.
    """
    n = adj.shape[0]
    r = adj | jnp.eye(n, dtype=bool)

    def step(r, _):
        rf = r.astype(jnp.float32)
        return (jnp.dot(rf, rf, preferred_element_type=jnp.float32) > 0) | r, None

    steps = max(1, math.ceil(math.log2(max(n, 2))))
    r, _ = jax.lax.scan(step, r, None, length=steps)
    idx = jnp.arange(n, dtype=jnp.int32)
    return jnp.min(jnp.where(r, idx[None, :], n), axis=1)


def connected_components_np(adj: np.ndarray) -> np.ndarray:
    """NumPy oracle: BFS labelling with min-member-index component ids."""
    n = adj.shape[0]
    adj = np.asarray(adj, dtype=bool) | np.eye(n, dtype=bool)
    comp = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        if comp[i] >= 0:
            continue
        frontier = {i}
        seen = {i}
        while frontier:
            nxt = set()
            for u in frontier:
                nxt |= set(np.flatnonzero(adj[u]))
            nxt -= seen
            seen |= nxt
            frontier = nxt
        comp[list(seen)] = i
    return comp


# ----------------------------------------------------------- grouped reduce
@jax.jit
def group_or_and_mean(
    masks: jnp.ndarray,  # (I, N) bool
    confs: jnp.ndarray,  # (I,) float32
    group_onehot: jnp.ndarray,  # (C, I) bool: group c contains node i
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per group: OR of member masks (MXU matmul) and mean of member confs."""
    g = group_onehot.astype(jnp.float32)
    merged = jnp.dot(g, masks.astype(jnp.float32), preferred_element_type=jnp.float32) > 0
    sizes = jnp.sum(g, axis=1)
    mean_conf = jnp.dot(g, confs.astype(jnp.float32)) / jnp.maximum(sizes, 1.0)
    return merged, mean_conf
