"""Point-cloud <-> image geometry: projection, visibility, 2D->3D mask lifting.

TPU-first redesign of the reference's per-frame NumPy loop
(reference: tools/projection_2d_to_3d.py:37-92,413-461): frames become a batch
axis (``vmap``/``lax.map``), the world->camera transform and pinhole intrinsics
are pre-fused into a single (3,4) matrix per frame in float64 on host, and the
per-point work (project, round, depth test, mask gather) runs as one fused XLA
program per frame chunk. Unlike the reference, which runs projection twice per
scene (mask lift, then a second full pass for per-point view counts,
projection_2d_to_3d.py:524-578), :func:`lift_frames` emits ``masked_counts``
and ``viewed_counts`` in the same pass.

Semantics parity notes:
  * pixel coords use round-half-to-even exactly like ``np.round``
    (projection_2d_to_3d.py:47);
  * visibility = in-bounds AND depth!=0 AND |z_cam - depth| < thresh
    (projection_2d_to_3d.py:51-70); no explicit z>0 test, matching the
    reference;
  * the 4x4 pose inverse and intrinsic product are computed in float64 on the
    host; per-point math is float32 on device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fuse_projection(cam_intr: np.ndarray, cam_pose: np.ndarray) -> np.ndarray:
    """Fuse intrinsics and world->camera extrinsics into one (3,4) matrix.

    ``P = K @ inv(pose)[:3]`` so that ``P @ [x,y,z,1]^T = [u*z, v*z, z]``.
    Row 2 of P recovers the camera-space depth z used by the visibility test.
    Computed in float64 (the reference keeps the whole pipeline in numpy
    doubles; only the 4x4 algebra is precision-critical).
    """
    cam_intr = np.asarray(cam_intr, dtype=np.float64)[:3, :3]
    cam_pose = np.asarray(cam_pose, dtype=np.float64)
    world2cam = np.linalg.inv(cam_pose)
    return (cam_intr @ world2cam[:3]).astype(np.float64)


def homogenize(points: np.ndarray) -> np.ndarray:
    """(N,3) xyz -> (4,N) homogeneous float32 (reference: projection_2d_to_3d.py:385-390)."""
    pts = np.asarray(points, dtype=np.float32)[:, :3]
    return np.concatenate([pts.T, np.ones((1, pts.shape[0]), np.float32)], axis=0)


# --------------------------------------------------------------------------
# device-side kernels (pure jnp; all fixed-shape)
# --------------------------------------------------------------------------


def project_and_test(
    pcd_h: jnp.ndarray,  # (4, N) float32 homogeneous world points
    proj: jnp.ndarray,  # (3, 4) float32 fused projection
    depth: jnp.ndarray,  # (H, W) float32 metric depth, 0 = invalid
    depth_thresh: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project points into a frame; return (pixel_id, visible).

    pixel_id: (N,) int32 flattened v*W+u for visible points, -1 otherwise.
    visible:  (N,) bool visibility mask.
    """
    h, w = depth.shape
    # full-f32 matmul: pixel rounding parity depends on it (bf16 passes shift
    # projected coords by ~1e-2 px and flip round() results)
    cam = jnp.dot(proj, pcd_h, precision=jax.lax.Precision.HIGHEST)  # (3, N): [u*z, v*z, z]
    z = cam[2]
    inv_z = jnp.where(z != 0, 1.0 / z, 0.0)
    u_f = cam[0] * inv_z
    v_f = cam[1] * inv_z
    finite = jnp.isfinite(u_f) & jnp.isfinite(v_f) & (z != 0)
    # round-half-to-even to match np.round, then in-bounds test on ints
    u = jnp.round(u_f).astype(jnp.int32)
    v = jnp.round(v_f).astype(jnp.int32)
    inb = finite & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    u_c = jnp.clip(u, 0, w - 1)
    v_c = jnp.clip(v, 0, h - 1)
    d = depth[v_c, u_c]
    visible = inb & (d != 0) & (jnp.abs(z - d) < depth_thresh)
    pixel_id = jnp.where(visible, v_c * w + u_c, -1)
    return pixel_id.astype(jnp.int32), visible


def gather_mask_membership(
    pixel_id: jnp.ndarray,  # (N,) int32, -1 for invisible
    masks: jnp.ndarray,  # (M, H*W) bool flattened 2D masks
) -> jnp.ndarray:
    """(M, N) bool: point n belongs to 2D mask m and is visible.

    Matches compute_visible_masked_pts_tensor (projection_2d_to_3d.py:73-92)
    but as a single gather instead of a python loop over masks.
    """
    safe = jnp.maximum(pixel_id, 0)
    member = jnp.take(masks, safe, axis=1)  # (M, N)
    return member & (pixel_id >= 0)[None, :]


@functools.partial(jax.jit, static_argnames=("out_hw", "depth_scale"))
def prepare_depth(depth_u16: jnp.ndarray, out_hw: Tuple[int, int],
                  depth_scale: float = 1000.0) -> jnp.ndarray:
    """(F, h0, w0) raw uint16 depth -> (F, H, W) metric float32 on device.

    Uploading native-resolution uint16 instead of resized float32 cuts
    host->device traffic ~8x; the bilinear resize (half-pixel convention,
    like cv2 INTER_LINEAR) runs on device. Values differ from the cv2
    fixed-point path at the ~1e-3 level — disable via
    ``frames.device_depth_resize`` for bit-exact host resizing.
    """
    f = depth_u16.shape[0]
    metric = depth_u16.astype(jnp.float32) / depth_scale
    if depth_u16.shape[1:] == tuple(out_hw):
        return metric
    return jax.image.resize(metric, (f, *out_hw), method="linear")


def pack_masks(masks: np.ndarray) -> np.ndarray:
    """(M<=32, HW) bool -> (HW,) uint32 bitfield (bit m = mask m).

    Packing shrinks host->device transfer and HBM gather traffic 8-32x and
    turns the per-mask membership gather into a single word gather per point.
    """
    m = masks.shape[0]
    if m > 32:
        raise ValueError(f"pack_masks supports up to 32 masks, got {m}")
    out = np.zeros(masks.shape[1], np.uint32)
    for i in range(m):
        out |= masks[i].astype(np.uint32) << np.uint32(i)
    return out


@functools.partial(jax.jit, static_argnames=("depth_thresh", "n_masks"))
def lift_frames_packed(
    pcd_h: jnp.ndarray,  # (4, N)
    projs: jnp.ndarray,  # (F, 3, 4)
    depths: jnp.ndarray,  # (F, H, W)
    masks_packed: jnp.ndarray,  # (F, H*W) uint32 bitfields
    depth_thresh: float = 0.08,
    n_masks: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Bit-packed variant of :func:`lift_frames`: one uint32 gather per point
    recovers membership in up to 32 masks. Returns (membership (F, n_masks, N),
    masked_counts, viewed_counts)."""

    def one(proj, depth, packed):
        pid, vis = project_and_test(pcd_h, proj, depth, depth_thresh)
        words = jnp.take(packed, jnp.maximum(pid, 0))  # (N,) uint32
        words = jnp.where(pid >= 0, words, jnp.uint32(0))
        bits = (words[None, :] >> jnp.arange(n_masks, dtype=jnp.uint32)[:, None]) & 1
        return bits.astype(bool), vis

    membership, vis = jax.vmap(one)(projs, depths, masks_packed)
    masked_counts = jnp.sum(membership, axis=(0, 1), dtype=jnp.int32)
    viewed_counts = jnp.sum(vis, axis=0, dtype=jnp.int32)
    return membership, masked_counts, viewed_counts


def rle_runs_to_packed(run_starts: jnp.ndarray, run_ends: jnp.ndarray,
                       hw: int) -> jnp.ndarray:
    """(F, M<=32, R) RLE run bounds -> (F, HW) uint32 packed masks, on device.

    Interval decode as scatter + cumsum: +1 at each run start, -1 at each
    (half-open) end, prefix-sum along pixels. Runs within a mask are disjoint
    so the int8 running value stays in {0, 1} — exact. Pad runs use
    start = HW+1 (their end is rewritten to land with the start, so they
    cancel outside the pixel range)."""
    f, m, _ = run_starts.shape
    en = jnp.where(run_starts > hw, hw + 1, run_ends)
    st = jnp.clip(run_starts, 0, hw + 1)
    fi = jnp.arange(f)[:, None, None]
    mi = jnp.arange(m)[None, :, None]
    delta = jnp.zeros((f, m, hw + 2), jnp.int8)
    delta = delta.at[fi, mi, st].add(1)
    delta = delta.at[fi, mi, en].add(-1)
    dense = jnp.cumsum(delta, axis=-1)[..., :hw] > 0
    shifts = jnp.arange(m, dtype=jnp.uint32)[None, :, None]
    return jnp.sum(dense.astype(jnp.uint32) << shifts, axis=1)


@functools.partial(jax.jit, static_argnames=("depth_thresh",))
def lift_frames_rle(
    pcd_h: jnp.ndarray,  # (4, N)
    projs: jnp.ndarray,  # (F, 3, 4)
    depths: jnp.ndarray,  # (F, H, W)
    run_starts: jnp.ndarray,  # (F, M, R) int32, 0-based, ascending; pad = HW+1
    run_ends: jnp.ndarray,  # (F, M, R) int32, half-open ends; pad = 0
    depth_thresh: float = 0.08,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Membership straight from RLE runs: instead of uploading an (H*W) bitmap
    per frame (4 MB+ at ScanNet resolution), upload each mask's run bounds
    (KBs) and binary-search every visible point's pixel id against them —
    runs are disjoint and ascending, so a point is inside mask m iff
    ``starts[i] <= pid < ends[i]`` for ``i = searchsorted(starts, pid) - 1``.
    Pad runs use start = HW+1 (> any pid, keeps the array sorted and
    unreachable). Returns (membership (F, M, N), masked_counts, viewed_counts).

    Lookup strategy (measured on a v5e at N=256k, F=8): scatter+cumsum decode
    of the runs into device-side packed bitmaps, then ONE uint32 gather per
    point (M<=32). The alternatives lose badly: per-point searchsorted lowers
    to log2(R) rounds of random gathers (~870 ms/chunk), and an R x N
    compare-all materializes GB-scale intermediates (~340 ms/chunk) vs ~30 ms
    for this path.
    """
    f, m, _ = run_starts.shape
    hw = depths.shape[1] * depths.shape[2]

    if m <= 32:
        packed = rle_runs_to_packed(run_starts, run_ends, hw)
        return lift_frames_packed(pcd_h, projs, depths, packed, depth_thresh,
                                  n_masks=m)

    def one(proj, depth, st, en):
        pid, vis = project_and_test(pcd_h, proj, depth, depth_thresh)
        pidc = jnp.maximum(pid, 0)

        def member_one(st_m, en_m):
            idx = jnp.searchsorted(st_m, pidc, side="right") - 1
            inside = (idx >= 0) & (pidc < en_m[jnp.maximum(idx, 0)])
            return inside & (pid >= 0)

        return jax.vmap(member_one)(st, en), vis

    membership, vis = jax.vmap(one)(projs, depths, run_starts, run_ends)
    masked_counts = jnp.sum(membership, axis=(0, 1), dtype=jnp.int32)
    viewed_counts = jnp.sum(vis, axis=0, dtype=jnp.int32)
    return membership, masked_counts, viewed_counts


@functools.partial(jax.jit, static_argnames=("depth_thresh",))
def lift_frames(
    pcd_h: jnp.ndarray,  # (4, N)
    projs: jnp.ndarray,  # (F, 3, 4)
    depths: jnp.ndarray,  # (F, H, W)
    masks: jnp.ndarray,  # (F, M, H*W) bool, padded along M
    mask_valid: jnp.ndarray,  # (F, M) bool padding flags
    depth_thresh: float = 0.08,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Lift a chunk of frames' 2D masks onto the shared point cloud.

    Returns:
      membership: (F, M, N) bool point membership per (frame, mask)
      masked_counts: (N,) int32 — number of (frame, mask) pairs covering each
        point (reference: projection_2d_to_3d.py:459-461)
      viewed_counts: (N,) int32 — number of frames in which each point is
        visible (reference: projection_2d_to_3d.py:537-567)
    """

    def one(proj, depth, m, mv):
        pid, vis = project_and_test(pcd_h, proj, depth, depth_thresh)
        member = gather_mask_membership(pid, m) & mv[:, None]
        return member, vis

    membership, vis = jax.vmap(one)(projs, depths, masks, mask_valid)
    masked_counts = jnp.sum(membership, axis=(0, 1), dtype=jnp.int32)
    viewed_counts = jnp.sum(vis, axis=0, dtype=jnp.int32)
    return membership, masked_counts, viewed_counts


@functools.partial(jax.jit, static_argnames=("depth_thresh",))
def view_counts(
    pcd_h: jnp.ndarray,  # (4, N)
    projs: jnp.ndarray,  # (F, 3, 4)
    depths: jnp.ndarray,  # (F, H, W)
    depth_thresh: float = 0.08,
) -> jnp.ndarray:
    """(N,) int32 visibility counts for frames that carry no detections."""

    def one(proj, depth):
        _, vis = project_and_test(pcd_h, proj, depth, depth_thresh)
        return vis

    vis = jax.vmap(one)(projs, depths)
    return jnp.sum(vis, axis=0, dtype=jnp.int32)


# --------------------------------------------------------------------------
# host-side numpy oracle (float64) — used by tests and the CPU fallback path
# --------------------------------------------------------------------------


def lift_frame_np(
    pcd_h: np.ndarray,  # (4, N) float64
    cam_intr: np.ndarray,
    cam_pose: np.ndarray,
    depth: np.ndarray,  # (H, W) float
    masks: np.ndarray,  # (M, H, W) bool
    depth_thresh: float = 0.08,
) -> Tuple[np.ndarray, np.ndarray]:
    """Float64 reference semantics of one frame's lift. Returns (membership, visible)."""
    h, w = depth.shape
    pts_cam = (np.linalg.inv(np.asarray(cam_pose, np.float64)) @ np.asarray(pcd_h, np.float64)).T[:, :3]
    proj = np.asarray(cam_intr, np.float64)[:3, :3] @ pts_cam.T
    with np.errstate(divide="ignore", invalid="ignore"):
        uv = np.round(proj[:2] / pts_cam[:, 2]).T
    finite = np.isfinite(uv).all(axis=1)
    uv_i = np.where(finite[:, None], uv, -1).astype(np.int64)
    inb = finite & (uv_i[:, 0] >= 0) & (uv_i[:, 0] < w) & (uv_i[:, 1] >= 0) & (uv_i[:, 1] < h)
    u = np.clip(uv_i[:, 0], 0, w - 1)
    v = np.clip(uv_i[:, 1], 0, h - 1)
    d = depth[v, u]
    visible = inb & (d != 0) & (np.abs(pts_cam[:, 2] - d) < depth_thresh)
    member = np.asarray(masks).astype(bool)[:, v, u] & visible[None, :]
    return member, visible
