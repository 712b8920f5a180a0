"""Multi-device frame-sharded 2D->3D lifting.

Frames are the batch axis (SURVEY.md §5 "sequence length" = frames), sharded
over the mesh's ``data`` axis with ``shard_map``; each device lifts its frame
shard against the replicated point cloud and the per-point ``masked_counts`` /
``viewed_counts`` reduce with ``psum`` over ICI — replacing the reference's
sequential per-frame accumulation (reference: tools/projection_2d_to_3d.py
:454-461,537-567) with one collective.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from beyondff_tpu.core import geometry


def make_sharded_lift(mesh: Mesh, depth_thresh: float = 0.08, data_axis: str = "data"):
    """Returns a jitted function lifting frame chunks sharded over ``data``.

    Signature matches :func:`beyondff_tpu.core.geometry.lift_frames`; the
    frame axis of projs/depths/masks/mask_valid must be divisible by the data
    axis size. ``membership`` stays frame-sharded (device-local output);
    counts are psum-reduced to every device.
    """

    def local(pcd_h, projs, depths, masks, mask_valid):
        membership, masked_counts, viewed_counts = geometry.lift_frames(
            pcd_h, projs, depths, masks, mask_valid, depth_thresh
        )
        masked_counts = jax.lax.psum(masked_counts, data_axis)
        viewed_counts = jax.lax.psum(viewed_counts, data_axis)
        return membership, masked_counts, viewed_counts

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(data_axis), P(data_axis), P(data_axis), P(data_axis)),
        out_specs=(P(data_axis), P(), P()),
    )
    return jax.jit(fn)


def make_sharded_lift_packed(mesh: Mesh, n_masks: int = 32, depth_thresh: float = 0.08,
                             data_axis: str = "data"):
    """Frame-sharded bit-packed lift (see geometry.lift_frames_packed):
    uint32 mask bitfields shard over the data axis; counts psum-reduce."""

    def local(pcd_h, projs, depths, masks_packed):
        membership, masked_counts, viewed_counts = geometry.lift_frames_packed(
            pcd_h, projs, depths, masks_packed, depth_thresh, n_masks=n_masks
        )
        masked_counts = jax.lax.psum(masked_counts, data_axis)
        viewed_counts = jax.lax.psum(viewed_counts, data_axis)
        return membership, masked_counts, viewed_counts

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(data_axis), P(data_axis), P(data_axis)),
        out_specs=(P(data_axis), P(), P()),
    )
    return jax.jit(fn)


def make_sharded_lift_rle(mesh: Mesh, depth_thresh: float = 0.08,
                          data_axis: str = "data"):
    """Frame-sharded RLE lift (see geometry.lift_frames_rle): per-mask run
    bounds shard over the data axis with the frames; counts psum-reduce.
    Signature: (pcd_h, projs, depths, run_starts, run_ends)."""

    def local(pcd_h, projs, depths, run_starts, run_ends):
        membership, masked_counts, viewed_counts = geometry.lift_frames_rle(
            pcd_h, projs, depths, run_starts, run_ends, depth_thresh
        )
        masked_counts = jax.lax.psum(masked_counts, data_axis)
        viewed_counts = jax.lax.psum(viewed_counts, data_axis)
        return membership, masked_counts, viewed_counts

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(data_axis), P(data_axis), P(data_axis), P(data_axis)),
        out_specs=(P(data_axis), P(), P()),
    )
    return jax.jit(fn)


def make_sharded_view_counts(mesh: Mesh, depth_thresh: float = 0.08, data_axis: str = "data"):
    """Frame-sharded visibility counting with a psum reduce."""

    def local(pcd_h, projs, depths):
        counts = geometry.view_counts(pcd_h, projs, depths, depth_thresh)
        return jax.lax.psum(counts, data_axis)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(data_axis), P(data_axis)),
        out_specs=P(),
    )
    return jax.jit(fn)
