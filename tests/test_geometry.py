"""Geometry core vs float64 numpy oracle on synthetic scenes."""

import jax.numpy as jnp
import numpy as np

from beyondff_tpu.core import geometry


def make_scene(rng, n_pts=500, h=48, w=64):
    """Synthetic camera + points, most visible in-frustum."""
    fx = fy = 40.0
    intr = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1.0]])
    pose = np.eye(4)
    # small rotation + translation
    th = 0.1
    pose[:3, :3] = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    pose[:3, 3] = [0.2, -0.1, -2.0]
    pts = rng.uniform([-1, -1, 1.0], [1, 1, 4.0], size=(n_pts, 3))
    pcd_h = geometry.homogenize(pts)
    # depth image consistent with some of the points
    depth = rng.uniform(1.0, 4.0, size=(h, w)).astype(np.float32)
    depth[rng.random((h, w)) < 0.1] = 0.0  # invalid pixels
    return intr, pose, pcd_h, depth


def test_fused_projection_equivalence(rng):
    intr, pose, pcd_h, _ = make_scene(rng)
    proj = geometry.fuse_projection(intr, pose)
    cam = proj @ pcd_h.astype(np.float64)
    # row 2 of the fused matrix recovers camera-space z
    pts_cam = (np.linalg.inv(pose) @ pcd_h.astype(np.float64)).T[:, :3]
    np.testing.assert_allclose(cam[2], pts_cam[:, 2], rtol=1e-12)
    uv = cam[:2] / cam[2]
    uv_ref = (intr @ pts_cam.T / pts_cam[:, 2])[:2]
    np.testing.assert_allclose(uv, uv_ref, rtol=1e-9)


def test_lift_matches_numpy_oracle(rng):
    h, w, m = 48, 64, 3
    intr, pose, pcd_h, depth = make_scene(rng, h=h, w=w)
    masks = rng.random((m, h, w)) < 0.5

    member_ref, vis_ref = geometry.lift_frame_np(pcd_h, intr, pose, depth, masks)

    proj = geometry.fuse_projection(intr, pose).astype(np.float32)
    membership, masked_counts, viewed_counts = geometry.lift_frames(
        jnp.asarray(pcd_h),
        jnp.asarray(proj[None]),
        jnp.asarray(depth[None]),
        jnp.asarray(masks.reshape(1, m, h * w)),
        jnp.ones((1, m), bool),
    )
    member = np.asarray(membership[0])
    vis = viewed_counts  # single frame: counts == visibility

    # float32 vs float64 rounding can flip points sitting exactly on pixel /
    # depth-threshold boundaries; on this synthetic scene it should be rare
    mismatch = np.mean(member != member_ref)
    assert mismatch < 0.002, f"membership mismatch rate {mismatch}"
    assert np.mean(np.asarray(vis).astype(bool) != vis_ref) < 0.002
    np.testing.assert_array_equal(
        np.asarray(masked_counts), member.sum(axis=0).astype(np.int32)
    )


def test_points_behind_camera_invisible(rng):
    h, w = 32, 32
    intr = np.array([[20.0, 0, 16], [0, 20.0, 16], [0, 0, 1]])
    pose = np.eye(4)
    pts = np.array([[0, 0, -2.0], [0, 0, 2.0], [0, 0, 0.0]])  # behind, front, at origin
    pcd_h = geometry.homogenize(pts)
    depth = np.full((h, w), 2.0, np.float32)
    proj = geometry.fuse_projection(intr, pose).astype(np.float32)
    pid, vis = geometry.project_and_test(
        jnp.asarray(pcd_h), jnp.asarray(proj), jnp.asarray(depth), 0.08
    )
    vis = np.asarray(vis)
    assert not vis[0]  # behind camera: |z - d| fails
    assert vis[1]  # in front at matching depth
    assert not vis[2]  # z == 0 guarded


def test_mask_padding_flags(rng):
    h, w, m = 24, 24, 4
    intr, pose, pcd_h, depth = make_scene(rng, n_pts=100, h=h, w=w)
    masks = np.ones((1, m, h * w), bool)
    valid = np.array([[True, True, False, False]])
    proj = geometry.fuse_projection(intr, pose).astype(np.float32)[None]
    membership, counts, _ = geometry.lift_frames(
        jnp.asarray(pcd_h), jnp.asarray(proj), jnp.asarray(depth[None]),
        jnp.asarray(masks), jnp.asarray(valid),
    )
    member = np.asarray(membership[0])
    assert member[2].sum() == 0 and member[3].sum() == 0
    np.testing.assert_array_equal(np.asarray(counts), member.sum(0).astype(np.int32))


def test_packed_lift_matches_unpacked(rng):
    h, w, m, f = 32, 40, 5, 2
    intr = np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1.0]])
    pts = rng.uniform([-1, -1, 1.0], [1, 1, 4.0], size=(300, 3))
    pcd_h = geometry.homogenize(pts)
    projs = np.stack([geometry.fuse_projection(intr, np.eye(4)).astype(np.float32)] * f)
    depths = rng.uniform(1, 4, (f, h, w)).astype(np.float32)
    masks = rng.random((f, m, h * w)) < 0.4
    packed = np.stack([geometry.pack_masks(mm) for mm in masks])

    ref = geometry.lift_frames(jnp.asarray(pcd_h), jnp.asarray(projs), jnp.asarray(depths),
                               jnp.asarray(masks), jnp.ones((f, m), bool))
    out = geometry.lift_frames_packed(jnp.asarray(pcd_h), jnp.asarray(projs),
                                      jnp.asarray(depths), jnp.asarray(packed), n_masks=m)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(ref[1]))
    np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(ref[2]))


def test_pack_masks_round_trip(rng):
    masks = rng.random((7, 100)) < 0.5
    packed = geometry.pack_masks(masks)
    for i in range(7):
        np.testing.assert_array_equal((packed >> np.uint32(i)) & 1, masks[i].astype(np.uint32))


def test_prepare_depth_matches_cv2(rng):
    import cv2

    raw = rng.integers(0, 6000, (2, 60, 80)).astype(np.uint16)
    out = np.asarray(geometry.prepare_depth(jnp.asarray(raw), (120, 160), 1000.0))
    for i in range(2):
        ref = cv2.resize(raw[i].astype(np.float32) / 1000.0, (160, 120))
        np.testing.assert_allclose(out[i], ref, rtol=2e-3, atol=2e-3)
    # same-resolution path: exact
    same = np.asarray(geometry.prepare_depth(jnp.asarray(raw), (60, 80), 1000.0))
    np.testing.assert_allclose(same, raw.astype(np.float32) / 1000.0, rtol=1e-6)


def test_lift_frames_rle_matches_dense(rng):
    """RLE-driven device lift (searchsorted over run bounds, no bitmap
    upload) is exactly equivalent to the dense path, including empty masks
    and out-of-view points."""
    import jax.numpy as jnp

    from beyondff_tpu.core import geometry, rle

    n, h, w, m, f = 400, 18, 26, 3, 4
    pcd_h = geometry.homogenize(rng.uniform([-1, -1, 1], [1, 1, 3], (n, 3)))
    intr = np.array([[14.0, 0, w / 2], [0, 14.0, h / 2], [0, 0, 1.0]])
    projs = np.stack([geometry.fuse_projection(intr, np.eye(4)).astype(np.float32)] * f)
    depths = rng.uniform(1, 3, (f, h, w)).astype(np.float32)
    masks = rng.random((f, m, h * w)) < 0.3
    masks[0, 0] = False  # empty mask edge case
    valid = np.ones((f, m), bool)

    ref, mc, vc = geometry.lift_frames(
        jnp.asarray(pcd_h), jnp.asarray(projs), jnp.asarray(depths),
        jnp.asarray(masks), jnp.asarray(valid))

    r_pad = 256
    st = np.full((f, m, r_pad), h * w + 1, np.int32)
    en = np.zeros((f, m, r_pad), np.int32)
    for i in range(f):
        for j in range(m):
            s0, e0 = rle.rle_bounds(rle.rle_encode(masks[i, j]))
            assert len(s0) <= r_pad
            st[i, j, : len(s0)] = s0
            en[i, j, : len(e0)] = e0
    out, mc2, vc2 = geometry.lift_frames_rle(
        jnp.asarray(pcd_h), jnp.asarray(projs), jnp.asarray(depths),
        jnp.asarray(st), jnp.asarray(en))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(mc2), np.asarray(mc))
    np.testing.assert_array_equal(np.asarray(vc2), np.asarray(vc))
