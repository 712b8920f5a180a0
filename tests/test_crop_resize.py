"""Device CLIP crop building (core/crop_resize.py) vs the host cv2 chain.

The host oracle below is the exact chain `Segmentor2D._clip_crops` +
`CLIP.preprocess` run (reference: segmentation_2d.py:345-380 GDINO mode,
segmentation_2d_yolo_world.py:505-515 YOLO mode, CLIP transform geometry
segmentation_2d.py:315-322). cv2 resizes in 11-bit fixed point with
round-half-up where the device path is f32 round-half-even, so the
comparison is tolerance-based (±1-2 LSB), not bitwise.
"""

import cv2
import numpy as np
import pytest

from beyondff_tpu.core import crop_resize as cr

CLIP_N = 56  # small CLIP resolution keeps the cubic matrices test-sized


def host_clip_transform(crop_u8, n=CLIP_N):
    """CLIP.preprocess geometry: bicubic short side -> n, center crop."""
    h, w = crop_u8.shape[:2]
    scale = n / min(h, w)
    nh, nw = round(h * scale), round(w * scale)
    r = cv2.resize(crop_u8, (nw, nh), interpolation=cv2.INTER_CUBIC)
    top, left = (nh - n) // 2, (nw - n) // 2
    return r[top:top + n, left:left + n]


def host_crop_yolo(frame, box, frame_hw, n=CLIP_N):
    h, w = frame.shape[:2]
    sx, sy = w / frame_hw[1], h / frame_hw[0]
    bx0, by0, bx1, by1 = box
    x0, y0 = max(0, int(bx0 * sx)), max(0, int(by0 * sy))
    x1, y1 = min(w, int(bx1 * sx)), min(h, int(by1 * sy))
    if x1 <= x0 or y1 <= y0:
        return np.zeros((n, n, 3), np.uint8)
    lut = (np.arange(256, dtype=np.uint8) * 255).astype(np.uint8)
    return host_clip_transform(cv2.LUT(frame[y0:y1, x0:x1], lut), n)


def host_crop_gdino(frame, box, frame_hw, det_hw, mean, std, n=CLIP_N):
    gh, gw = det_hw
    src = cv2.resize(frame, (gw, gh), interpolation=cv2.INTER_LINEAR)
    lut = (((np.arange(256, dtype=np.float32)[:, None] / 255.0 - mean)
            / std) * 255).astype(np.uint8).reshape(1, 256, 3)
    sx, sy = gw / frame_hw[1], gh / frame_hw[0]
    bx0, by0, bx1, by1 = box
    x0, y0 = max(0, int(bx0 * sx)), max(0, int(by0 * sy))
    x1, y1 = min(gw, int(bx1 * sx)), min(gh, int(by1 * sy))
    if x1 <= x0 or y1 <= y0:
        return np.zeros((n, n, 3), np.uint8)
    return host_clip_transform(cv2.LUT(src[y0:y1, x0:x1], lut), n)


def smooth_frame(rng, h, w):
    """Low-frequency content: fixed-point-vs-float resize differences stay
    sub-LSB on smooth data, so tolerance checks measure geometry, not cv2's
    quantizer."""
    base = rng.integers(0, 255, (h // 8 + 2, w // 8 + 2, 3), np.uint8)
    return cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)


BOXES = np.array(
    [
        [8.0, 6.0, 90.0, 70.0],     # interior
        [0.0, 0.0, 128.0, 96.0],    # full frame
        [-10.0, -5.0, 40.0, 30.0],  # clamped at origin
        [100.0, 60.0, 200.0, 140.0],  # clamped at far edge
        [30.0, 20.0, 31.5, 60.0],   # thin sliver
        [50.0, 40.0, 50.0, 45.0],   # degenerate -> zero crop
    ],
    np.float32,
)


def test_yolo_device_crops_match_host_chain(rng):
    frame = smooth_frame(rng, 48, 64)
    frame_hw = (96, 128)
    got = np.asarray(cr.clip_crop_batch(
        np.stack([frame] * len(BOXES)), BOXES,
        np.ones(len(BOXES), bool), "yolo", frame_hw, n=CLIP_N))
    for i, box in enumerate(BOXES):
        want = host_crop_yolo(frame, box, frame_hw).astype(np.float32)
        diff = np.abs(got[i] - want)
        assert diff.mean() < 1.0, (i, diff.mean())
        assert np.percentile(diff, 95) <= 2.0, (i, np.percentile(diff, 95))


def test_gdino_device_crops_match_host_chain(rng):
    from beyondff_tpu.models.gdino.model import IMAGE_MEAN, IMAGE_STD

    frame = smooth_frame(rng, 40, 56)
    frame_hw = (96, 128)
    det_hw = (80, 108)
    got = np.asarray(cr.clip_crop_batch(
        np.stack([frame] * len(BOXES)), BOXES,
        np.ones(len(BOXES), bool), "gdino", frame_hw, det_hw=det_hw,
        mean=IMAGE_MEAN, std=IMAGE_STD, n=CLIP_N))
    for i, box in enumerate(BOXES):
        want = host_crop_gdino(frame, box, frame_hw, det_hw,
                               IMAGE_MEAN, IMAGE_STD).astype(np.float32)
        # the normalize LUT wraps (sawtooth): compare mod-256 distance.
        # Tolerance is wider than YOLO mode because the affine slope
        # (1/std ~= 4) amplifies cv2-vs-f32 quantizer differences of the
        # stage-1 resize by ~4x per LSB — geometry errors would show up as
        # whole rows off, not +-1-slope noise (mean stays < 1.5).
        diff = np.abs(got[i] - want)
        diff = np.minimum(diff, 256.0 - diff)
        assert diff.mean() < 1.5, (i, diff.mean())
        assert np.percentile(diff, 95) <= 6.0, (i, np.percentile(diff, 95))


def test_gdino_wrap_arithmetic_matches_numpy_lut():
    """The device normalize (trunc + mod 256 arithmetic) vs the host's
    256-entry numpy LUT, over every uint8 value."""
    import jax.numpy as jnp

    from beyondff_tpu.models.gdino.model import IMAGE_MEAN, IMAGE_STD

    v = np.arange(256, dtype=np.float32)[:, None].repeat(3, 1)
    t = (v / 255.0 - IMAGE_MEAN) / IMAGE_STD * 255.0
    got = np.asarray(jnp.mod(jnp.trunc(jnp.asarray(t)).astype(jnp.int32), 256))
    lut = (((np.arange(256, dtype=np.float32)[:, None] / 255.0 - IMAGE_MEAN)
            / IMAGE_STD) * 255).astype(np.uint8)
    diff = np.abs(got.astype(np.int32) - lut.astype(np.int32))
    diff = np.minimum(diff, 256 - diff)
    assert diff.max() <= 1, diff.max()


def test_invalid_boxes_zero_and_valid_mask(rng):
    frame = smooth_frame(rng, 48, 64)
    boxes = np.array([[50.0, 40.0, 50.0, 45.0], [8.0, 6.0, 90.0, 70.0]],
                     np.float32)
    got = np.asarray(cr.clip_crop_batch(
        np.stack([frame, frame]), boxes, np.array([True, False]),
        "yolo", (96, 128), n=CLIP_N))
    assert np.all(got == 0.0)  # degenerate rect AND masked-out crop


def test_encode_image_boxes_matches_uploaded_crops(rng):
    """CLIP.encode_image_boxes vs preprocess+encode_image of the host-chain
    crops built from the SAME source buffer: feature cosine ~ 1."""
    from beyondff_tpu.models import clip as clip_mod

    model = clip_mod.CLIP.create("test")
    n = model.cfg.image_resolution  # 28
    frames = np.stack([smooth_frame(rng, 48, 64) for _ in range(2)])
    frame_hw = (96, 128)
    boxes = BOXES[:4]
    frame_idx = np.array([0, 0, 1, 1], np.int32)
    feats_dev, k = model.encode_image_boxes(
        frames, frame_idx, boxes, "yolo", frame_hw)
    got = np.asarray(feats_dev, np.float32)[:k]
    host_crops = [host_crop_yolo(frames[f], b, frame_hw, n=n)
                  for f, b in zip(frame_idx, boxes)]
    want = np.asarray(model.encode_image(
        model.preprocess(np.stack(host_crops))), np.float32)
    cos = np.sum(got * want, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1))
    assert np.all(cos > 0.995), cos


def test_encode_image_boxes_gdino_mode_feature_cosine(rng):
    """GDINO-mode device crops: the slope-amplified ±4 LSB wrap noise
    (see the tolerance note above) stays negligible at the feature level."""
    from beyondff_tpu.models import clip as clip_mod
    from beyondff_tpu.models.gdino.model import IMAGE_MEAN, IMAGE_STD

    model = clip_mod.CLIP.create("test")
    n = model.cfg.image_resolution
    frames = np.stack([smooth_frame(rng, 40, 56) for _ in range(2)])
    frame_hw = (96, 128)
    det_hw = (80, 108)
    boxes = BOXES[:4]
    frame_idx = np.array([0, 1, 0, 1], np.int32)
    feats_dev, k = model.encode_image_boxes(
        frames, frame_idx, boxes, "gdino", frame_hw, det_hw=det_hw,
        det_mean=IMAGE_MEAN, det_std=IMAGE_STD)
    got = np.asarray(feats_dev, np.float32)[:k]
    host_crops = [host_crop_gdino(frames[f], b, frame_hw, det_hw,
                                  IMAGE_MEAN, IMAGE_STD, n=n)
                  for f, b in zip(frame_idx, boxes)]
    want = np.asarray(model.encode_image(
        model.preprocess(np.stack(host_crops))), np.float32)
    cos = np.sum(got * want, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1))
    assert np.all(cos > 0.99), cos
