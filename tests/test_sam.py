"""SAM model: shapes, box-prompt sensitivity, postprocessing (tiny config)."""

import numpy as np
import pytest

from beyondff_tpu.models import sam as sam_mod


@pytest.fixture(scope="module")
def tiny_sam():
    return sam_mod.SAM.create("test", seed=0)


def test_encode_decode_shapes(tiny_sam):
    c = tiny_sam.cfg
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (2, 50, 60, 3), dtype=np.uint8)
    x, input_hw = tiny_sam.preprocess(imgs)
    assert x.shape == (2, c.img_size, c.img_size, 3)
    emb = tiny_sam.encode_image(x)
    g = c.img_size // c.patch_size
    assert emb.shape == (2, g, g, c.prompt_dim)

    boxes = tiny_sam.transform_boxes(np.array([[5, 5, 40, 45], [10, 0, 55, 30]]), (50, 60))
    masks, iou = tiny_sam.decode_boxes(np.asarray(emb[0]), boxes)
    assert masks.shape == (2, 4 * g, 4 * g)
    assert iou.shape == (2,)
    out = tiny_sam.postprocess_masks(masks, input_hw, (50, 60))
    assert out.shape == (2, 50, 60) and out.dtype == bool


def test_different_boxes_different_masks(tiny_sam):
    c = tiny_sam.cfg
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (1, c.img_size, c.img_size, 3), dtype=np.uint8)
    x, _ = tiny_sam.preprocess(imgs)
    emb = np.asarray(tiny_sam.encode_image(x))[0]
    boxes = np.array([[0, 0, 20, 20], [40, 40, 60, 60]], np.float32)
    masks, _ = tiny_sam.decode_boxes(emb, boxes)
    assert not np.allclose(np.asarray(masks[0]), np.asarray(masks[1]))


def test_batch_invariance(tiny_sam):
    """Decoding boxes in one batch == decoding them separately."""
    c = tiny_sam.cfg
    g = c.img_size // c.patch_size
    rng = np.random.default_rng(2)
    emb = rng.normal(size=(g, g, c.prompt_dim)).astype(np.float32)
    boxes = np.array([[0, 0, 30, 30], [10, 20, 50, 60]], np.float32)
    both, _ = tiny_sam.decode_boxes(emb, boxes)
    one, _ = tiny_sam.decode_boxes(emb, boxes[:1])
    np.testing.assert_allclose(np.asarray(both[0]), np.asarray(one[0]), rtol=2e-4, atol=2e-4)


def test_decode_boxes_packed_matches_loop_path(rng):
    """The batched decode + device postprocess + bit-pack path must agree
    with the per-frame decode_boxes/postprocess_masks path."""
    from beyondff_tpu.models import sam as sam_mod

    sam = sam_mod.SAM.create("test", seed=0)
    b, k, h, w = 2, 4, 30, 41  # odd resolution: exercises the pad-to-8 branch
    frames = rng.integers(0, 255, (b, h, w, 3), dtype=np.uint8)
    x, input_hw = sam.preprocess(frames)
    embs = sam.encode_image(x, input_hw=input_hw)
    boxes = np.zeros((b, k, 4), np.float32)
    boxes[:, :, 2:] = rng.uniform(10, sam.cfg.img_size, (b, k, 2))

    packed, iou = sam.decode_boxes_packed(embs, boxes, input_hw, (h, w))
    packed = np.asarray(packed)
    assert packed.shape == (b, k, -(-h * w // 8))
    assert iou.shape == (b, k)

    embs_np = np.asarray(embs)
    for i in range(b):
        low, _ = sam.decode_boxes(embs_np[i], boxes[i])
        ref = sam.postprocess_masks(low, input_hw, (h, w))
        got = np.unpackbits(packed[i], axis=-1, bitorder="little")[:, : h * w]
        got = got.reshape(k, h, w).astype(bool)
        # identical math modulo reduction order: allow measure-zero flips
        assert (got != ref).mean() < 1e-3


def test_encode_frames_matches_preprocess_path(rng):
    """Single-upload path: device pad+normalize+encode == host preprocess +
    encode_image (bit-comparable inputs by construction)."""
    import jax.numpy as jnp

    from beyondff_tpu.models import sam as sam_mod

    sam = sam_mod.SAM.create("test", seed=0)
    frames = rng.integers(0, 255, (2, 30, 41, 3), dtype=np.uint8)
    x, input_hw = sam.preprocess(frames)
    ref = np.asarray(sam.encode_image(x, input_hw=input_hw))

    smalls = []
    for f in frames:
        small, hw = sam.scale_frame(f)
        assert hw == input_hw
        smalls.append(small)
    got = np.asarray(sam.encode_frames(jnp.stack(smalls)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_rect_encode_full_size_matches_square(rng, monkeypatch):
    """BFF_SAM_RECT with a full-square input takes the identical program —
    exact equality with the square path."""
    import jax.numpy as jnp

    from beyondff_tpu.models import sam as sam_mod

    s = sam_mod.PRESETS["test"].img_size
    frames = rng.integers(0, 255, (1, s, s, 3), dtype=np.uint8)
    sam_sq = sam_mod.SAM.create("test", seed=0)
    ref = np.asarray(sam_sq.encode_frames(jnp.asarray(frames)))
    monkeypatch.setenv("BFF_SAM_RECT", "1")
    sam_r = sam_mod.SAM.create("test", seed=0)
    got = np.asarray(sam_r.encode_frames(jnp.asarray(frames)))
    np.testing.assert_array_equal(got, ref)


def test_rect_encode_end_to_end(rng, monkeypatch):
    """Rect mode on a non-square frame: sub-grid embedding, rect decode, and
    the valid-region output stays close to the square path (the deviation is
    only pad-token participation in attention)."""
    import jax.numpy as jnp

    from beyondff_tpu.models import sam as sam_mod

    h, w = 30, 41  # scale_frame -> (47, 64) long-side-64 for the test preset
    frames = rng.integers(0, 255, (1, h, w, 3), dtype=np.uint8)
    sam_sq = sam_mod.SAM.create("test", seed=0)
    small, input_hw = sam_sq.scale_frame(frames[0])
    dev = jnp.asarray(small[None])
    emb_sq = np.asarray(sam_sq.encode_frames(dev))

    monkeypatch.setenv("BFF_SAM_RECT", "1")
    sam_r = sam_mod.SAM.create("test", seed=0)
    emb_r = np.asarray(sam_r.encode_frames(dev))
    patch = sam_r.cfg.patch_size
    gh = -(-input_hw[0] // patch)
    gw = -(-input_hw[1] // patch)
    assert emb_r.shape[1:3] == (gh, gw)
    assert np.isfinite(emb_r).all()
    # valid-region deviation bounded (random weights; pad tokens carry only
    # the normalized-zero constant)
    ref = emb_sq[:, :gh, :gw]
    rel = np.linalg.norm(emb_r - ref) / (np.linalg.norm(ref) + 1e-12)
    assert rel < 0.5, rel

    boxes = np.array([[[2.0, 2.0, 40.0, 28.0], [5.0, 8.0, 60.0, 40.0]]],
                     np.float32)
    packed, iou = sam_r.decode_boxes_packed(emb_r, boxes, input_hw, (h, w))
    assert np.asarray(packed).shape == (1, 2, -(-h * w // 8))
    assert np.isfinite(np.asarray(iou)).all()
