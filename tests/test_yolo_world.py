"""YOLO-World: tiny-config forward, NMS semantics, predict interface."""

import jax.numpy as jnp
import numpy as np
import pytest

from beyondff_tpu.models import yolo_world as yw


def test_nms_fixed_suppresses_overlaps():
    boxes = jnp.asarray(np.array([
        [0, 0, 10, 10],
        [1, 1, 11, 11],   # heavy overlap with box 0, lower score -> suppressed
        [50, 50, 60, 60],
    ], np.float32))
    scores = jnp.asarray(np.array([0.9, 0.8, 0.7], np.float32))
    keep_idx, valid = yw.nms_fixed(boxes, scores, iou_thres=0.5, top_k=3)
    kept = set(np.asarray(keep_idx)[np.asarray(valid)].tolist())
    assert kept == {0, 2}


def test_nms_keeps_disjoint():
    boxes = jnp.asarray(np.array([[0, 0, 5, 5], [10, 10, 15, 15], [20, 20, 25, 25]], np.float32))
    scores = jnp.asarray(np.array([0.5, 0.9, 0.7], np.float32))
    keep_idx, valid = yw.nms_fixed(boxes, scores, iou_thres=0.5, top_k=3)
    assert np.asarray(valid).all()
    assert set(np.asarray(keep_idx).tolist()) == {0, 1, 2}


@pytest.fixture(scope="module")
def tiny_yw():
    return yw.YOLOWorld.create("test", seed=0)


def test_forward_shapes(tiny_yw):
    c = tiny_yw.cfg
    h, w = c.img_size
    img = jnp.zeros((1, h, w, 3))
    txt = jnp.asarray(np.random.default_rng(0).normal(size=(3, c.text_dim)).astype(np.float32))
    boxes, logits = tiny_yw._forward(tiny_yw.params, img, txt)
    n_anchors = (h // 8) * (w // 8) + (h // 16) * (w // 16) + (h // 32) * (w // 32)
    assert boxes.shape == (1, n_anchors, 4)
    assert logits.shape == (1, n_anchors, 3)


def test_predict_interface(tiny_yw):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)
    boxes, scores, phrases = tiny_yw.predict(img, "clothes .", box_threshold=0.0)
    assert boxes.shape[1] == 4 and len(phrases) == boxes.shape[0]
    assert np.all(boxes >= 0) and np.all(boxes <= 1)
    assert all(p == "clothes" for p in phrases)


def test_class_embeddings_dim_guard(tiny_yw):
    """A CLIP tower whose embed dim doesn't match cfg.text_dim must raise a
    clear error instead of a flax shape mismatch deep in the forward; with no
    tower attached the hash fallback produces the right width."""
    feats = tiny_yw.class_embeddings(["chair", "table"])
    assert feats.shape == (2, tiny_yw.cfg.text_dim)
    assert np.allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-5)

    class WrongClip:
        def encode_text(self, toks):
            return np.zeros((len(toks), tiny_yw.cfg.text_dim + 7), np.float32)

    tiny_yw.clip = WrongClip()
    tiny_yw.clip_tokenizer = lambda names: names
    try:
        with pytest.raises(ValueError, match="guide embeddings"):
            tiny_yw.class_embeddings(["sofa"])
    finally:
        tiny_yw.clip = None
        tiny_yw.clip_tokenizer = None
        tiny_yw._text_cache.clear()


def test_caption_spans_index_protocol(tiny_yw):
    """YOLO-World's fused-caption spans are class indices (i, i+1) and the
    caption re-splits to the class list (predict's '.'-separator parse)."""
    caption, spans = tiny_yw.caption_spans(["red chair", "towel.", " tv "])
    assert caption == "red chair . towel . tv"
    assert spans == [(0, 1), (1, 2), (2, 3)]
    parsed = [c.strip() for c in caption.rstrip(".").split(".") if c.strip()]
    assert parsed == ["red chair", "towel", "tv"]


def test_yolo_demux_partitions_finalize(tiny_yw):
    """Fused demux = predict_finalize partitioned by argmax class: the union
    over classes of demuxed detections (scalar threshold) is exactly the
    finalize keep-set, each box landing in its assigned class's bucket."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (*tiny_yw.cfg.img_size, 3), dtype=np.uint8)
    caption, spans = tiny_yw.caption_spans(["chair", "towel", "tv"])
    handle = tiny_yw.predict_batch_frames_async(jnp.asarray(img[None]), caption)
    ref = tiny_yw.predict_finalize(handle, box_threshold=0.0)
    out = tiny_yw.predict_finalize_demux(handle, spans, box_threshold=0.0)
    (rb, rs, rp) = ref[0]
    classes = ["chair", "towel", "tv"]
    assert len(out) == 1 and len(out[0]) == 3
    for ci, (db, ds, dp) in enumerate(out[0]):
        sel = np.asarray([p == classes[ci] for p in rp], bool)
        np.testing.assert_array_equal(db, rb[sel])
        np.testing.assert_array_equal(ds, rs[sel])
        assert dp == [p for p in rp if p == classes[ci]]
    assert sum(len(d[2]) for d in out[0]) == len(rp)

    # per-span thresholds apply independently
    ts = [float(np.median(ds)) if len(ds) else 0.5 for _b, ds, _p in out[0]]
    out2 = tiny_yw.predict_finalize_demux(handle, spans, box_threshold=ts)
    for t, (_b0, ds0, _p0), (_b, ds, _p) in zip(ts, out[0], out2[0]):
        np.testing.assert_array_equal(ds, ds0[ds0 > t])
    with pytest.raises(ValueError):
        tiny_yw.predict_finalize_demux(handle, spans, box_threshold=[0.1])
