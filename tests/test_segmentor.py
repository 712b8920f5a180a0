"""Segmentor2D unit behavior: filtering, caching, batch/single equivalence."""

import numpy as np
import pytest

from beyondff_tpu.config import Config
from beyondff_tpu.pipeline.segmentation_2d import Segmentor2D, box_cxcywh_to_xyxy


@pytest.fixture(scope="module")
def seg():
    cfg = Config.from_dict({
        "frames": {"width_2d": 64, "height_2d": 48},
        "detector": {"box_threshold": 0.0, "must_match_query": False,
                     "similarity_threshold": -1.0, "max_detections": 8,
                     "dtype": "float32"},
    })
    return Segmentor2D(cfg)


def test_box_conversion():
    boxes = np.array([[0.5, 0.5, 0.5, 0.5]])
    out = box_cxcywh_to_xyxy(boxes, 100, 60)
    np.testing.assert_allclose(out[0], [25, 15, 75, 45])


def test_query_embedding_cached_and_normalized(seg):
    a = seg.query_embedding("clothes")
    b = seg.query_embedding("clothes")
    assert a is b  # cache hit
    np.testing.assert_allclose(np.linalg.norm(a), 1.0, rtol=1e-5)


def test_clip_filter_threshold(seg):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    boxes = np.array([[5, 5, 30, 30], [10, 10, 50, 40]], np.float32)
    keep, sims = seg.filter_boxes_with_clip(img, boxes, "clothes")
    assert keep.all()  # threshold -1 keeps everything
    seg.cfg = seg.cfg.override(**{"detector.similarity_threshold": 2.0})
    keep2, _ = seg.filter_boxes_with_clip(img, boxes, "clothes")
    assert not keep2.any()
    seg.cfg = seg.cfg.override(**{"detector.similarity_threshold": -1.0})


def test_process_frame_none_when_no_match(seg):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    seg.cfg = seg.cfg.override(**{"detector.box_threshold": 1.0})
    assert seg.process_frame(img, "clothes") is None
    seg.cfg = seg.cfg.override(**{"detector.box_threshold": 0.0})


def test_max_detections_cap(seg):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    rec = seg.process_frame(img, "clothes")
    if rec is not None:
        assert rec["segmented_frame_masks"].shape[0] <= seg.cfg.detector.max_detections
        assert rec["segmented_frame_masks"].shape[2:] == (48, 64)


@pytest.fixture(scope="module")
def yseg():
    cfg = Config.from_dict({
        "frames": {"width_2d": 64, "height_2d": 48},
        "detector": {"kind": "yolo_world", "box_threshold": 0.0,
                     "must_match_query": False, "similarity_threshold": -1.0,
                     "max_detections": 8, "dtype": "float32",
                     "filter_with_clip": False},
    })
    return Segmentor2D(cfg)


def test_clip_crop_source_matches_reference_semantics(seg, monkeypatch):
    """GDINO-mode crops must come from the ImageNet-normalized
    detector-resolution tensor with the reference's *255 -> uint8 wraparound
    (bbox_filter, reference segmentation_2d.py:345-380)."""
    import cv2

    from beyondff_tpu.models.gdino.model import IMAGE_MEAN, IMAGE_STD

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    boxes = np.array([[8, 6, 40, 30]], np.float32)
    captured = {}
    orig = seg.clip.preprocess

    def capture(crops):
        captured["crops"] = crops
        return orig(crops)

    monkeypatch.setattr(seg.clip, "preprocess", capture)
    seg.filter_boxes_with_clip(img, boxes, "clothes")
    gh, gw = seg.detector.cfg.image_size
    resized = cv2.resize(img, (gw, gh), interpolation=cv2.INTER_LINEAR)
    norm = (resized.astype(np.float32) / 255.0 - IMAGE_MEAN) / IMAGE_STD
    sx, sy = gw / 64, gh / 48
    x0, y0, x1, y1 = int(8 * sx), int(6 * sy), int(40 * sx), int(30 * sy)
    expect = (norm[y0:y1, x0:x1] * 255).astype(np.uint8)
    np.testing.assert_array_equal(captured["crops"][0], expect)
    assert expect.min() >= 0  # wraparound really exercised (negatives wrapped)


def test_yolo_crop_source_wraps_uint8(yseg, monkeypatch):
    """YOLO-World-mode crops come from the raw uint8 frame where the
    reference's `x*255` wraps to (-x) mod 256
    (segmentation_2d_yolo_world.py:505-515)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    boxes = np.array([[4, 4, 20, 20]], np.float32)
    captured = {}
    orig = yseg.clip.preprocess

    def capture(crops):
        captured["crops"] = crops
        return orig(crops)

    monkeypatch.setattr(yseg.clip, "preprocess", capture)
    yseg.filter_boxes_with_clip(img, boxes, "clothes")
    expect = (img[4:20, 4:20] * 255).astype(np.uint8)  # == (-x) mod 256
    np.testing.assert_array_equal(captured["crops"][0], expect)


def test_yolo_mode_filter_gated_on_config(yseg):
    """YOLO-World mode always loads CLIP (class embeddings) but must only
    CLIP-filter when filter_with_clip is set (reference gates on
    filter_with_CLIP_feature, segmentation_2d_yolo_world.py:213-224)."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    det = (np.array([[0.5, 0.5, 0.4, 0.4]], np.float32),
           np.array([0.123], np.float32), ["clothes"])
    assert yseg.clip is not None
    out = yseg._detect_and_filter(img, "clothes", det)
    assert out is not None
    np.testing.assert_allclose(out[1], [0.123])  # detector conf untouched
    yseg.cfg = yseg.cfg.override(**{"detector.filter_with_clip": True})
    try:
        out2 = yseg._detect_and_filter(img, "clothes", det)
    finally:
        yseg.cfg = yseg.cfg.override(**{"detector.filter_with_clip": False})
    assert out2 is not None  # threshold -1 keeps the box
    assert abs(float(out2[1][0]) - 0.123) > 1e-6  # conf replaced by CLIP sim


def test_process_scene_device_frames_runs(tmp_path, monkeypatch):
    """The single-upload scene loop produces well-formed records and the
    host-path loop stays available via device_frames=false."""
    import cv2

    rng = np.random.default_rng(6)
    scene = tmp_path / "scene0000_00" / "color"
    scene.mkdir(parents=True)
    for i in range(4):
        cv2.imwrite(str(scene / f"{i}.jpg"),
                    rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))

    def run(device_frames):
        cfg = Config.from_dict({
            "paths": {"scene_2d_dir": str(tmp_path)},
            "frames": {"width_2d": 64, "height_2d": 48, "downsample_ratio": 1},
            "detector": {"box_threshold": -1.0, "must_match_query": False,
                         "similarity_threshold": -10.0, "max_detections": 4,
                         "dtype": "float32", "frame_batch": 2,
                         "device_frames": device_frames},
        })
        return Segmentor2D(cfg).process_scene("scene0000_00", "clothes")

    recs = run(True)
    assert len(recs) == 4
    for r in recs:
        m = np.asarray(r["segmented_frame_masks"])
        assert m.shape[1:] == (1, 48, 64) and m.dtype == bool
        assert len(r["confidences"]) == m.shape[0] == len(r["labels"])
    recs_host = run(False)
    assert len(recs_host) == 4


def test_process_scene_defer_matches_blocking(tmp_path, monkeypatch):
    """The three-stage deferred completion (BFF_SEG2D_DEFER=1, default) must
    emit byte-identical records to same-cycle blocking resolution, with and
    without the eager SAM encode — only the host blocking points move, never
    the math (phrase filter -> CLIP filter -> cap -> decode)."""
    import cv2

    rng = np.random.default_rng(8)
    scene = tmp_path / "scene0000_00" / "color"
    scene.mkdir(parents=True)
    for i in range(5):  # odd count: exercises the partial tail batch
        cv2.imwrite(str(scene / f"{i}.jpg"),
                    rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    def make(threshold):
        cfg = Config.from_dict({
            "paths": {"scene_2d_dir": str(tmp_path)},
            "frames": {"width_2d": 64, "height_2d": 48, "downsample_ratio": 1},
            "detector": {"box_threshold": -1.0, "must_match_query": False,
                         "similarity_threshold": threshold,
                         "max_detections": 4, "dtype": "float32",
                         "frame_batch": 2},
        })
        return Segmentor2D(cfg)

    # calibrate: random-init CLIP sims are tightly correlated across crops,
    # so a fixed threshold keeps all or none — pick the median observed sim
    # so the filter genuinely drops some boxes and keeps others
    monkeypatch.setenv("BFF_SEG2D_DEFER", "0")
    monkeypatch.setenv("BFF_SEG2D_EAGER_SAM", "0")
    probe = make(-10.0).process_scene("scene0000_00", "clothes")
    sims = np.concatenate([r["confidences"] for r in probe])
    assert sims.size >= 4
    seg = make(float(np.median(sims)))

    def run(defer, eager):
        monkeypatch.setenv("BFF_SEG2D_DEFER", defer)
        monkeypatch.setenv("BFF_SEG2D_EAGER_SAM", eager)
        return seg.process_scene("scene0000_00", "clothes")

    base = run("0", "0")
    assert base, "median threshold should keep at least one record"
    n_base = sum(len(r["confidences"]) for r in base)
    assert 0 < n_base < sims.size, "filter should drop some boxes, not all"
    for defer, eager in (("1", "1"), ("1", "0"), ("0", "1")):
        recs = run(defer, eager)
        assert len(recs) == len(base)
        for r, b in zip(recs, base):
            assert r["frame_id"] == b["frame_id"]
            assert r["labels"] == b["labels"]
            np.testing.assert_allclose(r["confidences"], b["confidences"],
                                       rtol=1e-6)
            np.testing.assert_array_equal(r["segmented_frame_masks"],
                                          b["segmented_frame_masks"])


def test_yolo_async_frame_path_matches_predict():
    """predict_batch_frames_async+finalize must equal predict() when the
    uploaded frame is already at the detector input resolution (the device
    resize is then the identity): same forward, same fixed-shape NMS."""
    import jax.numpy as jnp

    from beyondff_tpu.models import yolo_world

    yw = yolo_world.YOLOWorld.create("test")
    h, w = yw.cfg.img_size
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    boxes, scores, phrases = yw.predict(img, "clothes.", box_threshold=0.0)
    out = yw.predict_finalize(
        yw.predict_batch_frames_async(jnp.asarray(img[None]), "clothes."),
        box_threshold=0.0)
    (b2, s2, p2) = out[0]
    assert p2 == list(phrases)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(scores), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(boxes),
                               rtol=1e-5, atol=1e-6)


def test_yolo_process_scene_device_frames(tmp_path):
    """YOLO-World + EfficientSAM now takes the pipelined single-upload path
    (async detection, eager encode, packed best-of-3 decode) and still emits
    well-formed stage records."""
    import cv2

    rng = np.random.default_rng(7)
    scene = tmp_path / "scene0000_00" / "color"
    scene.mkdir(parents=True)
    for i in range(4):
        cv2.imwrite(str(scene / f"{i}.jpg"),
                    rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    cfg = Config.from_dict({
        "paths": {"scene_2d_dir": str(tmp_path)},
        "frames": {"width_2d": 64, "height_2d": 48, "downsample_ratio": 1},
        "detector": {"kind": "yolo_world", "box_threshold": -1.0,
                     "must_match_query": False, "similarity_threshold": -10.0,
                     "max_detections": 4, "dtype": "float32", "frame_batch": 2,
                     "filter_with_clip": False},
    })
    seg = Segmentor2D(cfg)
    assert hasattr(seg.detector, "predict_batch_frames_async")
    recs = seg.process_scene("scene0000_00", "clothes")
    assert len(recs) == 4
    for r in recs:
        m = np.asarray(r["segmented_frame_masks"])
        assert m.shape[1:] == (1, 48, 64) and m.dtype == bool
        assert len(r["confidences"]) == m.shape[0] == len(r["labels"])


def test_yolo_mismatched_clip_tower_not_attached():
    """A pipeline CLIP tower wider than the detector's guide dim (ViT-L/14 is
    768-d; official YOLO-World guides on CLIP-base, 512-d) must not be
    attached as the guide encoder — the detector keeps its hash-embedding
    fallback of the right width. A matching tower still attaches."""
    from beyondff_tpu.models import yolo_world

    cfg = Config.from_dict({
        "frames": {"width_2d": 64, "height_2d": 48},
        "detector": {"kind": "yolo_world", "box_threshold": 0.0,
                     "must_match_query": False, "similarity_threshold": -1.0,
                     "max_detections": 4, "dtype": "float32",
                     "filter_with_clip": False},
    })
    yw = yolo_world.YOLOWorld.create("test")  # text_dim 32

    class WideClipCfg:
        embed_dim = yw.cfg.text_dim + 7

    class WideClip:
        cfg = WideClipCfg()

    seg = Segmentor2D(cfg, detector=yw, clip_model=WideClip(),
                      clip_tokenizer=lambda names: names)
    assert seg.detector.clip is None
    feats = seg.detector.class_embeddings(["chair"])
    assert feats.shape == (1, yw.cfg.text_dim)

    class GoodClipCfg:
        embed_dim = yw.cfg.text_dim

    class GoodClip:
        cfg = GoodClipCfg()

        def encode_text(self, toks):
            return np.ones((len(toks), yw.cfg.text_dim), np.float32)

    yw2 = yolo_world.YOLOWorld.create("test")
    seg2 = Segmentor2D(cfg, detector=yw2, clip_model=GoodClip(),
                       clip_tokenizer=lambda names: names)
    assert seg2.detector.clip is not None


def test_yolo_two_tier_upload_matches_classic(tmp_path, monkeypatch):
    """BFF_SEG2D_TWO_TIER=1 (detector-scale upload + lazy SAM-scale upload
    for hit frames) must emit identical records to the classic single-upload
    path. Frames at the detector/SAM resolution make every resize an
    identity, so the comparison is exact and validates the plumbing (lazy
    uploads, per-frame input_hw, dict-indexed SAM buffers)."""
    import cv2

    rng = np.random.default_rng(13)
    scene = tmp_path / "scene0000_00" / "color"
    scene.mkdir(parents=True)
    for i in range(5):
        cv2.imwrite(str(scene / f"{i}.jpg"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    cfg = Config.from_dict({
        "paths": {"scene_2d_dir": str(tmp_path)},
        "frames": {"width_2d": 64, "height_2d": 64, "downsample_ratio": 1},
        "detector": {"kind": "yolo_world", "box_threshold": -1.0,
                     "must_match_query": False, "similarity_threshold": -10.0,
                     "max_detections": 4, "dtype": "float32", "frame_batch": 2,
                     "filter_with_clip": False},
    })
    seg = Segmentor2D(cfg)

    monkeypatch.setenv("BFF_SEG2D_TWO_TIER", "0")
    classic = seg.process_scene("scene0000_00", "clothes")
    monkeypatch.setenv("BFF_SEG2D_TWO_TIER", "1")
    two_tier = seg.process_scene("scene0000_00", "clothes")

    assert len(classic) == len(two_tier) > 0
    for a, b in zip(classic, two_tier):
        assert a["frame_id"] == b["frame_id"]
        assert a["labels"] == b["labels"]
        np.testing.assert_array_equal(a["segmented_frame_masks"],
                                      b["segmented_frame_masks"])
        np.testing.assert_allclose(a["confidences"], b["confidences"], rtol=1e-6)


@pytest.mark.parametrize("kind", ["gdino", "yolo_world"])
def test_batch_upload_matches_per_frame(tmp_path, monkeypatch, kind):
    """BFF_SEG2D_BATCH_UPLOAD=1 (one host->device transfer per detection
    batch, chunked prefetch, jitted subset gather) must emit identical
    records to per-frame uploads — in both detector modes (YOLO-World also
    exercises the two-tier lazy SAM-scale batch upload) and with a tail
    chunk smaller than frame_batch."""
    import cv2

    rng = np.random.default_rng(29)
    scene = tmp_path / "scene0000_00" / "color"
    scene.mkdir(parents=True)
    for i in range(5):  # frame_batch=2 -> tail chunk of 1
        cv2.imwrite(str(scene / f"{i}.jpg"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    det = {"box_threshold": -1.0 if kind == "yolo_world" else 0.0,
           "must_match_query": False, "similarity_threshold": -10.0,
           "max_detections": 4, "dtype": "float32", "frame_batch": 2,
           "filter_with_clip": kind == "gdino"}
    if kind == "yolo_world":
        det["kind"] = "yolo_world"
    cfg = Config.from_dict({
        "paths": {"scene_2d_dir": str(tmp_path)},
        "frames": {"width_2d": 64, "height_2d": 64, "downsample_ratio": 1},
        "detector": det,
    })
    seg = Segmentor2D(cfg)

    if kind == "yolo_world":
        # force the two-tier path so the lazy SAM-scale BATCH upload runs
        monkeypatch.setenv("BFF_SEG2D_TWO_TIER", "1")
    monkeypatch.setenv("BFF_SEG2D_BATCH_UPLOAD", "0")
    per_frame = seg.process_scene("scene0000_00", "clothes")
    monkeypatch.setenv("BFF_SEG2D_BATCH_UPLOAD", "1")
    batched = seg.process_scene("scene0000_00", "clothes")

    assert len(per_frame) == len(batched) > 0
    for a, b in zip(per_frame, batched):
        assert a["frame_id"] == b["frame_id"]
        assert a["labels"] == b["labels"]
        np.testing.assert_array_equal(a["segmented_frame_masks"],
                                      b["segmented_frame_masks"])
        np.testing.assert_allclose(a["confidences"], b["confidences"], rtol=1e-6)


@pytest.mark.parametrize("kind", ["gdino", "yolo_world"])
def test_run_classes_frame_bank_matches_per_class(tmp_path, monkeypatch, kind):
    """Scene-outer multi-class seg2d (run_classes: per-scene frame bank —
    JPEG decode + frame uploads paid once, every class's detection reuses
    the banked buffers) must emit identical stage files to per-class run(),
    in both detector modes (YOLO-World forced two-tier exercises the banked
    lazy SAM-scale path)."""
    import os

    import cv2

    from beyondff_tpu.pipeline import segmentation_2d as s2d
    from beyondff_tpu.utils import io as bio

    rng = np.random.default_rng(31)
    scene = tmp_path / "scene0000_00" / "color"
    scene.mkdir(parents=True)
    for i in range(5):
        cv2.imwrite(str(scene / f"{i}.jpg"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    s1_dir = tmp_path / "stage1"
    s1_dir.mkdir()
    (s1_dir / "scene0000_00.npz").write_bytes(b"")  # scene discovery marker
    det = {"box_threshold": -1.0 if kind == "yolo_world" else 0.0,
           "must_match_query": False, "similarity_threshold": -10.0,
           "max_detections": 4, "dtype": "float32", "frame_batch": 2,
           "filter_with_clip": kind == "gdino"}
    if kind == "yolo_world":
        det["kind"] = "yolo_world"
        monkeypatch.setenv("BFF_SEG2D_TWO_TIER", "1")
    cfg = Config.from_dict({
        "paths": {"scene_2d_dir": str(tmp_path),
                  "mask_2d_dir": str(tmp_path / "mask_2d"),
                  "stage_1_results_dir": str(s1_dir),
                  "checkpoint_dir": str(tmp_path / "ckpt_a")},
        "frames": {"width_2d": 64, "height_2d": 64, "downsample_ratio": 1},
        "detector": det,
    })
    seg = Segmentor2D(cfg)

    ref = {}
    for c in ("clothes", "towel"):
        s2d.run(cfg, c, resume=False, segmentor=seg)
        ref[c] = bio.load_frame_records(
            os.path.join(cfg.paths.mask_2d_dir, c,
                         f"scene0000_00.{cfg.output_format}"))

    cfg2 = cfg.override(**{"paths.checkpoint_dir": str(tmp_path / "ckpt_b")})
    banked = s2d.run_classes(cfg2, ["clothes", "towel"], resume=False,
                             segmentor=seg)
    assert len(banked["clothes"]) == len(banked["towel"]) == 1
    from beyondff_tpu.core import rle as rle_mod

    for c in ("clothes", "towel"):
        got = bio.load_frame_records(
            os.path.join(cfg.paths.mask_2d_dir, c,
                         f"scene0000_00.{cfg.output_format}"))
        assert len(got) == len(ref[c]) > 0
        for a, b in zip(ref[c], got):
            assert a["frame_id"] == b["frame_id"]
            assert list(a["labels"]) == list(b["labels"])
            ma = rle_mod.rle_decode_batch(a["segmented_frame_masks"])
            mb = rle_mod.rle_decode_batch(b["segmented_frame_masks"])
            np.testing.assert_array_equal(ma, mb)
            np.testing.assert_allclose(a["confidences"], b["confidences"],
                                       rtol=1e-6)

    # resume contract: everything checkpointed -> no work
    again = s2d.run_classes(cfg2, ["clothes", "towel"], resume=True,
                            segmentor=seg)
    assert again == {"clothes": [], "towel": []}


def test_sam_emb_bank_skips_reencode_with_identical_results(tmp_path, monkeypatch):
    """Multi-class sweeps bank SAM encoder embeddings per hit frame
    (("sam_emb", fid) keys): the second class re-encodes ONLY frames the
    first class didn't hit, and the emitted records stay identical to an
    un-banked run. BFF_SEG2D_BANK_EMB=0 opts out (no keys, same results)."""
    import cv2

    rng = np.random.default_rng(23)
    scene = tmp_path / "scene0000_00" / "color"
    scene.mkdir(parents=True)
    for i in range(4):
        cv2.imwrite(str(scene / f"{i}.jpg"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    cfg = Config.from_dict({
        "paths": {"scene_2d_dir": str(tmp_path)},
        "frames": {"width_2d": 64, "height_2d": 64, "downsample_ratio": 1},
        "detector": {"box_threshold": 0.0, "must_match_query": False,
                     "similarity_threshold": -10.0, "max_detections": 4,
                     "dtype": "float32", "frame_batch": 2,
                     "filter_with_clip": True},
    })
    seg = Segmentor2D(cfg)

    encoded = []
    real_encode = seg.sam.encode_frames

    def counting_encode(frames_dev):
        encoded.append(int(frames_dev.shape[0]))
        return real_encode(frames_dev)

    monkeypatch.setattr(seg.sam, "encode_frames", counting_encode)

    # un-banked reference run
    ref = seg.process_scene("scene0000_00", "towel")
    assert len(ref) > 0 and sum(encoded) > 0

    # banked: class 1 encodes its hit frames, class 2 re-encodes none of them
    bank = {}
    one = seg.process_scene("scene0000_00", "clothes", frame_bank=bank)
    n_banked = sum(1 for k in bank if k[0] == "sam_emb")
    assert n_banked > 0
    encoded.clear()
    two = seg.process_scene("scene0000_00", "towel", frame_bank=bank)
    assert sum(encoded) == 0, "banked embeddings must skip re-encode"
    assert len(one) > 0

    def assert_same(a_records, b_records):
        assert len(a_records) == len(b_records) > 0
        for a, b in zip(a_records, b_records):
            assert a["frame_id"] == b["frame_id"]
            assert a["labels"] == b["labels"]
            np.testing.assert_array_equal(a["segmented_frame_masks"],
                                          b["segmented_frame_masks"])
            np.testing.assert_allclose(a["confidences"], b["confidences"],
                                       rtol=1e-6)

    assert_same(ref, two)

    # opt-out: no emb keys, identical results
    monkeypatch.setenv("BFF_SEG2D_BANK_EMB", "0")
    bank2 = {}
    seg.process_scene("scene0000_00", "clothes", frame_bank=bank2)
    assert not any(k[0] == "sam_emb" for k in bank2)
    off = seg.process_scene("scene0000_00", "towel", frame_bank=bank2)
    assert_same(ref, off)


def test_feats_bank_cap_gates_banking_but_not_results(tmp_path, monkeypatch):
    """BFF_SEG2D_BANK_FEATS_CAP=0 must keep multi-class results identical
    while banking no backbone pyramids (the cap bounds device memory on
    huge scenes; capped frames recompute per class)."""
    import cv2

    rng = np.random.default_rng(17)
    scene = tmp_path / "scene0000_00" / "color"
    scene.mkdir(parents=True)
    for i in range(4):
        cv2.imwrite(str(scene / f"{i}.jpg"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    cfg = Config.from_dict({
        "paths": {"scene_2d_dir": str(tmp_path)},
        "frames": {"width_2d": 64, "height_2d": 64, "downsample_ratio": 1},
        "detector": {"box_threshold": 0.0, "must_match_query": False,
                     "similarity_threshold": -10.0, "max_detections": 4,
                     "dtype": "float32", "frame_batch": 2,
                     "filter_with_clip": True},
    })
    seg = Segmentor2D(cfg)

    bank = {}
    banked = seg.process_scene("scene0000_00", "clothes", frame_bank=bank)
    assert any(k[0] == "det_feats" for k in bank), "feats banked by default"

    monkeypatch.setenv("BFF_SEG2D_BANK_FEATS_CAP", "0")
    bank2 = {}
    capped = seg.process_scene("scene0000_00", "clothes", frame_bank=bank2)
    assert not any(k[0] == "det_feats" for k in bank2), "cap=0 banks nothing"

    assert len(banked) == len(capped) > 0
    for a, b in zip(banked, capped):
        assert a["frame_id"] == b["frame_id"]
        assert a["labels"] == b["labels"]
        np.testing.assert_array_equal(a["segmented_frame_masks"],
                                      b["segmented_frame_masks"])
        np.testing.assert_allclose(a["confidences"], b["confidences"],
                                   rtol=1e-6)


def test_detections_override_matches_normal(tmp_path, monkeypatch):
    """The fused-caption building blocks compose to the classic result: a
    demux pass whose single span covers the WHOLE caption records exactly
    the detections predict_finalize would keep, and replaying them through
    detections_override (no detector) emits byte-identical records.

    Crop transport is pinned to the host chain for BOTH passes: the auto
    default enables device-side CLIP crops only in override/demux passes,
    and the device resize's ±LSB sim shifts reorder the max_detections cap
    (a documented transport deviation, PARITY.md) — this test pins the
    demux/override MECHANICS, so both passes must share one crop path
    (device-vs-host crop equivalence is test_device_crops_match_host_crops)."""
    import cv2

    monkeypatch.setenv("BFF_CLIP_DEVICE_CROPS", "0")

    rng = np.random.default_rng(41)
    scene = tmp_path / "scene0000_00" / "color"
    scene.mkdir(parents=True)
    for i in range(5):
        cv2.imwrite(str(scene / f"{i}.jpg"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    cfg = Config.from_dict({
        "paths": {"scene_2d_dir": str(tmp_path)},
        "frames": {"width_2d": 64, "height_2d": 64, "downsample_ratio": 1},
        "detector": {"box_threshold": 0.0, "must_match_query": False,
                     "similarity_threshold": -10.0, "max_detections": 4,
                     "dtype": "float32", "frame_batch": 2,
                     "filter_with_clip": True},
    })
    seg = Segmentor2D(cfg)
    normal = seg.process_scene("scene0000_00", "clothes", frame_bank={})
    assert len(normal) > 0

    # demux with one whole-caption span == classic finalize (pinned in
    # tests/test_gdino.py); the caption IS the classic query here
    enc = seg.detector.tokenizer([seg.detector.preprocess_caption("clothes")])
    t = np.asarray(enc["input_ids"]).shape[1]
    bank: dict = {}
    dets: dict = {}
    out = seg.process_scene("scene0000_00", "clothes", frame_bank=bank,
                            demux=(["clothes"], [(0, t)], dets))
    assert out == []  # detection-only pass emits no records
    assert dets, "demux recorded detections"
    assert any(k[0] == "sam_emb" for k in bank), "hit frames banked eagerly"

    calls = []
    orig = seg.detector.predict_batch_frames_async
    monkeypatch.setattr(seg.detector, "predict_batch_frames_async",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    table = {fid: det for (_c, fid), det in dets.items()}
    replay = seg.process_scene("scene0000_00", "clothes", frame_bank=bank,
                               detections_override=table)
    assert calls == [], "override pass must not run the detector"
    assert len(replay) == len(normal)
    for a, b in zip(normal, replay):
        assert a["frame_id"] == b["frame_id"]
        assert a["labels"] == b["labels"]
        np.testing.assert_array_equal(a["segmented_frame_masks"],
                                      b["segmented_frame_masks"])
        np.testing.assert_allclose(a["confidences"], b["confidences"],
                                   rtol=1e-6)


def test_run_classes_fused_matches_manual_demux(tmp_path, monkeypatch):
    """Fused-caption run_classes (detector.fused_captions): one multi-phrase
    detection pass per scene serves every class in the group; per-class
    stage files must equal a hand-driven demux + detections_override
    pipeline, checkpoints resume, and classes the fused pass never detects
    still write (empty) stage files."""
    import os

    import cv2

    from beyondff_tpu.core import rle as rle_mod
    from beyondff_tpu.pipeline import segmentation_2d as s2d
    from beyondff_tpu.utils import io as bio

    rng = np.random.default_rng(43)
    scene = tmp_path / "scene0000_00" / "color"
    scene.mkdir(parents=True)
    for i in range(5):
        cv2.imwrite(str(scene / f"{i}.jpg"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    s1_dir = tmp_path / "stage1"
    s1_dir.mkdir()
    (s1_dir / "scene0000_00.npz").write_bytes(b"")
    base = {
        "paths": {"scene_2d_dir": str(tmp_path),
                  "mask_2d_dir": str(tmp_path / "mask_2d"),
                  "stage_1_results_dir": str(s1_dir),
                  "checkpoint_dir": str(tmp_path / "ckpt_a")},
        "frames": {"width_2d": 64, "height_2d": 64, "downsample_ratio": 1},
        "detector": {"box_threshold": 0.2, "must_match_query": False,
                     "similarity_threshold": -10.0, "max_detections": 4,
                     "dtype": "float32", "frame_batch": 2,
                     "filter_with_clip": True, "fused_captions": True,
                     "fused_group": 16},
    }
    cfg = Config.from_dict(base)
    seg = Segmentor2D(cfg)
    classes = ["clothes", "towel"]

    # hand-driven fused pipeline = expected stage outputs
    groups = s2d._fused_groups(seg.detector, classes, 16)
    assert len(groups) == 1 and groups[0][0] == classes
    _g, caption, spans = groups[0]
    dets: dict = {}
    bank: dict = {}
    seg.process_scene("scene0000_00", caption, frame_bank=bank,
                      demux=(classes, spans, dets))
    expect = {}
    for c in classes:
        table = {fid: det for (cc, fid), det in dets.items() if cc == c}
        recs = seg.process_scene("scene0000_00", c, frame_bank=bank,
                                 detections_override=table)
        rle_mod.encode_frame_masks(recs)
        expect[c] = recs

    got = s2d.run_classes(cfg, classes, resume=False, segmentor=seg)
    assert set(got) == set(classes)
    for c in classes:
        path = os.path.join(cfg.paths.mask_2d_dir, c,
                            f"scene0000_00.{cfg.output_format}")
        assert os.path.exists(path)
        recs = bio.load_frame_records(path)
        assert len(recs) == len(expect[c])
        for a, b in zip(expect[c], recs):
            assert a["frame_id"] == b["frame_id"]
            assert list(a["labels"]) == list(b["labels"])
            np.testing.assert_array_equal(
                rle_mod.rle_decode_batch(a["segmented_frame_masks"]),
                rle_mod.rle_decode_batch(b["segmented_frame_masks"]))
            # combined-replay CLIP sims wobble at the ulp level vs the
            # per-class crop batches (different power-of-2 padding)
            np.testing.assert_allclose(a["confidences"], b["confidences"],
                                       rtol=2e-5, atol=1e-6)

    # resume: everything checkpointed -> no work
    again = s2d.run_classes(cfg, classes, resume=True, segmentor=seg)
    assert again == {c: [] for c in classes}

    # env kill-switch: BFF_SEG2D_FUSED=0 falls back to the per-class path
    monkeypatch.setenv("BFF_SEG2D_FUSED", "0")
    cfg2 = cfg.override(**{"paths.checkpoint_dir": str(tmp_path / "ckpt_b")})
    calls = []
    orig = seg.detector.predict_finalize_demux
    monkeypatch.setattr(seg.detector, "predict_finalize_demux",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    s2d.run_classes(cfg2, classes, resume=False, segmentor=seg)
    assert calls == [], "BFF_SEG2D_FUSED=0 must not demux"


def test_run_classes_fused_yolo_matches_manual_demux(tmp_path):
    """The fused-caption sweep also serves the fast variant: YOLO-World's
    demux-by-argmax hooks plug into the same run_classes path (two-tier
    lazy SAM uploads included), and per-class stage files equal a
    hand-driven demux + detections_override pipeline."""
    import os

    import cv2

    from beyondff_tpu.core import rle as rle_mod
    from beyondff_tpu.pipeline import segmentation_2d as s2d
    from beyondff_tpu.utils import io as bio

    rng = np.random.default_rng(47)
    scene = tmp_path / "scene0000_00" / "color"
    scene.mkdir(parents=True)
    for i in range(4):
        cv2.imwrite(str(scene / f"{i}.jpg"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    s1_dir = tmp_path / "stage1"
    s1_dir.mkdir()
    (s1_dir / "scene0000_00.npz").write_bytes(b"")
    cfg = Config.from_dict({
        "paths": {"scene_2d_dir": str(tmp_path),
                  "mask_2d_dir": str(tmp_path / "mask_2d"),
                  "stage_1_results_dir": str(s1_dir),
                  "checkpoint_dir": str(tmp_path / "ckpt")},
        "frames": {"width_2d": 64, "height_2d": 64, "downsample_ratio": 1},
        "detector": {"kind": "yolo_world", "box_threshold": 0.0,
                     "must_match_query": False, "similarity_threshold": -10.0,
                     "max_detections": 4, "dtype": "float32",
                     "frame_batch": 2, "filter_with_clip": True,
                     "fused_captions": True, "fused_group": 16},
    })
    seg = Segmentor2D(cfg)
    classes = ["clothes", "towel"]

    groups = s2d._fused_groups(seg.detector, classes, 16)
    assert len(groups) == 1
    _g, caption, spans = groups[0]
    dets: dict = {}
    bank: dict = {}
    seg.process_scene("scene0000_00", caption, frame_bank=bank,
                      demux=(classes, spans, dets))
    expect = {}
    for c in classes:
        table = {fid: det for (cc, fid), det in dets.items() if cc == c}
        recs = seg.process_scene("scene0000_00", c, frame_bank=bank,
                                 detections_override=table)
        rle_mod.encode_frame_masks(recs)
        expect[c] = recs
    # argmax demux splits the boxes between the classes — both should see
    # some detections in a permissive-threshold run for the test to bite
    assert any(expect[c] for c in classes)

    got = s2d.run_classes(cfg, classes, resume=False, segmentor=seg)
    assert set(got) == set(classes)
    for c in classes:
        path = os.path.join(cfg.paths.mask_2d_dir, c,
                            f"scene0000_00.{cfg.output_format}")
        recs = bio.load_frame_records(path)
        assert len(recs) == len(expect[c])
        for a, b in zip(expect[c], recs):
            assert a["frame_id"] == b["frame_id"]
            assert list(a["labels"]) == list(b["labels"])
            np.testing.assert_array_equal(
                rle_mod.rle_decode_batch(a["segmented_frame_masks"]),
                rle_mod.rle_decode_batch(b["segmented_frame_masks"]))
            # combined-replay CLIP sims wobble at the ulp level vs the
            # per-class crop batches (different power-of-2 padding)
            np.testing.assert_allclose(a["confidences"], b["confidences"],
                                       rtol=2e-5, atol=1e-6)


def test_override_groups_matches_per_class_replays(tmp_path, monkeypatch):
    """The COMBINED replay (override_groups): one pipeline pass over
    (frame, class) entries must emit, per class, byte-identical records to
    a per-class detections_override replay, never touch the detector, and
    return [] for classes whose table is empty."""
    import cv2

    rng = np.random.default_rng(53)
    scene = tmp_path / "scene0000_00" / "color"
    scene.mkdir(parents=True)
    for i in range(5):
        cv2.imwrite(str(scene / f"{i}.jpg"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    cfg = Config.from_dict({
        "paths": {"scene_2d_dir": str(tmp_path)},
        "frames": {"width_2d": 64, "height_2d": 64, "downsample_ratio": 1},
        "detector": {"box_threshold": 0.1, "must_match_query": False,
                     "similarity_threshold": -10.0, "max_detections": 4,
                     "dtype": "float32", "frame_batch": 2,
                     "filter_with_clip": True},
    })
    seg = Segmentor2D(cfg)
    classes = ["clothes", "towel"]
    caption, spans = seg.detector.caption_spans(classes)
    bank: dict = {}
    dets: dict = {}
    seg.process_scene("scene0000_00", caption, frame_bank=bank,
                      demux=(classes, spans, dets))
    tables = {c: {fid: det for (cc, fid), det in dets.items() if cc == c}
              for c in classes}
    expect = {c: seg.process_scene("scene0000_00", c, frame_bank=bank,
                                   detections_override=tables[c])
              for c in classes}

    calls = []
    orig = seg.detector.predict_batch_frames_async
    monkeypatch.setattr(seg.detector, "predict_batch_frames_async",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    tables["mug"] = {}  # class the demux never detected
    got = seg.process_scene("scene0000_00", caption, frame_bank=bank,
                            override_groups=tables)
    assert calls == [], "combined replay must not run the detector"
    assert isinstance(got, dict) and set(got) == {"clothes", "towel", "mug"}
    assert got["mug"] == []
    assert any(expect[c] for c in classes), "demux produced detections"
    for c in classes:
        assert len(got[c]) == len(expect[c])
        for a, b in zip(expect[c], got[c]):
            assert a["frame_id"] == b["frame_id"]
            assert a["labels"] == b["labels"]
            np.testing.assert_array_equal(a["segmented_frame_masks"],
                                          b["segmented_frame_masks"])
            # confidences are CLIP sims: the combined crop batch pads to a
            # different power-of-2 than the per-class batches, so f32
            # numerics wobble at the ulp level (~1e-7 abs)
            np.testing.assert_allclose(a["confidences"], b["confidences"],
                                       rtol=2e-5, atol=1e-6)

    # without a frame_bank the combined form must refuse (frames are shared
    # across entries through the bank)
    with pytest.raises(ValueError, match="frame_bank"):
        seg.process_scene("scene0000_00", caption, override_groups=tables)


def test_run_classes_class_thresholds(tmp_path):
    """Per-class box_threshold overrides (run_classes ``class_thresholds``):
    the per-class path must emit stage files identical to per-class run()
    with the same threshold in cfg, and the fused path must apply each
    class's own cutoff through the demux."""
    import os

    import cv2

    from beyondff_tpu.core import rle as rle_mod
    from beyondff_tpu.pipeline import segmentation_2d as s2d
    from beyondff_tpu.utils import io as bio

    rng = np.random.default_rng(57)
    scene = tmp_path / "scene0000_00" / "color"
    scene.mkdir(parents=True)
    for i in range(4):
        cv2.imwrite(str(scene / f"{i}.jpg"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    s1_dir = tmp_path / "stage1"
    s1_dir.mkdir()
    (s1_dir / "scene0000_00.npz").write_bytes(b"")
    base = {
        "paths": {"scene_2d_dir": str(tmp_path),
                  "mask_2d_dir": str(tmp_path / "mask_2d"),
                  "stage_1_results_dir": str(s1_dir),
                  "checkpoint_dir": str(tmp_path / "ckpt_a")},
        "frames": {"width_2d": 64, "height_2d": 64, "downsample_ratio": 1},
        "detector": {"box_threshold": 1e9, "must_match_query": False,
                     "similarity_threshold": -10.0, "max_detections": 4,
                     "dtype": "float32", "frame_batch": 2,
                     "filter_with_clip": True},
    }
    cfg = Config.from_dict(base)
    seg = Segmentor2D(cfg)
    classes = ["clothes", "towel"]
    thr = {"clothes": -1.0, "towel": 1e9}  # hit / forced-miss

    # expected: per-class run() with the threshold in cfg
    expect = {}
    for c in classes:
        cfg_c = cfg.override(**{"detector.box_threshold": thr[c]})
        seg.cfg = cfg_c
        s2d.run(cfg_c, c, resume=False, segmentor=seg)
        expect[c] = bio.load_frame_records(os.path.join(
            cfg.paths.mask_2d_dir, c, f"scene0000_00.{cfg.output_format}"))
    seg.cfg = cfg
    assert len(expect["clothes"]) > 0 and len(expect["towel"]) == 0

    cfg2 = cfg.override(**{"paths.checkpoint_dir": str(tmp_path / "ckpt_b")})
    s2d.run_classes(cfg2, classes, resume=False, segmentor=seg,
                    class_thresholds=thr)
    for c in classes:
        got = bio.load_frame_records(os.path.join(
            cfg.paths.mask_2d_dir, c, f"scene0000_00.{cfg.output_format}"))
        assert len(got) == len(expect[c])
        for a, b in zip(expect[c], got):
            assert a["frame_id"] == b["frame_id"]
            np.testing.assert_array_equal(
                rle_mod.rle_decode_batch(a["segmented_frame_masks"]),
                rle_mod.rle_decode_batch(b["segmented_frame_masks"]))
            np.testing.assert_allclose(a["confidences"], b["confidences"],
                                       rtol=1e-6)
    # cfg's own (1e9) threshold untouched for classes absent from the map
    s2d.run_classes(
        cfg.override(**{"paths.checkpoint_dir": str(tmp_path / "ckpt_c")}),
        classes, resume=False, segmentor=seg,
        class_thresholds={"clothes": -1.0})
    assert len(bio.load_frame_records(os.path.join(
        cfg.paths.mask_2d_dir, "towel",
        f"scene0000_00.{cfg.output_format}"))) == 0

    # fused path: each class keeps its own cutoff through the demux
    cfg_f = cfg.override(**{"detector.fused_captions": True,
                            "detector.fused_group": 16,
                            "paths.checkpoint_dir": str(tmp_path / "ckpt_d")})
    s2d.run_classes(cfg_f, classes, resume=False, segmentor=seg,
                    class_thresholds=thr)
    fused_hit = bio.load_frame_records(os.path.join(
        cfg.paths.mask_2d_dir, "clothes", f"scene0000_00.{cfg.output_format}"))
    fused_miss = bio.load_frame_records(os.path.join(
        cfg.paths.mask_2d_dir, "towel", f"scene0000_00.{cfg.output_format}"))
    assert len(fused_hit) > 0 and len(fused_miss) == 0


@pytest.mark.parametrize("kind", ["gdino", "yolo_world"])
def test_device_crops_match_host_crops(tmp_path, monkeypatch, kind):
    """BFF_CLIP_DEVICE_CROPS=1 (box crops cut + resized on device from the
    SAM-scale frame buffers, core/crop_resize.py) must keep the pipeline's
    records aligned with the host crop chain: identical frames, labels and
    masks; confidences (CLIP sims) within the f32-vs-cv2 resize tolerance.
    Frames at the SAM resolution with BFF_SEG2D_YUV=0 make the crop SOURCE
    identical, so the comparison isolates the device resize arithmetic."""
    import cv2

    rng = np.random.default_rng(47)
    scene = tmp_path / "scene0000_00" / "color"
    scene.mkdir(parents=True)
    for i in range(4):
        # smooth content: keeps cv2-fixed-point-vs-f32 differences sub-LSB
        base = rng.integers(0, 255, (8, 8, 3), np.uint8)
        cv2.imwrite(str(scene / f"{i}.jpg"),
                    cv2.resize(base, (64, 64), interpolation=cv2.INTER_CUBIC),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
    # max_detections above any detection count: _cap_detections sorts by
    # confidence (= CLIP sims after the filter), and near-tied sims reorder
    # between the two crop paths — capping off keeps records order-aligned
    det = {"box_threshold": -1.0 if kind == "yolo_world" else 0.0,
           "must_match_query": False, "similarity_threshold": -10.0,
           "max_detections": 32, "dtype": "float32", "frame_batch": 2,
           "filter_with_clip": True}
    if kind == "yolo_world":
        det["kind"] = "yolo_world"
    cfg = Config.from_dict({
        "paths": {"scene_2d_dir": str(tmp_path)},
        "frames": {"width_2d": 64, "height_2d": 64, "downsample_ratio": 1},
        "detector": det,
    })
    seg = Segmentor2D(cfg)

    monkeypatch.setenv("BFF_SEG2D_YUV", "0")
    # pin the frame transport too: JXT auto-enables exactly where device
    # crops are on, and this smooth content packs — without the pin the
    # two runs would compare different SAM buffers, not the crop arithmetic
    # (JXT-vs-host equivalence is test_jxt_transport_matches_host_chain)
    monkeypatch.setenv("BFF_SEG2D_JXT", "0")
    if kind == "yolo_world":
        # force two-tier so the lazy SAM-scale buffer is the crop source
        monkeypatch.setenv("BFF_SEG2D_TWO_TIER", "1")
    monkeypatch.setenv("BFF_CLIP_DEVICE_CROPS", "0")
    host = seg.process_scene("scene0000_00", "clothes")
    monkeypatch.setenv("BFF_CLIP_DEVICE_CROPS", "1")
    dev = seg.process_scene("scene0000_00", "clothes")

    assert len(host) == len(dev) > 0
    for a, b in zip(host, dev):
        assert a["frame_id"] == b["frame_id"]
        assert a["labels"] == b["labels"]
        np.testing.assert_array_equal(a["segmented_frame_masks"],
                                      b["segmented_frame_masks"])
        np.testing.assert_allclose(a["confidences"], b["confidences"],
                                   atol=0.05)


@pytest.mark.parametrize("tier_batch", [("1", "1"), ("1", "0"), ("0", "0")])
def test_jxt_transport_matches_host_chain(tmp_path, monkeypatch, tier_batch):
    """BFF_SEG2D_JXT=1 (JPEG coefficient transport: sparse DCT upload, device
    IDCT, detector-/SAM-scale buffers derived by device resize) must emit the
    same detections as the host decode + YCrCb chain, with masks equal up to
    the documented transport deviation (float vs libjpeg integer IDCT, device
    vs cv2 resize — PARITY.md transport class). Parametrized over the
    two-tier x batch-upload loader variants (load_chunk batched natives,
    per-frame load, and the non-two-tier direct SAM derivation)."""
    import cv2

    from beyondff_tpu.core import jxt
    from beyondff_tpu.utils import native

    if not native.available() or native.jpeg_coeffs_native is None:
        pytest.skip("native runtime unavailable")

    two_tier, batch_upload = tier_batch
    rng = np.random.default_rng(7)
    scene = tmp_path / "scene0000_00" / "color"
    scene.mkdir(parents=True)
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for i in range(5):  # frame_batch=2 -> tail chunk of 1
        base = 120 + 60 * np.sin(xx / 9 + i) + 40 * np.cos(yy / 7)
        img = np.clip(np.stack([base, base * 0.9 + 10, base * 0.8 + 20], -1)
                      + rng.normal(0, 2, (h, w, 3)), 0, 255).astype(np.uint8)
        cv2.imwrite(str(scene / f"{i}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
    # precondition: this content must actually take the coefficient path,
    # and the jxt-derived buffer must sit within the transport deviation
    # class of the host chain (decode + resize, a few LSB)
    with open(scene / "0.jpg", "rb") as f:
        packed = jxt.pack_file(f.read())
    assert packed is not None
    native_dev = np.asarray(jxt.upload_frame(packed))
    host_img = cv2.cvtColor(cv2.imread(str(scene / "0.jpg")), cv2.COLOR_BGR2RGB)
    assert np.abs(native_dev.astype(int) - host_img.astype(int)).max() <= 6

    cfg = Config.from_dict({
        "paths": {"scene_2d_dir": str(tmp_path)},
        "frames": {"width_2d": w, "height_2d": h, "downsample_ratio": 1},
        "detector": {"kind": "yolo_world", "box_threshold": -1.0,
                     "must_match_query": False, "similarity_threshold": -10.0,
                     "max_detections": 8, "dtype": "float32", "frame_batch": 2,
                     "filter_with_clip": True},
    })
    seg = Segmentor2D(cfg)

    monkeypatch.setenv("BFF_SEG2D_TWO_TIER", two_tier)
    monkeypatch.setenv("BFF_SEG2D_BATCH_UPLOAD", batch_upload)
    monkeypatch.setenv("BFF_CLIP_DEVICE_CROPS", "1")
    monkeypatch.setenv("BFF_SEG2D_JXT", "0")
    host = seg.process_scene("scene0000_00", "clothes")
    monkeypatch.setenv("BFF_SEG2D_JXT", "1")
    jx = seg.process_scene("scene0000_00", "clothes")

    assert len(host) == len(jx) > 0
    ious = []
    for a, b in zip(host, jx):
        assert a["frame_id"] == b["frame_id"]
        assert a["labels"] == b["labels"]
        assert a["segmented_frame_masks"].shape == b["segmented_frame_masks"].shape
        ma = a["segmented_frame_masks"].reshape(len(a["labels"]), -1)
        mb = b["segmented_frame_masks"].reshape(len(b["labels"]), -1)
        inter = (ma & mb).sum(-1)
        union = (ma | mb).sum(-1)
        ious.append(np.where(union == 0, 1.0, inter / np.maximum(union, 1)))
        np.testing.assert_allclose(a["confidences"], b["confidences"],
                                   atol=0.05)
    ious = np.concatenate(ious)
    # random-init decoders have large near-threshold level sets, so a
    # few-LSB input deviation can flip a band of pixels on an unlucky
    # mask — the buffer-closeness precondition above pins the transport;
    # the IoU floors guard against coordinate/indexing bugs (those
    # produce ~0 overlap, not a noisy boundary)
    assert ious.mean() > 0.95 and ious.min() > 0.5, ious
