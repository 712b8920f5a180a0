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
