"""EfficientSAM: tiny-config decode with best-of-multimask selection."""

import numpy as np
import pytest

from beyondff_tpu.models import efficientsam as esam_mod


@pytest.fixture(scope="module")
def tiny_esam():
    return esam_mod.EfficientSAM.create("test", seed=0)


def test_best_of_multimask(tiny_esam):
    c = tiny_esam.cfg
    g = c.img_size // c.patch_size
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(g, g, c.prompt_dim)).astype(np.float32)
    boxes = np.array([[0, 0, 30, 30], [20, 10, 60, 50]], np.float32)
    masks, iou = tiny_esam.decode_boxes_best(emb, boxes)
    assert masks.shape == (2, 4 * g, 4 * g)
    assert iou.shape == (2,)
    # best-of selection: returned iou is the max over the mask heads
    all_masks, all_iou = tiny_esam.decode_boxes(emb, boxes)
    assert np.all(np.asarray(iou) >= np.asarray(all_iou) - 1e-6)


def test_encoder_windowless(tiny_esam):
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (1, 48, 64, 3), dtype=np.uint8)
    x, _ = tiny_esam.preprocess(imgs)
    emb = tiny_esam.encode_image(x)
    g = tiny_esam.cfg.img_size // tiny_esam.cfg.patch_size
    assert emb.shape == (1, g, g, tiny_esam.cfg.prompt_dim)
    assert np.isfinite(np.asarray(emb)).all()
