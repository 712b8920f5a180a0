"""RLE codec: round-trip properties + wire-format parity with the reference
encoding (1-based starts; reference: tools/utils/rle_encode_decode.py)."""

import numpy as np

from beyondff_tpu.core import rle


def reference_rle_encode(mask):
    """Literal transcription of the reference algorithm as an oracle."""
    mask = np.concatenate([[0], mask.astype(np.uint8), [0]])
    runs = np.flatnonzero(mask[1:] != mask[:-1]) + 1
    runs[1::2] -= runs[::2]
    return {"length": int(len(mask) - 2), "counts": runs}


def test_round_trip_random(rng):
    for _ in range(20):
        mask = rng.random(rng.integers(1, 500)) < 0.3
        dec = rle.rle_decode(rle.rle_encode(mask))
        np.testing.assert_array_equal(dec.astype(bool), mask)


def test_wire_format_matches_reference(rng):
    for _ in range(50):
        mask = rng.random(rng.integers(1, 200)) < rng.random()
        ours = rle.rle_encode(mask)
        ref = reference_rle_encode(mask)
        assert ours["length"] == ref["length"]
        np.testing.assert_array_equal(ours["counts"], ref["counts"])


def test_edge_cases():
    for mask in [np.zeros(10, bool), np.ones(10, bool), np.array([True]), np.array([False])]:
        enc = rle.rle_encode(mask)
        np.testing.assert_array_equal(rle.rle_decode(enc).astype(bool), mask)
    empty = rle.rle_encode(np.zeros(0, bool))
    assert empty["length"] == 0 and len(empty["counts"]) == 0


def test_string_counts_tolerated():
    mask = np.array([0, 1, 1, 0, 1], bool)
    enc = rle.rle_encode(mask)
    enc_str = {"length": enc["length"], "counts": " ".join(str(c) for c in enc["counts"])}
    np.testing.assert_array_equal(rle.rle_decode(enc_str).astype(bool), mask)


def test_batch_and_frame_wrappers(rng):
    h, w = 12, 17
    masks = rng.random((4, 1, h, w)) < 0.4
    records = [{"frame_id": "0.jpg", "segmented_frame_masks": masks.copy(), "confidences": [1.0] * 4, "labels": ["x"] * 4}]
    rle.encode_frame_masks(records)
    assert isinstance(records[0]["segmented_frame_masks"], list)
    rle.decode_frame_masks(records, image_shape=(h, w))
    np.testing.assert_array_equal(records[0]["segmented_frame_masks"].astype(bool), masks)


def test_decode_frame_masks_accepts_dense_tensors(rng):
    """The reference's YOLO-World stage saves raw (M, 1, H, W) bool tensors
    without RLE encoding (segmentation_2d_yolo_world.py:634-638); those
    records must decode unchanged."""
    import torch

    from beyondff_tpu.core import rle

    h, w = 12, 16
    masks = rng.random((3, 1, h, w)) < 0.4
    records = [
        {"frame_id": "0.jpg", "segmented_frame_masks": torch.from_numpy(masks)},
        {"frame_id": "1.jpg", "segmented_frame_masks": []},  # empty detections
    ]
    out = rle.decode_frame_masks(records, image_shape=(h, w))
    np.testing.assert_array_equal(out[0]["segmented_frame_masks"], masks.astype(np.uint8))
    assert out[1]["segmented_frame_masks"].shape == (0, 1, h, w)

    # RLE-encoded records still round-trip through the same entry point
    enc = [{"frame_id": "0.jpg", "segmented_frame_masks": masks.copy()}]
    rle.encode_frame_masks(enc)
    dec = rle.decode_frame_masks(enc, image_shape=(h, w))
    np.testing.assert_array_equal(dec[0]["segmented_frame_masks"], masks.astype(np.uint8))
