"""C++ host runtime vs python/cv2 oracles."""

import numpy as np
import pytest

from beyondff_tpu.core import rle
from beyondff_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def test_native_rle_round_trip(rng):
    masks = rng.random((5, 777)) < 0.3
    rles = [rle.rle_encode(m) for m in masks]
    out = native.rle_decode_batch_native(rles)
    np.testing.assert_array_equal(out.astype(bool), masks)
    # native encode matches python encode
    for m in masks:
        enc_n = native.rle_encode_native(m)
        enc_p = rle.rle_encode(m)
        assert enc_n["length"] == enc_p["length"]
        np.testing.assert_array_equal(enc_n["counts"], enc_p["counts"])


def test_native_depth_png_matches_cv2(tmp_path, rng):
    import cv2

    depth_mm = rng.integers(0, 6000, (120, 160)).astype(np.uint16)
    path = str(tmp_path / "d.png")
    assert cv2.imwrite(path, depth_mm)

    # no resize: exact scaling parity
    ours = native.decode_depth_native(path, 1000.0, (120, 160))
    ref = depth_mm.astype(np.float32) / 1000.0
    np.testing.assert_allclose(ours, ref, rtol=1e-6)

    # with resize: match cv2 INTER_LINEAR
    ours_r = native.decode_depth_native(path, 1000.0, (242, 324))
    ref_r = cv2.resize(ref, (324, 242))
    np.testing.assert_allclose(ours_r, ref_r, rtol=1e-4, atol=1e-4)


def test_native_depth_batch(tmp_path, rng):
    import cv2

    paths = []
    refs = []
    for i in range(4):
        d = rng.integers(0, 4000, (60, 80)).astype(np.uint16)
        p = str(tmp_path / f"{i}.png")
        cv2.imwrite(p, d)
        paths.append(p)
        refs.append(cv2.resize(d.astype(np.float32) / 1000.0, (100, 90)))
    out = native.decode_depth_batch_native(paths, 1000.0, (90, 100), n_threads=2)
    np.testing.assert_allclose(out, np.stack(refs), rtol=1e-4, atol=1e-4)
