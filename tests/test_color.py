"""YCrCb 4:2:0 frame transport (core/color.py): device unpack vs numpy
oracle, round-trip error bounds, odd-dimension handling."""

import numpy as np
import pytest

from beyondff_tpu.core import color


def _smooth_image(h, w, seed=0):
    """Chroma-smooth test frame (indoor frames are chroma-smooth; the JPEG
    sources carried no 2x2 chroma detail to begin with)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [
            128 + 90 * np.sin(yy / 37.0) * np.cos(xx / 53.0),
            128 + 80 * np.cos(yy / 29.0 + 1.0),
            128 + 70 * np.sin(xx / 41.0 + 2.0),
        ],
        axis=-1,
    )
    noise = rng.normal(0, 6, (h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(64, 96), (63, 95), (765, 102)])
def test_pack_length_and_device_matches_oracle(h, w):
    img = _smooth_image(h, w)
    he, we = h + (h & 1), w + (w & 1)
    buf = color.pack_ycrcb420(img)
    assert buf.shape == (he * we + 2 * (he // 2) * (we // 2),)

    dev = np.asarray(color.upload_frame(img, yuv=True))
    assert dev.shape == (h, w, 3) and dev.dtype == np.uint8
    oracle = color.roundtrip_host(img)
    # device op and numpy mirror share the math; +-1 covers float rounding
    assert np.max(np.abs(dev.astype(int) - oracle.astype(int))) <= 1


def test_roundtrip_jpeg_sourced_near_lossless():
    """The claim the default rests on: pipeline frames come from JPEGs
    (ScanNet color/*.jpg), whose chroma is already 4:2:0 — so the transport's
    added error is an order of magnitude below the file's own quantization
    error. Measured: transport mean 0.38 / max 4 vs JPEG-own mean 4.6."""
    import cv2

    img = _smooth_image(480, 640, seed=1)
    ok, enc = cv2.imencode(".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                           [cv2.IMWRITE_JPEG_QUALITY, 90])
    assert ok
    src = cv2.cvtColor(cv2.imdecode(enc, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
    rt = color.roundtrip_host(src)
    err = np.abs(rt.astype(int) - src.astype(int))
    jpeg_err = np.abs(src.astype(int) - img.astype(int))
    assert err.mean() < 1.0, err.mean()
    assert np.percentile(err, 99) <= 4, np.percentile(err, 99)
    assert err.max() <= 8, err.max()
    assert err.mean() < 0.25 * jpeg_err.mean(), (err.mean(), jpeg_err.mean())


def test_roundtrip_error_bounded_smooth():
    # per-pixel RGB noise leaks into chroma, so this synthetic is HARSHER
    # than any JPEG-sourced frame; measured mean 3.7 / p99 14
    img = _smooth_image(128, 160, seed=1)
    rt = color.roundtrip_host(img)
    err = np.abs(rt.astype(int) - img.astype(int))
    assert err.mean() < 5.0, err.mean()
    assert np.percentile(err, 99) <= 18, np.percentile(err, 99)
    # luma survives exactly (the inverse matrix is exact): Y of the
    # round-tripped RGB matches Y of the source within rounding
    import cv2

    y_src = cv2.cvtColor(img, cv2.COLOR_RGB2YCrCb)[:, :, 0].astype(int)
    y_rt = cv2.cvtColor(rt, cv2.COLOR_RGB2YCrCb)[:, :, 0].astype(int)
    assert np.abs(y_src - y_rt).max() <= 1


def test_roundtrip_error_bounded_noise():
    # adversarial: full-range independent RGB noise (no real image looks
    # like this; measured mean 46 — documents the worst case, nothing more)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (96, 96, 3), np.uint8)
    rt = color.roundtrip_host(img)
    err = np.abs(rt.astype(int) - img.astype(int))
    assert err.mean() < 60.0, err.mean()


def test_dense_fallback_is_identity():
    img = _smooth_image(33, 47, seed=3)
    dev = np.asarray(color.upload_frame(img, yuv=False))
    np.testing.assert_array_equal(dev, img)
