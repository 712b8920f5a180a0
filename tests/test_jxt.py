"""JXT (JPEG coefficient transport) tests: the C++ entropy decoder, the
sparse wire format, the device decode (dequant + IDCT + upsample + color),
and the device resize — all against numpy oracles and cv2's own decode of
the same bytes (core/jxt.py, native/bff_native.cpp)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from beyondff_tpu.core import jxt
from beyondff_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available()
                                or native.jpeg_coeffs_native is None,
                                reason="native runtime unavailable")


def _structured(h, w, seed=0):
    """Natural-image-like content: smooth fields + rectangles + mild noise
    (uniform noise would spill to the YCrCb fallback by design)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 120 + 60 * np.sin(xx / 40) + 40 * np.cos(yy / 30)
    img = np.stack([base, base * 0.9 + 10, base * 0.8 + 20], -1)
    for _ in range(8):
        x0, y0 = rng.integers(0, max(w - 20, 1)), rng.integers(0, max(h - 20, 1))
        dw, dh = rng.integers(10, w // 2), rng.integers(10, h // 2)
        img[y0:y0 + dh, x0:x0 + dw] = (
            0.7 * img[y0:y0 + dh, x0:x0 + dw] + 0.3 * rng.integers(30, 220, 3))
    img = img + rng.normal(0, 2, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def _encode(img_rgb, quality=90, **flags):
    params = [cv2.IMWRITE_JPEG_QUALITY, quality]
    for k, v in flags.items():
        params += [getattr(cv2, k), v]
    ok, enc = cv2.imencode(".jpg", cv2.cvtColor(img_rgb, cv2.COLOR_RGB2BGR),
                           params)
    assert ok
    return enc.tobytes()


def _cv2_decode(blob):
    arr = cv2.imdecode(np.frombuffer(blob, np.uint8), cv2.IMREAD_COLOR)
    return cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)


@pytest.mark.parametrize("hw", [(96, 128), (97, 131)])
def test_device_decode_matches_oracle_and_cv2(hw):
    blob = _encode(_structured(*hw), quality=90)
    packed = jxt.pack_file(blob)
    assert packed is not None
    dev = np.asarray(jxt.upload_frame(packed))
    oracle = jxt.roundtrip_host(blob)
    ref = _cv2_decode(blob)
    assert dev.shape == ref.shape
    # device == numpy oracle up to f32-vs-f64 rounding
    assert np.abs(dev.astype(int) - oracle.astype(int)).max() <= 1
    # exact to the FILE up to IDCT/upsample arithmetic (libjpeg integer
    # IDCT vs float): same transport class as YCrCb 4:2:0 (PARITY.md)
    err = np.abs(dev.astype(int) - ref.astype(int))
    assert err.max() <= 6 and err.mean() < 1.0


def test_wire_is_sparse_for_natural_content():
    h, w = 96, 128
    packed = jxt.pack_file(_encode(_structured(h, w), quality=90))
    assert packed is not None
    assert packed.nbytes < 1.5 * h * w  # beats the YCrCb transport


def test_noise_spills_to_none():
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 255, (96, 128, 3), np.uint8)
    assert jxt.pack_file(_encode(noise, quality=95)) is None


def test_progressive_falls_back():
    blob = _encode(_structured(64, 64), quality=90, IMWRITE_JPEG_PROGRESSIVE=1)
    assert jxt.pack_file(blob) is None


def test_restart_markers():
    blob = _encode(_structured(96, 128), quality=90, IMWRITE_JPEG_RST_INTERVAL=2)
    packed = jxt.pack_file(blob)
    assert packed is not None
    dev = np.asarray(jxt.upload_frame(packed))
    err = np.abs(dev.astype(int) - _cv2_decode(blob).astype(int))
    assert err.max() <= 6


def test_grayscale_decodes_to_rgb():
    g = _structured(80, 96)[:, :, 0]
    ok, enc = cv2.imencode(".jpg", g, [cv2.IMWRITE_JPEG_QUALITY, 90])
    packed = jxt.pack_file(enc.tobytes())
    assert packed is not None
    dev = np.asarray(jxt.upload_frame(packed))
    assert dev.shape == (80, 96, 3)
    assert np.array_equal(dev[..., 0], dev[..., 1])


def test_batch_matches_singles():
    packs = [jxt.pack_file(_encode(_structured(96, 128, seed=s), quality=90))
             for s in range(3)]
    assert all(p is not None for p in packs)
    batch = np.asarray(jxt.upload_frames(packs))
    singles = np.stack([np.asarray(jxt.upload_frame(p)) for p in packs])
    assert np.array_equal(batch, singles)


def test_batch_mixed_quality_uses_per_frame_qsteps():
    """A chunk mixing JPEG qualities must decode each frame with ITS OWN
    quantization tables (ADVICE r4: frames 1..B-1 silently dequantized with
    frame 0's qtab reconstructed wrong pixels)."""
    packs = [jxt.pack_file(_encode(_structured(96, 128, seed=s), quality=q))
             for s, q in ((0, 90), (1, 75), (2, 95))]
    assert all(p is not None for p in packs)
    assert not np.array_equal(packs[0].qsteps, packs[1].qsteps)
    batch = np.asarray(jxt.upload_frames(packs))
    singles = np.stack([np.asarray(jxt.upload_frame(p)) for p in packs])
    assert np.array_equal(batch, singles)


def test_batch_mixed_geometry_falls_back_per_frame():
    """A grayscale frame (1 component) among color 4:2:0 frames has a
    different block geometry — the batch must decode it correctly rather
    than assembling it with frame 0's geometry."""
    color = [jxt.pack_file(_encode(_structured(96, 128, seed=s), quality=90))
             for s in range(2)]
    g = _structured(96, 128, seed=7)[:, :, 0]
    ok, enc = cv2.imencode(".jpg", g, [cv2.IMWRITE_JPEG_QUALITY, 90])
    gray = jxt.pack_file(enc.tobytes())
    packs = [color[0], gray, color[1]]
    assert all(p is not None for p in packs)
    assert packs[1].geometry != packs[0].geometry
    batch = np.asarray(jxt.upload_frames(packs))
    singles = np.stack([np.asarray(jxt.upload_frame(p)) for p in packs])
    assert np.array_equal(batch, singles)


def test_batch_mixed_pixel_dims_rejected():
    a = jxt.pack_file(_encode(_structured(96, 128), quality=90))
    b = jxt.pack_file(_encode(_structured(80, 96), quality=90))
    assert a is not None and b is not None
    with pytest.raises(ValueError):
        jxt.upload_frames([a, b])


def test_device_resize_matches_cv2():
    img = _structured(96, 128)
    import jax.numpy as jnp

    dev = np.asarray(jxt.resize_frame(jnp.asarray(img), (48, 80)))
    ref = cv2.resize(img, (80, 48), interpolation=cv2.INTER_LINEAR)
    assert np.abs(dev.astype(int) - ref.astype(int)).max() <= 1


def test_escape_values_roundtrip():
    """Huge low-frequency coefficients exercise the int16 escape channel."""
    h, w = 64, 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # extreme-contrast smooth ramp -> large DC/low-AC values at q95
    img = np.clip(np.stack([255 * (xx / w), 255 * (yy / h),
                            255 * ((xx + yy) / (h + w))], -1), 0, 255
                  ).astype(np.uint8)
    blob = _encode(img, quality=95)
    packed = jxt.pack_file(blob)
    assert packed is not None
    dev = np.asarray(jxt.upload_frame(packed))
    oracle = jxt.roundtrip_host(blob)
    assert np.abs(dev.astype(int) - oracle.astype(int)).max() <= 1


def test_skip_entries_bridge_long_gaps():
    """A frame that is one flat color except one corner -> coefficient gaps
    far beyond 255 between nonzeros."""
    img = np.full((128, 160, 3), 180, np.uint8)
    img[120:, 150:] = 30
    blob = _encode(img, quality=90)
    packed = jxt.pack_file(blob)
    assert packed is not None
    dev = np.asarray(jxt.upload_frame(packed))
    err = np.abs(dev.astype(int) - _cv2_decode(blob).astype(int))
    assert err.max() <= 6


def test_native_scan_matches_numpy_pack():
    """bff_jxt_scan (the one-pass C++ delta/val/esc builder) must produce
    byte-identical JxtPacked wires to the pure-numpy pack() chain, including
    the edge cases: first nonzero at position 0, gaps > 255 and > 510
    (multi-skip bridging), +-127 boundary values, and int16 escapes."""
    from unittest import mock

    blob = _encode(_structured(96, 128), quality=90)
    dec = jxt.parse_file(blob)
    a = jxt.pack(dec)
    with mock.patch.object(native, "jxt_scan_native", lambda flat: None):
        b = jxt.pack(dec)
    assert a is not None and b is not None
    assert (a.ncap, a.ecap) == (b.ncap, b.ecap)
    np.testing.assert_array_equal(a.wire, b.wire)

    rng = np.random.default_rng(3)
    for _ in range(100):
        n = int(rng.integers(1, 3000))
        flat = np.zeros(n, np.int16)
        k = int(rng.integers(0, min(n, 40)))
        idxs = rng.choice(n, size=k, replace=False)
        flat[idxs] = rng.integers(-4000, 4000, k).astype(np.int16)
        flat[0] = int(rng.integers(-128, 129))  # position-0 + boundary vals
        sc = native.jxt_scan_native(flat)
        pos = np.flatnonzero(flat)
        vals = flat[pos]
        deltas = np.diff(pos, prepend=0)
        nskip = np.maximum(deltas - 1, 0) // 255
        total = pos.size + int(nskip.sum())
        od = np.full(total, 255, np.uint8)
        ov = np.zeros(total, np.int8)
        slots = np.arange(pos.size) + np.cumsum(nskip)
        od[slots] = (deltas - 255 * nskip).astype(np.uint8)
        em = (vals > 127) | (vals < -127)
        ov[slots] = np.where(em, -128, vals).astype(np.int8)
        t, nz, d2, v2, e2 = sc
        assert t == total and nz == pos.size
        np.testing.assert_array_equal(d2[:t], od)
        np.testing.assert_array_equal(v2[:t], ov)
        np.testing.assert_array_equal(e2, vals[em].astype(np.int16))
