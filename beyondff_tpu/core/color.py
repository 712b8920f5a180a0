"""YCrCb 4:2:0 frame transport: halve host->device frame traffic.

Every seg2d frame's pixels must cross the host->TPU link, and the link — not
the chip — bounds the pipeline's miss regime (ARCHITECTURE.md round-4 trace:
96-frame miss pass ~= upload bytes / measured tunnel bandwidth). The source
frames are JPEGs, which already store chroma at 4:2:0 (reference data layout:
ScanNet `color/*.jpg`, tools/segmentation_2d.py:247-254) — so shipping frames
as full-range YCrCb with 2x2-subsampled chroma carries ~all the information
the file had at HALF the bytes of dense RGB (1.5 vs 3 bytes/pixel).

Host side packs with cv2's JPEG-convention YCrCb (COLOR_RGB2YCrCb:
Y = 0.299 R + 0.587 G + 0.114 B, Cr = 0.713 (R - Y) + 128,
Cb = 0.564 (B - Y) + 128) + INTER_AREA 2x2 chroma averaging; the device op
inverts exactly (R = Y + 1.403 (Cr - 128), ...) with bilinear chroma
upsampling, yielding the uint8 RGB buffer the detectors / SAM already consume.
Round-trip error vs the original RGB is bounded by chroma re-sampling +
rounding (measured in tests/test_color.py; luma is exact within +-1).
`BFF_SEG2D_YUV=0` restores dense RGB uploads (pipeline/segmentation_2d.py).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np


def pack_ycrcb420(img: np.ndarray) -> np.ndarray:
    """uint8 RGB (H, W, 3) -> one flat uint8 buffer [Y | Cr/2x2 | Cb/2x2].

    Odd dimensions pad by edge replication to even before chroma subsampling
    (the pad rows/cols are sliced away on device). Output length =
    He*We + 2*(He/2)*(We/2) = 1.5*He*We bytes.
    """
    import cv2

    h, w = img.shape[:2]
    he, we = h + (h & 1), w + (w & 1)
    if (he, we) != (h, w):
        img = np.pad(img, ((0, he - h), (0, we - w), (0, 0)), mode="edge")
    ycrcb = cv2.cvtColor(img, cv2.COLOR_RGB2YCrCb)
    y = ycrcb[:, :, 0]
    # INTER_AREA at exactly 2x downscale is the 2x2 box average
    cr = cv2.resize(ycrcb[:, :, 1], (we // 2, he // 2), interpolation=cv2.INTER_AREA)
    cb = cv2.resize(ycrcb[:, :, 2], (we // 2, he // 2), interpolation=cv2.INTER_AREA)
    return np.concatenate([y.reshape(-1), cr.reshape(-1), cb.reshape(-1)])


def _unpack_core(buf, h: int, w: int):
    import jax
    import jax.numpy as jnp

    he, we = h + (h & 1), w + (w & 1)
    y = buf[: he * we].reshape(he, we).astype(jnp.float32)
    n = (he // 2) * (we // 2)
    cr = buf[he * we : he * we + n].reshape(he // 2, we // 2).astype(jnp.float32)
    cb = buf[he * we + n :].reshape(he // 2, we // 2).astype(jnp.float32)
    # bilinear chroma upsample (pairs with the 2x2 box-average downsample)
    cr = jax.image.resize(cr, (he, we), method="bilinear")
    cb = jax.image.resize(cb, (he, we), method="bilinear")
    cr -= 128.0
    cb -= 128.0
    # exact inverse of cv2 COLOR_RGB2YCrCb (JPEG full-range constants)
    r = y + 1.403 * cr
    g = y - 0.714 * cr - 0.344 * cb
    b = y + 1.773 * cb
    rgb = jnp.stack([r, g, b], axis=-1)
    rgb = jnp.clip(jnp.round(rgb), 0.0, 255.0).astype(jnp.uint8)
    return rgb[:h, :w]


@lru_cache(maxsize=8)
def _unpack_jit(h: int, w: int):
    import jax

    return jax.jit(lambda buf: _unpack_core(buf, h, w))


@lru_cache(maxsize=8)
def _unpack_batch_jit(h: int, w: int):
    import jax

    return jax.jit(jax.vmap(lambda buf: _unpack_core(buf, h, w)))


def upload_frame(img: np.ndarray, yuv: bool = True):
    """uint8 RGB host frame -> uint8 RGB DEVICE buffer, shipping 1.5 B/px
    as YCrCb 4:2:0 instead of 3 B/px dense RGB (``yuv=False`` restores the
    dense upload). Dispatch is async either way; safe from prefetch threads."""
    import jax.numpy as jnp

    if not yuv:
        return jnp.asarray(img)
    h, w = img.shape[:2]
    return _unpack_jit(h, w)(jnp.asarray(pack_ycrcb420(img)))


def upload_frames(imgs, yuv: bool = True):
    """Same-size uint8 RGB host frames -> ONE uint8 RGB (B, H, W, 3) device
    batch in a SINGLE host->device transfer. The tunneled link pays a fixed
    ~27 ms per RPC and does not pipeline back-to-back transfers
    (tools/probe_link.py), so per-frame uploads cost B round-trips where one
    batched upload costs one."""
    import jax.numpy as jnp

    if not yuv:
        return jnp.asarray(np.stack(list(imgs)))
    h, w = imgs[0].shape[:2]
    packed = np.stack([pack_ycrcb420(im) for im in imgs])
    return _unpack_batch_jit(h, w)(jnp.asarray(packed))


def roundtrip_host(img: np.ndarray) -> np.ndarray:
    """Host-side oracle of upload_frame(img, yuv=True) for tests/A-B: same
    pack + a numpy mirror of the device unpack."""
    h, w = img.shape[:2]
    he, we = h + (h & 1), w + (w & 1)
    buf = pack_ycrcb420(img)
    y = buf[: he * we].reshape(he, we).astype(np.float32)
    n = (he // 2) * (we // 2)
    cr = buf[he * we : he * we + n].reshape(he // 2, we // 2).astype(np.float32)
    cb = buf[he * we + n :].reshape(he // 2, we // 2).astype(np.float32)
    cr = _bilinear_x2(cr, he, we) - 128.0
    cb = _bilinear_x2(cb, he, we) - 128.0
    r = y + 1.403 * cr
    g = y - 0.714 * cr - 0.344 * cb
    b = y + 1.773 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)[:h, :w]


def _bilinear_x2(p: np.ndarray, he: int, we: int) -> np.ndarray:
    """numpy mirror of jax.image.resize(..., method='bilinear') at exact 2x
    (half-pixel-center alignment)."""
    hh, ww = p.shape
    ys = (np.arange(he) + 0.5) / 2.0 - 0.5
    xs = (np.arange(we) + 0.5) / 2.0 - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, hh - 1)
    y1 = np.clip(y0 + 1, 0, hh - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, ww - 1)
    x1 = np.clip(x0 + 1, 0, ww - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    top = p[y0][:, x0] * (1 - fx) + p[y0][:, x1] * fx
    bot = p[y1][:, x0] * (1 - fx) + p[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy
