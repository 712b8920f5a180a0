"""Device-side CLIP crop building: box crops cut + resized on the TPU from
already-uploaded frame buffers, so the CLIP filter uploads only box
coordinates instead of pixel crops.

Reference chain being reproduced (per crop):

  YOLO-World mode (segmentation_2d_yolo_world.py:505-515): crop the raw
  uint8 frame, multiply by 255 in uint8 (wraps to (-x) mod 256), then the
  CLIP transform — bicubic short-side resize to 224 + center crop.

  GDINO mode (segmentation_2d.py:345-380): resize the frame to the detector
  input (800, 1072) with cv2 INTER_LINEAR, ImageNet-normalize, crop the box,
  `* 255 -> uint8` (sawtooth wrap), then the same CLIP transform.

The host pipeline (`Segmentor2D._clip_crops` + `CLIP.preprocess`) runs this
chain with cv2 and uploads the finished 224x224 crops. Here the SAME
geometry runs on device as separable weight-matrix contractions (a resize is
a linear operator per axis, so a (224, H) x (H, W) x (W, 224) einsum chain
reproduces it; weights are built on the VPU from the box scalars — no
gathers, MXU-friendly). Deviations vs the host chain, all of the accepted
transport class (PARITY.md):

  * the crop source is the device frame buffer (SAM-scale, YCrCb-roundtripped
    when BFF_SEG2D_YUV is on) instead of the raw host frame — the same
    source deviation the single-upload path documents;
  * cv2 resizes in 11-bit fixed point and rounds half-up, this path in f32
    with round-half-even: outputs match within +-1 LSB (test-pinned);
  * the GDINO normalize LUT is evaluated as arithmetic (trunc + mod 256,
    numpy's float->uint8 cast semantics) instead of a 256-entry table —
    identical on all 256 inputs up to f32 rounding of the same expression
    (test-pinned; a table gather would cost ~19 ns x 150k pixels per crop,
    the known TPU random-gather floor, ARCHITECTURE.md).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_CUBIC_A = -0.75  # cv2 interpolateCubic


def _cubic_coeffs(f):
    """cv2's 4-tap bicubic coefficients at fractional offset ``f``."""
    A = _CUBIC_A
    c0 = ((A * (f + 1) - 5 * A) * (f + 1) + 8 * A) * (f + 1) - 4 * A
    c1 = ((A + 2) * f - (A + 3)) * f * f + 1
    c2 = ((A + 2) * (1 - f) - (A + 3)) * (1 - f) * (1 - f) + 1
    c3 = 1 - c0 - c1 - c2
    return c0, c1, c2, c3


def _linear_coeffs(f):
    return 1 - f, f


def _resize_weights(n_out, out_lo, crop_lo, crop_len, n_mid, full_len,
                    cubic: bool):
    """(n_out, full_len) weight matrix for one axis of
    ``cv2.resize(src[crop_lo:crop_lo+crop_len], n_mid)[out_lo:out_lo+n_out]``.

    ``crop_lo``/``crop_len``/``n_mid``/``out_lo`` are traced scalars; border
    handling is cv2's BORDER_REPLICATE *within the crop* (taps clamp to the
    crop bounds, matching a resize of the sliced array).
    """
    i = jnp.arange(n_out, dtype=jnp.float32)
    pos = (out_lo + i + 0.5) * (crop_len / n_mid) - 0.5  # crop-local
    base = jnp.floor(pos)
    frac = pos - base
    coeffs = _cubic_coeffs(frac) if cubic else _linear_coeffs(frac)
    first = -1 if cubic else 0
    cols = jnp.arange(full_len, dtype=jnp.int32)[None, :]
    hi = jnp.maximum(jnp.asarray(crop_len, jnp.float32).astype(jnp.int32) - 1, 0)
    lo32 = jnp.asarray(crop_lo, jnp.int32)
    w = jnp.zeros((n_out, full_len), jnp.float32)
    for t, c in enumerate(coeffs):
        p = jnp.clip(base.astype(jnp.int32) + (first + t), 0, hi) + lo32
        w = w + c[:, None] * (cols == p[:, None])
    return w


def _clip_transform_weights(y0, y1, x0, x1, full_h, full_w, n=224):
    """Row/col weight matrices for the CLIP transform of crop
    ``src[y0:y1, x0:x1]``: bicubic short-side resize to ``n`` + center crop
    (CLIP.preprocess / the reference clip transform)."""
    ch = (y1 - y0).astype(jnp.float32)
    cw = (x1 - x0).astype(jnp.float32)
    scale = n / jnp.minimum(ch, cw)
    # Python round() = round-half-even on f64; jnp.round matches on f32
    nh = jnp.round(ch * scale)
    nw = jnp.round(cw * scale)
    top = jnp.floor((nh - n) / 2)
    left = jnp.floor((nw - n) / 2)
    wr = _resize_weights(n, top, y0, ch, nh, full_h, cubic=True)
    wc = _resize_weights(n, left, x0, cw, nw, full_w, cubic=True)
    return wr, wc


def _crop_rect(box, sx, sy, w_lim, h_lim):
    """The host's integer crop rect: truncation + clamping
    (Segmentor2D._clip_crops). Returns (x0, y0, x1, y1, valid) as traced
    int32 scalars; invalid crops keep a 1-pixel rect so downstream shapes
    stay finite (the output is zeroed instead, like the host's 2x2 zero
    placeholder whose resize is all-zero)."""
    bx0, by0, bx1, by1 = box[0], box[1], box[2], box[3]
    x0 = jnp.maximum(0, jnp.trunc(bx0 * sx)).astype(jnp.int32)
    y0 = jnp.maximum(0, jnp.trunc(by0 * sy)).astype(jnp.int32)
    x1 = jnp.minimum(w_lim, jnp.trunc(bx1 * sx)).astype(jnp.int32)
    y1 = jnp.minimum(h_lim, jnp.trunc(by1 * sy)).astype(jnp.int32)
    valid = (x1 > x0) & (y1 > y0)
    x1 = jnp.maximum(x1, x0 + 1)
    y1 = jnp.maximum(y1, y0 + 1)
    return x0, y0, x1, y1, valid


def _apply(wr, wc, img):
    """(n, H) x (H, W, 3) x (n, W) -> (n, n, 3)."""
    rows = jnp.einsum("oy,yxc->oxc", wr, img)
    return jnp.einsum("px,oxc->opc", wc, rows)


def _sat_round(v):
    """cv2's saturate_cast<uchar> of the fixed-point accumulator: clamp +
    round (half-up there, half-even here — the +-1 LSB deviation class)."""
    return jnp.clip(jnp.round(v), 0.0, 255.0)


def clip_crop_yolo(frame_u8, box, valid_in, frame_hw: Tuple[int, int],
                   n: int = 224):
    """One device CLIP crop, YOLO-World mode.

    frame_u8: (H, W, 3) uint8 device frame (the crop source); box: (4,) f32
    xyxy in ``frame_hw`` coordinates. Returns (n, n, 3) f32 holding the
    uint8-valued crop the host path would have uploaded.
    """
    h, w = frame_u8.shape[:2]
    sx = w / frame_hw[1]
    sy = h / frame_hw[0]
    x0, y0, x1, y1, valid = _crop_rect(box, sx, sy, w, h)
    valid = valid & valid_in
    # uint8 * 255 wraps to (-x) mod 256 — the reference's cast quirk
    wrapped = ((256 - frame_u8.astype(jnp.int32)) % 256).astype(jnp.float32)
    wr, wc = _clip_transform_weights(y0, y1, x0, x1, h, w, n)
    out = _sat_round(_apply(wr, wc, wrapped))
    return jnp.where(valid, out, 0.0)


def clip_crop_gdino(frame_u8, box, valid_in, frame_hw: Tuple[int, int],
                    det_hw: Tuple[int, int], mean, std, n: int = 224):
    """One device CLIP crop, GDINO mode: device resize to the detector input
    (cv2 INTER_LINEAR geometry), ImageNet-normalize `* 255 -> uint8` wrap
    (numpy cast semantics: trunc toward zero, mod 256), then the CLIP
    transform — the host LUT chain as arithmetic."""
    h, w = frame_u8.shape[:2]
    gh, gw = det_hw
    zero = jnp.zeros((), jnp.int32)
    wr1 = _resize_weights(gh, zero, zero, jnp.float32(h), jnp.float32(gh),
                          h, cubic=False)
    wc1 = _resize_weights(gw, zero, zero, jnp.float32(w), jnp.float32(gw),
                          w, cubic=False)
    v = _sat_round(_apply(wr1, wc1, frame_u8.astype(jnp.float32)))
    t = (v / 255.0 - jnp.asarray(mean)) / jnp.asarray(std) * 255.0
    wrapped = jnp.mod(jnp.trunc(t).astype(jnp.int32), 256).astype(jnp.float32)
    sx = gw / frame_hw[1]
    sy = gh / frame_hw[0]
    x0, y0, x1, y1, valid = _crop_rect(box, sx, sy, gw, gh)
    valid = valid & valid_in
    wr, wc = _clip_transform_weights(y0, y1, x0, x1, gh, gw, n)
    out = _sat_round(_apply(wr, wc, wrapped))
    return jnp.where(valid, out, 0.0)


def clip_crop_batch(frames_u8, boxes, valid, mode: str,
                    frame_hw: Tuple[int, int],
                    det_hw: Optional[Tuple[int, int]] = None,
                    mean=None, std=None, n: int = 224):
    """(K, H, W, 3) uint8 per-crop frames + (K, 4) boxes -> (K, n, n, 3) f32
    uint8-valued crops, vmapped over K. ``mode`` is 'yolo' or 'gdino'."""
    if mode == "yolo":
        fn = partial(clip_crop_yolo, frame_hw=frame_hw, n=n)
    elif mode == "gdino":
        fn = partial(clip_crop_gdino, frame_hw=frame_hw, det_hw=det_hw,
                     mean=mean, std=std, n=n)
    else:  # pragma: no cover - guarded by callers
        raise ValueError(f"unknown crop mode {mode!r}")
    return jax.vmap(fn)(frames_u8, boxes, valid)
