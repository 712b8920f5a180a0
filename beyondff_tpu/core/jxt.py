"""JXT — JPEG coefficient transport: ship the file's quantized DCT
coefficients across the host->TPU link and finish decoding ON DEVICE.

The seg2d frame transport is link-bound on the fast-variant pipeline
(ARCHITECTURE.md: 18.3 f/s composite vs 31.4 f/s device bound), and the
source frames are JPEG files (ScanNet ``color/*.jpg``, reference
tools/segmentation_2d.py:247-254). The YCrCb 4:2:0 transport (core/color.py)
ships 1.5 B/px regardless of content; the file's own representation — its
quantized DCT coefficients — is far sparser for natural images (measured
0.18-0.34 nonzero/px at libjpeg q90-95). JXT ships exactly that:

  host   C++ entropy decode (native/bff_native.cpp, Huffman only — no IDCT)
         -> sparse-pack nonzero coefficients into ONE uint8 wire buffer
  device unpack -> dequantize -> 8x8 inverse DCT (two batched 8x8 matmuls,
         MXU) -> plane assembly -> bilinear chroma upsample -> YCbCr->RGB

Wire format (per frame; Ncap/Ecap are static per compiled bucket):
  [ delta:u8 x Ncap | val:i8 x Ncap | esc_lo:u8 x Ecap | esc_hi:u8 x Ecap ]
  - positions are flat indices into the concatenated per-component dense
    coefficient tensors ([Y-blocks | Cb-blocks | Cr-blocks] x 64, natural
    order within blocks); ``delta`` are consecutive position differences.
    Gaps > 255 are bridged by zero-valued skip entries so delta fits u8.
  - values are int8 with -128 as an escape: the true int16 value is read
    from the esc side channel in order of appearance.
  - padding entries are (delta=0, val=0): they re-add 0 at the last
    position, which the scatter-add ignores semantically.
  ~2 B per nonzero -> 0.4-0.7 B/px for natural frames vs 1.5 B/px YCrCb.
  A spill guard returns None when the packed frame would not beat YCrCb
  (e.g. noise frames, very high quality): callers fall back to core/color.

One native-resolution JXT upload serves EVERY consumer: the detector-scale
and SAM-scale buffers are derived on device (``resize_frame``, the same
+-1 LSB cv2-INTER_LINEAR parity class as core/crop_resize.py), so hit
frames stop paying a second, larger upload entirely.

Accuracy: the reconstruction is exact to the FILE up to IDCT/upsample
arithmetic — measured max +-5, mean ~0.4 vs cv2.imdecode of the same bytes
(libjpeg integer IDCT vs float IDCT; tests/test_jxt.py) — the same
transport deviation class PARITY.md documents for YCrCb 4:2:0.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional, Tuple

import numpy as np

# geometric wire-size buckets bound jit recompiles; ratio 1.25 wastes <=12%
# of the link bytes on average (pad bytes are zeros but still cross)
_BUCKET_BASE = 2048
_BUCKET_RATIO = 1.25


def _bucket(n: int, base: int = _BUCKET_BASE) -> int:
    if n <= base:
        return base
    k = math.ceil(math.log(n / base) / math.log(_BUCKET_RATIO))
    return int(math.ceil(base * _BUCKET_RATIO ** k))


def _bucket_small(n: int) -> int:
    return _bucket(n, base=256)


@dataclass(frozen=True)
class JxtGeometry:
    """Static (hashable) frame geometry — the jit cache key."""

    h: int
    w: int
    # per component: (block-grid h, block-grid w, samp_h, samp_v)
    comps: Tuple[Tuple[int, int, int, int], ...]

    @property
    def total_coeffs(self) -> int:
        return sum(bh * bw * 64 for bh, bw, _, _ in self.comps)


@dataclass
class JxtPacked:
    """One packed frame: the wire buffer + everything the device needs."""

    geometry: JxtGeometry
    wire: np.ndarray          # uint8 (2*ncap + 2*ecap,)
    ncap: int
    ecap: int
    qsteps: np.ndarray        # float32 (ncomp, 64) natural order

    @property
    def nbytes(self) -> int:
        return self.wire.nbytes + self.qsteps.nbytes


def parse_file(blob: bytes):
    """Entropy-decode a JPEG via the native runtime. None -> caller falls
    back to a full host decode + YCrCb transport."""
    from beyondff_tpu.utils import native

    return native.jpeg_coeffs_native(blob)


def pack(dec: dict, max_bytes: Optional[int] = None) -> Optional[JxtPacked]:
    """Sparse-pack an entropy-decoded frame (``parse_file`` output) into the
    wire format. Returns None when the packed size would exceed
    ``max_bytes`` (default: the 1.5 B/px YCrCb transport) — the spill guard
    that keeps noise-like content on the dense path."""
    h, w = dec["hw"]
    if max_bytes is None:
        max_bytes = int(1.5 * h * w)
    comps = dec["comps"]
    geometry = JxtGeometry(
        h=h, w=w,
        comps=tuple((c["grid"][0], c["grid"][1], c["samp"][0], c["samp"][1])
                    for c in comps),
    )
    flat = np.concatenate([c["coeffs"].reshape(-1) for c in comps])
    from beyondff_tpu.utils import native as _native

    scan = _native.jxt_scan_native(flat)
    if scan is not None:
        # one cache-friendly C++ pass builds the delta/val/esc streams
        # directly (the numpy chain below measured ~13 ms/frame at 1296x968
        # on the 1-core host — the transport's miss-regime bottleneck)
        total, n_nonzero, out_delta, out_val, esc = scan
        if 2 * n_nonzero >= max_bytes:  # same early-spill stat as below
            return None
        out_delta = out_delta[:total]
        out_val = out_val[:total]
    else:
        pos = np.flatnonzero(flat)
        vals = flat[pos]
        # cheap early spill: >=2 B per nonzero
        if 2 * pos.size >= max_bytes:
            return None

        # delta encode; bridge gaps > 255 with zero-valued skip entries
        deltas = np.diff(pos, prepend=0)
        nskip = np.maximum(deltas - 1, 0) // 255  # entries of delta 255 each
        total = pos.size + int(nskip.sum())
        out_delta = np.full(total, 255, np.uint8)
        out_val = np.zeros(total, np.int8)
        slots = np.arange(pos.size) + np.cumsum(nskip)  # final slot of each nz
        out_delta[slots] = (deltas - 255 * nskip).astype(np.uint8)
        esc_mask = (vals > 127) | (vals < -127)
        out_val[slots] = np.where(esc_mask, -128, vals).astype(np.int8)
        esc = vals[esc_mask].astype(np.int16)

    ncap, ecap = _bucket(total), _bucket_small(int(esc.size))
    if 2 * ncap + 2 * ecap >= max_bytes:
        return None
    wire = np.zeros(2 * ncap + 2 * ecap, np.uint8)
    wire[:total] = out_delta
    wire[ncap:ncap + total] = out_val.view(np.uint8)
    eu = esc.view(np.uint8).reshape(-1, 2)  # little-endian pairs
    wire[2 * ncap:2 * ncap + esc.size] = eu[:, 0]
    wire[2 * ncap + ecap:2 * ncap + ecap + esc.size] = eu[:, 1]

    qsteps = np.stack([c["qtab"].astype(np.float32) for c in comps])
    return JxtPacked(geometry=geometry, wire=wire, ncap=ncap, ecap=ecap,
                     qsteps=qsteps)


def pack_file(blob: bytes, max_bytes: Optional[int] = None) -> Optional[JxtPacked]:
    dec = parse_file(blob)
    if dec is None:
        return None
    return pack(dec, max_bytes=max_bytes)


# --------------------------------------------------------------- device side
def _idct_mat() -> np.ndarray:
    k = np.arange(8)
    u = np.arange(8)[:, None]
    c = np.cos((2 * k + 1) * u * np.pi / 16) * 0.5
    c[0] *= 1.0 / np.sqrt(2.0)
    return c.astype(np.float32)  # orthonormal: X = C^T F C


def _decode_core(wire, qsteps, geometry: JxtGeometry, ncap: int, ecap: int):
    import jax
    import jax.numpy as jnp

    delta = wire[:ncap].astype(jnp.int32)
    val = wire[ncap:2 * ncap].astype(jnp.int8)
    esc_lo = wire[2 * ncap:2 * ncap + ecap].astype(jnp.int32)
    esc_hi = wire[2 * ncap + ecap:].astype(jnp.int32)
    esc = esc_lo + 256 * esc_hi
    esc = jnp.where(esc >= 32768, esc - 65536, esc)

    pos = jnp.cumsum(delta)
    is_esc = val == -128
    eidx = jnp.clip(jnp.cumsum(is_esc.astype(jnp.int32)) - 1, 0, ecap - 1)
    v = jnp.where(is_esc, esc[eidx], val.astype(jnp.int32)).astype(jnp.float32)

    # dequantize: qstep indexed by (component of block, index within block)
    nblocks = [bh * bw for bh, bw, _, _ in geometry.comps]
    block_id = pos // 64
    comp_id = jnp.zeros_like(block_id)
    acc = 0
    for i, nb in enumerate(nblocks[:-1]):
        acc += nb
        comp_id = comp_id + (block_id >= acc)
    v = v * qsteps[comp_id, pos % 64]

    dense = jnp.zeros(geometry.total_coeffs, jnp.float32).at[pos].add(v)

    c = jnp.asarray(_idct_mat())
    planes = []
    off = 0
    for bh, bw, _, _ in geometry.comps:
        nb = bh * bw
        f = dense[off * 64:(off + nb) * 64].reshape(nb, 8, 8)
        off += nb
        sp = jnp.einsum("ux,buv,vy->bxy", c, f, c,
                        preferred_element_type=jnp.float32)
        planes.append(
            sp.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8) + 128.0)

    h, w = geometry.h, geometry.w
    if len(planes) == 1:
        y = jnp.clip(jnp.round(planes[0][:h, :w]), 0.0, 255.0).astype(jnp.uint8)
        return jnp.stack([y, y, y], axis=-1)
    hmax = max(sh for _, _, sh, _ in geometry.comps)
    vmax = max(sv for _, _, _, sv in geometry.comps)
    outs = []
    for (bh, bw, sh, sv), p in zip(geometry.comps, planes):
        ch = -(-h * sv // vmax)
        cw = -(-w * sh // hmax)
        fy, fx = vmax // sv, hmax // sh
        p = p[:ch, :cw]
        if (fy, fx) != (1, 1):
            # upsample at the EXACT integer sampling factor then crop —
            # libjpeg's "fancy" upsample works on the full subsampled grid
            # (a direct resize to (h, w) at odd dims would use a non-integer
            # scale and drift out of phase across the image); half-pixel-
            # center bilinear at 2x == the fancy triangular filter
            p = jax.image.resize(p, (ch * fy, cw * fx),
                                 method="bilinear")[:h, :w]
        outs.append(p)
    y, cb, cr = outs[0], outs[1] - 128.0, outs[2] - 128.0
    # libjpeg (ITU-R BT.601 full-range) constants — the file's own colorspace
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0.0, 255.0).astype(jnp.uint8)


@lru_cache(maxsize=64)
def _decode_jit(geometry: JxtGeometry, ncap: int, ecap: int):
    import jax

    return jax.jit(lambda wire, q: _decode_core(wire, q, geometry, ncap, ecap))


@lru_cache(maxsize=64)
def _decode_batch_jit(geometry: JxtGeometry, ncap: int, ecap: int):
    import jax

    return jax.jit(jax.vmap(
        lambda wire, q: _decode_core(wire, q, geometry, ncap, ecap),
        in_axes=(0, None)))


@lru_cache(maxsize=64)
def _decode_batch_q_jit(geometry: JxtGeometry, ncap: int, ecap: int):
    """Batched decode with PER-FRAME quantization tables (same geometry,
    different JPEG qualities in one chunk)."""
    import jax

    return jax.jit(jax.vmap(
        lambda wire, q: _decode_core(wire, q, geometry, ncap, ecap),
        in_axes=(0, 0)))


def upload_frame(packed: JxtPacked):
    """Packed frame -> uint8 RGB (H, W, 3) DEVICE buffer; only the sparse
    wire bytes cross the link."""
    import jax.numpy as jnp

    fn = _decode_jit(packed.geometry, packed.ncap, packed.ecap)
    return fn(jnp.asarray(packed.wire), jnp.asarray(packed.qsteps))


def rebucket(packed: JxtPacked, ncap: int, ecap: int) -> JxtPacked:
    """Grow a packed frame's caps (for batching frames into one bucket)."""
    if (ncap, ecap) == (packed.ncap, packed.ecap):
        return packed
    wire = np.zeros(2 * ncap + 2 * ecap, np.uint8)
    o, n, e = packed.wire, packed.ncap, packed.ecap
    wire[:n] = o[:n]
    wire[ncap:ncap + n] = o[n:2 * n]
    wire[2 * ncap:2 * ncap + e] = o[2 * n:2 * n + e]
    wire[2 * ncap + ecap:2 * ncap + ecap + e] = o[2 * n + e:]
    return JxtPacked(geometry=packed.geometry, wire=wire, ncap=ncap,
                     ecap=ecap, qsteps=packed.qsteps)


def upload_frames(packs: List[JxtPacked]):
    """Packed frames -> ONE (B, H, W, 3) device batch in a single
    host->device transfer (frames rebucket to the largest caps).

    Frames need not share JPEG quality or geometry: mixed quantization
    tables ride a per-frame-qsteps vmap, and a chunk mixing block
    geometries (e.g. a grayscale or 4:4:4 frame among 4:2:0 ones) decodes
    per frame and stacks — decoding frame i with frame 0's qtab/geometry
    would silently reconstruct wrong pixels. All frames must share (h, w)
    (callers reject other pixel dims before packing)."""
    import jax.numpy as jnp

    geo = packs[0].geometry
    if any(p.geometry != geo for p in packs):
        if any((p.geometry.h, p.geometry.w) != (geo.h, geo.w) for p in packs):
            raise ValueError("upload_frames: mixed frame pixel dims")
        return jnp.stack([upload_frame(p) for p in packs])
    ncap = max(p.ncap for p in packs)
    ecap = max(p.ecap for p in packs)
    packs = [rebucket(p, ncap, ecap) for p in packs]
    wire = np.stack([p.wire for p in packs])
    if all(np.array_equal(p.qsteps, packs[0].qsteps) for p in packs[1:]):
        fn = _decode_batch_jit(geo, ncap, ecap)
        return fn(jnp.asarray(wire), jnp.asarray(packs[0].qsteps))
    fn = _decode_batch_q_jit(geo, ncap, ecap)
    return fn(jnp.asarray(wire),
              jnp.asarray(np.stack([p.qsteps for p in packs])))


# ------------------------------------------------------------- device resize
def _resize_fn(dst_hw: Tuple[int, int]):
    import jax
    import jax.numpy as jnp

    th, tw = dst_hw

    def fn(img_u8):
        x = jax.image.resize(img_u8.astype(jnp.float32), (th, tw, 3),
                             method="bilinear", antialias=False)
        return jnp.clip(jnp.round(x), 0.0, 255.0).astype(jnp.uint8)

    return fn


@lru_cache(maxsize=32)
def _resize_jit(src_hw: Tuple[int, int], dst_hw: Tuple[int, int]):
    import jax

    return jax.jit(_resize_fn(dst_hw))


def resize_frame(dev_rgb, dst_hw: Tuple[int, int]):
    """Device-side frame resize (cv2 INTER_LINEAR geometry — half-pixel
    centers, no antialias; f32 vs cv2's 11-bit fixed point, the +-1 LSB
    parity class of core/crop_resize.py). Derives detector-/SAM-scale
    buffers from one native-resolution JXT upload."""
    return _resize_jit(tuple(dev_rgb.shape[:2]), tuple(dst_hw))(dev_rgb)


@lru_cache(maxsize=32)
def _resize_batch_jit(src_hw: Tuple[int, int], dst_hw: Tuple[int, int]):
    import jax

    return jax.jit(jax.vmap(_resize_fn(dst_hw)))


def resize_frames(dev_rgb_batch, dst_hw: Tuple[int, int]):
    """Batched :func:`resize_frame` — (B, H, W, 3) uint8 device batch ->
    (B, th, tw, 3) in one dispatch (the batched-upload loader's derivation
    of the detector-scale chunk from a JXT native-resolution batch)."""
    return _resize_batch_jit(tuple(dev_rgb_batch.shape[1:3]),
                             tuple(dst_hw))(dev_rgb_batch)


def _np_bilinear(p: np.ndarray, he: int, we: int) -> np.ndarray:
    """numpy mirror of jax.image.resize(..., 'bilinear') upsampling
    (half-pixel-center mapping at the TRUE scale, edge clamp)."""
    hh, ww = p.shape
    ys = (np.arange(he) + 0.5) * (hh / he) - 0.5
    xs = (np.arange(we) + 0.5) * (ww / we) - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, hh - 1)
    y1 = np.clip(y0 + 1, 0, hh - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, ww - 1)
    x1 = np.clip(x0 + 1, 0, ww - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    top = p[y0][:, x0] * (1 - fx) + p[y0][:, x1] * fx
    bot = p[y1][:, x0] * (1 - fx) + p[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy


# ------------------------------------------------------------------- oracle
def roundtrip_host(blob: bytes) -> Optional[np.ndarray]:
    """numpy mirror of pack + device decode, for tests and A/B: returns the
    uint8 RGB frame the device would reconstruct, or None on fallback."""
    dec = parse_file(blob)
    if dec is None:
        return None
    h, w = dec["hw"]
    c = _idct_mat().astype(np.float64)
    planes = []
    for comp in dec["comps"]:
        bh, bw = comp["grid"]
        f = comp["coeffs"].astype(np.float64) * comp["qtab"].astype(np.float64)
        sp = np.einsum("ux,buv,vy->bxy", c, f.reshape(-1, 8, 8), c)
        planes.append(sp.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                      .reshape(bh * 8, bw * 8) + 128.0)
    if len(planes) == 1:
        y = np.clip(np.round(planes[0][:h, :w]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    hmax = max(comp["samp"][0] for comp in dec["comps"])
    vmax = max(comp["samp"][1] for comp in dec["comps"])
    outs = []
    for comp, p in zip(dec["comps"], planes):
        ch = -(-h * comp["samp"][1] // vmax)
        cw = -(-w * comp["samp"][0] // hmax)
        fy, fx = vmax // comp["samp"][1], hmax // comp["samp"][0]
        p = p[:ch, :cw]
        if (fy, fx) != (1, 1):
            p = _np_bilinear(p, ch * fy, cw * fx)[:h, :w]
        outs.append(p)
    y, cb, cr = outs[0], outs[1] - 128.0, outs[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
