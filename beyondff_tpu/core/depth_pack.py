"""Depth-pack — lossless block transport for uint16 depth maps.

The projection stage's dominant host cost is shipping depth across the
host->TPU link: ~184 MB/scene of raw uint16 at 300+ frames x 640x480
(reference reads the same PNGs per (class, scene), tools/projection_2d_to_3d
.py:432-436; here they upload once per scene and resize/scale on device).
The link runs ~20-85 MB/s (co-tenant weather), so raw depth costs seconds
per scene and caps the multi-chip sweep at the single-host feed rate
(SCALING_r04). Indoor depth maps are piecewise smooth, so their neighbor
deltas are small — this module ships them packed and reconstructs EXACTLY
(bit-lossless, unlike the accuracy-affecting ``frames.depth_decimation``
lever) on device:

  host   C++ single pass (native/bff_native.cpp bff_depth_pack): 64-pixel
         blocks, per block the first pixel as a uint16 base, a signed int8
         slope predictor (the block's median neighbor delta), and
         zigzag-coded residuals (neighbor delta minus predictor) at a
         width class k in {0,2,4,8,16} bits — neighbor deltas track the
         surface gradient and the predictor removes its constant part, so
         smooth surfaces at any slope land in the 2-4 bit classes;
         residuals that do not fit (depth edges, invalid-zero speckle)
         store 0 and escape the true residual to a (position, int32
         correction) side channel.
  device unpack: class-conditional gathers from the stream -> unzigzag ->
         scatter-add escape corrections -> per-block prefix sum + base ->
         uint16 (H, W), fed to the unchanged ``geometry.prepare_depth``.

Wire layout per frame (caps bucketed so jit programs are reused):
  [ classes:u8 x nb | preds:i8 x nb | bases:u16LE x nb | stream:u8 x scap
    | esc_pos:i32LE x ecap | esc_corr:i32LE x ecap ]
Measured wire sizes: ~0.5-1.1 B/px on rendered/smooth depth vs 2 B/px raw;
a spill guard returns None when packing would not beat raw (noise-like
content) and callers fall back to the raw uint16 upload.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional, Tuple

import numpy as np

BLOCK = 64
_KS = (0, 2, 4, 8, 16)
_KBYTES = (0, 16, 32, 64, 128)  # payload bytes per 64-px block per class
_LIMS = (1, 4, 16, 256, 65536)  # first zigzag value that escapes, per class


def _bucket(n: int, base: int) -> int:
    if n <= base:
        return base
    k = math.ceil(math.log(n / base) / math.log(1.25))
    return int(math.ceil(base * 1.25 ** k))


@dataclass
class DepthPacked:
    """One packed frame: the wire buffer + static decode geometry."""

    hw: Tuple[int, int]
    wire: np.ndarray  # uint8 (4*nb + scap + 8*ecap,)
    scap: int
    ecap: int

    @property
    def n_blocks(self) -> int:
        h, w = self.hw
        return -(-h * w // BLOCK)

    @property
    def nbytes(self) -> int:
        return self.wire.nbytes


def _pack_arrays_numpy(flat: np.ndarray):
    """Vectorized numpy mirror of the C++ packer (fallback + test oracle).
    ``flat`` is uint16, length a multiple of BLOCK. Returns (classes u8
    (nb,), preds i8 (nb,), bases u16 (nb,), stream u8, esc_pos i32,
    esc_corr i32).
    """
    nb = flat.size // BLOCK
    px = flat.reshape(nb, BLOCK).astype(np.int64)
    d = np.diff(px, axis=1, prepend=px[:, :1])  # d[:, 0] == 0
    pred = np.clip(np.median(d[:, 1:], axis=1), -127, 127).astype(np.int64)
    r = d - pred[:, None]
    z = np.where(r >= 0, 2 * r, -2 * r - 1)
    z[:, 0] = 0  # pixel 0 stays out of the predicted chain
    costs = np.stack([_KBYTES[c] + 8 * (z >= _LIMS[c]).sum(1)
                      for c in range(len(_KS))])
    best_c = np.argmin(costs, axis=0).astype(np.uint8)  # ties -> smaller k (as C++)
    lim = np.array(_LIMS, np.int64)[best_c]
    escm = z >= lim[:, None]
    zz = np.where(escm, 0, z)
    esc_pos = np.flatnonzero(escm).astype(np.int32)
    esc_corr = r.reshape(-1)[esc_pos].astype(np.int32)
    parts = []
    for b in range(nb):
        k = _KS[best_c[b]]
        if k == 0:
            continue
        zb = zz[b]
        if k == 2:
            parts.append((zb[0::4] | (zb[1::4] << 2) | (zb[2::4] << 4)
                          | (zb[3::4] << 6)).astype(np.uint8))
        elif k == 4:
            parts.append((zb[0::2] | (zb[1::2] << 4)).astype(np.uint8))
        elif k == 8:
            parts.append(zb.astype(np.uint8))
        else:
            parts.append(zb.astype("<u2").view(np.uint8))
    stream = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
    return (best_c, pred.astype(np.int8), px[:, 0].astype(np.uint16), stream,
            esc_pos, esc_corr)


def _pack_arrays(flat: np.ndarray):
    """C++ packer when available, numpy otherwise."""
    from beyondff_tpu.utils import native

    out = native.depth_pack_native(flat)
    if out is not None:
        return out
    return _pack_arrays_numpy(flat)


def estimate_wire_ratio(flat: np.ndarray, stride: int = 16) -> float:
    """Estimated wire/raw ratio from every ``stride``-th block's class costs
    (no stream build) — a ~0.3 ms pre-check that lets noise frames skip the
    ~5-7 ms full pack attempt on the 1-core host."""
    nb = flat.size // BLOCK
    px = flat.reshape(nb, BLOCK)[::stride].astype(np.int64)
    d = np.diff(px, axis=1, prepend=px[:, :1])
    pred = np.clip(np.median(d[:, 1:], axis=1), -127, 127).astype(np.int64)
    r = d - pred[:, None]
    z = np.where(r >= 0, 2 * r, -2 * r - 1)
    z[:, 0] = 0
    costs = np.stack([_KBYTES[c] + 8 * (z >= _LIMS[c]).sum(1)
                      for c in range(len(_KS))])
    per_block = costs.min(axis=0).mean() + 4  # + header bytes/block
    return float(per_block * nb / (2 * flat.size))


def pack(depth: np.ndarray, max_bytes: Optional[int] = None) -> Optional[DepthPacked]:
    """Pack one uint16 depth map; None when the wire would not beat the raw
    2 B/px upload (spill guard — noise-like content)."""
    h, w = depth.shape
    n_px = h * w
    if max_bytes is None:
        max_bytes = 2 * n_px  # the raw uint16 transport
    flat = np.ascontiguousarray(depth.reshape(-1), np.uint16)
    pad = (-flat.size) % BLOCK
    if pad:
        flat = np.concatenate([flat, np.full(pad, flat[-1], np.uint16)])
    if estimate_wire_ratio(flat) * 2 * flat.size >= 0.98 * max_bytes:
        return None  # clearly incompressible; skip the full scan
    classes, preds, bases, stream, esc_pos, esc_corr = _pack_arrays(flat)
    nb = classes.size
    if 4 * nb + stream.size + 8 * esc_pos.size >= max_bytes:
        return None
    # scap stays a multiple of 4: every class payload is a 4-byte multiple,
    # so block offsets are word-aligned and the device decode can read the
    # stream as uint32 words (one 32-word gather per block instead of
    # hundreds of byte gathers)
    scap = -(-_bucket(max(int(stream.size), 1), 4096) // 4) * 4
    ecap = _bucket(max(int(esc_pos.size), 1), 256)
    if 4 * nb + scap + 8 * ecap >= max_bytes:
        return None
    wire = np.zeros(4 * nb + scap + 8 * ecap, np.uint8)
    wire[:nb] = classes
    wire[nb:2 * nb] = preds.view(np.uint8)
    wire[2 * nb:4 * nb] = bases.astype("<u2").view(np.uint8)
    wire[4 * nb:4 * nb + stream.size] = stream
    o = 4 * nb + scap
    # padding escape positions point one past the padded pixel range; the
    # device scatter drops them (mode="drop")
    pos = np.full(ecap, nb * BLOCK, np.int32)
    pos[:esc_pos.size] = esc_pos
    wire[o:o + 4 * ecap] = pos.astype("<i4").view(np.uint8)
    corr = np.zeros(ecap, np.int32)
    corr[:esc_corr.size] = esc_corr
    wire[o + 4 * ecap:] = corr.astype("<i4").view(np.uint8)
    return DepthPacked(hw=(h, w), wire=wire, scap=scap, ecap=ecap)


# content-addressed pack cache: the reference sweep protocol re-reads the
# SAME depth frames once per (class, scene) (run_evl.py loops classes
# outer), so ref-mode projection would re-pay the ~5 ms/frame pack per
# class; keying on the frame bytes makes repeats ~0.8 ms (hash + lookup)
# while keeping the per-class re-UPLOAD that the protocol implies. Spills
# cache as None (skips the repeated pre-check too).
_PACK_CACHE: "OrderedDict[bytes, Optional[DepthPacked]]" = None  # type: ignore
_PACK_CACHE_CAP = 512  # ~50 MB of wires at typical sensor frames


def pack_cached(depth: np.ndarray,
                max_bytes: Optional[int] = None) -> Optional[DepthPacked]:
    """:func:`pack` behind a content-addressed LRU (blake2b of the bytes)."""
    global _PACK_CACHE
    import hashlib
    from collections import OrderedDict

    if _PACK_CACHE is None:
        _PACK_CACHE = OrderedDict()
    key = (hashlib.blake2b(depth.tobytes(), digest_size=16).digest()
           + str(depth.shape).encode() + str(max_bytes).encode())
    if key in _PACK_CACHE:
        _PACK_CACHE.move_to_end(key)
        return _PACK_CACHE[key]
    out = pack(depth, max_bytes=max_bytes)
    _PACK_CACHE[key] = out
    if len(_PACK_CACHE) > _PACK_CACHE_CAP:
        _PACK_CACHE.popitem(last=False)
    return out


# --------------------------------------------------------------- device side
def _decode_core(wire, hw: Tuple[int, int], scap: int, ecap: int):
    import jax.numpy as jnp

    h, w = hw
    n_px = h * w
    nb = -(-n_px // BLOCK)
    cls = wire[:nb].astype(jnp.int32)
    pu = wire[nb:2 * nb].astype(jnp.int32)
    preds = jnp.where(pu > 127, pu - 256, pu)
    bases = (wire[2 * nb:4 * nb:2].astype(jnp.int32)
             + 256 * wire[2 * nb + 1:4 * nb:2].astype(jnp.int32))
    stream = wire[4 * nb:4 * nb + scap].astype(jnp.int32)
    o = 4 * nb + scap
    ep = wire[o:o + 4 * ecap].reshape(ecap, 4).astype(jnp.int32)
    esc_pos = ep[:, 0] + (ep[:, 1] << 8) + (ep[:, 2] << 16) + (ep[:, 3] << 24)
    ec = wire[o + 4 * ecap:].reshape(ecap, 4).astype(jnp.int32)
    # int32 two's complement reassembles exactly (<< wraps)
    esc_corr = ec[:, 0] + (ec[:, 1] << 8) + (ec[:, 2] << 16) + (ec[:, 3] << 24)

    nbytes = jnp.asarray(_KBYTES, jnp.int32)[cls]
    offs = jnp.cumsum(nbytes) - nbytes  # exclusive prefix per block
    j = jnp.arange(BLOCK, dtype=jnp.int32)
    # ONE word-granular gather per block: every class payload is a 4-byte
    # multiple, so block offsets are word-aligned; fetching the maximal
    # 32-word (128 B, the k=16 payload) window per block and slicing the
    # hypotheses out elementwise replaced five per-byte gathers that
    # measured 13.8 ms/frame device time (8x fewer gathered elements, and
    # the lane dim is contiguous)
    words = (stream[0::4] + (stream[1::4] << 8)
             + (stream[2::4] << 16) + (stream[3::4] << 24))
    wv = words[jnp.clip(offs[:, None] // 4 + jnp.arange(32, dtype=jnp.int32),
                        0, scap // 4 - 1)]  # (nb, 32)

    def byte(i):  # static per-block byte index array -> (nb, len(i)) values
        return (wv[:, i // 4] >> (8 * (i % 4))) & 255

    z2 = (byte(j // 4) >> (2 * (j % 4))) & 3
    b4 = byte(j // 2)
    z4 = jnp.where(j % 2 == 0, b4 & 15, b4 >> 4)
    z8 = byte(j)
    z16 = byte(2 * j) + 256 * byte(2 * j + 1)
    c = cls[:, None]
    z = jnp.where(c == 0, 0,
                  jnp.where(c == 1, z2,
                            jnp.where(c == 2, z4, jnp.where(c == 3, z8, z16))))
    resid = jnp.where(z % 2 == 0, z // 2, -((z + 1) // 2))
    delta = jnp.where(j == 0, 0, resid + preds[:, None])
    # escape corrections land in the delta field BEFORE the prefix sum, so
    # the neighbor chain after an escape stays exact
    flat_d = delta.reshape(-1).at[esc_pos].add(esc_corr, mode="drop")
    vals = bases[:, None] + jnp.cumsum(flat_d.reshape(nb, BLOCK), axis=1)
    return vals.reshape(-1)[:n_px].astype(jnp.uint16).reshape(h, w)


@lru_cache(maxsize=64)
def _decode_jit(hw: Tuple[int, int], scap: int, ecap: int):
    import jax

    return jax.jit(lambda wire: _decode_core(wire, hw, scap, ecap))


@lru_cache(maxsize=64)
def _decode_batch_jit(hw: Tuple[int, int], scap: int, ecap: int):
    import jax

    return jax.jit(jax.vmap(lambda wire: _decode_core(wire, hw, scap, ecap)))


def upload_frame(packed: DepthPacked):
    """Packed depth -> uint16 (H, W) DEVICE buffer; only the wire bytes
    cross the link."""
    import jax.numpy as jnp

    return _decode_jit(packed.hw, packed.scap, packed.ecap)(jnp.asarray(packed.wire))


def rebucket(packed: DepthPacked, scap: int, ecap: int) -> DepthPacked:
    """Grow a packed frame's caps (for batching frames into one bucket)."""
    if (scap, ecap) == (packed.scap, packed.ecap):
        return packed
    nb = packed.n_blocks
    wire = np.zeros(4 * nb + scap + 8 * ecap, np.uint8)
    o, os_, oe = packed.wire, packed.scap, packed.ecap
    wire[:4 * nb + os_] = o[:4 * nb + os_]
    # padding escapes must keep pointing at the dropped slot
    pos = np.full(ecap, nb * BLOCK, np.int32)
    pos.view(np.uint8)[:4 * oe] = o[4 * nb + os_:4 * nb + os_ + 4 * oe]
    wire[4 * nb + scap:4 * nb + scap + 4 * ecap] = pos.astype("<i4").view(np.uint8)
    wire[4 * nb + scap + 4 * ecap:4 * nb + scap + 4 * ecap + 4 * oe] = (
        o[4 * nb + os_ + 4 * oe:])
    return DepthPacked(hw=packed.hw, wire=wire, scap=scap, ecap=ecap)


def upload_frames(packs: List[DepthPacked]):
    """Same-dims packed frames -> ONE (B, H, W) uint16 device batch in a
    single host->device transfer (frames rebucket to the largest caps)."""
    import jax.numpy as jnp

    hw = packs[0].hw
    if any(p.hw != hw for p in packs):
        raise ValueError("upload_frames: mixed depth dims")
    scap = max(p.scap for p in packs)
    ecap = max(p.ecap for p in packs)
    packs = [rebucket(p, scap, ecap) for p in packs]
    wire = np.stack([p.wire for p in packs])
    return _decode_batch_jit(hw, scap, ecap)(jnp.asarray(wire))


# ------------------------------------------------------------------- oracle
def roundtrip_host(packed: DepthPacked) -> np.ndarray:
    """numpy mirror of the device decode (tests)."""
    h, w = packed.hw
    n_px = h * w
    nb = packed.n_blocks
    wire = packed.wire
    cls = wire[:nb].astype(np.int64)
    preds = wire[nb:2 * nb].view(np.int8).astype(np.int64)
    bases = wire[2 * nb:4 * nb].view("<u2").astype(np.int64)
    stream = wire[4 * nb:4 * nb + packed.scap].astype(np.int64)
    o = 4 * nb + packed.scap
    esc_pos = wire[o:o + 4 * packed.ecap].view("<i4")
    esc_corr = wire[o + 4 * packed.ecap:].view("<i4")
    nbytes = np.asarray(_KBYTES)[cls]
    offs = np.cumsum(nbytes) - nbytes
    j = np.arange(BLOCK)
    b2 = stream[np.clip(offs[:, None] + j // 4, 0, packed.scap - 1)]
    z2 = (b2 >> (2 * (j % 4))) & 3
    b4 = stream[np.clip(offs[:, None] + j // 2, 0, packed.scap - 1)]
    z4 = np.where(j % 2 == 0, b4 & 15, b4 >> 4)
    z8 = stream[np.clip(offs[:, None] + j, 0, packed.scap - 1)]
    z16 = (stream[np.clip(offs[:, None] + 2 * j, 0, packed.scap - 1)]
           + 256 * stream[np.clip(offs[:, None] + 2 * j + 1, 0, packed.scap - 1)])
    c = cls[:, None]
    z = np.where(c == 0, 0,
                 np.where(c == 1, z2,
                          np.where(c == 2, z4, np.where(c == 3, z8, z16))))
    resid = np.where(z % 2 == 0, z // 2, -((z + 1) // 2))
    delta = np.where(j == 0, 0, resid + preds[:, None])
    flat_d = delta.reshape(-1)
    keep = esc_pos < nb * BLOCK
    np.add.at(flat_d, esc_pos[keep], esc_corr[keep])
    vals = bases[:, None] + np.cumsum(flat_d.reshape(nb, BLOCK), axis=1)
    return vals.reshape(-1)[:n_px].astype(np.uint16).reshape(h, w)
