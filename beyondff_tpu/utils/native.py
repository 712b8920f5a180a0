"""ctypes bindings for the C++ host runtime (native/bff_native.cpp).

The library builds on demand with g++ (cached next to the source); every
entry point has a pure-python fallback so the framework works without a
toolchain. ``BFF_NO_NATIVE=1`` forces the fallbacks.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                    "native", "bff_native.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libbff_native.so")


@functools.lru_cache(maxsize=1)
def load_library() -> Optional[ctypes.CDLL]:
    if os.environ.get("BFF_NO_NATIVE"):
        return None
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
                 "-o", _SO, "-lz", "-lpthread"],
                check=True, capture_output=True, timeout=180,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.bff_rle_decode_batch.restype = ctypes.c_int
    lib.bff_rle_encode.restype = ctypes.c_int64
    lib.bff_decode_depth.restype = ctypes.c_int
    lib.bff_decode_depth_batch.restype = ctypes.c_int
    if hasattr(lib, "bff_jpeg_info"):
        lib.bff_jpeg_info.restype = ctypes.c_int
        lib.bff_jpeg_coeffs.restype = ctypes.c_int
    if hasattr(lib, "bff_jxt_scan"):
        lib.bff_jxt_scan.restype = ctypes.c_int64
    if hasattr(lib, "bff_depth_pack"):
        lib.bff_depth_pack.restype = ctypes.c_int
    return lib


def available() -> bool:
    return load_library() is not None


# ------------------------------------------------------------------ RLE
def rle_decode_batch_native(rles: Sequence[dict]) -> Optional[np.ndarray]:
    """Dense (M, L) uint8 from RLE dicts; None if the library is unavailable
    or the masks have mixed lengths."""
    lib = load_library()
    if lib is None or not rles:
        return None
    length = int(rles[0]["length"])
    if any(int(r["length"]) != length for r in rles):
        return None
    counts = np.concatenate([np.asarray(r["counts"], np.int64) for r in rles])
    offsets = np.zeros(len(rles) + 1, np.int64)
    np.cumsum([len(np.asarray(r["counts"])) for r in rles], out=offsets[1:])
    out = np.empty((len(rles), length), np.uint8)
    rc = lib.bff_rle_decode_batch(
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(rles), length,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None


def rle_encode_native(mask: np.ndarray) -> Optional[dict]:
    lib = load_library()
    if lib is None:
        return None
    mask = np.ascontiguousarray(np.asarray(mask, np.uint8).ravel())
    out = np.empty(mask.size + 2, np.int64)
    n = lib.bff_rle_encode(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(mask.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return {"length": int(mask.size), "counts": out[:n].copy()}


# ------------------------------------------------------------------ depth
def decode_depth_native(path: str, depth_scale: float, out_hw: tuple) -> Optional[np.ndarray]:
    lib = load_library()
    if lib is None:
        return None
    with open(path, "rb") as f:
        blob = np.frombuffer(f.read(), np.uint8)
    out = np.empty(out_hw, np.float32)
    rc = lib.bff_decode_depth(
        blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(blob.size), ctypes.c_float(depth_scale),
        out_hw[0], out_hw[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


# ------------------------------------------------------------------ JPEG
def jpeg_coeffs_native(blob: bytes) -> Optional[dict]:
    """Entropy-decode a baseline JPEG to its quantized DCT coefficients
    (no IDCT/color — the device finishes decoding, core/jxt.py).

    Returns ``None`` when the library is unavailable or the file is not a
    baseline JPEG (progressive, malformed, >4 components) — callers fall
    back to a full host decode. Otherwise a dict:

    - ``hw``: (height, width) pixel dims
    - ``comps``: list per component of
      ``{"coeffs": int16 (bh, bw, 64) natural-order blocks,
      "samp": (Hi, Vi), "grid": (bh, bw), "qtab": int32 (64,)}``
    """
    lib = load_library()
    if lib is None or not hasattr(lib, "bff_jpeg_info"):
        return None
    buf = np.frombuffer(blob, np.uint8)
    info = np.zeros(32, np.int32)
    qtabs = np.zeros(4 * 64, np.int32)
    rc = lib.bff_jpeg_info(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(buf.size),
        info.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        qtabs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    w, h, ncomp = int(info[0]), int(info[1]), int(info[2])
    if ncomp < 1 or ncomp > 4:
        return None
    outs = []
    ptrs = []
    for i in range(4):
        if i < ncomp:
            bh, bw = int(info[8 + 5 * i]), int(info[7 + 5 * i])
            arr = np.zeros((bh, bw, 64), np.int16)  # decoder writes nz only
            outs.append(arr)
            ptrs.append(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
        else:
            ptrs.append(ctypes.POINTER(ctypes.c_int16)())
    rc = lib.bff_jpeg_coeffs(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(buf.size), *ptrs,
    )
    if rc != 0:
        return None
    comps = []
    for i in range(ncomp):
        comps.append({
            "coeffs": outs[i],
            "samp": (int(info[4 + 5 * i]), int(info[5 + 5 * i])),
            "grid": outs[i].shape[:2],
            "qtab": qtabs[int(info[6 + 5 * i]) * 64:][:64].copy(),
        })
    return {"hw": (h, w), "comps": comps}


def jxt_scan_native(flat: np.ndarray):
    """One-pass JXT wire scan (delta/val/esc streams, core/jxt.py pack()
    semantics) over the concatenated dense coefficient tensor. Returns
    (total_entries, n_nonzero, delta, val, esc) — delta/val oversized to
    the worst-case cap, esc trimmed — or None without the library."""
    lib = load_library()
    if lib is None or not hasattr(lib, "bff_jxt_scan"):
        return None
    flat = np.ascontiguousarray(flat, np.int16)
    cap = flat.size + flat.size // 255 + 8
    delta = np.empty(cap, np.uint8)
    val = np.empty(cap, np.int8)
    esc = np.empty(max(flat.size, 1), np.int16)
    nz = ctypes.c_int64()
    ne = ctypes.c_int64()
    total = lib.bff_jxt_scan(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        ctypes.c_int64(flat.size),
        delta.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        val.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        esc.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        ctypes.byref(nz), ctypes.byref(ne),
    )
    return int(total), int(nz.value), delta, val, esc[:int(ne.value)]


def depth_pack_native(flat: np.ndarray):
    """One-pass depth-pack scan (core/depth_pack.py wire semantics) over a
    flattened uint16 depth map (length a multiple of 64). Returns
    (classes u8, preds i8, bases u16, stream u8, esc_pos i32, esc_corr
    i32) with stream/escapes trimmed, or None without the library."""
    lib = load_library()
    if lib is None or not hasattr(lib, "bff_depth_pack"):
        return None
    flat = np.ascontiguousarray(flat, np.uint16)
    nb = flat.size // 64
    classes = np.empty(nb, np.uint8)
    preds = np.empty(nb, np.int8)
    bases = np.empty(nb, np.uint16)
    stream = np.empty(2 * flat.size, np.uint8)
    esc_pos = np.empty(max(flat.size, 1), np.int32)
    esc_corr = np.empty(max(flat.size, 1), np.int32)
    slen = ctypes.c_int64()
    nesc = ctypes.c_int64()
    rc = lib.bff_depth_pack(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.c_int64(flat.size),
        classes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        preds.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        bases.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        stream.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(slen),
        esc_pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        esc_corr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(nesc),
    )
    if rc != 0:
        return None
    return (classes, preds, bases, stream[:int(slen.value)].copy(),
            esc_pos[:int(nesc.value)].copy(), esc_corr[:int(nesc.value)].copy())


def decode_depth_batch_native(paths: List[str], depth_scale: float, out_hw: tuple,
                              n_threads: Optional[int] = None) -> Optional[np.ndarray]:
    lib = load_library()
    if lib is None:
        return None
    blobs = []
    offsets = [0]
    for p in paths:
        with open(p, "rb") as f:
            b = f.read()
        blobs.append(b)
        offsets.append(offsets[-1] + len(b))
    blob = np.frombuffer(b"".join(blobs), np.uint8)
    offs = np.asarray(offsets, np.int64)
    out = np.empty((len(paths), *out_hw), np.float32)
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    rc = lib.bff_decode_depth_batch(
        blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(paths), ctypes.c_float(depth_scale), out_hw[0], out_hw[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    return out if rc == 0 else None
