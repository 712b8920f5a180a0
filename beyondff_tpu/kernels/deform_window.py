"""Tile-windowed deformable sampling as a Pallas TPU kernel (MXU path).

The encoder's multi-scale deformable attention samples each level at
(static raster center + predicted offset) per (query, head, point)
(reference: Grounding-DINO's CUDA ``MultiScaleDeformableAttention``,
SURVEY.md §2.3). On TPU the production XLA path is a 2x2-patch
``lax.gather`` — descriptor-bound at ~19 ns/sample, ~12 ms per large level
per layer at the (800, 1200) config (tools/bench_deform_gather.py).

This kernel exploits the STATIC query raster: queries are bucketed by their
center cell into TxT tiles of the target level, so one (3T, W3X, hd) value
window serves every sample of a tile from VMEM. Per (tile, head, query
chunk) the kernel builds the COMBINED 2D interpolation weight matrix on the
VPU — for each query, the sum over its P points of the bilinear 2x2
footprint times the attention weight, laid out flat over the window cells —
and contracts it against the flattened window in ONE MXU matmul:

  acc[(y, x), q] = sum_p wy_p[y, q] * (wx_p * aw_p)[x, q]   (VPU outer products)
  out[d, q]      = sum_(y,x) win[(y, x), d] * acc[(y, x), q]   (MXU)

The contraction dim is W3*W3X (hundreds — full 128-lane K utilization) and
the output is (hd, chunk) with hd on sublanes and queries on lanes — no
padding waste on either matmul dim. An earlier separable formulation
(row/column one-hot matmuls with K = W3 = 24 padded to 128, plus expansion /
reduction / point-sum matmuls) spent ~12x more MXU cycles for the same
samples. The flat (W3*W3X) weight layout is built as a (W3, W3X, chunk)
broadcast product and collapsed for free: W3X is padded to the sublane tile
(16) so the reshape preserves the VMEM tiling.

Semantics vs the exact path: samples whose bilinear footprint falls fully
inside the tile window (|offset| <= R = T-1 cells of the target level) are
EXACT, including zero-padding at the map border (the window is cut from a
T-cell zero-padded map, so partial/out-of-map corners match
deformable.ms_deform_attn bit for bit). Samples beyond the window CLAMP to
the window edge (the nearest representable location — strictly closer to the
true sample than dropping it, for smooth feature maps), except samples fully
outside the map, which contribute exactly 0 like the original op's zero
padding. The deviation is therefore confined to in-map samples offset more
than R cells from their query's tile, and bounded by the feature variation
between the true location and the window edge — measured in
tools/measure_deform_window.py, recorded in PARITY.md. Gated by
``GDINOConfig.enc_windowed_deform`` / env ``BFF_DEFORM_WINDOWED`` (the exact
gather path remains the fallback). Decoder layers (dynamic reference points)
always use the exact path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16  # target-level cells per tile side; window = 3*TILE, radius = TILE-1


class TileAssign:
    """Static bucketing of the all-level query raster into target-level tiles."""

    def __init__(self, idx, valid, inv, nty, ntx, s_pad, tile):
        self.idx = idx          # (tiles, S) query index per slot
        self.valid = valid      # (tiles, S) slot is a real query
        self.inv = inv          # (Q,) flat (tile*S + slot) per query
        self.nty, self.ntx = nty, ntx
        self.s_pad = s_pad
        self.tile = tile        # T: target-level cells per tile side


def build_assignment(shapes: Tuple[Tuple[int, int], ...], level: int,
                     tile: int = TILE) -> TileAssign:
    """Bucket the concatenated all-level raster queries (the encoder token
    order, model.py:258-266) by their center cell in level ``level``."""
    return _build_assignment_cached(shapes, level, tile)


@functools.lru_cache(maxsize=32)
def _build_assignment_cached(shapes, level, tile):
    h, w = shapes[level]
    cys, cxs = [], []
    for hh, ww in shapes:
        ys = (np.arange(hh) + 0.5) / hh
        xs = (np.arange(ww) + 0.5) / ww
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        cys.append(gy.reshape(-1))
        cxs.append(gx.reshape(-1))
    cy = np.concatenate(cys) * h - 0.5
    cx = np.concatenate(cxs) * w - 0.5
    q = cy.shape[0]
    nty, ntx = -(-h // tile), -(-w // tile)
    ty = np.clip((cy // tile).astype(np.int64), 0, nty - 1)
    tx = np.clip((cx // tile).astype(np.int64), 0, ntx - 1)
    tid = ty * ntx + tx
    n_tiles = nty * ntx
    order = np.argsort(tid, kind="stable")
    counts = np.bincount(tid, minlength=n_tiles)
    # Lane-align the slot dim: Mosaic rejects the kernel's 2D->3D weight
    # broadcasts at non-128-multiple lane counts (measured: 96 fails, 128
    # OK), and VMEM pads lanes to 128 regardless, so slots are free.
    mx = int(counts.max())
    s_pad = 32 if mx <= 32 else -(-mx // 128) * 128
    idx = np.zeros((n_tiles, s_pad), np.int32)
    valid = np.zeros((n_tiles, s_pad), bool)
    off = 0
    for t in range(n_tiles):
        c = int(counts[t])
        idx[t, :c] = order[off:off + c]
        valid[t, :c] = True
        off += c
    inv = np.zeros(q, np.int64)
    inv[idx[valid]] = np.arange(n_tiles * s_pad).reshape(n_tiles, s_pad)[valid]
    return TileAssign(idx, valid, inv, nty, ntx, s_pad, tile)


def _qchunk(s: int) -> int:
    """Largest 128-multiple divisor of s that is <= 512 (query chunk);
    tiny configs (s = 32) run as one chunk."""
    for c in (512, 384, 256, 128):
        if s % c == 0:
            return c
    return s


def _kernel(ry_ref, rx_ref, aw_ref, win_ref, out_ref, *, w3: int, w3x: int,
            p_pts: int, s: int):
    """One (tile, batch) program: all heads, query chunks of SQ.

    Coordinates arrive point-major — (heads, P*S) with each point's S
    query slots contiguous — so per-point rows slice contiguously on lanes.
    The combined weight is accumulated as (W3, W3X, SQ) broadcast products
    and collapsed to (W3*W3X, SQ) for the single MXU contraction; the
    output block is (heads, hd, S) — hd on sublanes, queries on lanes."""
    dtype = win_ref.dtype
    heads = ry_ref.shape[2]
    sq = _qchunk(s)
    iy = jax.lax.broadcasted_iota(jnp.int32, (w3, sq), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (w3x, sq), 0)
    dn0 = (((0,), (0,)), ((), ()))  # contract leading dims

    def onehot(iw, r):  # (1, sq) f32 in [0, w3-2] -> (rows, sq) weights
        r0 = jnp.floor(r)
        f = r - r0
        r0i = r0.astype(jnp.int32)
        return (jnp.where(iw == r0i, 1.0 - f, 0.0)
                + jnp.where(iw == r0i + 1, f, 0.0)).astype(dtype)

    for hh in range(heads):
        win = win_ref[0, 0, hh]  # (w3*w3x, hd)
        for c in range(s // sq):
            acc = jnp.zeros((w3, w3x, sq), dtype)
            for p in range(p_pts):
                sl = pl.ds(p * s + c * sq, sq)
                wy = onehot(iy, ry_ref[0, 0, hh:hh + 1, sl])
                wxa = (onehot(ix, rx_ref[0, 0, hh:hh + 1, sl])
                       * aw_ref[0, 0, hh:hh + 1, sl].astype(dtype))
                acc = acc + (
                    jax.lax.broadcast_in_dim(wy, (w3, w3x, sq), (0, 2))
                    * jax.lax.broadcast_in_dim(wxa, (w3, w3x, sq), (1, 2)))
            accf = acc.reshape(w3 * w3x, sq)
            outq = jax.lax.dot_general(win, accf, dn0,
                                       preferred_element_type=jnp.float32)
            out_ref[0, 0, hh, :, pl.ds(c * sq, sq)] = outq.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("assign", "h", "w", "radius",
                                             "interpret"))
def sample_level_windowed(v, gx, gy, aw, assign: TileAssign, h: int, w: int,
                          radius: Optional[int] = None, interpret: bool = False):
    """One level's deformable-attention contribution, tile-windowed.

    v:  (B, H*W, heads, hd) level value slice
    gx, gy: (B, Q, heads, P) sampling locations in CELL coords (x*W - 0.5)
    aw: (B, Q, heads, P) softmaxed attention weights for this level
    Returns (B, Q, heads, hd) = sum_p aw * bilinear(v, loc); samples outside
    the tile window clamp to its edge (see module docstring).

    ``radius``: window margin in target-level cells on each side of the
    tile — window side = tile + 2*radius; every query's reach is at least
    radius - 1 cells in every direction. Defaults to ``tile`` (the historic
    3*tile window). Decoupling lets a LARGER tile keep the same clamp bound:
    windows overlap less, so the materialized (tiles, heads, W, hd) window
    array shrinks ~(old_tiles/new_tiles)x while the per-slot VPU/MXU work
    stays similar.
    """
    b, q, heads, p_pts = gx.shape
    hd = v.shape[-1]
    dtype = v.dtype
    t = assign.tile
    r = radius if radius is not None else t
    w3 = t + 2 * r
    w3x = max(-(-w3 // 16) * 16, w3)  # window cols padded to the sublane tile
    pad = r
    n_tiles = assign.nty * assign.ntx
    s = assign.s_pad
    sp = s * p_pts

    idx = jnp.asarray(assign.idx)
    valid = jnp.asarray(assign.valid)

    # ---- windows: (tiles, B, heads, W3*W3X, hd) via static per-tile slices
    # (an 8-D shifted-block transpose measured ~7 ms at the (800,1200)
    # config; static strided copies compile to plain fast DMAs). The extra
    # W3X - W3 columns are never selected (rx clamps to w3 - 2).
    vm = v.reshape(b, h, w, heads, hd).transpose(0, 3, 1, 2, 4)
    vm = vm.reshape(b * heads, h, w, hd)
    vp = jnp.pad(vm, ((0, 0), (pad, assign.nty * t + pad - h),
                      (pad, assign.ntx * t + pad + (w3x - w3) - w), (0, 0)))
    wins = jnp.stack([
        vp[:, ti // assign.ntx * t:ti // assign.ntx * t + w3,
           ti % assign.ntx * t:ti % assign.ntx * t + w3x]
        for ti in range(n_tiles)])  # (tiles, BH, W3, W3X, hd)
    wins = wins.reshape(n_tiles, b, heads, w3 * w3x, hd)

    # ---- coords permuted to tile order, POINT-major: (tiles, B, heads, P*S)
    def permute(a):  # (B, Q, heads, P) -> (tiles, B, heads, P*S)
        pa = a[:, idx]  # (B, tiles, S, heads, P)
        return pa.transpose(1, 0, 3, 4, 2).reshape(n_tiles, b, heads, sp)

    ty0 = (jnp.arange(n_tiles, dtype=jnp.float32) // assign.ntx) * t - pad
    tx0 = (jnp.arange(n_tiles, dtype=jnp.float32) % assign.ntx) * t - pad
    pgy = permute(gy.astype(jnp.float32))
    pgx = permute(gx.astype(jnp.float32))
    ry = pgy - ty0[:, None, None, None]
    rx = pgx - tx0[:, None, None, None]
    # samples fully outside the MAP contribute exactly 0 (the original op's
    # zero padding); in-map samples beyond the window clamp to the window
    # edge below (see module docstring)
    inmap = (pgy > -1.0) & (pgy < float(h)) & (pgx > -1.0) & (pgx < float(w))
    pvalid = jnp.broadcast_to(valid[:, None, None, None, :],
                              (n_tiles, 1, 1, p_pts, s)).reshape(n_tiles, 1, 1, sp)
    paw = permute(aw.astype(jnp.float32)) * pvalid * inmap
    ry = jnp.clip(ry, 0.0, w3 - 2.0)
    rx = jnp.clip(rx, 0.0, w3 - 2.0)

    coord_spec = pl.BlockSpec((1, 1, heads, sp), lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, w3=w3, w3x=w3x, p_pts=p_pts, s=s),
        out_shape=jax.ShapeDtypeStruct((n_tiles, b, heads, hd, s), dtype),
        grid=(n_tiles, b),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, 1, heads, w3 * w3x, hd),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, heads, hd, s),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ry, rx, paw, wins)

    # ---- un-permute back to query order (P-sum happened in the weights)
    out = out.transpose(1, 0, 4, 2, 3).reshape(b, n_tiles * s, heads, hd)
    return out[:, jnp.asarray(assign.inv)]
