"""Tile-windowed deformable sampling as a Pallas TPU kernel (MXU path).

The encoder's multi-scale deformable attention samples each level at
(static raster center + predicted offset) per (query, head, point)
(reference: Grounding-DINO's CUDA ``MultiScaleDeformableAttention``,
SURVEY.md §2.3). On TPU the production XLA path is a 2x2-patch
``lax.gather`` — descriptor-bound at ~19 ns/sample, ~12 ms per large level
per layer at the (800, 1200) config (tools/bench_deform_gather.py).

This kernel exploits the STATIC query raster: queries are bucketed by their
center cell into TxT tiles of the target level, so one (3T, 3T, hd) value
window serves every sample of a tile from VMEM, and bilinear interpolation
becomes three MXU matmuls per (tile, head, row-block):

  1. ``m1 = wy @ win``          row one-hot interp    (SPB, W3) x (W3, W3*hd)
  2. ``wxe = (wx*aw) @ E``      lane expansion        (SPB, W3) x (W3, W3*hd)
  3. ``out = (m1 * wxe) @ R``   strided column reduce (SPB, W3*hd) x (W3*hd, hd)

where W3 = 3T and E / R are constant one-hot expansion / reduction matrices.
The only VPU work is building the two one-hot interpolation matrices.

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
from typing import Tuple

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


@functools.lru_cache(maxsize=32)
def build_assignment(shapes: Tuple[Tuple[int, int], ...], level: int,
                     tile: int = TILE) -> TileAssign:
    """Bucket the concatenated all-level raster queries (the encoder token
    order, model.py:258-266) by their center cell in level ``level``."""
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
    s_pad = max(32, -(-int(counts.max()) // 32) * 32)
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


@functools.lru_cache(maxsize=8)
def _point_sum(spb: int, p: int):
    """(spb/p, spb) one-hot: row q sums sample rows [q*p, (q+1)*p)."""
    sq = spb // p
    ps = np.zeros((sq, spb), np.float32)
    for qrow in range(sq):
        ps[qrow, qrow * p:(qrow + 1) * p] = 1.0
    return ps


@functools.lru_cache(maxsize=8)
def _expand_reduce(win: int, hd: int):
    """E (win, win*hd): repeat each column weight across its hd lanes.
    R (win*hd, hd): sum the win strided hd-groups."""
    e = np.zeros((win, win * hd), np.float32)
    for x in range(win):
        e[x, x * hd:(x + 1) * hd] = 1.0
    r = np.zeros((win * hd, hd), np.float32)
    for x in range(win):
        r[x * hd:(x + 1) * hd] += np.eye(hd, dtype=np.float32)
    return e, r


def _chunk(sp: int) -> int:
    """Largest 128-multiple divisor of sp that is <= 512 (row chunk)."""
    for c in (512, 384, 256, 128):
        if sp % c == 0:
            return c
    return sp  # tiny configs (tests): single chunk


def _kernel(ry_ref, rx_ref, aw_ref, win_ref, e_ref, r_ref, ps_ref, out_ref):
    """One (tile, batch) program: ALL heads' SP sample rows in row chunks
    (the per-(tile, head) grid spent ~1.4 us launch cost x tiles x heads —
    at tile 8 that was a quarter of the level call).

    One-hot interpolation matrices are built TRANSPOSED — (w3, chunk) with
    samples on lanes — so coords stream as contiguous (1, SP) rows and the
    MXU contracts their leading dim (transpose_lhs), avoiding the
    sublane-strided layouts that dominate wall-clock otherwise. The final
    one-hot matmul ``ps`` sums each query's P consecutive point rows, so the
    output (and its HBM write) is (S, hd), not (S*P, hd)."""
    dtype = win_ref.dtype
    w3 = e_ref.shape[0]
    heads = ry_ref.shape[2]
    sp = ry_ref.shape[3]
    spb = _chunk(sp)
    sq = ps_ref.shape[0]  # query rows per chunk after the P-sum
    iw = jax.lax.broadcasted_iota(jnp.int32, (w3, spb), 0)
    dn0 = (((0,), (0,)), ((), ()))  # contract leading dims

    for hh in range(heads):
        win = win_ref[0, 0, hh]
        for c in range(sp // spb):
            sl = pl.ds(c * spb, spb)

            def onehot_t(r):  # (1, spb) f32 in [0, w3-2] -> (w3, spb) weights
                r0 = jnp.floor(r)
                f = r - r0
                r0i = r0.astype(jnp.int32)
                return (jnp.where(iw == r0i, 1.0 - f, 0.0)
                        + jnp.where(iw == r0i + 1, f, 0.0)).astype(dtype)

            wy_t = onehot_t(ry_ref[0, 0, hh:hh + 1, sl])
            wx_t = (onehot_t(rx_ref[0, 0, hh:hh + 1, sl])
                    * aw_ref[0, 0, hh:hh + 1, sl].astype(dtype))
            m1 = jax.lax.dot_general(wy_t, win, dn0,
                                     preferred_element_type=jnp.float32).astype(dtype)
            wxe = jax.lax.dot_general(wx_t, e_ref[:], dn0,
                                      preferred_element_type=jnp.float32).astype(dtype)
            out = jnp.dot(m1 * wxe, r_ref[:],
                          preferred_element_type=jnp.float32).astype(dtype)
            outq = jnp.dot(ps_ref[:], out, preferred_element_type=jnp.float32)
            out_ref[0, 0, hh, pl.ds(c * sq, sq), :] = outq.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("assign", "h", "w", "interpret"))
def sample_level_windowed(v, gx, gy, aw, assign: TileAssign, h: int, w: int,
                          interpret: bool = False):
    """One level's deformable-attention contribution, tile-windowed.

    v:  (B, H*W, heads, hd) level value slice
    gx, gy: (B, Q, heads, P) sampling locations in CELL coords (x*W - 0.5)
    aw: (B, Q, heads, P) softmaxed attention weights for this level
    Returns (B, Q, heads, hd) = sum_p aw * bilinear(v, loc); samples outside
    the tile window contribute 0 (see module docstring).
    """
    b, q, heads, p_pts = gx.shape
    hd = v.shape[-1]
    dtype = v.dtype
    t = assign.tile
    w3 = 3 * t
    pad = t
    n_tiles = assign.nty * assign.ntx
    s = assign.s_pad
    sp = s * p_pts
    spb = min(512, sp)
    # SP must split into equal blocks
    while sp % spb:
        spb //= 2

    idx = jnp.asarray(assign.idx)
    valid = jnp.asarray(assign.valid)

    # ---- windows: (tiles, B, heads, W3, W3*hd) via static per-tile slices
    # (an 8-D shifted-block transpose measured ~7 ms at the (800,1200)
    # config; 70 static strided copies compile to plain fast DMAs)
    vm = v.reshape(b, h, w, heads, hd).transpose(0, 3, 1, 2, 4)
    vm = vm.reshape(b * heads, h, w, hd)
    vp = jnp.pad(vm, ((0, 0), (pad, assign.nty * t + pad - h),
                      (pad, assign.ntx * t + pad - w), (0, 0)))
    wins = jnp.stack([
        vp[:, ti // assign.ntx * t:ti // assign.ntx * t + w3,
           ti % assign.ntx * t:ti % assign.ntx * t + w3]
        for ti in range(n_tiles)])  # (tiles, BH, W3, W3, hd)
    wins = wins.reshape(n_tiles, b, heads, w3, w3 * hd)

    # ---- coords permuted to tile order: (tiles, B, heads, SP)
    def permute(a):  # (B, Q, heads, P) -> (tiles, B, heads, SP)
        pa = a[:, idx]  # (B, tiles, S, heads, P)
        return pa.transpose(1, 0, 3, 2, 4).reshape(n_tiles, b, heads, sp)

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
    paw = (permute(aw.astype(jnp.float32))
           * valid[:, None, :, None].repeat(p_pts, -1).reshape(n_tiles, 1, 1, sp)
           * inmap)
    ry = jnp.clip(ry, 0.0, w3 - 2.0)
    rx = jnp.clip(rx, 0.0, w3 - 2.0)

    e_np, r_np = _expand_reduce(w3, hd)
    e = jnp.asarray(e_np, dtype)
    r = jnp.asarray(r_np, dtype)
    spb = _chunk(sp)
    ps = jnp.asarray(_point_sum(spb, p_pts), dtype)

    coord_spec = pl.BlockSpec((1, 1, heads, sp), lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, b, heads, s, hd), dtype),
        grid=(n_tiles, b),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, 1, heads, w3, w3 * hd),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w3, w3 * hd), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w3 * hd, hd), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spb // p_pts, spb), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, heads, s, hd),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ry, rx, paw, wins, e, r, ps)

    # ---- un-permute back to query order (P-sum happened in-kernel)
    out = out.transpose(1, 0, 3, 2, 4).reshape(b, n_tiles * s, heads, hd)
    return out[:, jnp.asarray(assign.inv)]
