#!/usr/bin/env python
"""Prototype: tile-windowed one-hot MXU deformable sampling vs the gather.

Encoder deformable attention samples each level at (static grid center +
predicted offset). Bucketing queries by their static center into TxT spatial
tiles lets each tile's samples be served from a (T+2R+2)^2 VMEM-sized window
with two one-hot matmuls (rows, then cols) — no random gather. Offsets are
clamped to the window (radius R cells), the single semantic deviation.

Run: python tools/bench_deform_window.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SHAPES = [(100, 150), (50, 75), (25, 38), (13, 19)]  # (800,1200) swin levels


def fence(x):
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    float(jax.device_get(leaves[0].reshape(-1)[0].astype("float32")))


def timed(name, fn, iters=20):
    out = fn()
    fence(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    fence(out)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:44s} {dt:8.2f} ms")
    return dt


def static_centers(shapes):
    """All-level query centers, as in GDINOModule (model.py:258-266)."""
    cs = []
    for h, w in shapes:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        g = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1).reshape(-1, 2)
        cs.append(g)
    return np.concatenate(cs, 0)  # (Q, 2) normalized (x, y)


def main():
    import jax
    import jax.numpy as jnp

    h, w = SHAPES[0]
    centers = static_centers(SHAPES)
    q = centers.shape[0]
    b, heads, hd, p = 1, 8, 32, 4
    dtype = jnp.bfloat16
    T, R = 16, 15
    wwin = T + 2 * R + 2  # 48 = 3*T

    # ---- static bucketing by center cell
    cx = centers[:, 0] * w - 0.5
    cy = centers[:, 1] * h - 0.5
    nty, ntx = -(-h // T), -(-w // T)
    ty = np.clip((cy // T).astype(int), 0, nty - 1)
    tx = np.clip((cx // T).astype(int), 0, ntx - 1)
    tile = ty * ntx + tx
    n_tiles = nty * ntx
    order = np.argsort(tile, kind="stable")
    counts = np.bincount(tile, minlength=n_tiles)
    s_q = int(counts.max())
    s_q = -(-s_q // 128) * 128  # pad to lane multiple
    idx = np.zeros((n_tiles, s_q), np.int32)
    valid = np.zeros((n_tiles, s_q), bool)
    off = 0
    for t in range(n_tiles):
        c = counts[t]
        idx[t, :c] = order[off:off + c]
        valid[t, :c] = True
        off += c
    inv = np.zeros(q, np.int64)
    inv[idx[valid]] = 0  # placeholder
    flat_slot = np.arange(n_tiles * s_q).reshape(n_tiles, s_q)
    inv[idx[valid]] = flat_slot[valid]
    print(f"tiles {nty}x{ntx}={n_tiles}, max queries/tile {counts.max()} -> padded {s_q}")

    rng = np.random.default_rng(0)
    vm = jnp.asarray(rng.normal(size=(b * heads, h, w, hd)), dtype)
    # local sampling locations: center + offsets within R cells (post-clamp regime)
    gx_np = cx[None, :, None, None] + rng.uniform(-R, R, (b, q, heads, p))
    gy_np = cy[None, :, None, None] + rng.uniform(-R, R, (b, q, heads, p))
    gx = jnp.asarray(gx_np, jnp.float32)
    gy = jnp.asarray(gy_np, jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (b, q, heads, p)), jnp.float32)

    idx_j = jnp.asarray(idx)
    valid_j = jnp.asarray(valid)
    inv_j = jnp.asarray(inv)
    tile_y0 = jnp.asarray((np.arange(n_tiles) // ntx) * T, jnp.float32)
    tile_x0 = jnp.asarray((np.arange(n_tiles) % ntx) * T, jnp.float32)

    @jax.jit
    def windowed(vm, gx, gy, aw):
        # ---- permute samples into tile order (static take)
        pgx = gx[:, idx_j]  # (B, tiles, S, heads, P)
        pgy = gy[:, idx_j]
        paw = aw[:, idx_j] * valid_j[None, :, :, None, None]
        # window origin per tile (top-left cell of the padded window)
        wy0 = tile_y0[None, :, None, None, None] - (R + 1)
        wx0 = tile_x0[None, :, None, None, None] - (R + 1)
        # clamp into window so floor+1 stays inside
        ry = jnp.clip(pgy - wy0, 0.0, wwin - 2.0)
        rx = jnp.clip(pgx - wx0, 0.0, wwin - 2.0)
        y0 = jnp.floor(ry)
        x0 = jnp.floor(rx)
        fy = (ry - y0).astype(dtype)
        fx = (rx - x0).astype(dtype)

        # ---- one-hot row/col weights (B, tiles, S, heads, P, wwin)
        iw = jnp.arange(wwin, dtype=jnp.float32)
        wy = ((1 - fy)[..., None] * (iw == y0[..., None]).astype(dtype)
              + fy[..., None] * (iw == y0[..., None] + 1).astype(dtype))
        wx = ((1 - fx)[..., None] * (iw == x0[..., None]).astype(dtype)
              + fx[..., None] * (iw == x0[..., None] + 1).astype(dtype))
        wx = wx * paw[..., None].astype(dtype)

        # ---- window tensor from 3x3 shifted T-blocks (wwin = 3T)
        pad_y = (R + 1, nty * T + R + 1 - h)
        pad_x = (R + 1, ntx * T + R + 1 - w)
        vp = jnp.pad(vm, ((0, 0), pad_y, pad_x, (0, 0)))
        hp = nty * T + 2 * (R + 1)
        wp = ntx * T + 2 * (R + 1)
        # block grid: (BH, nty+2, T, ntx+2, T, hd) after trimming to multiples
        # of T: hp = (nty+2)*T when R+1 == T/... use direct slicing instead
        wins = jnp.stack([
            jnp.stack([
                vp[:, dy * T:dy * T + nty * T, dx * T:dx * T + ntx * T]
                .reshape(b * heads, nty, T, ntx, T, hd)
                for dx in range(3)], axis=0)
            for dy in range(3)], axis=0)
        # (3, 3, BH, nty, T, ntx, T, hd) -> (tiles, BH, 3T, 3T, hd)
        wins = wins.transpose(3, 5, 2, 0, 4, 1, 6, 7)  # nty, ntx, BH, 3, Ty, 3, Tx, hd
        wins = wins.reshape(n_tiles, b * heads, wwin, wwin, hd)

        # ---- per-tile two-stage contraction (scan over tiles)
        wy_t = wy.transpose(1, 0, 3, 2, 4, 5).reshape(n_tiles, b * heads, s_q * p, wwin)
        wx_t = wx.transpose(1, 0, 3, 2, 4, 5).reshape(n_tiles, b * heads, s_q * p, wwin)

        def per_tile(args):
            wy_i, wx_i, win_i = args  # (BH, SP, W), (BH, W, W, hd)
            m1 = jnp.einsum("bsw,bwx->bsx", wy_i,
                            win_i.reshape(b * heads, wwin, wwin * hd))
            m1 = m1.reshape(b * heads, s_q * p, wwin, hd)
            return jnp.einsum("bsw,bswd->bsd", wx_i, m1)

        out_t = jax.lax.map(per_tile, (wy_t, wx_t, wins))  # (tiles, BH, SP, hd)
        # sum the P points per query, un-permute
        out_t = out_t.reshape(n_tiles, b, heads, s_q, p, hd).sum(4)
        out_t = out_t.transpose(1, 0, 3, 2, 4).reshape(b, n_tiles * s_q, heads, hd)
        return out_t[:, inv_j]  # (B, Q, heads, hd)

    # ---- reference: production patch gather (exact, same clamped locations)
    # per-query static window origin (same clamp as the windowed path)
    q_wy0 = jnp.asarray(ty * T - (R + 1), jnp.float32)[None, :, None, None]
    q_wx0 = jnp.asarray(tx * T - (R + 1), jnp.float32)[None, :, None, None]

    @jax.jit
    def gather_ref(vm, gx, gy, aw):
        cgy = jnp.clip(gy - q_wy0, 0.0, wwin - 2.0) + q_wy0
        cgx = jnp.clip(gx - q_wx0, 0.0, wwin - 2.0) + q_wx0
        x0 = jnp.floor(cgx)
        y0 = jnp.floor(cgy)
        fx = (cgx - x0)[..., None].astype(dtype)
        fy = (cgy - y0)[..., None].astype(dtype)
        vp = jnp.pad(vm, ((0, 0), (1, 1), (1, 1), (0, 0)))
        xi = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1
        yi = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
        starts = jnp.stack([yi, xi], -1).transpose(0, 2, 1, 3, 4).reshape(b * heads, q * p, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3, 4), collapsed_slice_dims=(), start_index_map=(1, 2),
            operand_batching_dims=(0,), start_indices_batching_dims=(0,))
        g = jax.lax.gather(vp, starts, dn, slice_sizes=(1, 2, 2, hd), mode="clip")
        g = g.reshape(b, heads, q, p, 2, 2, hd).transpose(0, 2, 1, 3, 4, 5, 6)

        def cw(dx, dy):
            wxc = fx if dx else (1 - fx)
            wyc = fy if dy else (1 - fy)
            inside = ((x0 + dx >= 0) & (x0 + dx < w) & (y0 + dy >= 0) & (y0 + dy < h))
            return wxc * wyc * inside[..., None].astype(dtype)

        s = (g[..., 0, 0, :] * cw(0, 0) + g[..., 0, 1, :] * cw(1, 0)
             + g[..., 1, 0, :] * cw(0, 1) + g[..., 1, 1, :] * cw(1, 1))
        return jnp.sum(s * aw[..., None].astype(dtype), axis=3)

    print(f"level-0: {q} queries x {p} pts x {heads} heads, window {wwin}, tile {T}")
    t_win = timed("tile-windowed one-hot MXU", lambda: windowed(vm, gx, gy, aw))
    t_ref = timed("patch gather (clamped locs)", lambda: gather_ref(vm, gx, gy, aw))
    a = np.asarray(windowed(vm, gx, gy, aw), np.float32)
    r = np.asarray(gather_ref(vm, gx, gy, aw), np.float32)
    err = np.max(np.abs(a - r))
    rel = err / (np.abs(r).max() + 1e-9)
    print(f"max abs err {err:.3e} (rel {rel:.3e}); speedup {t_ref / t_win:.2f}x")


if __name__ == "__main__":
    main()
