#!/usr/bin/env python
"""Measure deformable-attention sampling variants on the attached chip.

The multi-scale deformable sampling (reference: Grounding-DINO's CUDA
MultiScaleDeformableAttention, SURVEY.md §2.3) is the round-1 wall: the 2x2
patch gather issues two 128 B DMA descriptors per (query, head, point) and
runs ~80x below HBM bandwidth. Candidate here: pair rows y/y+1 into the
channel axis once per layer ("vertical pairing") so one 256 B descriptor
fetches the whole bilinear footprint — half the descriptor count of the
strided patch gather at half the construction cost of the rejected full 2x2
pairing (ARCHITECTURE.md perf notes).

Run: python tools/bench_deform_gather.py [--iters 20]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def fence(x):
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    float(jax.device_get(leaves[0].reshape(-1)[0].astype("float32")))


def timed(name, fn, iters):
    out = fn()
    fence(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    fence(out)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:44s} {dt:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    # encoder level-0 scale at (800, 1200) input: map 100x150, ~20k queries
    b, heads, hd = 1, 8, 32
    h, w = 100, 150
    q, p = 19947, 4
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    vm = jnp.asarray(rng.normal(size=(b * heads, h, w, hd)), dtype)
    gx = jnp.asarray(rng.uniform(-0.5, w - 0.5, (b, q, heads, p)), jnp.float32)
    gy = jnp.asarray(rng.uniform(-0.5, h - 0.5, (b, q, heads, p)), jnp.float32)
    aw = jnp.asarray(rng.uniform(0, 1, (b, q, heads, p)), dtype)

    def corners(gx, gy):
        x0 = jnp.floor(gx)
        y0 = jnp.floor(gy)
        return x0, y0, (gx - x0)[..., None].astype(dtype), (gy - y0)[..., None].astype(dtype)

    def mix(g, fx, fy, x0, y0):
        # g: (B, Q, heads, P, 2, 2, hd) corner patch [dy, dx]
        def cw(dx, dy):
            wx = fx if dx else (1 - fx)
            wy = fy if dy else (1 - fy)
            inside = ((x0 + dx >= 0) & (x0 + dx < w) & (y0 + dy >= 0) & (y0 + dy < h))
            return wx * wy * inside[..., None].astype(dtype)

        s = (g[..., 0, 0, :] * cw(0, 0) + g[..., 0, 1, :] * cw(1, 0)
             + g[..., 1, 0, :] * cw(0, 1) + g[..., 1, 1, :] * cw(1, 1))
        return jnp.sum(s * aw[..., None], axis=3)  # (B, Q, heads, hd)

    @jax.jit
    def patch_gather(vm, gx, gy):
        """Round-1 production path: strided (1, 2, 2, hd) gather."""
        x0, y0, fx, fy = corners(gx, gy)
        vp = jnp.pad(vm, ((0, 0), (1, 1), (1, 1), (0, 0)))
        xi = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1
        yi = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
        starts = jnp.stack([yi, xi], -1).transpose(0, 2, 1, 3, 4).reshape(b * heads, q * p, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3, 4), collapsed_slice_dims=(), start_index_map=(1, 2),
            operand_batching_dims=(0,), start_indices_batching_dims=(0,))
        g = jax.lax.gather(vp, starts, dn, slice_sizes=(1, 2, 2, hd), mode="clip")
        g = g.reshape(b, heads, q, p, 2, 2, hd).transpose(0, 2, 1, 3, 4, 5, 6)
        return mix(g, fx, fy, x0, y0)

    @jax.jit
    def vpair_gather(vm, gx, gy):
        """Vertical pairing: pm[y, x] = [vm[y, x], vm[y+1, x]] -> one
        contiguous (1, 1, 2, 2*hd) = 256 B descriptor per sample."""
        x0, y0, fx, fy = corners(gx, gy)
        vp = jnp.pad(vm, ((0, 0), (1, 2), (1, 1), (0, 0)))
        pm = jnp.concatenate([vp[:, :-1], vp[:, 1:]], axis=-1)  # (BH, H+2, W+2, 2hd)
        xi = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1
        yi = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
        starts = jnp.stack([yi, xi], -1).transpose(0, 2, 1, 3, 4).reshape(b * heads, q * p, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3, 4), collapsed_slice_dims=(), start_index_map=(1, 2),
            operand_batching_dims=(0,), start_indices_batching_dims=(0,))
        g = jax.lax.gather(pm, starts, dn, slice_sizes=(1, 1, 2, 2 * hd), mode="clip")
        # (BH, QP, 1, 2, 2hd) -> corners [dy][dx]
        g = g.reshape(b, heads, q, p, 2, 2, hd).transpose(0, 2, 1, 3, 5, 4, 6)
        # layout: last reshape gives [dx, dy] -> transpose to [dy, dx]
        return mix(g, fx, fy, x0, y0)

    def build_full_pair(vm):
        """(BH, H+2, W+2, 4*hd): channel = [y0x0, y0x1, y1x0, y1x1] patches.
        Exactly 128 bf16 lanes -> one aligned 256 B descriptor per sample,
        and no extra HBM vs the lane-padded hd=32 map."""
        vp = jnp.pad(vm, ((0, 0), (1, 2), (1, 2), (0, 0)))
        return jnp.concatenate(
            [vp[:, :-1, :-1], vp[:, :-1, 1:], vp[:, 1:, :-1], vp[:, 1:, 1:]], axis=-1)

    def fpair_sample(pm, gx, gy):
        x0, y0, fx, fy = corners(gx, gy)
        xi = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1
        yi = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
        starts = jnp.stack([yi, xi], -1).transpose(0, 2, 1, 3, 4).reshape(b * heads, q * p, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3, 4), collapsed_slice_dims=(), start_index_map=(1, 2),
            operand_batching_dims=(0,), start_indices_batching_dims=(0,))
        g = jax.lax.gather(pm, starts, dn, slice_sizes=(1, 1, 1, 4 * hd), mode="clip")
        # channel = [ (dy, dx) = (0,0), (0,1), (1,0), (1,1) ] x hd
        g = g.reshape(b, heads, q, p, 2, 2, hd).transpose(0, 2, 1, 3, 4, 5, 6)
        return mix(g, fx, fy, x0, y0)

    fpair_e2e = jax.jit(lambda vm, gx, gy: fpair_sample(build_full_pair(vm), gx, gy))
    fpair_gather_only = jax.jit(fpair_sample)
    build_only = jax.jit(build_full_pair)

    @jax.jit
    def patch_gather_only(vp, gx, gy):
        """Patch gather with the padded map prebuilt (isolates gather+mix)."""
        x0, y0, fx, fy = corners(gx, gy)
        xi = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1
        yi = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
        starts = jnp.stack([yi, xi], -1).transpose(0, 2, 1, 3, 4).reshape(b * heads, q * p, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3, 4), collapsed_slice_dims=(), start_index_map=(1, 2),
            operand_batching_dims=(0,), start_indices_batching_dims=(0,))
        g = jax.lax.gather(vp, starts, dn, slice_sizes=(1, 2, 2, hd), mode="clip")
        g = g.reshape(b, heads, q, p, 2, 2, hd).transpose(0, 2, 1, 3, 4, 5, 6)
        return mix(g, fx, fy, x0, y0)

    print(f"level-0 scale: map {h}x{w}, {q} queries x {p} points x {heads} heads, bf16")
    t_patch = timed("patch gather (round-1 production)", lambda: patch_gather(vm, gx, gy), args.iters)
    t_vpair = timed("vertical-paired gather", lambda: vpair_gather(vm, gx, gy), args.iters)
    t_fpair = timed("full-paired gather (e2e incl. build)", lambda: fpair_e2e(vm, gx, gy), args.iters)
    pm = jax.block_until_ready(build_only(vm))
    timed("full-paired build only", lambda: build_only(vm), args.iters)
    timed("full-paired gather only (map prebuilt)", lambda: fpair_gather_only(pm, gx, gy), args.iters)
    vp = jax.block_until_ready(jnp.pad(vm, ((0, 0), (1, 1), (1, 1), (0, 0))))
    timed("patch gather only (pad prebuilt)", lambda: patch_gather_only(vp, gx, gy), args.iters)

    a = np.asarray(patch_gather(vm, gx, gy), np.float32)
    for name, f in [("vpair", vpair_gather), ("fpair", fpair_e2e)]:
        bb = np.asarray(f(vm, gx, gy), np.float32)
        print(f"max |patch - {name}| = {np.max(np.abs(a - bb)):.2e}")
    print(f"fpair speedup vs patch: {t_patch / t_fpair:.2f}x")

    # locality probe: encoder queries are raster pixels sampling near their
    # own centers (trained offsets are a few cells) — are near-sorted indices
    # faster than the uniform-random ones above?
    qy = np.repeat(np.arange(h), w + 0)[:q] if h * w >= q else None
    base_y = np.asarray(np.unravel_index(np.arange(q) % (h * w), (h, w)))
    ly = base_y[0][:, None, None] + rng.normal(0, 2.0, (q, heads, p))
    lx = base_y[1][:, None, None] + rng.normal(0, 2.0, (q, heads, p))
    lgy = jnp.asarray(ly[None], jnp.float32)
    lgx = jnp.asarray(lx[None], jnp.float32)
    timed("patch gather, LOCAL raster indices", lambda: patch_gather(vm, lgx, lgy), args.iters)


if __name__ == "__main__":
    main()
