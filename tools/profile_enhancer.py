"""Attribute one GDINO enhancer layer's time by component, at production
shapes ((800, 1072) input -> levels (100,134),(50,67),(25,34),(13,17),
Q = 17821, d = 256, 8 heads, P = 4, bf16).

Times each sub-block standalone (jitted, fenced, best-of-two):
  - the full EnhancerLayer (cross-check vs profile_gdino_blocks' 11.9 ms)
  - MSDeformAttn (projections + sampling) and its pieces:
    windowed kernel per large level, matmul-interp per small level
  - BiAttention fusion, text enhancer part, image FFN

    python tools/profile_enhancer.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SHAPES = ((100, 134), (50, 67), (25, 34), (13, 17))  # (800,1072) swin levels


def main():
    import jax
    import jax.numpy as jnp

    from beyondff_tpu.kernels import deform_window as dw
    from beyondff_tpu.models.gdino import deformable
    from beyondff_tpu.models.gdino.model import (
        BiAttention, EnhancerLayer, GDINOConfig, sine_position_embedding)

    iters = int(os.environ.get("BFF_ENH_ITERS", "20"))
    dtype = jnp.bfloat16
    cfg = GDINOConfig()
    d, heads, p_pts = cfg.hidden, cfg.heads, cfg.enc_points
    hd = d // heads
    q = sum(h * w for h, w in SHAPES)
    t_len = 8
    key = jax.random.PRNGKey(0)

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        float(jax.device_get(leaves[0].reshape(-1)[0].astype(jnp.float32)))

    def timed(name, fn, *args):
        f = jax.jit(fn)
        t0 = time.time()
        sync(f(*args))
        print(f"# {name}: compile {time.time() - t0:.1f}s", flush=True)
        best = None
        for _ in range(2):
            t0 = time.time()
            out = None
            for _ in range(iters):
                out = f(*args)
            sync(out)
            dt = (time.time() - t0) / iters
            best = dt if best is None else min(best, dt)
        print(f"{name:46s} {best * 1000:8.2f} ms", flush=True)
        return best

    ks = jax.random.split(key, 12)
    img = jax.random.normal(ks[0], (1, q, d), dtype)
    pos = jax.random.normal(ks[1], (1, q, d), dtype)
    txt = jax.random.normal(ks[2], (1, t_len, d), dtype)
    txt_mask = jnp.ones((1, t_len), bool)
    tsm = jnp.ones((1, t_len, t_len), bool)
    pos_text = jax.random.normal(ks[3], (1, t_len, d), dtype)
    # per-level normalized reference points (the encoder raster)
    refs = []
    for h, w in SHAPES:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        g = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1).reshape(-1, 2)
        refs.append(g)
    centers = np.concatenate(refs, 0)  # (Q, 2) normalized (x, y)
    ref_points = jnp.asarray(
        np.broadcast_to(centers[None, :, None, :], (1, q, len(SHAPES), 2)).copy(),
        dtype)

    # ---- full enhancer layer (SHAPES closed over: static under jit)
    layer = EnhancerLayer(cfg, dtype=dtype)
    params = jax.jit(lambda k, a, b_, c_, r, m, sm, pt: layer.init(
        k, a, b_, c_, r, SHAPES, m, sm, pt))(
        ks[4], img, pos, txt, ref_points, txt_mask, tsm, pos_text)
    timed("enhancer layer (full)",
          lambda p, a, b_, c_, r, m, sm, pt: layer.apply(
              p, a, b_, c_, r, SHAPES, m, sm, pt),
          params, img, pos, txt, ref_points, txt_mask, tsm, pos_text)

    # ---- deformable sub-block (projections + sampling)
    attn = deformable.MSDeformAttn(d, heads, cfg.levels, p_pts, dtype=dtype,
                                   windowed=True)
    ap = jax.jit(lambda k, a, r, v_: attn.init(k, a, r, v_, SHAPES))(
        ks[5], img, ref_points, img)
    timed("  MSDeformAttn windowed (proj+sample)",
          lambda p, a, r, v_: attn.apply(p, a, r, v_, SHAPES),
          ap, img, ref_points, img)
    attn_x = deformable.MSDeformAttn(d, heads, cfg.levels, p_pts, dtype=dtype,
                                     windowed=False)
    timed("  MSDeformAttn exact    (proj+sample)",
          lambda p, a, r, v_: attn_x.apply(p, a, r, v_, SHAPES),
          ap, img, ref_points, img)

    # ---- sampling only, per level
    v = jax.random.normal(ks[6], (1, q, heads, hd), dtype)
    locs = jax.random.uniform(ks[7], (1, q, heads, cfg.levels, p_pts, 2),
                              jnp.float32).astype(dtype)
    aw = jax.nn.softmax(jax.random.normal(
        ks[8], (1, q, heads, cfg.levels * p_pts), jnp.float32), -1)
    aw = aw.astype(dtype).reshape(1, q, heads, cfg.levels, p_pts)

    sizes = [h * w for h, w in SHAPES]
    offs = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    for li, (h, w) in enumerate(SHAPES):
        vl = jax.lax.dynamic_slice_in_dim(v, int(offs[li]), sizes[li], axis=1)
        loc = locs[:, :, :, li]
        gx = loc[..., 0].astype(jnp.float32) * w - 0.5
        gy = loc[..., 1].astype(jnp.float32) * h - 0.5
        awl = aw[:, :, :, li]
        if h * w > 1024:
            assign = dw.build_assignment(SHAPES, li, 8)
            timed(f"    L{li} windowed kernel ({h}x{w})",
                  lambda vv, a, b_, c_: dw.sample_level_windowed(
                      vv, a, b_, c_, assign, h, w),
                  vl, gx, gy, awl)
        else:
            x0 = jnp.floor(gx)
            y0 = jnp.floor(gy)
            timed(f"    L{li} matmul-interp ({h}x{w})",
                  lambda vv, a, b_, e, f, c_: deformable._interp_matmul(
                      vv, h, w, 1, heads, hd, a, b_, e, f, c_, dtype),
                  vl, gx, gy, x0, y0, awl)

    # ---- fusion
    fusion = BiAttention(d, d, cfg.ffn_dim // 2, heads // 2, dtype=dtype)
    fp = jax.jit(fusion.init)(ks[9], img, txt, txt_mask)
    timed("  BiAttention fusion",
          lambda p, *a: fusion.apply(p, *a), fp, img, txt, txt_mask)

    # ---- image FFN (2048) at Q tokens
    import flax.linen as nn

    class FFN(nn.Module):
        @nn.compact
        def __call__(self, x):
            i = nn.Dense(cfg.ffn_dim, dtype=dtype)(x)
            i = nn.relu(i)
            i = nn.Dense(d, dtype=dtype)(i)
            return nn.LayerNorm(epsilon=1e-5, dtype=dtype)(x + i)

    ffn = FFN()
    fpp = jax.jit(ffn.init)(ks[10], img)
    timed("  image FFN+LN", lambda p, x: ffn.apply(p, x), fpp, img)

    # sine PE of the raster (computed once per forward, not per layer — shown
    # for completeness)
    timed("  sine PE (per forward)",
          lambda c: sine_position_embedding(c, d), ref_points[:, :, 0])


if __name__ == "__main__":
    main()
