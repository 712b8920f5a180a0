"""Multi-scale deformable attention as pure XLA (bilinear gathers).

The reference depends on Grounding-DINO's hand-written CUDA
``MultiScaleDeformableAttention`` op (SURVEY.md §2.3). On TPU the same math —
per query, per head: sample K points from each feature level at predicted
fractional locations and blend with predicted weights — lowers cleanly to
four gathers + a weighted sum per level, which XLA fuses; no custom kernel is
required for correctness. (A Pallas variant can slot in behind the same
function signature for further fusion.)

Shapes follow the Deformable-DETR convention:
  value:            (B, sum_l H_l*W_l, heads, head_dim)
  sampling_locs:    (B, Q, heads, levels, points, 2)  in [0, 1] per level
  attention_weights:(B, Q, heads, levels, points)     softmaxed over l*p
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


# levels with H*W at or below this use the matmul-interpolation path
_MATMUL_LEVEL_MAX = 1024


def _interp_matmul(v, h, w, b, heads, head_dim, gx, gy, x0, y0, aw, dtype):
    """Bilinear sampling via separable row/column weight matmuls.

    ``bias-free`` corner handling: a floor index outside [0, size) matches no
    one-hot row, so out-of-map corners contribute exactly 0 (zero padding).
    Attention weights fold into the column matrix, so the (B, Q, heads, hd)
    level contribution comes straight out of the second contraction.

    MEASURED dead end (do not re-attempt without a full-model A/B): a
    combined-2D-weight form — W2[q, h, (r, c)] = sum_p wy_p[r]*(wx_p*aw_p)[c]
    then one (Q, H*W) x (H*W, hd) contraction, the window kernel's
    formulation — profiled 5.2 -> 1.3 ms standalone at encoder shapes but
    REGRESSED the full GDINO forward 97.9 -> 162.1 ms on a v5e
    (tools/bench_gdino_ab.py, consistent +62 ms across window variants and
    the exact-gather config, which also routes small levels here): the VPU
    outer-product building the (B, Q, heads, H*W) map doesn't fuse with the
    surrounding enhancer the way the separable one-hot builds do.
    """
    fy = (gy - y0).astype(dtype)
    fx = (gx - x0).astype(dtype)
    y0i = jnp.clip(y0, -2, h + 1).astype(jnp.int32)[..., None]  # (B,Q,heads,P,1)
    x0i = jnp.clip(x0, -2, w + 1).astype(jnp.int32)[..., None]
    rows = jnp.arange(h, dtype=jnp.int32)
    cols = jnp.arange(w, dtype=jnp.int32)
    wy = ((1 - fy)[..., None] * (rows == y0i)
          + fy[..., None] * (rows == y0i + 1)).astype(dtype)  # (B,Q,heads,P,H)
    wx = ((1 - fx)[..., None] * (cols == x0i)
          + fx[..., None] * (cols == x0i + 1)).astype(dtype)  # (B,Q,heads,P,W)
    wx = wx * aw[..., None].astype(dtype)  # fold attention weights

    vh = v.reshape(b, h, w, heads, head_dim).transpose(0, 3, 1, 2, 4)
    vh = vh.reshape(b, heads, h, w * head_dim)
    # dtype-following accumulation: each output sums only 2 (rows) x 2 (cols)
    # bilinear taps per point, so bf16 accumulation is exact enough, and
    # bf16 x bf16 -> f32 dots are unsupported on some CPU backends
    t = jnp.einsum("bqhpr,bhrx->bqhpx", wy, vh)
    t = t.reshape(*t.shape[:-1], w, head_dim)
    contrib = jnp.einsum("bqhpw,bqhpwd->bqhd", wx, t)
    return contrib.astype(dtype)


def _use_windowed(windowed: bool) -> bool:
    """Config-requested windowed sampling, gated to TPU-class backends with
    an env override (BFF_DEFORM_WINDOWED=0 forces the exact path, =1 forces
    the kernel even off-TPU via the Pallas interpreter — tests)."""
    import os

    env = os.environ.get("BFF_DEFORM_WINDOWED")
    if env is not None:
        # the env var only gates callers that requested windowing — it never
        # force-enables the kernel for non-raster queries (decoder layers)
        return windowed and env != "0"
    if not windowed:
        return False
    from beyondff_tpu.kernels.dispatch import on_tpu

    return on_tpu()


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locs: jnp.ndarray,
    attention_weights: jnp.ndarray,
    windowed: bool = False,
) -> jnp.ndarray:
    """Core sampling. Returns (B, Q, heads*head_dim).

    ``windowed=True`` is valid ONLY when the queries are the standard
    all-level raster (the encoder token order): the two large levels then
    route through the tile-windowed MXU kernel (kernels/deform_window.py);
    offsets beyond the tile window contribute 0 (documented deviation there).
    """
    b, _, heads, head_dim = value.shape
    q = sampling_locs.shape[1]
    n_levels = len(spatial_shapes)

    # split the flattened value into per-level maps
    sizes = [h * w for h, w in spatial_shapes]
    offsets = [0]
    for s in sizes[:-1]:
        offsets.append(offsets[-1] + s)

    use_win = _use_windowed(windowed) and q == sum(sizes)
    if use_win:
        from beyondff_tpu.kernels import dispatch as _dispatch
        from beyondff_tpu.kernels import deform_window as dw

        interp = not _dispatch.on_tpu()
        shapes_key = tuple((int(h), int(w)) for h, w in spatial_shapes)

    p_pts = sampling_locs.shape[4]
    out = jnp.zeros((b, q, heads, head_dim), value.dtype)
    for li, (h, w) in enumerate(spatial_shapes):
        v = jax.lax.dynamic_slice_in_dim(value, offsets[li], sizes[li], axis=1)
        # locations for this level: (B, Q, heads, points, 2) in [0,1]
        loc = sampling_locs[:, :, :, li]
        # align_corners=False convention: x*W - 0.5
        gx = loc[..., 0] * w - 0.5
        gy = loc[..., 1] * h - 0.5
        x0 = jnp.floor(gx)
        y0 = jnp.floor(gy)

        if use_win and h * w <= _MATMUL_LEVEL_MAX:
            # Small levels through the SAME tile-window kernel (default on):
            # the separable matmul-interp path measured 5.28 (L2 25x34) +
            # 3.27 ms (L3 13x17) per enhancer layer standalone at (800,1072)
            # — MORE than the large levels' windowed kernels (4.89 + 3.21,
            # tools/profile_enhancer.py) — because its one-hot contraction
            # runs at K = H (25/13) against a 128-lane MXU tile. The window
            # kernel's combined-2D form contracts at K = window cells (768).
            # Radius semantics are per-LEVEL cells, so tile 8 gives the same
            # R=7 deviation bound the large levels carry (PARITY.md); for
            # these maps the window then covers most of the level outright.
            import os as _os

            if _os.environ.get("BFF_DEFORM_SMALL_KERNEL", "1") != "0":
                tile = int(_os.environ.get("BFF_DEFORM_TILE_SMALL", "8"))
                radius = int(_os.environ.get("BFF_DEFORM_R_SMALL", str(tile)))
                assign = dw.build_assignment(shapes_key, li, tile)
                out = out + dw.sample_level_windowed(
                    v, gx, gy, attention_weights[:, :, :, li], assign, h, w,
                    radius=radius, interpret=interp)
                continue

        if use_win and h * w > _MATMUL_LEVEL_MAX:
            # Both large levels keep minimum reach 7 cells. Measured
            # deviation (tools/measure_deform_window.py, PARITY.md): R=7 is
            # near-exact through sigma=2-cell offsets (rel err <1%),
            # marginal at sigma=3 (8%), and the full-model check at R=7
            # window geometry and trained-like offset scales shows max box
            # delta ~1e-6 with top-K overlap 1.00. Wide windows for
            # accuracy-critical runs: BFF_DEFORM_R1/R2=16 (R=15, exact
            # through sigma=4; measured ~+6 ms/forward at the old tile-16
            # coupling). R=3 measured too lossy (31% rel err at sigma=2).
            import os as _os

            # L0 default tile 16 with DECOUPLED radius 8: same minimum reach
            # (radius-1 = 7 cells) as the historic tile-8/3x window, but 1/4
            # the tiles so the materialized window array shrinks ~10x —
            # measured 86.8 -> 80.4 ms full forward (tools/bench_gdino_ab.py;
            # tile2=16 +3.0 ms and tile1=32 +9.0 ms both regress)
            if h * w == max(sizes):
                tile1_env = _os.environ.get("BFF_DEFORM_TILE1")
                tile = int(tile1_env) if tile1_env is not None else 16
                # Radius defaults to the tile when TILE1 is set explicitly
                # (same rule as R2/R_SMALL, so BFF_DEFORM_TILE1=16 alone gives
                # the wide R=15-reach window); only the built-in tile-16
                # default keeps the measured radius-8 geometry.
                default_r1 = str(tile) if tile1_env is not None else "8"
                radius = int(_os.environ.get("BFF_DEFORM_R1", default_r1))
            else:
                tile = int(_os.environ.get("BFF_DEFORM_TILE2", "8"))
                radius = int(_os.environ.get("BFF_DEFORM_R2", str(tile)))
            assign = dw.build_assignment(shapes_key, li, tile)
            out = out + dw.sample_level_windowed(
                v, gx, gy, attention_weights[:, :, :, li], assign, h, w,
                radius=radius, interpret=interp)
            continue

        if h * w <= _MATMUL_LEVEL_MAX:
            # small levels: separable interpolation as two MXU matmuls beats
            # the random gather (which runs far below HBM bandwidth on TPU)
            out = out + _interp_matmul(
                v, h, w, b, heads, head_dim, gx, gy, x0, y0,
                attention_weights[:, :, :, li], value.dtype)
            continue

        # (B*heads, H, W, hd): one patch gather fetches all 4 bilinear corners
        vm = v.reshape(b, h, w, heads, head_dim).transpose(0, 3, 1, 2, 4)
        vm = vm.reshape(b * heads, h, w, head_dim)
        fx = (gx - x0)[..., None]
        fy = (gy - y0)[..., None]

        # 2x2 patch gather over a zero-padded map: one gather fetches all four
        # bilinear corners exactly (the original op zero-pads outside the map;
        # out-of-map corner weights are additionally zeroed below, so points
        # sampling far outside contribute nothing either way).
        # Measured alternative (v5e): pre-pairing each 2x2 neighborhood into a
        # contiguous 4*hd row and gathering (1, 1, 128) is 1.7x faster
        # standalone (15.2 -> 9.0 ms per large level) but 15% SLOWER in the
        # full model (186.8 -> 214.1 ms) — the per-layer paired-map
        # construction and layout changes cost more than the gather saves
        # once interleaved with the rest of the enhancer. Keep the strided
        # patch gather.
        vm = jnp.pad(vm, ((0, 0), (1, 1), (1, 1), (0, 0)))
        xi = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1  # shift into padded frame
        yi = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
        starts = jnp.stack([yi, xi], -1).transpose(0, 2, 1, 3, 4)
        starts = starts.reshape(b * heads, q * p_pts, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3, 4), collapsed_slice_dims=(),
            start_index_map=(1, 2),
            operand_batching_dims=(0,), start_indices_batching_dims=(0,),
        )
        g = jax.lax.gather(vm, starts, dn, slice_sizes=(1, 2, 2, head_dim), mode="clip")
        g = g.reshape(b, heads, q, p_pts, 2, 2, head_dim).transpose(0, 2, 1, 3, 4, 5, 6)

        def corner_w(dx, dy):
            wx = fx if dx else (1 - fx)
            wy = fy if dy else (1 - fy)
            inside = ((x0 + dx >= 0) & (x0 + dx < w) & (y0 + dy >= 0) & (y0 + dy < h))
            return wx * wy * inside[..., None]

        sampled = (
            g[..., 0, 0, :] * corner_w(0, 0)
            + g[..., 0, 1, :] * corner_w(1, 0)
            + g[..., 1, 0, :] * corner_w(0, 1)
            + g[..., 1, 1, :] * corner_w(1, 1)
        )  # (B, Q, heads, P, hd)
        wgt = attention_weights[:, :, :, li][..., None]
        out = out + jnp.sum(sampled * wgt, axis=3)

    return out.reshape(b, q, heads * head_dim)


class MSDeformAttn(nn.Module):
    """Deformable attention layer: projections + predicted offsets/weights."""

    dim: int = 256
    heads: int = 8
    levels: int = 4
    points: int = 4
    dtype: jnp.dtype = jnp.float32
    # tile-windowed MXU sampling for large levels; set ONLY where queries are
    # the all-level raster (the encoder; decoder refs move per layer)
    windowed: bool = False

    @nn.compact
    def __call__(self, query, reference_points, value, spatial_shapes, value_mask=None):
        """query: (B, Q, dim); reference_points: (B, Q, levels, 2 or 4) in [0,1];
        value: (B, sum HW, dim)."""
        b, q, _ = query.shape
        head_dim = self.dim // self.heads
        v = nn.Dense(self.dim, dtype=self.dtype, name="value_proj")(value)
        if value_mask is not None:
            v = jnp.where(value_mask[..., None], v, 0.0)
        v = v.reshape(b, -1, self.heads, head_dim)

        offsets = nn.Dense(self.heads * self.levels * self.points * 2, dtype=self.dtype,
                           name="sampling_offsets")(query)
        offsets = offsets.reshape(b, q, self.heads, self.levels, self.points, 2)
        weights = nn.Dense(self.heads * self.levels * self.points, dtype=self.dtype,
                           name="attention_weights")(query)
        weights = jax.nn.softmax(
            weights.reshape(b, q, self.heads, self.levels * self.points).astype(jnp.float32), -1
        ).astype(self.dtype).reshape(b, q, self.heads, self.levels, self.points)

        shapes_arr = jnp.asarray(spatial_shapes, jnp.float32)  # (levels, 2) as (h, w)
        wh = shapes_arr[:, ::-1][None, None, None, :, None, :]  # (1,1,1,levels,1,2) as (w, h)
        if reference_points.shape[-1] == 2:
            ref = reference_points[:, :, None, :, None, :]  # (B,Q,1,levels,1,2)
            locs = ref + offsets / wh
        else:  # 4d refs (cx, cy, w, h): offsets scaled by box size
            ref_c = reference_points[..., :2][:, :, None, :, None, :]
            ref_wh = reference_points[..., 2:][:, :, None, :, None, :]
            locs = ref_c + offsets / self.points * ref_wh * 0.5
        out = ms_deform_attn(v, spatial_shapes, locs, weights, windowed=self.windowed)
        return nn.Dense(self.dim, dtype=self.dtype, name="output_proj")(out)
