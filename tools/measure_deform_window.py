"""Quantify the tile-windowed deformable kernel's deviation from the exact op.

The default TPU encoder path (kernels/deform_window.py) samples each level
through per-tile VMEM windows: samples within R = T-1 cells of the query's
tile are exact; in-map samples beyond R clamp to the window edge; fully
out-of-map samples are 0 (matching the original CUDA op's zero padding,
reference: Grounding-DINO MultiScaleDeformableAttention, SURVEY.md §2.3).

Two measurements, recorded in PARITY.md:

1. KERNEL-LEVEL, production level shapes ((800, 1072) pyramid): gaussian
   offset distributions of increasing scale sigma (cells) around the raster
   centers -> out-of-window fraction and output error vs the exact path.
   Trained deformable-DETR-family offsets concentrate within a few cells
   (the init bias spans 1..n_points=4 cells; published offset visualizations
   stay within ~1 level stride), so sigma <= 4 is the realistic regime.

2. FULL-MODEL: GDINO forward (L0 32x48, the same T=16 / R=15 window geometry
   as production) with the encoder's predicted-offset scale swept via a
   multiplier on the sampling_offsets parameters -> end-to-end box/logit
   deltas and top-K selection agreement between windowed and exact paths.

Run on CPU (BFF_PLATFORM=cpu, Pallas interpreter — same math) or on TPU
(real kernel).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("BFF_PLATFORM") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from beyondff_tpu.kernels import deform_window as dw  # noqa: E402
from beyondff_tpu.kernels.dispatch import on_tpu  # noqa: E402
from beyondff_tpu.models.gdino import deformable  # noqa: E402

SHAPES_800 = ((100, 134), (50, 67), (25, 34), (13, 17))


def _centers(shapes):
    cs = []
    for h, w in shapes:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        cs.append(np.stack(np.meshgrid(xs, ys, indexing="xy"), -1).reshape(-1, 2))
    return np.concatenate(cs, 0)


def kernel_level(rng, sigmas, heads=2, hd=8, p=4, interpret=None,
                 tiles=(16, 8)):
    if interpret is None:
        interpret = not on_tpu()
    shapes = SHAPES_800
    centers = _centers(shapes)
    q = centers.shape[0]
    value = rng.normal(size=(1, q, heads, hd)).astype(np.float32)
    print(f"# kernel-level, shapes={shapes}, Q={q}, heads={heads}, "
          f"p={p}, tiles={tiles}, interpret={interpret}", flush=True)
    print("level sigma_cells  frac_beyond_R  mean_abs_err  max_abs_err  rel_l2",
          flush=True)
    for level, tile in [(0, tiles[0]), (1, tiles[1])]:
        h, w = shapes[level]
        assign = dw.build_assignment(shapes, level, tile)
        radius = tile - 1
        v = value[:, sum(hh * ww for hh, ww in shapes[:level]):][:, : h * w]
        for sigma in sigmas:
            off = rng.normal(0, sigma, (1, q, heads, p, 2)).astype(np.float32)
            locs1 = np.zeros((1, q, heads, 1, p, 2), np.float32)
            locs1[:, :, :, 0, :, 0] = centers[None, :, None, None, 0] + off[..., 0] / w
            locs1[:, :, :, 0, :, 1] = centers[None, :, None, None, 1] + off[..., 1] / h
            aw = rng.uniform(0.1, 1.0, (1, q, heads, 1, p)).astype(np.float32)
            aw /= aw.sum((-1, -2), keepdims=True)

            gx = locs1[:, :, :, 0, :, 0] * w - 0.5
            gy = locs1[:, :, :, 0, :, 1] * h - 0.5
            got = np.asarray(dw.sample_level_windowed(
                jnp.asarray(v), jnp.asarray(gx), jnp.asarray(gy),
                jnp.asarray(aw[:, :, :, 0]), assign, h, w,
                interpret=interpret))
            # exact single-level reference
            want = np.asarray(deformable.ms_deform_attn(
                jnp.asarray(v), [(h, w)], jnp.asarray(locs1),
                jnp.asarray(aw))).reshape(got.shape)
            err = np.abs(got - want)
            beyond = float((np.abs(off) > radius).any(-1).mean())
            rel = float(np.linalg.norm(got - want) / (np.linalg.norm(want) + 1e-12))
            print(f"L{level}    {sigma:5.1f}       {beyond:.4f}        "
                  f"{err.mean():.2e}      {err.max():.2e}    {rel:.2e}", flush=True)


def full_model(rng, alphas):
    from beyondff_tpu.models.gdino import GroundingDINO, model as gdino_model
    from beyondff_tpu.models.gdino import bert as bert_mod, swin as swin_mod

    cfg = gdino_model.GDINOConfig(
        swin=swin_mod.PRESETS["test"], bert=bert_mod.PRESETS["test"],
        hidden=32, heads=4, levels=3, enc_layers=2, dec_layers=2,
        ffn_dim=64, num_queries=32, max_text_len=16,
        image_size=(256, 384))  # L0 = 32x48: T=16 window, R=15 (production geometry)
    g = GroundingDINO.create(cfg, seed=0)
    gh, gw = cfg.image_size
    img = jnp.asarray(rng.normal(size=(1, gh, gw, 3)), jnp.float32)
    t = 8
    ids = jnp.asarray(rng.integers(1, cfg.bert.vocab_size, (1, t)), jnp.int32)
    sm = jnp.ones((1, t, t), bool)
    pm = jnp.ones((1, t), bool)
    pos = jnp.zeros((1, t), jnp.int32)

    print("\n# full-model, L0 32x48 (T=16, R=15), offsets scaled by alpha")
    print("alpha  max|dbox|   max|dlogit|  topk_overlap")
    base = g.params
    for alpha in alphas:
        params = jax.tree_util.tree_map(lambda x: x, base)
        for li in range(cfg.enc_layers):
            so = params["params"][f"enc{li}"]["deform"]["sampling_offsets"]
            so["kernel"] = so["kernel"] * alpha
            so["bias"] = so["bias"] * alpha
        os.environ["BFF_DEFORM_WINDOWED"] = "0"
        exact_logits, exact_boxes = g.module.apply(params, img, ids, sm, pm, pos)
        os.environ["BFF_DEFORM_WINDOWED"] = "1"
        win_logits, win_boxes = g.module.apply(params, img, ids, sm, pm, pos)
        os.environ.pop("BFF_DEFORM_WINDOWED", None)
        dbox = float(np.abs(np.asarray(win_boxes) - np.asarray(exact_boxes)).max())
        dlog = float(np.abs(np.asarray(win_logits) - np.asarray(exact_logits)).max())
        # top-8 query agreement by score
        se = np.asarray(jax.nn.sigmoid(exact_logits).max(-1))[0]
        sw = np.asarray(jax.nn.sigmoid(win_logits).max(-1))[0]
        te = set(np.argsort(se)[-8:].tolist())
        tw = set(np.argsort(sw)[-8:].tolist())
        ov = len(te & tw) / 8.0
        print(f"{alpha:5.2f}  {dbox:.2e}   {dlog:.2e}     {ov:.2f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sigmas", default="1,2,4,8,16,32")
    ap.add_argument("--alphas", default="0.05,0.25,1.0,4.0")
    ap.add_argument("--tiles", default="16,8",
                    help="window tile for the two large levels, e.g. 8,4")
    ap.add_argument("--skip-full", action="store_true")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    kernel_level(rng, [float(s) for s in args.sigmas.split(",")],
                 tiles=tuple(int(t) for t in args.tiles.split(",")))
    if not args.skip_full:
        full_model(rng, [float(a) for a in args.alphas.split(",")])


if __name__ == "__main__":
    main()
