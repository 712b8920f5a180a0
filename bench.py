#!/usr/bin/env python
"""Headline benchmark: 2D-segmentation frames/sec on one TPU chip.

Measures the per-frame device compute of the seg2d stage with full-size
models — Grounding-DINO (Swin-B) detection forward, CLIP ViT-L/14 crop
scoring, SAM ViT-H image encode + box-prompted decode — batched as the
pipeline runs them. Random weights (zero-egress image): identical FLOPs and
memory traffic to converted checkpoints.

Baseline: the reference averages 35 s per (class, scene) for this stage on an
RTX A5000 at ~350 downsampled frames/scene => ~10 frames/sec
(BASELINE.md: paper Sec. 4). ``vs_baseline`` = our frames/sec / 10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Env knobs: BFF_BENCH_SCALE=small for a smoke-size run, BFF_BENCH_BATCH,
BFF_BENCH_ITERS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_FPS = 10.0  # reference: 35 s/scene at ~350 frames (paper Sec. 4)


def main():
    import jax
    import jax.numpy as jnp

    from beyondff_tpu.models import clip as clip_mod
    from beyondff_tpu.models import sam as sam_mod
    from beyondff_tpu.models.gdino import GroundingDINO, model as gdino_model

    small = os.environ.get("BFF_BENCH_SCALE") == "small"
    batch = int(os.environ.get("BFF_BENCH_BATCH", "4"))
    iters = int(os.environ.get("BFF_BENCH_ITERS", "5"))
    crops_per_frame = 4
    boxes_per_frame = 4
    dtype = jnp.bfloat16

    t_setup = time.time()
    if small:
        sam = sam_mod.SAM.create("test", dtype=dtype)
        clip = clip_mod.CLIP.create("test", dtype=dtype)
        gdino = GroundingDINO.create("test", dtype=dtype)
    else:
        sam = sam_mod.SAM.create("vit_h", dtype=dtype)
        clip = clip_mod.CLIP.create("ViT-L/14", dtype=dtype)
        gdino = GroundingDINO.create(
            gdino_model.GDINOConfig(image_size=(800, 1200)), dtype=dtype)
    print(f"# models built in {time.time() - t_setup:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    gh, gw = gdino.cfg.image_size
    g_img = jnp.asarray(rng.normal(size=(batch, gh, gw, 3)), jnp.float32)
    t_len = 8
    ids = jnp.asarray(rng.integers(1, gdino.cfg.bert.vocab_size, (batch, t_len)), jnp.int32)
    self_mask = jnp.ones((batch, t_len, t_len), bool)
    pad_mask = jnp.ones((batch, t_len), bool)
    pos_ids = jnp.zeros((batch, t_len), jnp.int32)

    s = sam.cfg.img_size
    s_img = jnp.asarray(rng.normal(size=(batch, s, s, 3)), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0, s, (boxes_per_frame, 4)), jnp.float32)

    n_crop = clip.cfg.image_resolution
    crops = jnp.asarray(
        rng.normal(size=(batch * crops_per_frame, n_crop, n_crop, 3)), jnp.float32)

    def frame_step(g_img, ids, self_mask, pad_mask, pos_ids, s_img, boxes, crops):
        logits, det_boxes = gdino.module.apply(
            gdino.params, g_img, ids, self_mask, pad_mask, pos_ids)
        crop_feats = clip.module.apply(clip.params, crops,
                                       method=clip_mod.CLIPModule.encode_image)
        emb = sam.module.apply(sam.params, s_img, method=sam_mod.SAMModule.encode)
        masks, iou = sam.module.apply(sam.params, emb[0], boxes,
                                      method=sam_mod.SAMModule.decode_boxes)
        return (logits.max(), det_boxes.sum(), crop_feats.sum(), masks.sum(), iou.sum())

    step = jax.jit(frame_step)
    args = (g_img, ids, self_mask, pad_mask, pos_ids, s_img, boxes, crops)

    t0 = time.time()
    jax.block_until_ready(step(*args))
    print(f"# compile+first-run {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    for _ in range(iters):
        out = step(*args)
    jax.block_until_ready(out)
    dt = time.time() - t0
    fps = batch * iters / dt

    print(json.dumps({
        "metric": "seg2d_frames_per_sec",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
