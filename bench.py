#!/usr/bin/env python
"""Headline benchmark: 2D-segmentation frames/sec on one TPU chip.

Measures the per-frame device compute of the seg2d stage with full-size
models — Grounding-DINO (Swin-B) detection forward, CLIP ViT-L/14 crop
scoring, SAM ViT-H image encode + box-prompted decode — batched as the
pipeline runs them. Weights are synthesized on device (identical FLOPs and
memory traffic to converted checkpoints; zero-egress image, and no multi-GB
host->device uploads).

Each model is its own compiled program (cacheable; progress logged to stderr)
and every timing loop is fenced with a host fetch so deferred-execution
backends can't fake completion.

Baseline: the reference averages 35 s per (class, scene) for this stage on an
RTX A5000 at ~350 downsampled frames/scene => ~10 frames/sec
(BASELINE.md: paper Sec. 4). ``vs_baseline`` = our frames/sec / 10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Env knobs: BFF_BENCH_SCALE=small, BFF_BENCH_BATCH, BFF_BENCH_ITERS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_FPS = 10.0  # reference: 35 s/scene at ~350 frames (paper Sec. 4)


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def timed(name, fn, sync, iters):
    """Median-free simple timing: warmup (real, fenced), then `iters` fenced runs."""
    import jax

    t0 = time.time()
    out = fn()
    sync(out)
    log(f"{name}: compile+first-run {time.time() - t0:.1f}s")
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    sync(out)
    dt = (time.time() - t0) / iters
    log(f"{name}: steady {dt * 1000:.1f} ms/iter")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from beyondff_tpu.models import clip as clip_mod
    from beyondff_tpu.models import sam as sam_mod
    from beyondff_tpu.models.gdino import GroundingDINO, model as gdino_model

    small = os.environ.get("BFF_BENCH_SCALE") == "small"
    # batch 1 measured optimal on v5e: the dominant ops (deformable gathers,
    # SAM windowed attention) are memory-bound and don't amortize with batch
    batch = int(os.environ.get("BFF_BENCH_BATCH", "1"))
    iters = int(os.environ.get("BFF_BENCH_ITERS", "8"))
    crops_per_frame = 4
    boxes_per_frame = 4
    dtype = jnp.bfloat16

    def sync(x):
        # force true completion: fetch a scalar derived from the outputs
        leaves = jax.tree_util.tree_leaves(x)
        float(jax.device_get(leaves[0].reshape(-1)[0].astype(jnp.float32)))

    t_setup = time.time()
    if small:
        sam = sam_mod.SAM.create("test", dtype=dtype, device_fill=True)
        clip = clip_mod.CLIP.create("test", dtype=dtype, device_fill=True)
        gdino = GroundingDINO.create("test", dtype=dtype, device_fill=True)
    else:
        sam = sam_mod.SAM.create("vit_h", dtype=dtype, device_fill=True)
        clip = clip_mod.CLIP.create("ViT-L/14", dtype=dtype, device_fill=True)
        gdino = GroundingDINO.create(
            gdino_model.GDINOConfig(image_size=(800, 1200)), dtype=dtype, device_fill=True)
    log(f"models built in {time.time() - t_setup:.1f}s")

    rng = np.random.default_rng(0)
    gh, gw = gdino.cfg.image_size
    g_img = jnp.asarray(rng.normal(size=(batch, gh, gw, 3)).astype(np.float32))
    t_len = 8
    ids = jnp.asarray(rng.integers(1, gdino.cfg.bert.vocab_size, (batch, t_len)), jnp.int32)
    self_mask = jnp.ones((batch, t_len, t_len), bool)
    pad_mask = jnp.ones((batch, t_len), bool)
    pos_ids = jnp.zeros((batch, t_len), jnp.int32)

    s = sam.cfg.img_size
    s_img = jnp.asarray(rng.normal(size=(batch, s, s, 3)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0, s, (boxes_per_frame, 4)).astype(np.float32))

    n_crop = clip.cfg.image_resolution
    crops = jnp.asarray(
        rng.normal(size=(batch * crops_per_frame, n_crop, n_crop, 3)).astype(np.float32))

    gdino_fwd = jax.jit(lambda p, *a: gdino.module.apply(p, *a))
    t_gdino = timed(
        "gdino(swinb)",
        lambda: gdino_fwd(gdino.params, g_img, ids, self_mask, pad_mask, pos_ids),
        sync, iters)

    t_clip = timed(
        f"clip(ViT-L)x{batch * crops_per_frame}crops",
        lambda: clip.encode_image(crops), sync, iters)

    t_sam_enc = timed("sam(vit_h) encode", lambda: sam.encode_image(s_img), sync, iters)

    emb0 = sam.encode_image(s_img)[0]
    t_sam_dec = timed(
        f"sam decode x{boxes_per_frame}boxes",
        lambda: sam.decode_boxes(emb0, boxes), sync, iters)

    per_batch = t_gdino + t_clip + t_sam_enc + t_sam_dec
    fps = batch / per_batch
    log(f"total per-frame device time {per_batch / batch * 1000:.1f} ms")

    print(json.dumps({
        "metric": "seg2d_frames_per_sec",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
