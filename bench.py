#!/usr/bin/env python
"""Headline benchmark: 2D-segmentation stage throughput on one TPU chip.

Two measurements, both printed to stderr; the JSON headline is the honest one:

1. **Pipeline wall-clock** (headline): the real ``Segmentor2D.process_scene``
   driver — JPEG load, preprocessing, detection, CLIP crop supervision,
   batched SAM decode, device bit-packing, host downloads, RLE encode — over
   a synthetic 1296x968 scene, in two regimes: every frame detects ("hit",
   boxes calibrated to ~4/frame like a trained model) and no frame detects
   ("miss", detection-only). The headline composes them at a 25% hit rate,
   matching the reference's regime (most frames have no query object;
   paper Sec. 4: 10-70 s/scene, avg 35 s ~= 10 frames/s on an RTX A5000).

2. **Device-compute upper bound** (secondary, comparable to round 1):
   per-model steady-state forward times at fixed shapes.

Weights are synthesized on device (identical FLOPs/memory traffic to
converted checkpoints; zero-egress image, no multi-GB uploads). All timing is
fenced with host fetches (deferred-execution backends can't fake completion).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Env knobs: BFF_BENCH_SCALE=small, BFF_BENCH_FRAMES, BFF_BENCH_HIT_RATE,
BFF_BENCH_BOXES, BFF_BENCH_DEVICES=n (virtual-CPU scaling mode, small scale).
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
    """Best of two measurement rounds: the shared/tunneled chip occasionally
    degrades ~20x for minutes at a time (observed twice in one session);
    min-of-rounds measures the machine, not the co-tenant."""
    import jax  # noqa: F401

    t0 = time.time()
    out = fn()
    sync(out)
    log(f"{name}: compile+first-run {time.time() - t0:.1f}s")
    rounds = []
    for _ in range(2):
        t0 = time.time()
        for _ in range(iters):
            out = fn()
        sync(out)
        rounds.append((time.time() - t0) / iters)
    dt = min(rounds)
    log(f"{name}: steady {dt * 1000:.1f} ms/iter"
        + (f" (rounds {[round(r * 1000, 1) for r in rounds]})"
           if max(rounds) > 1.5 * dt else ""))
    return dt


def make_scene(root, n_frames, width, height):
    """Synthetic scene directory of random JPEG frames (cached)."""
    import cv2

    color = os.path.join(root, "scene0000_00", "color")
    marker = os.path.join(color, f".done_{n_frames}_{width}x{height}")
    if os.path.exists(marker):
        return
    os.makedirs(color, exist_ok=True)
    # stale frames/markers from a different n_frames would silently inflate
    # the scene (process_scene lists the dir) and skew every f/s number
    for f in os.listdir(color):
        os.remove(os.path.join(color, f))
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        img = rng.integers(0, 255, (height, width, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(color, f"{i}.jpg"), img)
    open(marker, "w").close()


def device_compute(models, iters):
    """Round-1-comparable per-model steady forwards at fixed shapes."""
    import jax
    import jax.numpy as jnp

    gdino, clip, sam = models["gdino"], models["clip"], models["sam"]
    crops_per_frame = 4
    boxes_per_frame = 4
    rng = np.random.default_rng(0)

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        float(jax.device_get(leaves[0].reshape(-1)[0].astype(jnp.float32)))

    gh, gw = gdino.cfg.image_size
    g_img = jnp.asarray(rng.normal(size=(1, gh, gw, 3)).astype(np.float32))
    t_len = 8
    ids = jnp.asarray(rng.integers(1, gdino.cfg.bert.vocab_size, (1, t_len)), jnp.int32)
    self_mask = jnp.ones((1, t_len, t_len), bool)
    pad_mask = jnp.ones((1, t_len), bool)
    pos_ids = jnp.zeros((1, t_len), jnp.int32)

    s = sam.cfg.img_size
    s_img = jnp.asarray(rng.normal(size=(1, s, s, 3)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0, s, (boxes_per_frame, 4)).astype(np.float32))
    n_crop = clip.cfg.image_resolution
    crops = jnp.asarray(rng.normal(size=(crops_per_frame, n_crop, n_crop, 3)).astype(np.float32))

    gdino_fwd = jax.jit(lambda p, *a: gdino.module.apply(p, *a))
    t_gdino = timed("gdino(swinb)",
                    lambda: gdino_fwd(gdino.params, g_img, ids, self_mask, pad_mask, pos_ids),
                    sync, iters)
    t_clip = timed(f"clip x{crops_per_frame}crops", lambda: clip.encode_image(crops),
                   sync, iters)
    t_sam_enc = timed("sam encode", lambda: sam.encode_image(s_img), sync, iters)
    emb0 = sam.encode_image(s_img)[0]
    t_sam_dec = timed(f"sam decode x{boxes_per_frame}boxes",
                      lambda: sam.decode_boxes(emb0, boxes), sync, iters)
    per_frame = t_gdino + t_clip + t_sam_enc + t_sam_dec
    log(f"device-compute upper bound: {per_frame * 1000:.1f} ms/frame "
        f"= {1 / per_frame:.2f} frames/s")
    return 1 / per_frame


def fast_variant_compute(iters, dtype):
    """Secondary metric: the reference's fast detector path (YOLO-World +
    EfficientSAM, ~7-8x faster than G-DINO per the paper Sec. 3.2;
    tools/segmentation_2d_yolo_world.py). Device-compute f/s at fixed shapes,
    reported to stderr only — the JSON headline stays the default path."""
    import jax
    import jax.numpy as jnp

    from beyondff_tpu.models import efficientsam, yolo_world

    rng = np.random.default_rng(0)

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        float(jax.device_get(leaves[0].reshape(-1)[0].astype(jnp.float32)))

    yw = yolo_world.YOLOWorld.create("l", dtype=dtype)
    esam = efficientsam.EfficientSAM.create("vits", dtype=dtype)
    h, w = yw.cfg.img_size
    img = jnp.asarray(rng.integers(0, 255, (1, h, w, 3)), jnp.uint8)
    txt = jnp.asarray(rng.normal(size=(2, yw.cfg.text_dim)), jnp.float32)
    t_det = timed("yolo_world(l)",
                  lambda: yw._forward(yw.params, img, txt), sync, iters)
    s = esam.cfg.img_size
    s_img = jnp.asarray(rng.normal(size=(1, s, s, 3)).astype(np.float32))
    t_enc = timed("efficientsam(vits) encode",
                  lambda: esam.encode_image(s_img), sync, iters)
    emb0 = esam.encode_image(s_img)[0]
    boxes = jnp.asarray(rng.uniform(0, s, (4, 4)).astype(np.float32))
    t_dec = timed("efficientsam decode x4boxes(best-of-3)",
                  lambda: esam.decode_boxes_best(emb0, boxes), sync, iters)
    per_frame = t_det + t_enc + t_dec
    log(f"fast-variant device-compute: {per_frame * 1000:.1f} ms/frame "
        f"= {1 / per_frame:.2f} frames/s")
    return 1 / per_frame


def pipeline_wall_clock(models, small):
    """The honest number: process_scene wall-clock in hit/miss regimes."""
    from beyondff_tpu.config import Config
    from beyondff_tpu.pipeline.segmentation_2d import Segmentor2D

    # 96 frames x 2 passes x 2 regimes ~= 60-80 s of measurement: long enough
    # that a transient co-tenant degradation window (CLAUDE.md) can't dominate
    # the headline the way the old 24-frame (~5 s) spans could
    n_frames = int(os.environ.get("BFF_BENCH_FRAMES", "96"))
    hit_rate = float(os.environ.get("BFF_BENCH_HIT_RATE", "0.25"))
    boxes_target = int(os.environ.get("BFF_BENCH_BOXES", "4"))
    width, height = (64, 48) if small else (1296, 968)
    root = os.path.join("/tmp", f"bff_bench_scene_{'small' if small else 'full'}")
    make_scene(root, n_frames, width, height)

    # batch 4 measured optimal on one v5e (composite f/s: 1 -> 3.04,
    # 4 -> 3.73, 8 -> 3.53 — per-dispatch host/RPC overhead amortizes by 4);
    # multi-chip runs want frame_batch = a device-count multiple
    frame_batch = int(os.environ.get("BFF_BENCH_FRAME_BATCH", "4" if not small else "8"))
    cfg = Config.from_dict({
        "paths": {"scene_2d_dir": root},
        "frames": {"width_2d": width, "height_2d": height, "downsample_ratio": 1},
        "detector": {"box_threshold": -1.0, "must_match_query": False,
                     "similarity_threshold": -10.0, "max_detections": boxes_target,
                     "dtype": "bfloat16", "frame_batch": frame_batch},
    })
    seg = Segmentor2D(cfg, detector=models["gdino"], sam=models["sam"],
                      clip_model=models["clip"], clip_tokenizer=models["clip_tok"])

    # calibrate box_threshold so the hit regime carries ~boxes_target
    # boxes/frame (a trained detector yields a handful, not TOP_K=64)
    from beyondff_tpu.utils import io as bio

    frame0 = bio.load_image(os.path.join(root, "scene0000_00", "color", "0.jpg"),
                            size=(width, height))
    _b, scores, _p = seg.detector.predict(frame0, "clothes", box_threshold=-1.0)
    scores = np.sort(np.asarray(scores))[::-1]
    if scores.size >= boxes_target:
        # keep at least boxes_target (ties keep more; max_detections caps)
        thr = float(scores[boxes_target - 1]) - 1e-6
    else:
        thr = -1.0
    log(f"calibrated box_threshold={thr:.4f} (top scores {scores[:6].round(4)})")

    def run(threshold, label):
        seg.cfg = cfg.override(**{"detector.box_threshold": threshold})
        # warmup: compile every program shape on a short prefix
        t0 = time.time()
        seg.process_scene("scene0000_00", "clothes")
        log(f"{label}: warmup pass {time.time() - t0:.1f}s")
        # best of four passes (the shared chip can degrade transiently;
        # min measures the machine — an r3 run caught BOTH of two hit
        # passes inside one degradation window, reporting 2.79 f/s where a
        # re-probe measured 4.65)
        best_dt, records = None, None
        for _ in range(int(os.environ.get("BFF_BENCH_PASSES", "4"))):
            t0 = time.time()
            recs = seg.process_scene("scene0000_00", "clothes")
            dt = time.time() - t0
            if best_dt is None or dt < best_dt:
                best_dt, records = dt, recs
        n_boxes = sum(len(r["confidences"]) for r in records)
        fps = n_frames / best_dt
        log(f"{label}: {n_frames} frames in {best_dt:.2f}s = {fps:.2f} frames/s "
            f"({len(records)} frames with boxes, {n_boxes} masks)")
        return fps

    fps_hit = run(thr, "pipeline[hit: every frame detects]")
    fps_miss = run(2.0, "pipeline[miss: detection only]")
    composite = 1.0 / (hit_rate / fps_hit + (1 - hit_rate) / fps_miss)
    log(f"pipeline composite at {hit_rate:.0%} hit rate: {composite:.2f} frames/s")
    return composite


def multichip_scaling(n_devices):
    """Virtual-CPU scaling mode (BFF_BENCH_DEVICES): frames/s of the sharded
    seg2d driver at 1 vs n devices, small models. Not the headline."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from beyondff_tpu.config import Config
    from beyondff_tpu.pipeline.segmentation_2d import Segmentor2D

    n_frames = int(os.environ.get("BFF_BENCH_FRAMES", "32"))
    width, height = 64, 48
    root = "/tmp/bff_bench_scene_small"
    make_scene(root, n_frames, width, height)

    def fps_at(frame_batch):
        cfg = Config.from_dict({
            "paths": {"scene_2d_dir": root},
            "frames": {"width_2d": width, "height_2d": height, "downsample_ratio": 1},
            "detector": {"box_threshold": -1.0, "must_match_query": False,
                         "similarity_threshold": -10.0, "max_detections": 4,
                         "dtype": "float32", "frame_batch": frame_batch},
        })
        seg = Segmentor2D(cfg)
        seg.process_scene("scene0000_00", "clothes")  # warmup/compile
        t0 = time.time()
        seg.process_scene("scene0000_00", "clothes")
        return n_frames / (time.time() - t0)

    f1 = fps_at(1)
    fn = fps_at(n_devices)
    log(f"virtual {n_devices}-device scaling: frame_batch=1 {f1:.2f} f/s -> "
        f"frame_batch={n_devices} {fn:.2f} f/s ({fn / f1:.2f}x)")
    print(json.dumps({"metric": "seg2d_virtual_scaling_x", "value": round(fn / f1, 3),
                      "unit": f"x at {n_devices} devices", "vs_baseline": round(fn / f1, 3)}))
    lift_scaling(n_devices)


def lift_scaling(n_devices):
    """Frame-sharded RLE lift at ScanNet scale (250k points) on the virtual
    mesh, 1 vs n devices. Virtual CPU devices share one host core, so the
    honest scaling signal is per-device work reduction (balance), not
    wall-clock speedup; both are reported."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from beyondff_tpu.core import geometry
    from beyondff_tpu.parallel import lift as lift_lib

    rng = np.random.default_rng(0)
    n_pts, n_frames, hh, ww, n_masks = 250_000, 32, 240, 320, 16
    pcd_h = jnp.asarray(geometry.homogenize(
        rng.uniform([-2, -2, 0.5], [2, 2, 4], (n_pts, 3)).astype(np.float32)))
    intr = np.array([[280.0, 0, ww / 2], [0, 280.0, hh / 2], [0, 0, 1.0]])
    projs = jnp.asarray(np.stack([
        geometry.fuse_projection(intr, np.eye(4)).astype(np.float32)
        for _ in range(n_frames)]))
    depths = jnp.asarray(rng.uniform(0.5, 3.0, (n_frames, hh, ww)).astype(np.float32))
    # RLE bounds: ~8 runs per mask row
    starts = np.sort(rng.integers(0, hh * ww, (n_frames, n_masks, 8)), axis=-1)
    ends = np.minimum(starts + rng.integers(1, hh * ww // 16, starts.shape), hh * ww)
    starts, ends = jnp.asarray(starts, jnp.int32), jnp.asarray(ends, jnp.int32)

    def run_at(nd):
        mesh = Mesh(np.array(jax.devices("cpu")[:nd]), ("data",))
        lift = lift_lib.make_sharded_lift_rle(mesh)
        sh = NamedSharding(mesh, P("data"))
        args = (pcd_h, jax.device_put(projs, sh), jax.device_put(depths, sh),
                jax.device_put(starts, sh), jax.device_put(ends, sh))
        with mesh:
            out = lift(*args)  # compile + warmup
            jax.device_get(out[2])
            t0 = time.time()
            out = lift(*args)
            jax.device_get(out[2])
        return time.time() - t0

    t1 = run_at(1)
    tn = run_at(n_devices)
    log(f"sharded RLE lift (250k pts, {n_frames} frames): 1-dev {t1 * 1000:.0f} ms, "
        f"{n_devices}-dev {tn * 1000:.0f} ms wall on one shared host core "
        f"(per-device frame shard {n_frames}->{n_frames // n_devices})")
    print(json.dumps({
        "metric": "lift_virtual_wall_ratio", "value": round(t1 / tn, 3),
        "unit": f"x at {n_devices} devices (one shared host core)",
        "vs_baseline": round(t1 / tn, 3)}))


def main():
    devices_mode = os.environ.get("BFF_BENCH_DEVICES")
    if devices_mode:
        multichip_scaling(int(devices_mode))
        return

    import jax.numpy as jnp

    from beyondff_tpu.models import clip as clip_mod
    from beyondff_tpu.models import sam as sam_mod
    from beyondff_tpu.models.gdino import GroundingDINO, model as gdino_model
    from beyondff_tpu.models.tokenizers import HashTokenizer

    small = os.environ.get("BFF_BENCH_SCALE") == "small"
    iters = int(os.environ.get("BFF_BENCH_ITERS", "8"))
    dtype = jnp.bfloat16

    t0 = time.time()
    if small:
        sam = sam_mod.SAM.create("test", dtype=dtype, device_fill=True)
        clip = clip_mod.CLIP.create("test", dtype=dtype, device_fill=True)
        gdino = GroundingDINO.create("test", dtype=dtype, device_fill=True)
    else:
        sam = sam_mod.SAM.create("vit_h", dtype=dtype, device_fill=True)
        clip = clip_mod.CLIP.create("ViT-L/14", dtype=dtype, device_fill=True)
        gdino = GroundingDINO.create(
            gdino_model.PRESETS["swinb"], dtype=dtype, device_fill=True)
    log(f"models built in {time.time() - t0:.1f}s")
    models = {
        "gdino": gdino, "clip": clip, "sam": sam,
        "clip_tok": HashTokenizer(clip.cfg.vocab_size, clip.cfg.context_length),
    }

    fps_device = device_compute(models, iters)
    fps_fast = None
    if not small and os.environ.get("BFF_BENCH_FAST_VARIANT", "1") != "0":
        fps_fast = fast_variant_compute(iters, dtype)
    fps_pipeline = pipeline_wall_clock(models, small)
    log(f"summary: device-compute {fps_device:.2f} f/s, "
        f"pipeline composite {fps_pipeline:.2f} f/s"
        + (f", fast-variant device {fps_fast:.2f} f/s" if fps_fast else ""))

    print(json.dumps({
        "metric": "seg2d_pipeline_frames_per_sec",
        "value": round(fps_pipeline, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps_pipeline / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
