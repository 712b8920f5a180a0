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

Prints the headline JSON line {"metric", "value", "unit", "vs_baseline"}
IMMEDIATELY after the composite section (so a driver timeout can never erase
the round's number — round 4's rc=124 left parsed:null), then re-prints the
same metric/value enriched with the secondary metrics at the end. Secondary
sections are each gated on a wall-clock budget (BFF_BENCH_BUDGET_S, default
1500 s from process start): once the budget is spent, remaining sections are
skipped with a log line instead of risking the driver's timeout.

Env knobs: BFF_BENCH_SCALE=small, BFF_BENCH_FRAMES, BFF_BENCH_HIT_RATE,
BFF_BENCH_BOXES, BFF_BENCH_DEVICES=n (virtual-CPU scaling mode, small scale),
BFF_BENCH_MULTICLASS=0 / BFF_BENCH_MULTI_CLASSES=k (scene-outer multi-class
banked section), BFF_BENCH_PROJ=0, BFF_BENCH_FAST_PIPELINE=0,
BFF_BENCH_BUDGET_S.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_FPS = 10.0  # reference: 35 s/scene at ~350 frames (paper Sec. 4)
_T_START = time.time()


def _budget_left() -> float:
    budget = float(os.environ.get("BFF_BENCH_BUDGET_S", "1500"))
    return budget - (time.time() - _T_START)


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def link_probe(mb: int = 8, rounds: int = 2):
    """Measure host->device and device->host tunnel bandwidth (MB/s).

    The pipeline composites are link-sensitive (frame uploads serialize on
    the tunnel, which co-tenancy can degrade from ~65 to ~13 MB/s within a
    session — ARCHITECTURE.md); recording the measured bandwidth alongside
    the throughput numbers makes link-bound sections interpretable."""
    import jax
    import jax.numpy as jnp

    buf = np.random.randint(0, 254, (mb * 1024 * 1024,), np.uint8)
    # the download must fetch device-COMPUTED data: device_get of an UPLOADED
    # buffer is served from the runtime's cached host copy (a memcpy, not the
    # tunnel — tools/probe_link.py section 3d)
    inc = jax.jit(lambda x: x + 1)
    up = down = 0.0
    for _ in range(rounds):
        t0 = time.time()
        dev = jnp.asarray(buf)
        # fence: a tiny reduce fetched to host proves the upload landed
        float(jax.device_get(dev[:: 1024 * 1024].sum()))
        up = max(up, mb / (time.time() - t0))
        dev = inc(dev)
        float(jax.device_get(dev[0].astype(jnp.float32)))
        t0 = time.time()
        np.asarray(jax.device_get(dev))
        down = max(down, mb / (time.time() - t0))
    log(f"link probe: upload {up:.1f} MB/s, download {down:.1f} MB/s (best of {rounds})")
    return round(up, 1), round(down, 1)


def _timed_once(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


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


def make_scene(root, n_frames, width, height, content=None):
    """Synthetic scene directory of JPEG frames (cached).

    ``content`` (or env ``BFF_BENCH_SCENE_CONTENT``): "noise" (default —
    uniform random, the historical bench workload, comparable across rounds)
    or "structured" (smooth fields + rectangles + mild noise at JPEG q90 —
    natural-image-like sparsity, the workload class real ScanNet frames
    belong to; required for the JXT coefficient transport to engage, whose
    spill guard correctly rejects noise)."""
    import cv2

    content = content or os.environ.get("BFF_BENCH_SCENE_CONTENT", "noise")
    color = os.path.join(root, "scene0000_00", "color")
    marker = os.path.join(color, f".done_{n_frames}_{width}x{height}_{content}")
    if os.path.exists(marker):
        # the marker alone is NOT proof: markers from other sizes survive
        # early returns, so a later rebuild at another size leaves this
        # marker dangling — verify the actual frame count
        n_jpg = sum(f.endswith(".jpg") for f in os.listdir(color))
        if n_jpg == n_frames:
            return
    os.makedirs(color, exist_ok=True)
    # stale frames/markers from a different n_frames would silently inflate
    # the scene (process_scene lists the dir) and skew every f/s number
    for f in os.listdir(color):
        os.remove(os.path.join(color, f))
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    for i in range(n_frames):
        if content == "structured":
            base = (120 + 60 * np.sin(xx / 40 + 0.37 * i)
                    + 40 * np.cos(yy / 30 + 0.11 * i))
            img = np.stack([base, base * 0.9 + 10, base * 0.8 + 20], -1)
            for _ in range(8):
                x0 = int(rng.integers(0, max(width - 20, 1)))
                y0 = int(rng.integers(0, max(height - 20, 1)))
                dw = int(rng.integers(10, width // 2))
                dh = int(rng.integers(10, height // 2))
                img[y0:y0 + dh, x0:x0 + dw] = (
                    0.7 * img[y0:y0 + dh, x0:x0 + dw]
                    + 0.3 * rng.integers(30, 220, 3))
            img = np.clip(img + rng.normal(0, 2, img.shape), 0,
                          255).astype(np.uint8)
            cv2.imwrite(os.path.join(color, f"{i}.jpg"), img,
                        [cv2.IMWRITE_JPEG_QUALITY, 90])
        else:
            img = rng.integers(0, 255, (height, width, 3), dtype=np.uint8)
            cv2.imwrite(os.path.join(color, f"{i}.jpg"), img)
    open(marker, "w").close()


def device_compute(models, iters):
    """Round-1-comparable per-model steady forwards at fixed shapes, with
    MFU/roofline accounting per component (XLA cost analysis / measured
    fenced time / chip peak) so 'at the hardware floor' claims carry
    evidence."""
    import jax
    import jax.numpy as jnp

    from beyondff_tpu.utils import mfu

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

    # MFU per component: lowered-HLO cost analysis (local; no second device
    # compile) against the measured fenced time above
    mfu_records = []
    for name, fn, args, dt in (
        ("gdino_forward", lambda p, *a: gdino.module.apply(p, *a),
         (gdino.params, g_img, ids, self_mask, pad_mask, pos_ids), t_gdino),
        (f"clip_x{crops_per_frame}crops", clip._encode_image,
         (clip.params, crops), t_clip),
        ("sam_encode", sam._encode, (sam.params, s_img), t_sam_enc),
        (f"sam_decode_x{boxes_per_frame}", sam._decode,
         (sam.params, emb0, boxes), t_sam_dec),
    ):
        cost = mfu.program_cost(fn, *args)
        log("mfu " + mfu.describe(name, cost, dt))
        mfu_records.append(mfu.summarize(name, cost, dt))
    return 1 / per_frame, mfu_records


def fast_variant_compute(iters, dtype, small=False):
    """Secondary metric: the reference's fast detector path (YOLO-World +
    EfficientSAM, ~7-8x faster than G-DINO per the paper Sec. 3.2;
    tools/segmentation_2d_yolo_world.py). Device-compute f/s at fixed shapes.
    Returns (fps, mfu_records, models) — the built models feed the fast
    pipeline measurement."""
    import jax
    import jax.numpy as jnp

    from beyondff_tpu.models import efficientsam, yolo_world
    from beyondff_tpu.utils import mfu

    rng = np.random.default_rng(0)

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        float(jax.device_get(leaves[0].reshape(-1)[0].astype(jnp.float32)))

    yw = yolo_world.YOLOWorld.create("test" if small else "l", dtype=dtype)
    esam = efficientsam.EfficientSAM.create("test" if small else "vits", dtype=dtype)
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
    mfu_records = []
    for name, fn, args, dt in (
        ("yolo_world_forward", yw._forward, (yw.params, img, txt), t_det),
        ("efficientsam_encode", esam._encode, (esam.params, s_img), t_enc),
        ("efficientsam_decode_x4", esam._decode_multi,
         (esam.params, emb0, boxes), t_dec),
    ):
        cost = mfu.program_cost(fn, *args)
        log("mfu " + mfu.describe(name, cost, dt))
        mfu_records.append(mfu.summarize(name, cost, dt))
    return 1 / per_frame, mfu_records, {"yolo": yw, "esam": esam}


def _measure_pipeline(seg, cfg, n_frames, hit_rate, tag):
    """process_scene wall-clock in hit/miss regimes -> composite f/s."""
    from beyondff_tpu.utils import io as bio

    boxes_target = cfg.detector.max_detections
    width, height = cfg.frames.width_2d, cfg.frames.height_2d
    root = cfg.paths.scene_2d_dir

    # calibrate box_threshold so the hit regime carries ~boxes_target
    # boxes/frame (a trained detector yields a handful, not TOP_K)
    frame0 = bio.load_image(os.path.join(root, "scene0000_00", "color", "0.jpg"),
                            size=(width, height))
    _b, scores, _p = seg.detector.predict(frame0, "clothes", box_threshold=-1.0)
    scores = np.sort(np.asarray(scores))[::-1]
    if scores.size >= boxes_target:
        # keep at least boxes_target (ties keep more; max_detections caps)
        thr = float(scores[boxes_target - 1]) - 1e-6
    else:
        thr = -1.0
    log(f"{tag}: calibrated box_threshold={thr:.4f} (top scores {scores[:6].round(4)})")

    def run(threshold, label):
        # warmup: compile every program shape on a short PREFIX of the scene
        # (the per-batch programs are shape-identical at any frame count that
        # divides frame_batch; a full-scene warmup re-pays ~90 frames of
        # steady-state work on top of the compiles for nothing). Residual
        # shapes compile during measured pass 1 and best-of-N absorbs it.
        warm_stride = max(1, n_frames // max(
            4 * cfg.detector.frame_batch,
            int(os.environ.get("BFF_BENCH_WARM_FRAMES", "16"))))
        seg.cfg = cfg.override(**{"detector.box_threshold": threshold,
                                  "frames.downsample_ratio": warm_stride})
        t0 = time.time()
        seg.process_scene("scene0000_00", "clothes")
        log(f"{label}: warmup pass {time.time() - t0:.1f}s "
            f"({-(-n_frames // warm_stride)} frames)")
        seg.cfg = cfg.override(**{"detector.box_threshold": threshold})
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

    fps_hit = run(thr, f"{tag}[hit: every frame detects]")
    fps_miss = run(2.0, f"{tag}[miss: detection only]")
    composite = 1.0 / (hit_rate / fps_hit + (1 - hit_rate) / fps_miss)
    log(f"{tag} composite at {hit_rate:.0%} hit rate: {composite:.2f} frames/s")
    return composite


def _bench_scene_cfg(small, extra_detector=None):
    """Shared synthetic-scene config for the pipeline measurements."""
    from beyondff_tpu.config import Config

    n_frames = int(os.environ.get("BFF_BENCH_FRAMES", "96"))
    boxes_target = int(os.environ.get("BFF_BENCH_BOXES", "4"))
    width, height = (64, 48) if small else (1296, 968)
    root = os.path.join("/tmp", f"bff_bench_scene_{'small' if small else 'full'}")
    make_scene(root, n_frames, width, height)
    # batch 4 measured optimal on one v5e (composite f/s: 1 -> 3.04,
    # 4 -> 3.73, 8 -> 3.53 — per-dispatch host/RPC overhead amortizes by 4);
    # multi-chip runs want frame_batch = a device-count multiple
    frame_batch = int(os.environ.get("BFF_BENCH_FRAME_BATCH", "4" if not small else "8"))
    det = {"box_threshold": -1.0, "must_match_query": False,
           "similarity_threshold": -10.0, "max_detections": boxes_target,
           "dtype": "bfloat16", "frame_batch": frame_batch}
    det.update(extra_detector or {})
    return Config.from_dict({
        "paths": {"scene_2d_dir": root},
        "frames": {"width_2d": width, "height_2d": height, "downsample_ratio": 1},
        "detector": det,
    }), n_frames


def pipeline_wall_clock(models, small):
    """The honest headline: process_scene wall-clock, default GDINO+SAM path.

    96 frames x 4 passes x 2 regimes: long enough that a transient co-tenant
    degradation window (CLAUDE.md) can't dominate the headline the way the
    old 24-frame (~5 s) spans could."""
    from beyondff_tpu.pipeline.segmentation_2d import Segmentor2D

    hit_rate = float(os.environ.get("BFF_BENCH_HIT_RATE", "0.25"))
    cfg, n_frames = _bench_scene_cfg(small)
    seg = Segmentor2D(cfg, detector=models["gdino"], sam=models["sam"],
                      clip_model=models["clip"], clip_tokenizer=models["clip_tok"])
    return _measure_pipeline(seg, cfg, n_frames, hit_rate, "pipeline")


def fast_pipeline_wall_clock(models, fast_models, small):
    """The fast variant (YOLO-World + EfficientSAM) as a FULL pipeline
    composite — same methodology/regimes as the headline, answering whether
    the reference's '7-8x faster' configuration (README.md:73-83, paper
    Sec. 3.2) meets the multi-chip north star end-to-end."""
    from beyondff_tpu.pipeline.segmentation_2d import Segmentor2D

    hit_rate = float(os.environ.get("BFF_BENCH_HIT_RATE", "0.25"))
    cfg, n_frames = _bench_scene_cfg(small, extra_detector={"kind": "yolo_world"})
    # Workload-faithful detector for the pipeline sections: the random-init
    # contrastive head SATURATES (every NMS survivor scores exactly 1.0), so
    # threshold calibration cannot separate boxes and the hit regime would
    # CLIP-score all cfg.max_dets=100 crops/frame — a workload no trained
    # detector produces (the methodology targets ~boxes_target/frame; GDINO's
    # random-init scores are non-degenerate and calibrate to ~7). max_dets is
    # post-processing only (NMS top-k), so the same params re-wrap with a
    # clamped config; the device-compute section keeps the official 100.
    import dataclasses

    from beyondff_tpu.models import yolo_world

    yw = fast_models["yolo"]
    k = 2 * cfg.detector.max_detections
    if yw.cfg.max_dets > k:
        log(f"fast-pipeline: clamping yolo max_dets {yw.cfg.max_dets} -> {k} "
            "(random-init scores are degenerate; see comment)")
        yw = yolo_world.YOLOWorld(dataclasses.replace(yw.cfg, max_dets=k),
                                  yw.params, dtype=yw.module.dtype)
    # The detector's guide embeddings must match cfg.text_dim (512 for "l",
    # the CLIP-base tower of official YOLO-World) — the headline ViT-L/14
    # tower (768) doesn't fit, and without a matching tower the detector
    # falls back to deterministic hash embeddings of the right width. The
    # injected ViT-L/14 still serves the crop filter (reference parity:
    # bbox_filter uses ViT-L/14 in the YOLO variant too).
    if (getattr(yw, "clip", None) is None
            and getattr(models["clip"].cfg, "embed_dim", None) == yw.cfg.text_dim):
        yw.clip = models["clip"]
        yw.clip_tokenizer = models["clip_tok"]
    seg = Segmentor2D(cfg, detector=yw, sam=fast_models["esam"],
                      clip_model=models["clip"], clip_tokenizer=models["clip_tok"])
    return _measure_pipeline(seg, cfg, n_frames, hit_rate, "fast-pipeline")


def multiclass_wall_clock(models, small):
    """Scene-outer multi-class seg2d (run_classes access pattern) on the
    headline GDINO+SAM path: class 1 pays JPEG decode + uploads + the
    text-independent device work, later classes reuse the banked frame
    buffers, backbone pyramids, and SAM embeddings (segmentation_2d
    frame_bank). This is the reference's actual 120-class sweep workload
    (run_evl.py loops classes over scenes and re-reads everything per
    class). Also measures the fused-captions sweep (detector.fused_captions:
    one multi-phrase detection pass serves the class group; disable with
    BFF_BENCH_MULTI_FUSED=0). Returns (first_class_fps, banked_class_fps,
    fused_class_fps) in the hit regime — where all banks engage."""
    from beyondff_tpu.pipeline.segmentation_2d import Segmentor2D
    from beyondff_tpu.utils import io as bio

    cfg, n_frames = _bench_scene_cfg(small)
    seg = Segmentor2D(cfg, detector=models["gdino"], sam=models["sam"],
                      clip_model=models["clip"], clip_tokenizer=models["clip_tok"])
    boxes_target = cfg.detector.max_detections
    frame0 = bio.load_image(
        os.path.join(cfg.paths.scene_2d_dir, "scene0000_00", "color", "0.jpg"),
        size=(cfg.frames.width_2d, cfg.frames.height_2d))
    n_classes = int(os.environ.get("BFF_BENCH_MULTI_CLASSES", "4"))
    classes = [f"class{j}" for j in range(n_classes)]
    # scores are query-conditioned: calibrate PER CLASS so every class
    # actually hits (a shared threshold leaves other classes in the miss
    # regime and the cross-class banks never engage)
    thr = {}
    for c in classes:
        _b, scores, _p = seg.detector.predict(frame0, c, box_threshold=-1.0)
        scores = np.sort(np.asarray(scores))[::-1]
        thr[c] = (float(scores[boxes_target - 1]) - 1e-6
                  if scores.size >= boxes_target else -1.0)
    seg.cfg = cfg.override(**{"detector.box_threshold": thr[classes[0]]})
    t0 = time.time()
    seg.process_scene("scene0000_00", classes[0])
    log(f"multiclass: warmup pass {time.time() - t0:.1f}s")

    # fused-caption sweep (opt-in production mode, detector.fused_captions):
    # ONE multi-phrase detection pass serves the whole class group, each
    # class replays CLIP-filter + SAM decode over its demuxed detections.
    # Thresholds calibrate on the FUSED caption's span scores so every class
    # keeps ~boxes_target boxes on frame0 (its own operating point).
    fused_groups = None
    if hasattr(seg.detector, "caption_spans") and os.environ.get(
            "BFF_BENCH_MULTI_FUSED", "1") != "0":
        from beyondff_tpu.pipeline.segmentation_2d import _fused_groups
        fused_groups = _fused_groups(seg.detector, classes,
                                     seg.cfg.detector.fused_group)
        thr_fused = {}
        for group, caption, spans in fused_groups:
            handle = seg.detector._dispatch([frame0], caption, frames=False)
            out0 = seg.detector.predict_finalize_demux(
                handle, spans, box_threshold=-1e9)
            for c, (_b, sc, _p) in zip(group, out0[0]):
                sc = np.sort(np.asarray(sc))[::-1]
                thr_fused[c] = (float(sc[boxes_target - 1]) - 1e-6
                                if sc.size >= boxes_target else -1.0)

    best = {}
    for _ in range(int(os.environ.get("BFF_BENCH_PASSES", "4")) // 2 or 1):
        bank = {}
        for j, c in enumerate(classes):
            seg.cfg = cfg.override(**{"detector.box_threshold": thr[c]})
            t0 = time.time()
            recs = seg.process_scene("scene0000_00", c, frame_bank=bank)
            dt = time.time() - t0
            label = "first" if j == 0 else "banked"
            best[label] = max(best.get(label, 0.0), n_frames / dt)
            log(f"multiclass[{'first' if j == 0 else f'banked{j}'}]: "
                f"{n_frames / dt:.2f} f/s ({len(recs)} frames with boxes)")
        if fused_groups is None:
            continue
        bank = {}
        t0 = time.time()
        n_masks = 0
        for group, caption, spans in fused_groups:
            dets = {}
            seg.process_scene(
                "scene0000_00", caption, frame_bank=bank,
                demux=(group, spans, dets, [thr_fused[c] for c in group]))
            tables = {c: {fid: det for (cc, fid), det in dets.items()
                          if cc == c} for c in group}
            by_class = seg.process_scene("scene0000_00", caption,
                                         frame_bank=bank,
                                         override_groups=tables)
            for recs in by_class.values():
                n_masks += sum(len(r["confidences"]) for r in recs)
        dt = time.time() - t0
        fps = n_frames * n_classes / dt
        best["fused"] = max(best.get("fused", 0.0), fps)
        log(f"multiclass[fused x{n_classes}]: {dt:.2f}s = {fps:.2f} "
            f"class-f/s ({n_masks} masks)")
    log(f"multiclass hit-regime best-of: first {best['first']:.2f} f/s, "
        f"banked {best['banked']:.2f} f/s -> x{best['banked'] / best['first']:.2f}"
        + (f"; fused sweep {best['fused']:.2f} class-f/s "
           f"(x{best['fused'] / best['first']:.2f})"
           if "fused" in best else ""))
    return best["first"], best["banked"], best.get("fused")


def projection_bench(small):
    """Stage 2+3 (projection + refinement) scenes/min, end-to-end AND
    device-only, so the host link (~85 MB/s tunnel uploading ~184 MB of
    depth/scene) doesn't masquerade as chip cost.

    - e2e: the real drivers over the full-scale fixture (300 frames, 250k
      points — tools/bench_pipeline.py's scene), best of repeats.
    - device-only: the driver's device programs (depth prep + RLE lift,
      view counts, aggregation, filtering) measured fenced on
      device-resident inputs at the same scale, composed per the fixture's
      chunk counts. Reference baseline: 1.1-4.8 s/scene (BASELINE.md).
    """
    import importlib.util

    import jax
    import jax.numpy as jnp

    from beyondff_tpu.config import Config
    from beyondff_tpu.core import aggregation, filtering, geometry

    n_points = 16_000 if small else 250_000
    n_frames = 32 if small else 300
    det_every = 4  # fixture: 1 in 4 frames carries a detection

    spec = importlib.util.spec_from_file_location(
        "bench_pipeline", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                       "tools", "bench_pipeline.py"))
    bp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bp)

    import tempfile

    root = tempfile.mkdtemp(prefix="bffbench_proj_")
    t0 = time.time()
    cfg = Config.from_yaml(bp.build_fullscale_scene(
        root, n_points, n_frames, np.random.default_rng(0)))
    log(f"projection fixture built in {time.time() - t0:.1f}s "
        f"({n_points} pts, {n_frames} frames)")

    from beyondff_tpu.pipeline import projection, refinement

    # --- end-to-end (includes PNG decode, depth upload over the link)
    t0 = time.time()
    projection.run(cfg, "clothes", resume=False)
    refinement.run(cfg, "clothes")
    log(f"projection+refinement warmup (incl compiles): {time.time() - t0:.1f}s")
    e2e_times = []
    for _ in range(int(os.environ.get("BFF_BENCH_PROJ_PASSES", "2"))):
        t0 = time.time()
        projection.run(cfg, "clothes", resume=False)
        refinement.run(cfg, "clothes")
        e2e_times.append(time.time() - t0)
    per_scene_e2e = min(e2e_times)
    log(f"projection+refinement e2e: {per_scene_e2e:.2f} s/scene "
        f"(passes {[round(t, 2) for t in e2e_times]})")

    # --- multi-class amortization: the sweep's real access pattern (many
    # classes over the same scenes). run_classes shares each scene's depth
    # upload across classes; at 4 classes the per-class cost already halves
    # (asymptote: device-bound lift + host mask IO). Guarded: a failure here
    # must not discard the already-measured e2e or skip the device section.
    per_cls_bank = None
    multi = int(os.environ.get("BFF_BENCH_PROJ_MULTI", "0" if small else "4"))
    if multi > 1:
        try:
            classes = bp.clone_mask_classes(cfg, "clothes", multi)
            # best-of-2 per CLAUDE.md (transient co-tenant degradation);
            # projection-only on BOTH legs so the ratio is apples-to-apples
            per_cls_loop = min(
                _timed_once(lambda: [projection.run(cfg, c, resume=False)
                                     for c in classes])
                for _ in range(2)) / multi
            per_cls_bank = min(
                _timed_once(lambda: projection.run_classes(cfg, classes,
                                                           resume=False))
                for _ in range(2)) / multi
            log(f"projection multi-class x{multi}: per-class driver "
                f"{per_cls_loop:.2f} s/class-scene, shared depth bank "
                f"{per_cls_bank:.2f} s/class-scene "
                f"({per_cls_loop / per_cls_bank:.2f}x)")
        except Exception as e:  # noqa: BLE001 - secondary metric only
            log(f"SECTION FAILED (projection multi-class): "
                f"{type(e).__name__}: {e}")
            per_cls_bank = None

    # --- device-only: fenced programs on device-resident inputs
    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        float(jax.device_get(jnp.asarray(leaves[0]).reshape(-1)[0].astype(jnp.float32)))

    rng = np.random.default_rng(1)
    h2d, w2d = cfg.frames.height_2d, cfg.frames.width_2d
    pcd = rng.uniform([-2, -1.5, 1.0], [2, 1.5, 4.0], (n_points, 3)).astype(np.float32)
    pcd_h = projection._pad_points(geometry.homogenize(pcd))
    pcd_dev = jnp.asarray(pcd_h)
    intr = np.array([[1170.0, 0, w2d / 2], [0, 1170.0, h2d / 2], [0, 0, 1.0]])
    projs8 = jnp.asarray(np.stack([geometry.fuse_projection(intr, np.eye(4))
                                   for _ in range(8)]).astype(np.float32))
    projs32 = jnp.asarray(np.stack([geometry.fuse_projection(intr, np.eye(4))
                                    for _ in range(32)]).astype(np.float32))
    raw8 = jnp.asarray(rng.integers(500, 4000, (8, 480, 640)).astype(np.uint16))
    raw32 = jnp.asarray(rng.integers(500, 4000, (32, 480, 640)).astype(np.uint16))
    # RLE bounds at fixture-like density (~1k runs/mask row); the same mask
    # on every frame (like the fixture) so the views merge and the
    # aggregate/filter timing covers real group work
    r_pad = 1024
    st1 = np.sort(rng.integers(0, h2d * w2d, (1, 1, r_pad)), axis=-1)
    en1 = np.minimum(st1 + rng.integers(1, 64, st1.shape), h2d * w2d)
    st = jnp.asarray(np.broadcast_to(st1, (8, 1, r_pad)), jnp.int32)
    en = jnp.asarray(np.broadcast_to(en1, (8, 1, r_pad)), jnp.int32)
    thresh = cfg.frames.depth_thresh

    def det_chunk():
        d = geometry.prepare_depth(raw8, (h2d, w2d), cfg.frames.depth_scale)
        return geometry.lift_frames_rle(pcd_dev, projs8, d, st, en, thresh)

    def view_chunk():
        d = geometry.prepare_depth(raw32, (h2d, w2d), cfg.frames.depth_scale)
        return geometry.view_counts(pcd_dev, projs32, d, thresh)

    iters = int(os.environ.get("BFF_BENCH_PROJ_ITERS", "4"))
    t_det = timed("projection det-chunk (8 frames, depth prep + RLE lift)",
                  det_chunk, sync, iters)
    t_view = timed("projection view-chunk (32 frames)", view_chunk, sync, iters)

    membership, mc, vc = det_chunk()
    n_det = n_frames // det_every
    n_view = n_frames - n_det
    det_chunks = -(-n_det // 8)
    view_chunks = -(-n_view // 32)
    chunks = [(membership, [1] * 8)] * det_chunks
    confs = [0.9] * (8 * det_chunks)
    labels = ["clothes"] * (8 * det_chunks)
    mc_h = np.asarray(mc, np.int64)[:n_points]
    vc_h = np.asarray(vc, np.int64)[:n_points]

    def agg_filter():
        agg = aggregation.aggregate_chunks(
            chunks, n_points, confs, labels,
            iou_thres=cfg.aggregation.iou_thres,
            min_aggregated_masks=cfg.aggregation.min_aggregated_masks)
        return filtering.filter_masks(agg, mc_h, vc_h, cfg.filtering)

    t0 = time.time()
    out = agg_filter()
    log(f"projection aggregate+filter: compile+first {time.time() - t0:.1f}s")
    t_af = []
    for _ in range(2):
        t0 = time.time()
        out = agg_filter()
        t_af.append(time.time() - t0)
    t_aggf = min(t_af)
    log(f"projection aggregate+filter: steady {t_aggf * 1000:.0f} ms "
        f"({out.ins.shape[0]} masks)")

    per_scene_device = det_chunks * t_det + view_chunks * t_view + t_aggf
    log(f"projection device-only: {det_chunks}x{t_det * 1000:.0f}ms det + "
        f"{view_chunks}x{t_view * 1000:.0f}ms view + {t_aggf * 1000:.0f}ms agg/filter "
        f"= {per_scene_device:.2f} s/scene")

    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return (60.0 / per_scene_e2e, 60.0 / per_scene_device,
            60.0 / per_cls_bank if per_cls_bank else None)


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


def build_models(small, dtype):
    """The headline model stack (synthesized on device), with bounded
    retries: the shared chip can be transiently held by a co-tenant
    (observed: RESOURCE_EXHAUSTED on the very first device_fill) and a
    transient episode must not cost the whole round-end artifact.
    Shared with tools/bench_sweep.py."""
    from beyondff_tpu.models import clip as clip_mod
    from beyondff_tpu.models import sam as sam_mod
    from beyondff_tpu.models.gdino import GroundingDINO, model as gdino_model
    from beyondff_tpu.models.tokenizers import HashTokenizer

    def _build_models():
        if small:
            sam = sam_mod.SAM.create("test", dtype=dtype, device_fill=True)
            clip = clip_mod.CLIP.create("test", dtype=dtype, device_fill=True)
            gdino = GroundingDINO.create("test", dtype=dtype, device_fill=True)
        else:
            sam = sam_mod.SAM.create("vit_h", dtype=dtype, device_fill=True)
            clip = clip_mod.CLIP.create("ViT-L/14", dtype=dtype, device_fill=True)
            gdino = GroundingDINO.create(
                gdino_model.PRESETS["swinb"], dtype=dtype, device_fill=True)
        return sam, clip, gdino

    t0 = time.time()
    retries = int(os.environ.get("BFF_BENCH_BUILD_RETRIES", "3"))
    for attempt in range(retries + 1):
        try:
            sam, clip, gdino = _build_models()
            break
        except Exception as e:  # noqa: BLE001 - retry transient chip states
            if attempt >= retries or "RESOURCE_EXHAUSTED" not in str(e):
                raise
            log(f"model build attempt {attempt + 1} hit transient "
                f"{type(e).__name__}; retrying in 120s")
            time.sleep(120)
    log(f"models built in {time.time() - t0:.1f}s")
    return {
        "gdino": gdino, "clip": clip, "sam": sam,
        "clip_tok": HashTokenizer(clip.cfg.vocab_size, clip.cfg.context_length),
    }


def main():
    devices_mode = os.environ.get("BFF_BENCH_DEVICES")
    if devices_mode:
        multichip_scaling(int(devices_mode))
        return

    import jax.numpy as jnp

    small = os.environ.get("BFF_BENCH_SCALE") == "small"
    iters = int(os.environ.get("BFF_BENCH_ITERS", "8"))
    dtype = jnp.bfloat16
    models = build_models(small, dtype)

    try:
        link_up, link_down = link_probe()
    except Exception as e:  # noqa: BLE001 - diagnostic only, never fatal
        log(f"SECTION FAILED (link_probe): {type(e).__name__}: {e}")
        link_up = link_down = None

    # ---- headline FIRST, printed IMMEDIATELY: a driver timeout during any
    # later section must never erase the round's number (round 4, rc=124)
    fps_pipeline = pipeline_wall_clock(models, small)
    headline = {
        "metric": "seg2d_pipeline_frames_per_sec",
        "value": round(fps_pipeline, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps_pipeline / BASELINE_FPS, 3),
    }
    print(json.dumps(headline), flush=True)

    def _optional(name, fn, est_cost_s=0.0):
        """Secondary sections must never kill the headline JSON line (a
        round-4 crash and a round-4 driver timeout each cost a full run) —
        catch errors, and skip outright when the wall-clock budget minus the
        section's estimated cost is already spent."""
        left = _budget_left()
        if left < est_cost_s:
            log(f"SECTION SKIPPED ({name}): {left:.0f}s of budget left "
                f"< ~{est_cost_s:.0f}s estimated (BFF_BENCH_BUDGET_S)")
            return None
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - report and continue
            log(f"SECTION FAILED ({name}): {type(e).__name__}: {e}")
            return None

    fps_fast = fps_fast_pipeline = None
    fast_models = None
    if os.environ.get("BFF_BENCH_FAST_VARIANT", "1") != "0":
        fast = _optional("fast_variant_compute",
                         lambda: fast_variant_compute(iters, dtype, small),
                         est_cost_s=90)
        if fast is not None:
            fps_fast, fast_mfu, fast_models = fast
    if fast_models is not None and os.environ.get("BFF_BENCH_FAST_PIPELINE", "1") != "0":
        fps_fast_pipeline = _optional(
            "fast_pipeline",
            lambda: fast_pipeline_wall_clock(models, fast_models, small),
            est_cost_s=150)
    mc_first = mc_banked = mc_fused = None
    if os.environ.get("BFF_BENCH_MULTICLASS", "0" if small else "1") != "0":
        mc = _optional("multiclass_wall_clock",
                       lambda: multiclass_wall_clock(models, small),
                       est_cost_s=250)
        if mc is not None:
            mc_first, mc_banked, mc_fused = mc
    proj_e2e = proj_device = proj_multi = None
    if os.environ.get("BFF_BENCH_PROJ", "0" if small else "1") != "0":
        proj = _optional("projection_bench", lambda: projection_bench(small),
                         est_cost_s=400)
        if proj is not None:
            proj_e2e, proj_device, proj_multi = proj
    # device-compute MFU/roofline table last: it is the most stable
    # cross-round section (unchanged since round 4's verdict) and the most
    # expensive compile load
    fps_device, mfu_records = None, []
    if os.environ.get("BFF_BENCH_DEVICE_COMPUTE", "1") != "0":
        dc = _optional("device_compute", lambda: device_compute(models, iters),
                       est_cost_s=450)
        if dc is not None:
            fps_device, mfu_records = dc
            if fast_models is not None:
                mfu_records.extend(fast_mfu)
    log("summary: "
        + (f"device-compute {fps_device:.2f} f/s, " if fps_device else "")
        + f"pipeline composite {fps_pipeline:.2f} f/s"
        + (f", fast-variant device {fps_fast:.2f} f/s" if fps_fast else "")
        + (f", fast pipeline composite {fps_fast_pipeline:.2f} f/s"
           if fps_fast_pipeline else "")
        + (f", multiclass hit first/banked {mc_first:.2f}/{mc_banked:.2f} f/s"
           if mc_banked else "")
        + (f" (fused sweep {mc_fused:.2f} class-f/s)" if mc_fused else "")
        + (f", projection {proj_e2e:.1f} scenes/min e2e / {proj_device:.1f} device-only"
           if proj_e2e else "")
        + (f" / {proj_multi:.1f} per-class multi-class" if proj_multi else ""))

    # re-print the SAME headline metric/value enriched with the secondary
    # metrics (the driver parses the last JSON line; both lines parse to the
    # same headline number, so a timeout anywhere above still leaves a valid
    # artifact). Reference anchors: seg2d ~10 f/s avg, projection ~12-20
    # scenes/min — BASELINE.md.
    extra = {
        "seg2d_device_bound_fps": round(fps_device, 3) if fps_device else None,
        "seg2d_fast_device_fps": round(fps_fast, 3) if fps_fast else None,
        "seg2d_fast_pipeline_fps": (round(fps_fast_pipeline, 3)
                                    if fps_fast_pipeline else None),
        "projection_scenes_per_min_e2e": round(proj_e2e, 2) if proj_e2e else None,
        "projection_scenes_per_min_device": (round(proj_device, 2)
                                             if proj_device else None),
        "projection_multiclass_scenes_per_min_per_class": (
            round(proj_multi, 2) if proj_multi else None),
        "seg2d_multiclass_hit_first_fps": (round(mc_first, 3)
                                           if mc_first else None),
        "seg2d_multiclass_hit_banked_fps": (round(mc_banked, 3)
                                            if mc_banked else None),
        "seg2d_multiclass_hit_fused_fps": (round(mc_fused, 3)
                                           if mc_fused else None),
        "link_upload_mb_s": link_up,
        "link_download_mb_s": link_down,
        "wall_s": round(time.time() - _T_START, 1),
        "mfu": mfu_records,
    }
    print(json.dumps({**headline, "extra": extra}), flush=True)


if __name__ == "__main__":
    main()
