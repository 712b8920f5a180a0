#!/usr/bin/env python
"""MEASURED full-sweep benchmark: the whole 4-stage pipeline per (class, scene).

ARCHITECTURE.md's full-sweep cost model composes separately-measured stage
numbers; this tool MEASURES the composed thing — K classes x one ScanNet-scale
scene (full-res frames, 250k-point cloud, 640x480 depth, stage-1 masks)
through the real drivers on one chip:

  segmentation_2d -> projection_2d_to_3d -> refinement -> evaluation

in three access patterns:

  * ``ref``     — the reference's pattern: one full per-class pass per stage
                  (run_evl.py:103-118 loops classes outer, re-reading and
                  re-shipping everything per class), here with each class's
                  own seg2d/projection/refinement/eval invocation.
  * ``banked``  — the production multi-class drivers, byte-identical outputs:
                  seg2d run_classes (per-scene frame/feats/embedding banks) +
                  projection run_classes (depth + viewed-counts banks).
  * ``fused``   — opt-in fused captions on top of ``banked``: one
                  multi-phrase detection pass per class group
                  (protocol-adjacent; PARITY.md fused-captions row).

Workload realism with random-init weights: each class's box_threshold is
calibrated so ~``--hit-frac`` of frames clear it (per-frame score quantile
over a calibration sample) with ~``max_detections`` boxes on hit frames —
the trained-model regime the headline bench composes from separate hit/miss
passes; here the mixed regime runs as ONE measured pass per class.

Reference anchor: ~35 s seg2d + 1.1-4.8 s projection + <1 s refine/eval per
(class, scene) on an RTX A5000, at ~350 processed frames/scene (BASELINE.md;
paper Sec. 4). Frame counts differ, so the comparable figure is
s/(class, scene) NORMALIZED to the reference's 350 frames — both are printed.

    python tools/bench_sweep.py [--classes 8] [--frames 96] [--points 250000]
                                [--rounds 2] [--hit-frac 0.25] [--modes ...]
                                [--out SWEEP.json]
"""

import argparse
import importlib.util
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_FRAMES = 350.0  # paper Sec. 4: 35 s at ~10 f/s
REF_S_PER_CLASS_SCENE = 38.0  # 35 s seg2d + ~2.5 s projection + <1 s tail


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def _load(modname, relpath):
    spec = importlib.util.spec_from_file_location(
        modname, os.path.join(REPO, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def calibrate_thresholds(seg, classes, frame_paths, hit_frac, boxes_target,
                         fused_groups=None):
    """Per-class box thresholds putting ~hit_frac of frames in the hit
    regime: per-frame stat = the boxes_target-th best detection score; the
    threshold is the (1 - hit_frac) quantile boundary of those stats. With
    ``fused_groups`` the scores come from the fused caption's span demux
    (each class's own operating point on the fused forward).

    Scores are computed through the SAME path the measured run uses —
    SAM-scale resize, YCrCb 4:2:0 device upload, per-batch stack, batched
    ``_dispatch(frames=True)`` — over ALL frames in run order. Measured
    (r04): the single-image host ``predict`` path shifts scores by ~0.3-0.45
    of the tiny per-frame spread on random-init weights, which blew the
    realized hit mix from the designed 25% to ~64%; path-faithful scoring
    makes the quantile exact by construction (up to bf16 score ties)."""
    from beyondff_tpu.core import color as _color
    from beyondff_tpu.pipeline.segmentation_2d import _stack_jit
    from beyondff_tpu.utils import io as bio

    fb = max(1, int(seg.cfg.detector.frame_batch))
    yuv = os.environ.get("BFF_SEG2D_YUV", "1") != "0"
    chunks = []  # (n_frames, stacked device buffer) in run order
    for i in range(0, len(frame_paths), fb):
        imgs = [bio.load_image(p) for p in frame_paths[i:i + fb]]
        devs = [_color.upload_frame(seg.sam.scale_frame(im)[0], yuv=yuv)
                for im in imgs]
        chunks.append((len(devs), _stack_jit(len(devs))(*devs)))

    def stat(sc):
        # the stat must be the TOP-1 score: at runtime a frame enters the
        # hit path iff ANY box clears the threshold, so quantiling a
        # lower-ranked score over-admits frames whose top boxes clear it
        # (measured r04: a 4th-best stat realized 100% hit at small scale).
        # With the fixture's contrast ramp dominating within-frame spread,
        # hit frames still carry ~boxes_target boxes each.
        sc = np.asarray(sc)
        return float(sc.max()) if sc.size else -1e9

    stats = {c: [] for c in classes}
    if fused_groups is None:
        for c in classes:
            for _n, dev in chunks:
                handle = seg.detector._dispatch(dev, c, frames=True)
                for _b, sc, _p in seg.detector.predict_finalize(
                        handle, box_threshold=-1e9):
                    stats[c].append(stat(sc))
    else:
        for group, caption, spans in fused_groups:
            for _n, dev in chunks:
                handle = seg.detector._dispatch(dev, caption, frames=True)
                out = seg.detector.predict_finalize_demux(
                    handle, spans, box_threshold=-1e9)
                for per_frame in out:
                    for c, (_b, sc, _p) in zip(group, per_frame):
                        stats[c].append(stat(sc))
    thr = {}
    for c in classes:
        t, k, designed = separable_threshold(stats[c], hit_frac)
        if k != designed:
            log(f"calib[{c}]: separable cut {k}/{len(stats[c])} frames "
                f"(designed {designed}; scores tie at the boundary)")
        thr[c] = t
    return thr


def separable_threshold(stats, hit_frac):
    """Threshold putting exactly k of the stats strictly above it, for the
    strictly-separable cut k nearest ``round(hit_frac * n)``.

    Tie-aware: stats tie (sigmoid saturation at small scale, bf16 logit
    quantization at full scale) and a threshold between tied values is
    unrealizable, so the cut snaps to the nearest boundary where the sorted
    stats strictly decrease. Returns ``(threshold, k, designed_k)``."""
    s = np.sort(np.asarray(stats))[::-1]
    designed = int(round(hit_frac * s.size))
    cuts = [0, s.size] + [j for j in range(1, s.size) if s[j - 1] > s[j]]
    k = min(cuts, key=lambda j: abs(j - designed))
    if k <= 0:
        t = float(s[0]) + 1e-6
    elif k >= s.size:
        t = float(s[-1]) - 1e-6
    else:
        t = float((s[k - 1] + s[k]) / 2.0)
    return t, k, designed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--points", type=int, default=250_000)
    ap.add_argument("--rounds", type=int, default=2,
                    help="measured rounds per mode (best-of; CLAUDE.md "
                         "transient-degradation rule)")
    ap.add_argument("--hit-frac", type=float, default=0.25)
    ap.add_argument("--calib-frames", type=int, default=0,
                    help="deprecated, ignored: calibration scores every "
                         "frame through the run path")
    ap.add_argument("--modes", default="ref,banked,fused")
    ap.add_argument("--small", action="store_true",
                    help="tiny models + tiny frames (CI smoke)")
    ap.add_argument("--keep", default=None)
    ap.add_argument("--out", default=None, help="also append JSON lines here")
    args = ap.parse_args()

    import cv2
    import jax.numpy as jnp

    bench = _load("bff_bench", "bench.py")
    bp = _load("bff_bench_pipeline", os.path.join("tools", "bench_pipeline.py"))

    from beyondff_tpu.config import Config
    from beyondff_tpu.data import scannet200
    from beyondff_tpu.pipeline import evaluate, projection, refinement
    from beyondff_tpu.pipeline import segmentation_2d as s2d
    from beyondff_tpu.pipeline.text_sim import ClipTextSimilarity
    from beyondff_tpu.pipeline.segmentation_2d import Segmentor2D, _fused_groups

    # single-word ScanNet200 instance classes: all share one tokenized
    # caption length (one compiled text shape serves every per-class pass)
    names = ["clothes", "chair", "table", "pillow", "towel", "monitor",
             "lamp", "bag", "plant", "bottle", "cabinet", "desk"]
    assert all(n in scannet200.INSTANCE_CAT_SCANNET_200 for n in names)
    classes = names[: args.classes]

    root = args.keep or tempfile.mkdtemp(prefix="bffsweep_")
    rng = np.random.default_rng(0)
    t0 = time.time()
    cfg = Config.from_yaml(bp.build_fullscale_scene(
        root, args.points, args.frames, rng))
    # the projection fixture ships tiny placeholder color files; the 2D stage
    # needs real full-resolution frames (distinct content per frame — the
    # hit-mix calibration relies on per-frame score variation)
    w2d, h2d = (64, 48) if args.small else (1296, 968)
    color_dir = os.path.join(cfg.paths.scene_2d_dir, "scene0000_00", "color")
    content = os.environ.get("BFF_SWEEP_CONTENT", "noise")
    yy, xx = np.mgrid[0:h2d, 0:w2d].astype(np.float32)
    for i in range(args.frames):
        # deterministic contrast ramp: random-init detector scores over pure
        # noise frames cluster within ~1e-5 of each other, so threshold
        # calibration degenerates into tie-breaking; scaling per-frame
        # amplitude spreads the score distribution for real
        amp = 0.35 + 0.65 * i / max(args.frames - 1, 1)
        if content == "structured":
            # natural-image-like sparsity (smooth fields + rectangles at
            # JPEG q90 — bench.make_scene's structured class): the content
            # real ScanNet frames belong to, and the regime the JXT
            # coefficient transport engages in (its spill guard correctly
            # rejects the noise flavor). The amp ramp keeps per-frame score
            # spread for calibration.
            base = (120 + 60 * np.sin(xx / 40 + 0.37 * i)
                    + 40 * np.cos(yy / 30 + 0.11 * i))
            img = np.stack([base, base * 0.9 + 10, base * 0.8 + 20], -1)
            for _ in range(8):
                x0 = int(rng.integers(0, max(w2d - 20, 1)))
                y0 = int(rng.integers(0, max(h2d - 20, 1)))
                dw = int(rng.integers(10, w2d // 2))
                dh = int(rng.integers(10, h2d // 2))
                img[y0:y0 + dh, x0:x0 + dw] = (
                    0.7 * img[y0:y0 + dh, x0:x0 + dw]
                    + 0.3 * rng.integers(30, 220, 3))
            img = np.clip(img * amp + rng.normal(0, 2, img.shape),
                          0, 255).astype(np.uint8)
            cv2.imwrite(os.path.join(color_dir, f"{i}.jpg"), img,
                        [cv2.IMWRITE_JPEG_QUALITY, 90])
        else:
            img = (rng.integers(0, 255, (h2d, w2d, 3)) * amp).astype(np.uint8)
            cv2.imwrite(os.path.join(color_dir, f"{i}.jpg"), img)
    log(f"fixture built in {time.time() - t0:.1f}s ({args.points} pts, "
        f"{args.frames} frames at {w2d}x{h2d}, {len(classes)} classes, "
        f"{content} frames)")

    cfg = cfg.override(**{
        "frames.width_2d": w2d, "frames.height_2d": h2d,
        "detector.box_threshold": 1e9, "detector.must_match_query": False,
        "detector.similarity_threshold": -10.0, "detector.max_detections": 4,
        "detector.dtype": "bfloat16" if not args.small else "float32",
        "detector.frame_batch": 4,
    })
    models = bench.build_models(args.small, jnp.bfloat16 if not args.small
                                else jnp.float32)
    seg = Segmentor2D(cfg, detector=models["gdino"], sam=models["sam"],
                      clip_model=models["clip"],
                      clip_tokenizer=models["clip_tok"])
    sim = ClipTextSimilarity(models["clip"], models["clip_tok"])

    boxes_target = cfg.detector.max_detections
    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    # calibrate over ALL frames in run order: the threshold quantile is then
    # exact for the measured workload (--calib-frames subsampling was the
    # r04 source of a 2.5x hit-mix miss and is retired)
    calib_paths = [os.path.join(color_dir, f"{i}.jpg")
                   for i in range(args.frames)]
    t0 = time.time()
    thr = calibrate_thresholds(seg, classes, calib_paths, args.hit_frac,
                               boxes_target)
    thr_fused = None
    if "fused" in modes:
        # fused calibration costs its own detection pass over the calib
        # frames — skip it entirely for ref/banked-only re-probes
        fused_groups = _fused_groups(seg.detector, classes,
                                     cfg.detector.fused_group)
        thr_fused = calibrate_thresholds(seg, classes, calib_paths,
                                         args.hit_frac, boxes_target,
                                         fused_groups=fused_groups)
    log(f"calibration ({len(calib_paths)} frames x {len(classes)} classes, "
        f"per-class{' + fused' if thr_fused is not None else ''}): "
        f"{time.time() - t0:.1f}s")

    def stage(fn):
        t0 = time.time()
        fn()
        return time.time() - t0

    def eval_all():
        # classes without GT instances evaluate to nan rows like the
        # reference's nan_classes; a failure there must not kill the bench
        for c in classes:
            try:
                evaluate.run(cfg, c, verbose=False)
            except Exception as e:  # noqa: BLE001 - tail stage, nan classes
                log(f"eval[{c}] failed: {type(e).__name__}: {e}")

    def run_mode(mode):
        times = {}
        if mode == "ref":
            def seg_fn():
                for c in classes:
                    cfg_c = cfg.override(**{"detector.box_threshold": thr[c]})
                    seg.cfg = cfg_c
                    s2d.run(cfg_c, c, resume=False, segmentor=seg)
                seg.cfg = cfg

            def proj_fn():
                for c in classes:
                    projection.run(cfg, c, resume=False)
        elif mode == "banked":
            def seg_fn():
                s2d.run_classes(cfg, classes, resume=False, segmentor=seg,
                                class_thresholds=thr)

            def proj_fn():
                projection.run_classes(cfg, classes, resume=False)
        elif mode == "fused":
            cfg_f = cfg.override(**{"detector.fused_captions": True})

            def seg_fn():
                seg.cfg = cfg_f
                s2d.run_classes(cfg_f, classes, resume=False, segmentor=seg,
                                class_thresholds=thr_fused)
                seg.cfg = cfg

            def proj_fn():
                projection.run_classes(cfg, classes, resume=False)
        else:
            raise ValueError(mode)

        times["seg2d"] = stage(seg_fn)
        times["projection"] = stage(proj_fn)
        times["refinement"] = stage(lambda: [
            refinement.run(cfg, c, sim=sim) for c in classes])
        times["evaluation"] = stage(eval_all)
        times["total"] = sum(times.values())
        return times

    out_fh = open(args.out, "a") if args.out else None
    results = {}
    for mode in modes:
        # per-mode warmup: every mode compiles its own program shapes (the
        # fused demux, the banked stack/take gathers); an uncounted first
        # round keeps remote-compile time out of the measurement
        t0 = time.time()
        warm = run_mode(mode)
        log(f"{mode} warmup (incl compiles): {time.time() - t0:.1f}s "
            f"[{ {k: round(v, 1) for k, v in warm.items()} }]")
        best = None
        masks = hit_frames = 0
        for r in range(args.rounds):
            t = run_mode(mode)
            masks = hit_frames = 0
            for c in classes:
                from beyondff_tpu.utils import io as bio
                recs = bio.load_frame_records(os.path.join(
                    cfg.paths.mask_2d_dir, c,
                    f"scene0000_00.{cfg.output_format}"))
                masks += sum(len(x["confidences"]) for x in recs)
                hit_frames += sum(
                    1 for x in recs if len(x["confidences"]))
            log(f"{mode} round {r + 1}: total {t['total']:.1f}s "
                f"({ {k: round(v, 1) for k, v in t.items() if k != 'total'} },"
                f" {masks} masks / {hit_frames} hit frames across classes)")
            if best is None or t["total"] < best["total"]:
                best = t
        per_cs = best["total"] / len(classes)
        # normalize seg2d (frame-proportional) to the reference's 350-frame
        # average scene; the other stages are frame-count-insensitive here
        norm = (best["seg2d"] * (REF_FRAMES / args.frames)
                + best["total"] - best["seg2d"]) / len(classes)
        results[mode] = {
            "s_per_class_scene": round(per_cs, 2),
            "s_per_class_scene_at_350_frames": round(norm, 2),
            "vs_reference_at_350_frames": round(REF_S_PER_CLASS_SCENE / norm, 2),
            "stages_s": {k: round(v, 2) for k, v in best.items()},
            # realized workload (identical across rounds: fixed thresholds,
            # deterministic pipeline) — lets a reader check the designed
            # hit mix actually held
            "masks_total": masks,
            "hit_frames_per_class": round(hit_frames / len(classes), 1),
            "realized_hit_frac": round(
                hit_frames / (len(classes) * args.frames), 3),
        }
        line = json.dumps({
            "metric": f"sweep_{mode}_s_per_class_scene",
            "value": round(per_cs, 3),
            "unit": f"s/(class,scene) at {args.frames} frames",
            "vs_baseline": results[mode]["vs_reference_at_350_frames"],
            "extra": results[mode],
        })
        print(line, flush=True)
        if out_fh:
            out_fh.write(line + "\n")
    if out_fh:
        out_fh.close()
    log("summary: " + ", ".join(
        f"{m}: {results[m]['s_per_class_scene']:.1f} s/(class,scene) "
        f"({results[m]['vs_reference_at_350_frames']:.1f}x ref at 350f)"
        for m in modes))
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
