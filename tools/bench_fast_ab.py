"""A/B harness for the seg2d pipeline — FAST variant (YOLO-World +
EfficientSAM, default) or the headline GDINO+SAM path
(BFF_FAST_DETECTOR=gdino).

Two measurement modes on the bench synthetic scene, both using the exact
fast-pipeline configuration from bench.py (max_dets clamped to the
workload-faithful value, CLIP crop filter on, calibrated thresholds):

1. Knob sweep (default): interleaved paired rounds over an env knob, e.g.

       BFF_FAST_KNOB=BFF_CLIP_YUV BFF_FAST_VARIANTS=1,0 \
           BFF_FAST_REGIME=hit python tools/bench_fast_ab.py

   The shared tunnel's bandwidth drifts between sessions (CLAUDE.md), so
   each round runs every variant once and the verdict compares best-of.

2. Multi-class (BFF_FAST_CLASSES=4): per-class wall clock of the scene-outer
   frame bank (run_classes access pattern) — class 1 pays JPEG decode +
   uploads + backbone, later classes reuse the banked device buffers AND the
   banked text-independent backbone pyramid (models/yolo_world.py split),
   re-running only the text-guided PAN + head per class.

3. Fused captions (BFF_FAST_MODES=fused, GDINO only, BFF_FAST_CLASSES=N):
   paired per-class-banked vs fused-caption sweeps — the fused variant runs
   ONE multi-phrase detection pass per scene per class group (caption
   demuxed by token span, per-class thresholds calibrated on the FUSED
   caption's scores so each class keeps ~boxes_target boxes) and replays
   each class through detections_override (CLIP filter + SAM decode only).

Regimes: miss (box_threshold above every score — no masks) and hit (every
frame detects ~boxes_target boxes).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_seg(n_frames, boxes_target, dtype_name="bfloat16"):
    import dataclasses

    import jax.numpy as jnp

    import bench
    from beyondff_tpu.config import Config
    from beyondff_tpu.models import clip as clip_mod
    from beyondff_tpu.models.tokenizers import HashTokenizer
    from beyondff_tpu.pipeline.segmentation_2d import Segmentor2D

    detector_kind = os.environ.get("BFF_FAST_DETECTOR", "yolo_world")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    width, height = 1296, 968
    root = "/tmp/bff_bench_scene_full"
    bench.make_scene(root, n_frames, width, height)

    t0 = time.time()
    if detector_kind == "gdino":
        from beyondff_tpu.models import sam as sam_mod
        from beyondff_tpu.models.gdino import GroundingDINO

        det = GroundingDINO.create("swinb", dtype=dtype, device_fill=True)
        seg_model = sam_mod.SAM.create("vit_h", dtype=dtype, device_fill=True)
        det_cfg = {}
    else:
        from beyondff_tpu.models import efficientsam, yolo_world

        det = yolo_world.YOLOWorld.create("l", dtype=dtype)
        seg_model = efficientsam.EfficientSAM.create("vits", dtype=dtype)
        # same workload-faithful max_dets clamp as
        # bench.fast_pipeline_wall_clock (the random-init contrastive head
        # saturates; see the comment there)
        k = 2 * boxes_target
        if det.cfg.max_dets > k:
            det = yolo_world.YOLOWorld(dataclasses.replace(det.cfg, max_dets=k),
                                       det.params, dtype=dtype)
        det_cfg = {"kind": "yolo_world"}
    clip = clip_mod.CLIP.create("ViT-L/14", dtype=dtype, device_fill=True)
    print(f"# models built in {time.time() - t0:.1f}s", flush=True)

    cfg = Config.from_dict({
        "paths": {"scene_2d_dir": root},
        "frames": {"width_2d": width, "height_2d": height, "downsample_ratio": 1},
        "detector": {**det_cfg, "box_threshold": -1.0,
                     "must_match_query": False, "similarity_threshold": -10.0,
                     "max_detections": boxes_target, "dtype": dtype_name,
                     "frame_batch": int(os.environ.get("BFF_BENCH_FRAME_BATCH", "4"))},
    })
    seg = Segmentor2D(cfg, detector=det, sam=seg_model, clip_model=clip,
                      clip_tokenizer=HashTokenizer(clip.cfg.vocab_size,
                                                   clip.cfg.context_length))
    return seg, cfg, root, (width, height)


def query_threshold(seg, root, size, boxes_target, query):
    """Hit-regime box_threshold for ONE query: keep ~boxes_target boxes on
    frame0 (scores are query-conditioned, so multi-class runs must calibrate
    per class — one shared threshold leaves other classes in the miss
    regime, which an early emb-bank A/B measured as a confounder)."""
    from beyondff_tpu.utils import io as bio

    frame0 = bio.load_image(os.path.join(root, "scene0000_00", "color", "0.jpg"),
                            size=size)
    _b, scores, _p = seg.detector.predict(frame0, query, box_threshold=-1.0)
    scores = np.sort(np.asarray(scores))[::-1]
    return float(scores[boxes_target - 1]) - 1e-6 \
        if scores.size >= boxes_target else -1.0


def calibrate(seg, cfg, root, size, boxes_target, regime, query="clothes"):
    if regime == "miss":
        seg.cfg = cfg.override(**{"detector.box_threshold": 2.0})
        return
    thr = query_threshold(seg, root, size, boxes_target, query)
    seg.cfg = cfg.override(**{"detector.box_threshold": thr})
    print(f"# calibrated box_threshold={thr:.4f} ({query})", flush=True)


def main():
    n_classes = int(os.environ.get("BFF_FAST_CLASSES", "0"))
    regimes = os.environ.get("BFF_FAST_REGIME", "hit").split(",")
    n_frames = int(os.environ.get("BFF_BENCH_FRAMES", "48"))
    boxes_target = int(os.environ.get("BFF_BENCH_BOXES", "4"))
    passes = int(os.environ.get("BFF_FAST_PASSES", "3"))

    seg, cfg, root, size = build_seg(n_frames, boxes_target)

    modes = os.environ.get(
        "BFF_FAST_MODES", "multi" if n_classes > 1 else "knob").split(",")

    for regime in regimes:
        calibrate(seg, cfg, root, size, boxes_target, regime)

        if "multi" in modes and n_classes > 1:
            # ---- multi-class frame-bank mode. With BFF_FAST_KNOB set, each
            # pass runs the class loop once per knob variant (fresh bank
            # each) so bank-policy knobs (e.g. BFF_SEG2D_BANK_EMB) A/B
            # inside one process/compile, interleaved against link drift.
            knob = os.environ.get("BFF_FAST_KNOB")
            variants = (os.environ.get("BFF_FAST_VARIANTS", "1,0").split(",")
                        if knob else [None])
            classes = [f"class{j}" for j in range(n_classes)]
            # per-class hit thresholds: every class must actually HIT for
            # the banked text-independent work (frames, pyramids, SAM embs)
            # to be exercised across classes
            thr_by_class = {}
            if regime == "hit":
                for c in classes:
                    thr_by_class[c] = query_threshold(
                        seg, root, size, boxes_target, c)
                print("# per-class thresholds: "
                      + ", ".join(f"{c}={thr_by_class[c]:.4f}"
                                  for c in classes), flush=True)
            if classes[0] in thr_by_class:
                # warm the HIT-path programs (encode/decode shapes)
                seg.cfg = cfg.override(
                    **{"detector.box_threshold": thr_by_class[classes[0]]})
            t0 = time.time()
            seg.process_scene("scene0000_00", classes[0])
            print(f"# warmup {time.time() - t0:.1f}s", flush=True)
            best = {v: {} for v in variants}
            for p in range(passes):
                for v in variants:
                    if knob:
                        os.environ[knob] = v
                    bank = {}
                    for j, c in enumerate(classes):
                        if c in thr_by_class:
                            seg.cfg = cfg.override(
                                **{"detector.box_threshold": thr_by_class[c]})
                        t0 = time.time()
                        recs = seg.process_scene("scene0000_00", c,
                                                 frame_bank=bank)
                        dt = time.time() - t0
                        label = "first" if j == 0 else f"banked{j}"
                        best[v][label] = max(best[v].get(label, 0.0),
                                             n_frames / dt)
                        tag = f"{knob}={v} " if knob else ""
                        print(f"  pass{p} {regime} [{tag}{label}] "
                              f"{n_frames / dt:.2f} f/s "
                              f"({len(recs)} frames with boxes)", flush=True)
            if knob:
                os.environ.pop(knob, None)
            for v in variants:
                banked = [x for k, x in best[v].items()
                          if k.startswith("banked")]
                tag = f" [{knob}={v}]" if knob else ""
                print(f"{regime}-regime multiclass{tag} best-of-{passes}: "
                      f"first {best[v]['first']:.2f} f/s, banked "
                      f"{np.mean(banked):.2f} f/s avg (max {max(banked):.2f})"
                      f" -> amortization x{np.mean(banked) / best[v]['first']:.2f}",
                      flush=True)

        if "fused" in modes and n_classes > 1:
            # ---- fused-captions mode: per-class banked loop vs one fused
            # multi-phrase detection pass + per-class override replays.
            from beyondff_tpu.pipeline import segmentation_2d as s2d
            from beyondff_tpu.utils import io as bio

            classes = [f"class{j}" for j in range(n_classes)]
            group_size = int(os.environ.get("BFF_FUSED_GROUP", "16"))
            groups = s2d._fused_groups(seg.detector, classes, group_size)
            print(f"# fused groups: {[len(g[0]) for g in groups]}", flush=True)

            # per-class thresholds, calibrated per PROTOCOL: the single-class
            # captions for the per-class variant, the fused caption's span
            # scores for the fused variant (both keep ~boxes_target boxes on
            # frame0, so the downstream CLIP/SAM workload matches)
            thr_pc, thr_fused = {}, {}
            if regime == "hit":
                frame0 = bio.load_image(
                    os.path.join(root, "scene0000_00", "color", "0.jpg"),
                    size=size)
                for c in classes:
                    thr_pc[c] = query_threshold(seg, root, size,
                                                boxes_target, c)
                for group, caption, spans in groups:
                    if hasattr(seg.detector, "_dispatch"):  # GDINO spans
                        handle = seg.detector._dispatch([frame0], caption,
                                                        frames=False)
                        out0 = seg.detector.predict_finalize_demux(
                            handle, spans, box_threshold=-1e9)
                        per_class_scores = [sc for _b, sc, _p in out0[0]]
                    else:  # YOLO-World: argmax class assignment
                        _b, sc_all, ph = seg.detector.predict(
                            frame0, caption, box_threshold=-1.0)
                        per_class_scores = [
                            np.asarray([s for s, p in zip(sc_all, ph)
                                        if p == c]) for c in group]
                    for c, sc in zip(group, per_class_scores):
                        sc = np.sort(np.asarray(sc))[::-1]
                        thr_fused[c] = (float(sc[boxes_target - 1]) - 1e-6
                                        if sc.size >= boxes_target else -1.0)
            else:
                thr_pc = {c: 2.0 for c in classes}
                thr_fused = dict(thr_pc)

            # warm both protocols' programs
            seg.cfg = cfg.override(
                **{"detector.box_threshold": thr_pc[classes[0]]})
            t0 = time.time()
            seg.process_scene("scene0000_00", classes[0])
            print(f"# warmup {time.time() - t0:.1f}s", flush=True)

            # with BFF_FAST_KNOB set, the FUSED pass runs once per knob
            # variant each round (interleaved, like knob-sweep mode) so
            # replay-phase knobs (e.g. BFF_CLIP_DEVICE_CROPS) A/B inside one
            # process against link drift; the per-class baseline runs once.
            knob = os.environ.get("BFF_FAST_KNOB")
            variants = (os.environ.get("BFF_FAST_VARIANTS", "1,0").split(",")
                        if knob else [None])
            fused_keys = [f"fused[{knob}={v}]" if knob else "fused"
                          for v in variants]
            best = {"perclass": 0.0, **{k: 0.0 for k in fused_keys}}
            masks = {}
            for p in range(passes):
                # A: per-class banked loop (the existing run_classes pattern)
                bank = {}
                t0 = time.time()
                n_masks = 0
                for c in classes:
                    seg.cfg = cfg.override(
                        **{"detector.box_threshold": thr_pc[c]})
                    recs = seg.process_scene("scene0000_00", c,
                                             frame_bank=bank)
                    n_masks += sum(len(r["confidences"]) for r in recs)
                dt = time.time() - t0
                fps = n_frames * n_classes / dt
                best["perclass"] = max(best["perclass"], fps)
                masks["perclass"] = n_masks
                print(f"  pass{p} {regime} [perclass] {dt:.2f}s = "
                      f"{fps:.2f} class-f/s ({n_masks} masks)", flush=True)

                # B: fused demux + COMBINED replay (the run_classes pattern:
                # one pipeline pass serves the whole group's replays)
                for v, fkey in zip(variants, fused_keys):
                    if knob:
                        os.environ[knob] = v
                    bank = {}
                    t0 = time.time()
                    n_masks = 0
                    for group, caption, spans in groups:
                        dets = {}
                        thr = [thr_fused[c] for c in group]
                        seg.process_scene("scene0000_00", caption,
                                          frame_bank=bank,
                                          demux=(group, spans, dets, thr))
                        tables = {c: {fid: det
                                      for (cc, fid), det in dets.items()
                                      if cc == c} for c in group}
                        by_class = seg.process_scene(
                            "scene0000_00", caption, frame_bank=bank,
                            override_groups=tables)
                        for recs in by_class.values():
                            n_masks += sum(len(r["confidences"])
                                           for r in recs)
                    dt = time.time() - t0
                    fps = n_frames * n_classes / dt
                    best[fkey] = max(best[fkey], fps)
                    masks[fkey] = n_masks
                    print(f"  pass{p} {regime} [{fkey}] {dt:.2f}s = "
                          f"{fps:.2f} class-f/s ({n_masks} masks)",
                          flush=True)
            if knob:
                os.environ.pop(knob, None)
            for fkey in fused_keys:
                print(f"{regime}-regime fused x{n_classes} classes best-of-"
                      f"{passes}: perclass {best['perclass']:.2f} vs "
                      f"{fkey} {best[fkey]:.2f} class-f/s -> "
                      f"x{best[fkey] / max(best['perclass'], 1e-9):.2f} "
                      f"(masks {masks.get('perclass')} vs {masks.get(fkey)})",
                      flush=True)

        if "knob" not in modes:
            continue

        # ---- knob-sweep mode
        knob = os.environ.get("BFF_FAST_KNOB", "BFF_CLIP_YUV")
        variants = os.environ.get("BFF_FAST_VARIANTS", "1,0").split(",")
        t0 = time.time()
        seg.process_scene("scene0000_00", "clothes")
        print(f"# warmup {time.time() - t0:.1f}s", flush=True)
        results = {v: [] for v in variants}
        for p in range(passes):
            for v in variants:
                os.environ[knob] = v
                t0 = time.time()
                recs = seg.process_scene("scene0000_00", "clothes")
                dt = time.time() - t0
                results[v].append(n_frames / dt)
                print(f"  pass{p} {regime} [{knob}={v}] {n_frames / dt:.2f} f/s "
                      f"({len(recs)} frames with boxes, "
                      f"{sum(len(r['confidences']) for r in recs)} masks)",
                      flush=True)
        os.environ.pop(knob, None)
        for v in variants:
            print(f"{regime}-regime [{knob}={v}]: best {max(results[v]):.2f} f/s "
                  f"(all={[round(x, 2) for x in results[v]]})", flush=True)


if __name__ == "__main__":
    main()
