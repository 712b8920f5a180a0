"""A/B the seg2d frame-transport knobs on the real link.

Sweeps BFF_SEG2D_YUV (YCrCb 4:2:0 vs dense RGB uploads) x
BFF_SEG2D_BATCH_UPLOAD (one transfer per detection batch vs per frame) in
INTERLEAVED paired rounds — the shared tunnel's bandwidth drifts between
sessions (CLAUDE.md), so each round runs every variant once and the verdict
compares best-of per variant.

    python tools/bench_upload_ab.py                     # GDINO, miss regime
    BFF_UPLOAD_DET=yolo python tools/bench_upload_ab.py # fast variant
    BFF_UPLOAD_REGIME=hit python tools/bench_upload_ab.py
    BFF_UPLOAD_VARIANTS=11,00 python tools/bench_upload_ab.py  # subset
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax.numpy as jnp

    import bench
    from beyondff_tpu.config import Config
    from beyondff_tpu.models import clip as clip_mod
    from beyondff_tpu.models.tokenizers import HashTokenizer
    from beyondff_tpu.pipeline.segmentation_2d import Segmentor2D
    from beyondff_tpu.utils import io as bio

    dtype = jnp.bfloat16
    det_kind = os.environ.get("BFF_UPLOAD_DET", "gdino")
    regime = os.environ.get("BFF_UPLOAD_REGIME", "miss")
    n_frames = int(os.environ.get("BFF_BENCH_FRAMES",
                                  "48" if regime == "hit" else "24"))
    boxes_target = int(os.environ.get("BFF_BENCH_BOXES", "4"))
    width, height = 1296, 968
    root = "/tmp/bff_bench_scene_full"
    bench.make_scene(root, n_frames, width, height)

    t0 = time.time()
    if det_kind == "yolo":
        from beyondff_tpu.models import efficientsam, yolo_world

        detector = yolo_world.YOLOWorld.create("l", dtype=dtype)
        sam = efficientsam.EfficientSAM.create("vits", dtype=dtype)
        det_cfg = {"kind": "yolo_world", "filter_with_clip": False}
    else:
        from beyondff_tpu.models import sam as sam_mod
        from beyondff_tpu.models.gdino import GroundingDINO, model as gdino_model

        detector = GroundingDINO.create(gdino_model.PRESETS["swinb"], dtype=dtype,
                                        device_fill=True)
        sam = sam_mod.SAM.create("vit_h", dtype=dtype, device_fill=True)
        det_cfg = {}
    clip = clip_mod.CLIP.create("ViT-L/14", dtype=dtype, device_fill=True)
    print(f"# models built in {time.time() - t0:.1f}s", flush=True)

    frame_batch = int(os.environ.get("BFF_BENCH_FRAME_BATCH", "4"))
    cfg = Config.from_dict({
        "paths": {"scene_2d_dir": root},
        "frames": {"width_2d": width, "height_2d": height, "downsample_ratio": 1},
        "detector": {"box_threshold": 2.0, "must_match_query": False,
                     "similarity_threshold": -10.0, "max_detections": boxes_target,
                     "dtype": "bfloat16", "frame_batch": frame_batch, **det_cfg},
    })
    seg = Segmentor2D(cfg, detector=detector, sam=sam, clip_model=clip,
                      clip_tokenizer=HashTokenizer(clip.cfg.vocab_size,
                                                   clip.cfg.context_length))

    if regime == "hit":
        # calibrate box_threshold for ~boxes_target boxes/frame (bench.py)
        frame0 = bio.load_image(
            os.path.join(root, "scene0000_00", "color", "0.jpg"),
            size=(width, height))
        _b, scores, _p = seg.detector.predict(frame0, "clothes",
                                              box_threshold=-1.0)
        scores = np.sort(np.asarray(scores))[::-1]
        thr = (float(scores[boxes_target - 1]) - 1e-6
               if scores.size >= boxes_target else -1.0)
        seg.cfg = cfg.override(**{"detector.box_threshold": thr})
        print(f"# calibrated box_threshold={thr:.4f}", flush=True)

    variants = os.environ.get("BFF_UPLOAD_VARIANTS", "11,10,01,00").split(",")
    rounds = int(os.environ.get("BFF_UPLOAD_ROUNDS", "3"))
    times = {v: [] for v in variants}

    def set_env(v):
        os.environ["BFF_SEG2D_YUV"] = v[0]
        os.environ["BFF_SEG2D_BATCH_UPLOAD"] = v[1]

    for v in variants:  # each variant compiles its own programs once
        set_env(v)
        t0 = time.time()
        seg.process_scene("scene0000_00", "clothes")
        print(f"# [yuv={v[0]} batch={v[1]}] warmup {time.time() - t0:.1f}s",
              flush=True)
    for r in range(rounds):
        for v in variants:
            set_env(v)
            t0 = time.time()
            recs = seg.process_scene("scene0000_00", "clothes")
            dt = time.time() - t0
            times[v].append(dt)
            print(f"# round {r} yuv={v[0]} batch={v[1]}: {dt:.2f}s = "
                  f"{n_frames / dt:.2f} f/s ({len(recs)} frames with boxes)",
                  flush=True)
    for v in variants:
        best = min(times[v])
        print(f"{regime}-regime [{det_kind} yuv={v[0]} batch={v[1]}]: "
              f"best {n_frames / best:.2f} f/s "
              f"(all={[round(n_frames / t, 2) for t in times[v]]})", flush=True)
    os.environ.pop("BFF_SEG2D_YUV", None)
    os.environ.pop("BFF_SEG2D_BATCH_UPLOAD", None)


if __name__ == "__main__":
    main()
