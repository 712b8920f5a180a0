"""A/B the seg2d hit-regime wall clock (every frame detects) against the
eager-SAM-encode pipelining knob.

The hit regime measured 4.74 f/s wall vs a 5.44 f/s device bound
(BENCH r3): after detection finalize the host builds/normalizes CLIP crops
while the chip idles before SAM encode. BFF_SEG2D_EAGER_SAM=1 (default)
dispatches the encode first so that host work overlaps ViT-H device time.

    python tools/bench_hit_ab.py                       # both variants
    BFF_HIT_VARIANTS=1 python tools/bench_hit_ab.py    # eager only
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
    from beyondff_tpu.models import sam as sam_mod
    from beyondff_tpu.models.gdino import GroundingDINO, model as gdino_model
    from beyondff_tpu.models.tokenizers import HashTokenizer
    from beyondff_tpu.pipeline.segmentation_2d import Segmentor2D
    from beyondff_tpu.utils import io as bio

    dtype = jnp.bfloat16
    n_frames = int(os.environ.get("BFF_BENCH_FRAMES", "48"))
    boxes_target = int(os.environ.get("BFF_BENCH_BOXES", "4"))
    width, height = 1296, 968
    root = "/tmp/bff_bench_scene_full"
    bench.make_scene(root, n_frames, width, height)

    t0 = time.time()
    gdino = GroundingDINO.create(gdino_model.PRESETS["swinb"], dtype=dtype,
                                 device_fill=True)
    sam = sam_mod.SAM.create("vit_h", dtype=dtype, device_fill=True)
    clip = clip_mod.CLIP.create("ViT-L/14", dtype=dtype, device_fill=True)
    print(f"# models built in {time.time() - t0:.1f}s", flush=True)

    frame_batch = int(os.environ.get("BFF_BENCH_FRAME_BATCH", "4"))
    cfg = Config.from_dict({
        "paths": {"scene_2d_dir": root},
        "frames": {"width_2d": width, "height_2d": height, "downsample_ratio": 1},
        "detector": {"box_threshold": -1.0, "must_match_query": False,
                     "similarity_threshold": -10.0, "max_detections": boxes_target,
                     "dtype": "bfloat16", "frame_batch": frame_batch},
    })
    seg = Segmentor2D(cfg, detector=gdino, sam=sam, clip_model=clip,
                      clip_tokenizer=HashTokenizer(clip.cfg.vocab_size,
                                                   clip.cfg.context_length))

    # calibrate box_threshold for ~boxes_target boxes/frame (bench.py:193)
    frame0 = bio.load_image(os.path.join(root, "scene0000_00", "color", "0.jpg"),
                            size=(width, height))
    _b, scores, _p = seg.detector.predict(frame0, "clothes", box_threshold=-1.0)
    scores = np.sort(np.asarray(scores))[::-1]
    thr = float(scores[boxes_target - 1]) - 1e-6 if scores.size >= boxes_target else -1.0
    seg.cfg = cfg.override(**{"detector.box_threshold": thr})
    print(f"# calibrated box_threshold={thr:.4f}", flush=True)

    variants = os.environ.get("BFF_HIT_VARIANTS", "1,0").split(",")
    defer_variants = os.environ.get("BFF_HIT_DEFER", "1").split(",")
    passes = int(os.environ.get("BFF_HIT_PASSES", "3"))
    warmed = False
    for dflag in defer_variants:
        os.environ["BFF_SEG2D_DEFER"] = dflag
        for flag in variants:
            os.environ["BFF_SEG2D_EAGER_SAM"] = flag
            label = ("eager sam encode" if flag != "0" else "filter-then-encode")
            label += " defer" if dflag != "0" else " blocking"
            if not warmed:
                # defer variants reuse the same compiled programs — only the
                # first variant pays the compile warmup
                t0 = time.time()
                seg.process_scene("scene0000_00", "clothes")
                print(f"# [{label}] warmup {time.time() - t0:.1f}s", flush=True)
                warmed = True
            times = []
            for _ in range(passes):
                t0 = time.time()
                recs = seg.process_scene("scene0000_00", "clothes")
                times.append(time.time() - t0)
            n_boxes = sum(len(r["confidences"]) for r in recs)
            print(f"hit-regime [{label}]: best {n_frames / min(times):.2f} f/s "
                  f"({len(recs)} frames with boxes, {n_boxes} masks, "
                  f"all={[round(n_frames / t, 2) for t in times]})", flush=True)
    os.environ.pop("BFF_SEG2D_EAGER_SAM", None)
    os.environ.pop("BFF_SEG2D_DEFER", None)


if __name__ == "__main__":
    main()
