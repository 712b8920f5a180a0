"""A/B the seg2d miss-regime wall clock against pipeline-depth knobs.

The miss regime (no frame passes the box threshold) is pure
detection+finalize; it regressed 4.87 -> 3.03 f/s when the pipeline moved
to two-batches-in-flight + packed downloads. This probe measures the miss
regime only, several passes per variant, with the in-flight depth and the
prefetch depth settable via env (BFF_SEG2D_INFLIGHT, BFF_SEG2D_PREFETCH),
to separate the knobs from co-tenant noise.

    python tools/bench_miss_ab.py            # current defaults
    BFF_SEG2D_INFLIGHT=1 python tools/bench_miss_ab.py
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

    dtype = jnp.bfloat16
    n_frames = int(os.environ.get("BFF_BENCH_FRAMES", "24"))
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
        "detector": {"box_threshold": 2.0, "must_match_query": False,
                     "similarity_threshold": -10.0, "max_detections": 4,
                     "dtype": "bfloat16", "frame_batch": frame_batch},
    })
    seg = Segmentor2D(cfg, detector=gdino, sam=sam, clip_model=clip,
                      clip_tokenizer=HashTokenizer(clip.cfg.vocab_size,
                                                   clip.cfg.context_length))

    t0 = time.time()
    seg.process_scene("scene0000_00", "clothes")
    print(f"# warmup {time.time() - t0:.1f}s", flush=True)
    passes = int(os.environ.get("BFF_MISS_PASSES", "4"))
    for workers in os.environ.get("BFF_MISS_WORKERS", "1").split(","):
        os.environ["BFF_SEG2D_WORKERS"] = workers
        times = []
        for _ in range(passes):
            t0 = time.time()
            seg.process_scene("scene0000_00", "clothes")
            times.append(time.time() - t0)
            print(f"# pass {times[-1]:.2f}s = {n_frames / times[-1]:.2f} f/s",
                  flush=True)
        best = min(times)
        print(f"miss-regime best: {n_frames / best:.2f} f/s "
              f"(workers={workers}, "
              f"inflight={os.environ.get('BFF_SEG2D_INFLIGHT', 'default')}, "
              f"prefetch={os.environ.get('BFF_SEG2D_PREFETCH', 'default')}, "
              f"all={[round(n_frames / t, 2) for t in times]})", flush=True)
    os.environ.pop("BFF_SEG2D_WORKERS", None)


if __name__ == "__main__":
    main()
