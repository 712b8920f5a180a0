"""Trace the fast-variant (YOLO-World + EfficientSAM) pipeline's host blocks.

Runs the bench's hit regime once with BFF_SEG2D_TRACE=1 so the per-phase
host-blocking breakdown prints per scene. Usage (real chip):

    BFF_SEG2D_TRACE=1 BFF_BENCH_PASSES=1 python tools/trace_fast_pipeline.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax.numpy as jnp

    import bench
    from beyondff_tpu.models import clip as clip_mod
    from beyondff_tpu.models import efficientsam, yolo_world
    from beyondff_tpu.models.tokenizers import HashTokenizer
    from beyondff_tpu.pipeline.segmentation_2d import Segmentor2D

    dtype = jnp.bfloat16
    t0 = time.time()
    clip = clip_mod.CLIP.create("ViT-L/14", dtype=dtype, device_fill=True)
    yw = yolo_world.YOLOWorld.create("l", dtype=dtype)
    esam = efficientsam.EfficientSAM.create("vits", dtype=dtype)
    print(f"# models built in {time.time() - t0:.1f}s", flush=True)

    cfg, n_frames = bench._bench_scene_cfg(False, extra_detector={"kind": "yolo_world"})
    seg = Segmentor2D(cfg, detector=yw, sam=esam, clip_model=clip,
                      clip_tokenizer=HashTokenizer(clip.cfg.vocab_size,
                                                   clip.cfg.context_length))
    print(f"# device_frames path: "
          f"{cfg.detector.device_frames and hasattr(seg.detector, 'predict_batch_frames_async') and hasattr(seg.sam, 'encode_frames')}",
          flush=True)
    bench._measure_pipeline(seg, cfg, n_frames, 0.25, "fast-pipeline")


if __name__ == "__main__":
    main()
