#!/usr/bin/env python
"""Stage 1 CLI: open-vocab 2D detection + segmentation over a class's scenes.

Usage (same shape as the reference command, README.md:44-54):
    python tools/segmentation_2d.py --config configs/config.yaml --cls "clothes"
    python tools/segmentation_2d.py --config ... --cls ... --detector yolo_world
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beyondff_tpu.config import Config
from beyondff_tpu.pipeline import segmentation_2d


def main():
    ap = argparse.ArgumentParser(description="BeyondFF-TPU 2D segmentation stage")
    ap.add_argument("--config", required=True)
    ap.add_argument("--cls", required=True,
                    help="text query / class name; comma-separate several to "
                         "decode+upload each scene's frames once for all "
                         "classes (scene-outer, segmentation_2d.run_classes)")
    ap.add_argument("--scene", default=None, help="restrict to one scene id")
    ap.add_argument("--detector", default=None, choices=["grounding_dino", "yolo_world"],
                    help="override detector kind")
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    cfg = Config.from_yaml(args.config)
    if args.detector:
        cfg = cfg.override(**{"detector.kind": args.detector})
    scenes = [args.scene] if args.scene else None
    classes = [c.strip() for c in args.cls.split(",") if c.strip()]
    if not classes:
        ap.error("--cls must name at least one class")
    t0 = time.time()
    if len(classes) > 1:
        by_class = segmentation_2d.run_classes(cfg, classes, scenes=scenes,
                                               resume=not args.no_resume)
    else:
        by_class = {classes[0]: segmentation_2d.run(
            cfg, classes[0], scenes=scenes, resume=not args.no_resume)}
    dt = time.time() - t0
    total = sum(len(r) for r in by_class.values())
    print(f"[segmentation_2d] {len(by_class)} class(es), {total} class-scenes, "
          f"time={dt:.1f}s")
    for cls_name, results in by_class.items():
        print(f"[segmentation_2d] class={cls_name!r} scenes={len(results)}")
        for r in results:
            print(f"  {r['scene_id']}: {r['frames_with_boxes']} frames with detections")


if __name__ == "__main__":
    main()
