#!/usr/bin/env python
"""Single-scene qualitative loop: run the pipeline for one (class, scene) and
export visualizations — the threshold-tuning workflow of the reference's
``*_single`` variants + singlevis_automation (reference: tools/
segmentation_2d_single.py, tools/refinement_single.py,
tools/singlevis_automation.py:24-46).

    python tools/single_scene.py --config config.yaml --cls clothes \
        --scene scene0435_00 [--skip-seg2d] [--png]

Threshold overrides sweep without editing the config:
    --set refinement.iou_thres=0.5 --set aggregation.iou_thres=0.25
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beyondff_tpu.config import Config
from beyondff_tpu.pipeline import projection, refinement, segmentation_2d
from beyondff_tpu.visualization import SceneVisualizer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--cls", required=True)
    ap.add_argument("--scene", required=True)
    ap.add_argument("--skip-seg2d", action="store_true",
                    help="reuse cached 2D masks (tuning loop)")
    ap.add_argument("--set", action="append", default=[],
                    help="dotted config override, e.g. refinement.iou_thres=0.5")
    ap.add_argument("--png", action="store_true")
    ap.add_argument("--out", default="visualization_out")
    args = ap.parse_args()

    cfg = Config.from_yaml(args.config)
    overrides = {}
    for item in args.set:
        key, _, value = item.partition("=")
        try:
            import yaml

            overrides[key] = yaml.safe_load(value)
        except Exception:
            overrides[key] = value
    if overrides:
        cfg = cfg.override(**overrides)

    if not args.skip_seg2d:
        segmentation_2d.run(cfg, args.cls, scenes=[args.scene], resume=False)
    projection.run(cfg, args.cls, scenes=[args.scene], resume=False)
    results = refinement.run(cfg, args.cls, scenes=[args.scene])
    print(f"[single] {args.scene}: {results[0]['instances']} final instances "
          f"(sim_thres={results[0]['sim_thres']:.4f})")

    viz = SceneVisualizer(cfg, args.scene, out_dir=args.out)
    for path in (viz.lifted_masks(args.cls), viz.refined_masks(args.cls)):
        print(path)
        if args.png:
            print(viz.snapshot_png(path))


if __name__ == "__main__":
    main()
