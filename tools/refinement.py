#!/usr/bin/env python
"""Stage 3 CLI: refine stage-1 masks with stage-2 (query-aware) masks.

Usage (same shape as the reference command, README.md:44-54):
    python tools/refinement.py --config configs/config.yaml --cls "clothes"
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beyondff_tpu.config import Config
from beyondff_tpu.pipeline import refinement


def main():
    ap = argparse.ArgumentParser(description="BeyondFF-TPU refinement stage")
    ap.add_argument("--config", required=True, help="path to config YAML")
    ap.add_argument("--cls", required=True,
                    help="text query / class name (comma list = batched multi-query)")
    ap.add_argument("--scene", default=None, help="restrict to one scene id")
    args = ap.parse_args()

    cfg = Config.from_yaml(args.config)
    classes = [c.strip() for c in args.cls.split(",")]
    t0 = time.time()
    if len(classes) > 1:
        multi = refinement.run_multi(cfg, classes)
        dt = time.time() - t0
        for cls, results in multi.items():
            print(f"[refinement] class={cls!r} scenes={len(results)}")
        print(f"[refinement] {len(classes)} queries batched in {dt:.2f}s")
        return
    scenes = [args.scene] if args.scene else None
    results = refinement.run(cfg, classes[0], scenes=scenes)
    dt = time.time() - t0
    print(f"[refinement] class={classes[0]!r} scenes={len(results)} time={dt:.2f}s"
          + (f" sim_thres={results[0]['sim_thres']:.4f}" if results else ""))
    for r in results:
        print(f"  {r['scene_id']}: {r['instances']} final instances")


if __name__ == "__main__":
    main()
