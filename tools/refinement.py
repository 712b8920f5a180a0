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
    ap.add_argument("--cls", required=True, help="text query / class name")
    ap.add_argument("--scene", default=None, help="restrict to one scene id")
    args = ap.parse_args()

    cfg = Config.from_yaml(args.config)
    scenes = [args.scene] if args.scene else None
    t0 = time.time()
    results = refinement.run(cfg, args.cls, scenes=scenes)
    dt = time.time() - t0
    print(f"[refinement] class={args.cls!r} scenes={len(results)} time={dt:.2f}s"
          + (f" sim_thres={results[0]['sim_thres']:.4f}" if results else ""))
    for r in results:
        print(f"  {r['scene_id']}: {r['instances']} final instances")


if __name__ == "__main__":
    main()
