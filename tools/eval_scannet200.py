#!/usr/bin/env python
"""Per-class evaluation CLI: final outputs + GT -> ScanNet200 AP.

Usage (reference: evaluation/eval/eval_scannet200.py):
    python tools/eval_scannet200.py --config configs/config.yaml --cls "clothes"
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beyondff_tpu.config import Config
from beyondff_tpu.pipeline import evaluate


def main():
    ap = argparse.ArgumentParser(description="BeyondFF-TPU ScanNet200 evaluation")
    ap.add_argument("--config", required=True, help="path to config YAML")
    ap.add_argument("--cls", required=True, help="class to evaluate")
    args = ap.parse_args()

    cfg = Config.from_yaml(args.config)
    avgs = evaluate.run(cfg, args.cls)
    c = avgs["classes"][args.cls]
    print(f"[eval] {args.cls}: AP={c['ap']:.4f} AP50={c['ap50%']:.4f} AP25={c['ap25%']:.4f}")


if __name__ == "__main__":
    main()
