#!/usr/bin/env python
"""Full class-sweep CLI: seg2d -> projection -> refinement -> eval per class.

Equivalent of the reference's outermost driver (reference: evaluation/eval/
run_evl.py), with `--find-parameters` reusing cached 2D masks to re-tune the
downstream thresholds (reference: run_evl_finding_parameter.py).

    python tools/run_sweep.py --config configs/config.yaml
    python tools/run_sweep.py --config configs/config.yaml --classes "clothes,towel"
    python tools/run_sweep.py --config configs/config.yaml --find-parameters
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beyondff_tpu.config import Config
from beyondff_tpu.orchestration import SweepRunner, default_class_list


def main():
    ap = argparse.ArgumentParser(description="BeyondFF-TPU class sweep")
    ap.add_argument("--config", required=True)
    ap.add_argument("--classes", default=None, help="comma-separated override")
    ap.add_argument("--per-group", type=int, default=40,
                    help="classes per head/common/tail group")
    ap.add_argument("--checkpoint", default="process_checkpoint.txt")
    ap.add_argument("--find-parameters", action="store_true",
                    help="skip seg2d; reuse cached 2D masks for threshold tuning")
    ap.add_argument("--retries", type=int, default=0, help="per-stage retry budget")
    ap.add_argument("--subprocess", action="store_true",
                    help="run stages as subprocesses for crash isolation")
    ap.add_argument("--amortize-segmentation", action="store_true",
                    help="run the 2D stage for ALL classes scene-outer first "
                         "(per-scene frame bank; detection still per class)")
    args = ap.parse_args()

    cfg = Config.from_yaml(args.config)
    runner = SweepRunner(cfg, config_path=args.config, checkpoint_path=args.checkpoint,
                         skip_segmentation=args.find_parameters,
                         use_subprocess=args.subprocess, retries=args.retries)
    classes = args.classes.split(",") if args.classes else default_class_list(args.per_group)
    results = runner.run(classes,
                         amortize_segmentation=args.amortize_segmentation)
    failed = [c for c, st in results.items() if not all(st.values())]
    print(f"[sweep] {len(results) - len(failed)}/{len(results)} classes complete"
          + (f"; failed: {failed}" if failed else ""))


if __name__ == "__main__":
    main()
