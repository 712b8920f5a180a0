#!/usr/bin/env python
"""Full class-sweep CLI: seg2d -> projection -> refinement -> eval per class.

Equivalent of the reference's outermost driver (reference: evaluation/eval/
run_evl.py), with `--find-parameters` reusing cached 2D masks to re-tune the
downstream thresholds (reference: run_evl_finding_parameter.py).

    python tools/run_sweep.py --config configs/config.yaml
    python tools/run_sweep.py --config configs/config.yaml --classes "clothes,towel"
    python tools/run_sweep.py --config configs/config.yaml --find-parameters

Multi-host (scene-sweep scale-out over DCN-connected hosts sharing a
filesystem; SURVEY §2.4): each host runs its deterministic class partition,
then any one host merges the per-host tables/checkpoints:

    # on host i of N (or rely on an initialized jax.distributed runtime,
    # which resolves --hosts/--host automatically when present):
    python tools/run_sweep.py --config c.yaml --hosts N --host i
    # after all hosts finish:
    python tools/run_sweep.py --config c.yaml --merge-hosts N
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beyondff_tpu.config import Config
from beyondff_tpu.orchestration import (SweepRunner, default_class_list,
                                        merge_host_results, resolve_hosts)


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
    ap.add_argument("--hosts", type=int, default=None,
                    help="total hosts in a multi-host sweep (default: "
                         "jax.process_count() when >1, else 1)")
    ap.add_argument("--host", type=int, default=None,
                    help="this host's index (default: jax.process_index())")
    ap.add_argument("--merge-hosts", type=int, default=None, metavar="N",
                    help="merge N hosts' results tables + checkpoints into "
                         "the canonical files, then exit")
    args = ap.parse_args()

    cfg = Config.from_yaml(args.config)
    if args.merge_hosts:
        merge_host_results(cfg, args.merge_hosts, checkpoint_path=args.checkpoint)
        print(f"[sweep] merged {args.merge_hosts} hosts' results into "
              "overall_results.txt")
        return
    hosts, host = resolve_hosts(args.hosts, args.host)
    runner = SweepRunner(cfg, config_path=args.config, checkpoint_path=args.checkpoint,
                         skip_segmentation=args.find_parameters,
                         use_subprocess=args.subprocess, retries=args.retries,
                         hosts=hosts, host=host)
    classes = args.classes.split(",") if args.classes else default_class_list(args.per_group)
    results = runner.run(classes,
                         amortize_segmentation=args.amortize_segmentation)
    failed = [c for c, st in results.items() if not all(st.values())]
    print(f"[sweep] {len(results) - len(failed)}/{len(results)} classes complete"
          + (f"; failed: {failed}" if failed else ""))


if __name__ == "__main__":
    main()
