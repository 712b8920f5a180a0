"""Label the depth-decimation knob with its accuracy cost.

``frames.depth_decimation=k`` subsamples depth k-fold before the lift's
visibility test (perf lever for the link-bound depth upload; BFF_DEPTH_DEC
in tools/bench_pipeline.py). This measures its accuracy effect on the
synthetic-scene proxy: projection+refinement run at dec=1/2/4 on the
make_synthetic_scene fixture, then we report (a) ScanNet200-protocol AP
against the synthetic GT (pipeline/evaluate.py — the same engine the real
eval uses) and (b) final-mask IoU against the dec=1 outputs.

    BFF_PLATFORM=cpu python tools/measure_depth_decimation.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("BFF_PLATFORM") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import make_synthetic_scene

    from beyondff_tpu.config import Config
    from beyondff_tpu.pipeline import evaluate, projection, refinement
    from beyondff_tpu.utils import io as bio

    query = "clothes"
    root = tempfile.mkdtemp(prefix="bff_dec_")
    try:
        cfg_path = make_synthetic_scene.generate(root, query, scenes=2, seed=7)
        base = Config.from_yaml(cfg_path)

        results = {}
        for dec in (1, 2, 4):
            cfg = base.override(**{"frames.depth_decimation": dec})
            # fresh stage outputs per variant
            for sub in ("mask_3d", "final_output", "checkpoints", "eval_results"):
                shutil.rmtree(os.path.join(root, sub), ignore_errors=True)
            projection.run(cfg, query, resume=False)
            refinement.run_multi(cfg, [query])
            ev = evaluate.run(cfg, query, verbose=False)
            masks = {}
            out_dir = os.path.join(root, "final_output", query)
            for f in sorted(os.listdir(out_dir)):
                d = bio.load_stage_dict(os.path.join(out_dir, f))
                masks[f] = np.asarray(d["ins"], bool)
            results[dec] = (ev, masks)
            ap = ev.get("all_ap", ev)
            print(f"# dec={dec}: eval={ap}", flush=True)

        base_masks = results[1][1]
        print("\ndec  AP      AP50    AP25    mean_final_mask_IoU_vs_dec1")
        for dec in (1, 2, 4):
            ev, masks = results[dec]
            ious = []
            for f, m1 in base_masks.items():
                m = masks.get(f)
                if m is None or m.shape[0] == 0 or m1.shape[0] == 0:
                    ious.append(0.0 if (m is None or m.shape[0] != m1.shape[0])
                                else 1.0)
                    continue
                # greedy match rows by IoU
                inter = (m[:, None] & m1[None]).sum(-1)
                union = (m[:, None] | m1[None]).sum(-1)
                iou = inter / np.maximum(union, 1)
                ious.append(float(iou.max(axis=1).mean()))
            a = ev if isinstance(ev, dict) else {}
            print(f"{dec}    {a.get('all_ap', float('nan')):.4f}  "
                  f"{a.get('all_ap_50%', float('nan')):.4f}  "
                  f"{a.get('all_ap_25%', float('nan')):.4f}  "
                  f"{np.mean(ious):.4f}", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
