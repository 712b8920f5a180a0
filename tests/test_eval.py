"""AP evaluator: protocol sanity + numerical parity with the reference engine."""

import os
import sys
import types

import numpy as np
import pytest

from beyondff_tpu.eval import ScanNetEval

LABELS = ["chair", "table", "sofa"]


def perfect_scene(rng, n=1000, n_inst=4):
    """gt with n_inst instances (>=100 pts each) + matching perfect preds."""
    sem = np.zeros(n, np.int32)
    ins = np.full(n, -100, np.int32)  # ignored background
    preds = []
    start = 0
    for k in range(n_inst):
        size = 150
        label = k % len(LABELS)
        sem[start:start + size] = label + 2  # scannet200 offset: sem-2+1 = label+1
        ins[start:start + size] = k
        mask = np.zeros(n, np.uint8)
        mask[start:start + size] = 1
        preds.append({"scan_id": "s0", "label_id": label + 1, "conf": 0.9, "pred_mask": mask})
        start += size
    return preds, sem, ins


def test_perfect_predictions_ap1(rng):
    ev = ScanNetEval(LABELS)
    preds, sem, ins = perfect_scene(rng)
    avgs = ev.evaluate([preds], [sem], [ins], verbose=False)
    assert avgs["all_ap"] == pytest.approx(1.0)
    assert avgs["all_ap_50%"] == pytest.approx(1.0)
    assert avgs["all_ap_25%"] == pytest.approx(1.0)


def test_missing_class_is_nan_and_fp_costs(rng):
    ev = ScanNetEval(LABELS)
    preds, sem, ins = perfect_scene(rng)
    # drop all 'sofa' preds and gts -> sofa column nan; nanmean ignores it
    avgs = ev.evaluate([preds[:2]], [sem], [ins], verbose=False)
    assert np.isnan(avgs["classes"]["sofa"]["ap"]) or avgs["classes"]["sofa"]["ap"] >= 0
    assert avgs["all_ap"] < 1.0  # chair/table gts beyond the kept preds unmatched


def test_small_pred_skipped(rng):
    ev = ScanNetEval(LABELS)
    preds, sem, ins = perfect_scene(rng)
    tiny = np.zeros_like(preds[0]["pred_mask"])
    tiny[:50] = 1  # below min_region_size=100
    preds.append({"scan_id": "s0", "label_id": 1, "conf": 1.0, "pred_mask": tiny})
    avgs = ev.evaluate([preds], [sem], [ins], verbose=False)
    assert avgs["all_ap"] == pytest.approx(1.0)  # tiny pred ignored, no FP


def _load_reference_eval():
    """Import the reference evaluator as an oracle (skip when not mounted)."""
    ref = "/root/reference"
    if not os.path.isdir(ref):
        pytest.skip("reference repo not available")
    # stub heavyweight deps the reference imports unconditionally
    if "plyfile" not in sys.modules:
        stub = types.ModuleType("plyfile")
        stub.PlyData = object
        sys.modules["plyfile"] = stub
    if "open3d" not in sys.modules:
        sys.modules["open3d"] = types.ModuleType("open3d")
    if ref not in sys.path:
        sys.path.insert(0, ref)
    from evaluation.eval.scannetv2_inst_eval import ScanNetEval as RefEval

    return RefEval


def random_scenes(rng, n_scenes=3, n=2000):
    scenes = []
    for s in range(n_scenes):
        sem = rng.integers(0, 6, n).astype(np.int32)  # some ids invalid -> void
        ins = rng.integers(-2, 5, n).astype(np.int32)
        preds = []
        for p in range(rng.integers(2, 7)):
            mask = (rng.random(n) < rng.uniform(0.05, 0.3)).astype(np.uint8)
            preds.append(
                {
                    "scan_id": f"scene{s}",
                    "label_id": int(rng.integers(1, len(LABELS) + 1)),
                    "conf": float(np.round(rng.random(), 3)),
                    "pred_mask": mask,
                }
            )
        scenes.append((preds, sem, ins))
    return scenes


def test_parity_with_reference_engine(rng):
    RefEval = _load_reference_eval()
    ours = ScanNetEval(LABELS)
    theirs = RefEval(class_labels=LABELS, dataset_name="scannetv2")
    ours.dataset_name = "scannetv2"  # same -1 offset; avoids s200 print path

    scenes = random_scenes(rng)
    preds = [s[0] for s in scenes]
    sems = [s[1] for s in scenes]
    inss = [s[2] for s in scenes]

    a = ours.evaluate(preds, sems, inss, verbose=False)
    # reference mutates gt arrays in place and prints; call on copies
    results = [
        theirs.assign_instances_for_scan(
            [dict(p) for p in preds[i]], sems[i].copy(), inss[i].copy()
        )
        for i in range(len(sems))
    ]
    matches = {
        f"gt_{i}": {"gt": g, "pred": p} for i, (g, p) in enumerate(results)
    }
    ap_ref, rc_ref = theirs.evaluate_matches(matches)
    b = theirs.compute_averages(ap_ref, rc_ref)

    for key in ["all_ap", "all_ap_50%", "all_ap_25%", "all_rc", "all_rc_50%", "all_rc_25%"]:
        np.testing.assert_allclose(a[key], b[key], rtol=1e-10, err_msg=key)
    for lab in LABELS:
        for k in ["ap", "ap50%", "ap25%", "rc", "rc50%", "rc25%"]:
            va, vb = a["classes"][lab][k], b["classes"][lab][k]
            if np.isnan(vb):
                assert np.isnan(va)
            else:
                np.testing.assert_allclose(va, vb, rtol=1e-10, err_msg=f"{lab}.{k}")


def test_box_iou_evaluation(rng):
    ev = ScanNetEval(LABELS)
    n = 600
    sem = np.zeros(n, np.int32)
    ins = np.full(n, -100, np.int32)
    coords = rng.uniform(0, 10, (n, 3))
    # instance 0: chair occupying a known box
    sem[:200] = 2  # label idx 0 -> benchmark offset
    ins[:200] = 0
    coords[:200] = rng.uniform([0, 0, 0], [1, 1, 1], (200, 3))
    pred_box = np.array([0, 0, 0, 1, 1, 1], np.float64)
    preds = [{"scan_id": "s", "label_id": 1, "conf": 0.9, "box": pred_box}]
    avgs = ev.evaluate_box([preds], [sem], [ins], [coords], verbose=False)
    assert avgs["classes"]["chair"]["ap50%"] > 0.9

    # badly-placed box -> no AP50
    preds2 = [{"scan_id": "s", "label_id": 1, "conf": 0.9,
               "box": np.array([5, 5, 5, 6, 6, 6], np.float64)}]
    avgs2 = ev.evaluate_box([preds2], [sem], [ins], [coords], verbose=False)
    assert avgs2["classes"]["chair"]["ap50%"] == 0.0


def test_pr_curves_collected(rng):
    ev = ScanNetEval(LABELS)
    preds, sem, ins = perfect_scene(rng)
    ev.evaluate([preds], [sem], [ins], verbose=False)
    assert len(ev.pr_curves) > 0
    (label, iou_th), (precision, recall) = next(iter(ev.pr_curves.items()))
    assert precision[-1] == 1.0 and recall[-1] == 0.0


def test_duplicate_match_demotes_lower_score():
    """Two preds matching one gt: the lower-confidence one becomes an FP at
    its own score (the reference's greedy duplicate rule)."""
    ev = ScanNetEval(["chair"])
    n = 400
    sem = np.zeros(n, np.int32)
    ins = np.full(n, -100, np.int32)
    sem[:200] = 2
    ins[:200] = 0
    mask = np.zeros(n, np.uint8)
    mask[:200] = 1
    preds = [
        {"scan_id": "s", "label_id": 1, "conf": 0.9, "pred_mask": mask},
        {"scan_id": "s", "label_id": 1, "conf": 0.6, "pred_mask": mask},
    ]
    avgs = ev.evaluate([preds], [sem], [ins], verbose=False)
    # PR curve: TP at 0.9, FP at 0.6 -> precisions (1.0 then 0.5); AP50 = 1*1... 
    # exact value: recall reaches 1 at the first threshold, extra FP halves
    # precision at the lower threshold but adds no recall -> AP stays 1.0? No:
    # integration includes the FP point. Just assert it's penalized vs clean.
    clean = ev.evaluate([preds[:1]], [sem], [ins], verbose=False)
    assert avgs["classes"]["chair"]["ap50%"] <= clean["classes"]["chair"]["ap50%"]
    assert clean["classes"]["chair"]["ap50%"] == pytest.approx(1.0)
    # order independence: swapping pred order must give identical numbers
    # (greedy matching visits preds in gt-intersection order, highest conf
    # wins via the max/min bookkeeping)
    swapped = ev.evaluate([[preds[1], preds[0]]], [sem], [ins], verbose=False)
    assert swapped["classes"]["chair"]["ap"] == pytest.approx(avgs["classes"]["chair"]["ap"])


def test_missing_scan_id_no_cross_scene_collision(rng):
    """Preds lacking scan_id must not share greedy `visited` keys across
    scenes — round-1 advisory: '_0' collisions silently demoted valid
    matches in later scenes to false positives."""
    ev = ScanNetEval(LABELS)
    scenes = [perfect_scene(rng, n_inst=1) for _ in range(3)]
    preds = [
        [{k: v for k, v in p.items() if k != "scan_id"} for p in s[0]]
        for s in scenes
    ]
    avgs = ev.evaluate(preds, [s[1] for s in scenes], [s[2] for s in scenes],
                       verbose=False)
    assert avgs["all_ap"] == pytest.approx(1.0)


def test_box_eval_parallel_matches_serial(rng):
    """workers>1 (the reference's mp.Pool(16) box path,
    scannetv2_inst_eval.py:620-623) must reproduce the serial result."""
    ev = ScanNetEval(LABELS)
    scenes_sem, scenes_ins, scenes_coords, scenes_preds = [], [], [], []
    for s in range(3):
        n = 400
        sem = np.zeros(n, np.int32)
        ins = np.full(n, -100, np.int32)
        coords = rng.uniform(0, 10, (n, 3))
        sem[:150] = 2
        ins[:150] = 0
        coords[:150] = rng.uniform([0, 0, 0], [1, 1, 1], (150, 3))
        preds = [
            {"scan_id": f"s{s}", "label_id": 1, "conf": 0.9,
             "box": np.array([0, 0, 0, 1, 1, 1], np.float64)},
            {"scan_id": f"s{s}", "label_id": 1, "conf": 0.4,
             "box": rng.uniform(0, 5, 6).astype(np.float64)},
        ]
        scenes_sem.append(sem)
        scenes_ins.append(ins)
        scenes_coords.append(coords)
        scenes_preds.append(preds)
    serial = ev.evaluate_box(scenes_preds, scenes_sem, scenes_ins, scenes_coords,
                             verbose=False, workers=1)
    par = ev.evaluate_box(scenes_preds, scenes_sem, scenes_ins, scenes_coords,
                          verbose=False, workers=2)
    np.testing.assert_allclose(par["all_ap"], serial["all_ap"], rtol=1e-12)
    np.testing.assert_allclose(par["all_ap_50%"], serial["all_ap_50%"], rtol=1e-12)
    for lab in LABELS:
        a, b = par["classes"][lab]["ap"], serial["classes"][lab]["ap"]
        assert (np.isnan(a) and np.isnan(b)) or a == b
