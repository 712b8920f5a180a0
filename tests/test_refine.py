"""Refinement core: matching, merging, threshold selection, pass-2 fusion."""

import numpy as np

from beyondff_tpu.core import refine


def test_match_scene_empty_stage2():
    s1 = np.zeros((3, 20), bool)
    s1[0, :5] = s1[1, 5:10] = s1[2, 10:15] = True
    m = refine.match_scene(s1, ["clothes", "chair", "clothes"], np.zeros((0, 20), bool),
                           np.zeros(0), "clothes")
    assert m.ious.shape == (0,)
    assert m.other_stage1.shape[0] == 2  # both 'clothes' stage-1 masks kept


def test_match_scene_basic(rng):
    n = 100
    s1 = np.zeros((2, n), bool)
    s1[0, :40] = True
    s1[1, 60:] = True
    # stage2 mask overlapping s1[0] strongly
    s2 = np.zeros((1, n), bool)
    s2[0, :35] = True
    m = refine.match_scene(s1, ["chair", "chair"], s2, np.array([0.8]), "chair")
    assert m.ious.shape == (1,)
    np.testing.assert_array_equal(m.matched_stage1[0], s1[0])
    assert m.matched_labels == ["chair"]
    # s1[1] has the query label and is unmatched -> other
    assert m.other_stage1.shape[0] == 1
    np.testing.assert_array_equal(m.other_stage1[0], s1[1])


def test_match_scene_merges_stage2_sharing_stage1():
    n = 100
    s1 = np.zeros((1, n), bool)
    s1[0, :60] = True
    s2 = np.zeros((2, n), bool)
    s2[0, :30] = True
    s2[1, 30:60] = True  # both best-match s1[0]
    m = refine.match_scene(s1, ["chair"], s2, np.array([0.6, 0.8]), "chair")
    # merged into one stage-2 mask with mean conf
    assert m.stage2.shape[0] == 1
    np.testing.assert_array_equal(m.stage2[0], s2[0] | s2[1])
    np.testing.assert_allclose(m.stage2_conf[0], 0.7, rtol=1e-6)


def test_match_scene_unions_overlapping_stage1():
    n = 100
    s1 = np.zeros((2, n), bool)
    s1[0, :40] = True
    s1[1, 30:70] = True  # IoU(s1[0], s1[1]) = 10/70 > 0.1
    s2 = np.zeros((2, n), bool)
    s2[0, :38] = True  # matches s1[0]
    s2[1, 32:68] = True  # matches s1[1]
    m = refine.match_scene(s1, ["chair", "chair"], s2, np.array([0.5, 0.5]), "chair",
                           stage1_iou_thres=0.1)
    # overlapping matched stage-1 masks were unioned; stage-2 merged onto one match
    assert m.stage2.shape[0] == 1
    np.testing.assert_array_equal(m.matched_stage1[0], s1[0] | s1[1])


def test_select_sim_threshold():
    sims = [[0.9, 0.5], [0.7], [], [0.5]]
    # unique sorted: [0.5, 0.7, 0.9]; thres = uniq[int(3*0.5)] = 0.7
    assert refine.select_sim_threshold(sims, 0.5) == 0.7
    assert refine.select_sim_threshold([[]], 0.2) == float("-inf")


def test_fuse_scene_branches():
    n = 50
    matched_s1 = np.zeros((2, n), bool)
    matched_s1[0, :10] = True
    matched_s1[1, 10:20] = True
    s2 = np.zeros((2, n), bool)
    s2[0, :8] = True
    s2[1, 20:30] = True
    other = np.zeros((1, n), bool)
    other[0, 40:] = True
    scene = refine.SceneMatch(
        ious=np.array([0.6, 0.1]),  # first above iou_thres, second below
        matched_labels=["chair", "table"],
        matched_stage1=matched_s1,
        stage2=s2,
        stage2_conf=np.array([0.9, 0.4], np.float32),
        other_stage1=other,
        similarities=[0.8, 0.2],
    )
    ins, conf, labels = refine.fuse_scene(scene, "chair", sim_thres=0.5, iou_thres=0.45)
    # order: other (conf .5) + stage1-kept (iou .6, sim .8 >= .5) + stage2-kept (iou .1)
    assert ins.shape[0] == 3
    np.testing.assert_array_equal(ins[0], other[0])
    np.testing.assert_array_equal(ins[1], matched_s1[0])
    np.testing.assert_array_equal(ins[2], s2[1])
    np.testing.assert_allclose(conf, [0.5, 0.9, 0.4])
    assert labels == ["chair"] * 3

    # high-iou pair with similarity below threshold is dropped entirely
    scene.similarities = [0.3, 0.2]
    ins2, conf2, _ = refine.fuse_scene(scene, "chair", sim_thres=0.5, iou_thres=0.45)
    assert ins2.shape[0] == 2  # other + stage2-kept only
