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


def _oracle_pass1(s1, labels1, s2, conf2, query_u, stage1_thres):
    """Literal numpy transcription of the reference's pass-1 semantics
    (refinement.py:208-312) as a differential oracle."""
    def iou_mn(a, b):
        a = a.astype(np.float64); b = b.astype(np.float64)
        inter = a @ b.T
        union = a.sum(1)[:, None] + b.sum(1)[None, :] - inter
        with np.errstate(invalid="ignore"):
            return (inter / union).T  # (m, n)

    s1 = s1.copy().astype(bool)
    s2 = s2.copy().astype(bool)
    conf2 = conf2.copy().astype(np.float64)
    m = s2.shape[0]
    iou = iou_mn(s1, s2)
    max_match = np.argmax(iou, axis=1)

    mm = iou_mn(s1[max_match], s1[max_match])
    np.fill_diagonal(mm, 0)
    mm = (mm > stage1_thres).astype(int)

    best = []
    remove_idx = -np.ones(m, int)
    for i in range(m):
        if remove_idx[i] != -1:
            best.append(max_match[remove_idx[i]])
            continue
        best.append(max_match[i])
        if mm[i].sum() > 0:
            for j in range(m):
                if mm[i][j] == 1:
                    remove_idx[j] = i
                    s1[max_match[i]] = s1[max_match[i]] | s1[max_match[j]]
    best = np.asarray(best)

    uniques, counts = np.unique(best, return_counts=True)
    for i, count in zip(uniques, counts):
        if count > 1:
            sel = best == i
            merged = s2[sel].any(axis=0)
            mc = conf2[sel].mean()
            s2 = np.concatenate([s2[~sel], merged[None]])
            conf2 = np.concatenate([conf2[~sel], [mc]])
            best = np.concatenate([best[~sel], [i]])

    iou2 = iou_mn(s1, s2)
    max2 = np.argmax(iou2, axis=1)
    matched_iou = iou2[np.arange(len(max2)), max2]
    other = [i for i, lab in enumerate(labels1)
             if lab == query_u and i not in set(max2.tolist())]
    return dict(s1=s1, s2=s2, conf=conf2, match=max2, iou=matched_iou, other=other)


def test_match_scene_differential_vs_oracle(rng):
    for trial in range(20):
        n1 = int(rng.integers(2, 8))
        n2 = int(rng.integers(1, 6))
        npts = 120
        # engineered overlaps: random blobs with shared support to trigger merges
        base = rng.random((4, npts)) < 0.35
        s1 = np.stack([base[rng.integers(0, 4)] | (rng.random(npts) < 0.1)
                       for _ in range(n1)])
        s2 = np.stack([base[rng.integers(0, 4)] & (rng.random(npts) < 0.9)
                       for _ in range(n2)])
        s2[:, :5] = True  # no empty stage-2 masks
        conf = rng.random(n2).astype(np.float32)
        labels = [["clothes", "chair"][int(rng.integers(0, 2))] for _ in range(n1)]

        ours = refine.match_scene(s1, labels, s2, conf, "clothes", stage1_iou_thres=0.1,
                                  use_device=False)
        oracle = _oracle_pass1(s1, labels, s2, conf, "clothes", 0.1)

        np.testing.assert_array_equal(ours.stage2, oracle["s2"], err_msg=f"trial {trial}")
        np.testing.assert_allclose(ours.stage2_conf, oracle["conf"], rtol=1e-6)
        np.testing.assert_allclose(ours.ious, oracle["iou"], rtol=1e-5,
                                   err_msg=f"trial {trial}")
        np.testing.assert_array_equal(ours.matched_stage1,
                                      oracle["s1"][oracle["match"]],
                                      err_msg=f"trial {trial}")
        assert ours.matched_labels == [labels[i] for i in oracle["match"]]
        np.testing.assert_array_equal(
            ours.other_stage1,
            oracle["s1"][oracle["other"]] if oracle["other"] else
            np.zeros((0, npts), bool))
