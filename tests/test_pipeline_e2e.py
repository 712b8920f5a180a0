"""End-to-end pipeline integration: synthetic scene -> projection -> refinement
-> evaluation (BASELINE.json config[0]: precomputed 2D masks, CPU-runnable)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from beyondff_tpu.config import Config
from beyondff_tpu.pipeline import evaluate, projection, refinement
from beyondff_tpu.utils import io as bio


@pytest.fixture(scope="module")
def scene_cfg(tmp_path_factory):
    import make_synthetic_scene

    root = str(tmp_path_factory.mktemp("bffscene"))
    cfg_path = make_synthetic_scene.generate(root, query="clothes", scenes=1, seed=7)
    return Config.from_yaml(cfg_path)


def test_projection_stage(scene_cfg):
    results = projection.run(scene_cfg, "clothes", resume=False)
    assert len(results) == 1
    out = bio.load_stage_dict(
        os.path.join(scene_cfg.paths.mask_3d_dir, "clothes", "scene0000_00.pth")
    )
    ins = np.asarray(out["ins"])
    assert ins.shape[0] == 2  # both query objects recovered
    assert list(out["final_class"]) == ["clothes", "clothes"]
    assert ins.sum(axis=1).min() > 100  # substantial masks


def test_refinement_stage(scene_cfg):
    results = refinement.run(scene_cfg, "clothes")
    assert len(results) == 1 and results[0]["instances"] == 2
    out = bio.load_stage_dict(
        os.path.join(scene_cfg.paths.final_output_dir, "clothes", "scene0000_00.pth")
    )
    assert list(out["final_class"]) == ["clothes", "clothes"]


def test_evaluation_stage(scene_cfg):
    avgs = evaluate.run(scene_cfg, "clothes", verbose=False)
    c = avgs["classes"]["clothes"]
    assert c["ap50%"] == pytest.approx(1.0)
    assert c["ap"] > 0.8
    # results table got patched
    table = open(os.path.join(scene_cfg.paths.results_dir, "overall_results.txt")).read()
    assert "clothes," in table and "clothes,-" not in table


def test_projection_resume(scene_cfg):
    # second run with resume: all scenes checkpointed -> no work
    results = projection.run(scene_cfg, "clothes", resume=True)
    assert results == []


def test_prefetch_utils():
    from beyondff_tpu.utils.prefetch import prefetch, prefetch_map

    assert list(prefetch(range(10), depth=3)) == list(range(10))
    assert list(prefetch_map(lambda x: x * 2, range(5))) == [0, 2, 4, 6, 8]
    # exceptions propagate
    def bad():
        yield 1
        raise ValueError("boom")
    import pytest as _pytest
    it = prefetch(bad(), depth=2)
    assert next(it) == 1
    with _pytest.raises(ValueError):
        next(it)


def test_refinement_multi_query_matches_single(scene_cfg):
    from beyondff_tpu.pipeline import refinement as refn

    single = refn.run(scene_cfg, "clothes")
    import shutil
    single_out = bio.load_stage_dict(
        os.path.join(scene_cfg.paths.final_output_dir, "clothes", "scene0000_00.pth"))
    shutil.rmtree(os.path.join(scene_cfg.paths.final_output_dir, "clothes"))

    multi = refn.run_multi(scene_cfg, ["clothes"])
    multi_out = bio.load_stage_dict(
        os.path.join(scene_cfg.paths.final_output_dir, "clothes", "scene0000_00.pth"))
    np.testing.assert_array_equal(np.asarray(single_out["ins"]), np.asarray(multi_out["ins"]))
    np.testing.assert_allclose(np.asarray(single_out["conf"]), np.asarray(multi_out["conf"]))
    assert multi["clothes"][0]["instances"] == single[0]["instances"]


def test_replica_dataset_pipeline(tmp_path):
    """Replica layout: reader, depth scale, direct class-index labels, eval."""
    import make_synthetic_scene

    root = str(tmp_path / "replica")
    cfg = Config.from_yaml(make_synthetic_scene.generate(
        root, query="basket", scenes=1, seed=11, dataset="replica"))
    assert cfg.paths.dataset == "replica"
    projection.run(cfg, "basket", resume=False)
    refinement.run(cfg, "basket")
    avgs = evaluate.run(cfg, "basket", verbose=False)
    assert avgs["classes"]["basket"]["ap50%"] == pytest.approx(1.0)


def test_npz_output_format_pipeline(tmp_path):
    """Torch-free stage outputs (.npz) flow through all three stages + eval."""
    import make_synthetic_scene

    root = str(tmp_path / "npz")
    cfg = Config.from_yaml(make_synthetic_scene.generate(root, query="towel", seed=3))
    cfg = cfg.override(output_format="npz")
    projection.run(cfg, "towel", resume=False)
    assert os.path.exists(os.path.join(cfg.paths.mask_3d_dir, "towel", "scene0000_00.npz"))
    refinement.run(cfg, "towel")
    final = os.path.join(cfg.paths.final_output_dir, "towel", "scene0000_00.npz")
    assert os.path.exists(final)
    d = bio.load_stage_dict(final)
    assert list(d["final_class"]) == ["towel"] * len(d["final_class"])
    avgs = evaluate.run(cfg, "towel", verbose=False)
    assert avgs["classes"]["towel"]["ap50%"] == pytest.approx(1.0)


def test_projection_with_no_detections(tmp_path):
    """A scene whose 2D stage found nothing yields a valid empty 3D output."""
    import make_synthetic_scene
    from beyondff_tpu.utils import io as bio2

    root = str(tmp_path / "empty")
    cfg = Config.from_yaml(make_synthetic_scene.generate(root, query="towel", seed=5))
    # overwrite the 2D records with an empty list
    bio2.save_frame_records(
        os.path.join(cfg.paths.mask_2d_dir, "towel", "scene0000_00.pth"), [])
    results = projection.run(cfg, "towel", resume=False)
    assert results[0]["instances"] == 0
    out = bio2.load_stage_dict(
        os.path.join(cfg.paths.mask_3d_dir, "towel", "scene0000_00.pth"))
    assert np.asarray(out["ins"]).shape[0] == 0 and list(out["final_class"]) == []
    # refinement of the empty stage-2 keeps unmatched same-label stage-1 masks
    refinement.run(cfg, "towel")
    fin = bio2.load_stage_dict(
        os.path.join(cfg.paths.final_output_dir, "towel", "scene0000_00.pth"))
    assert len(fin["final_class"]) == 2  # the two 'towel' stage-1 masks, conf 0.5
    np.testing.assert_allclose(np.asarray(fin["conf"]), 0.5)


def test_projection_dense_mask_records_match_rle(tmp_path):
    """The dense-mask fallback (reference YOLO-World stage files, and masks
    above the RLE run cap) must produce the same 3D output as the default
    RLE-on-device lift path."""
    import torch

    import make_synthetic_scene
    from beyondff_tpu.core import rle

    root = str(tmp_path / "scene")
    cfg = Config.from_yaml(make_synthetic_scene.generate(root, query="clothes", seed=11))
    ref_out = projection.run(cfg, "clothes", resume=False)
    ref = bio.load_stage_dict(
        os.path.join(cfg.paths.mask_3d_dir, "clothes", "scene0000_00.pth"))

    # rewrite the stage file with dense bool tensors (no RLE)
    rec_path = os.path.join(cfg.paths.mask_2d_dir, "clothes", "scene0000_00.pth")
    records = bio.load_frame_records(rec_path)
    records = rle.decode_frame_masks(
        records, image_shape=(cfg.frames.height_2d, cfg.frames.width_2d))
    for r in records:
        r["segmented_frame_masks"] = torch.from_numpy(
            np.asarray(r["segmented_frame_masks"]).astype(bool))
    torch.save(records, rec_path)

    dense_out = projection.run(cfg, "clothes", resume=False)
    out = bio.load_stage_dict(
        os.path.join(cfg.paths.mask_3d_dir, "clothes", "scene0000_00.pth"))
    assert ref_out[0]["instances"] == dense_out[0]["instances"]
    np.testing.assert_array_equal(np.asarray(out["ins"]), np.asarray(ref["ins"]))
    np.testing.assert_allclose(np.asarray(out["conf"]), np.asarray(ref["conf"]))
    assert list(out["final_class"]) == list(ref["final_class"])


def test_projection_lifts_out_of_listing_detections(tmp_path):
    """2D outputs produced at a different frame interval than the projection
    config must still be lifted (the reference iterates the stage-file records
    directly, projection_2d_to_3d.py:413)."""
    import make_synthetic_scene

    cfg_path = make_synthetic_scene.generate(str(tmp_path), query="clothes",
                                             scenes=1, seed=7)
    cfg = Config.from_yaml(cfg_path).override(**{"frames.downsample_ratio": 3})
    results = projection.run(cfg, "clothes", resume=False)
    assert results[0]["instances"] == 2


def test_full_chain_seg2d_to_eval(tmp_path):
    """FULL 4-stage chain: seg2d (test GDINO+SAM, random weights) writes the
    2D-mask contract, projection lifts THOSE outputs, refinement fuses with
    stage-1, evaluation consumes the result — exercising every stage-to-stage
    contract through the real writers/readers in one run (the reference's
    run_evl.py:56-96 chain)."""
    import make_synthetic_scene

    from beyondff_tpu.pipeline import segmentation_2d

    root = str(tmp_path / "scene")
    cfg = Config.from_yaml(make_synthetic_scene.generate(
        root, query="clothes", scenes=1, seed=11))
    cfg = cfg.override(**{
        # fresh dirs so seg2d's own outputs (not the GT-perfect fixture
        # masks) feed projection
        "paths.mask_2d_dir": str(tmp_path / "mask2d"),
        "paths.mask_3d_dir": str(tmp_path / "mask3d"),
        "paths.final_output_dir": str(tmp_path / "final"),
        "paths.checkpoint_dir": str(tmp_path / "ckpt"),
        "paths.results_dir": str(tmp_path / "results"),
        # random-weight detector: keep everything above threshold, no
        # phrase/CLIP gating, few boxes
        "detector.box_threshold": -1.0,
        "detector.must_match_query": False,
        "detector.filter_with_clip": False,
        "detector.max_detections": 2,
    })
    seg_results = segmentation_2d.run(cfg, "clothes", resume=False)
    assert len(seg_results) == 1
    out2d = os.path.join(cfg.paths.mask_2d_dir, "clothes", "scene0000_00.pth")
    assert os.path.exists(out2d)
    records = bio.load_frame_records(out2d)
    assert records, "random-weight detector produced no detections"
    for r in records:
        assert set(r) >= {"frame_id", "segmented_frame_masks", "confidences", "labels"}

    assert len(projection.run(cfg, "clothes", resume=False)) == 1
    out3d = os.path.join(cfg.paths.mask_3d_dir, "clothes", "scene0000_00.pth")
    d3 = bio.load_stage_dict(out3d)
    ins = np.asarray(d3["ins"])
    assert ins.dtype == bool and ins.ndim == 2

    assert len(refinement.run(cfg, "clothes")) == 1
    final = bio.load_stage_dict(
        os.path.join(cfg.paths.final_output_dir, "clothes", "scene0000_00.pth"))
    assert np.asarray(final["ins"]).dtype == bool
    assert np.asarray(final["conf"]).dtype == np.float32

    avgs = evaluate.run(cfg, "clothes", verbose=False)
    ap = avgs["classes"]["clothes"]["ap"]
    assert np.isfinite(ap) or np.isnan(ap)  # random boxes: any valid AP value


def test_run_classes_matches_per_class(tmp_path, monkeypatch):
    """Scene-outer multi-class projection (projection.run_classes: each
    scene's depth uploads once into a shared bank and serves every class)
    must write identical stage outputs to per-class projection.run, and its
    per-(class, scene) checkpoints must resume exactly like the per-class
    driver's. The query-independent viewed_counts must be computed by the
    FIRST class only (view_bank) without changing any output."""
    import shutil

    import make_synthetic_scene

    cfg = Config.from_yaml(
        make_synthetic_scene.generate(str(tmp_path), query="clothes", seed=7))
    # a second class with its own (identical) 2D-stage outputs
    shutil.copytree(os.path.join(cfg.paths.mask_2d_dir, "clothes"),
                    os.path.join(cfg.paths.mask_2d_dir, "towel"))

    need_viewed_calls = []
    orig_lift = projection.lift_scene_streamed

    def spy_lift(*args, **kwargs):
        need_viewed_calls.append(kwargs.get("need_viewed", True))
        return orig_lift(*args, **kwargs)

    monkeypatch.setattr(projection, "lift_scene_streamed", spy_lift)

    ref = {}
    for c in ("clothes", "towel"):
        projection.run(cfg, c, resume=False)
        ref[c] = bio.load_stage_dict(
            os.path.join(cfg.paths.mask_3d_dir, c, "scene0000_00.pth"))
    assert need_viewed_calls == [True, True]  # per-class driver: no banking

    shutil.rmtree(cfg.paths.mask_3d_dir)
    need_viewed_calls.clear()
    results = projection.run_classes(cfg, ["clothes", "towel"], resume=False)
    # first class computes the scene's visibility totals, the second reuses
    # them and lifts only its detection frames
    assert need_viewed_calls == [True, False]
    assert len(results["clothes"]) == len(results["towel"]) == 1
    for c in ("clothes", "towel"):
        out = bio.load_stage_dict(
            os.path.join(cfg.paths.mask_3d_dir, c, "scene0000_00.pth"))
        np.testing.assert_array_equal(np.asarray(out["ins"]),
                                      np.asarray(ref[c]["ins"]))
        np.testing.assert_allclose(np.asarray(out["conf"]),
                                   np.asarray(ref[c]["conf"]))
        assert list(out["final_class"]) == list(ref[c]["final_class"])

    # every (class, scene) checkpointed by the scene-outer driver -> resume
    # skips all work, same contract as projection.run
    again = projection.run_classes(cfg, ["clothes", "towel"], resume=True)
    assert again == {"clothes": [], "towel": []}

    # BFF_PROJ_BANK_VIEWED=0 disables the viewed bank without changing results
    shutil.rmtree(cfg.paths.mask_3d_dir)
    need_viewed_calls.clear()
    monkeypatch.setenv("BFF_PROJ_BANK_VIEWED", "0")
    projection.run_classes(cfg, ["clothes", "towel"], resume=False)
    assert need_viewed_calls == [True, True]
    for c in ("clothes", "towel"):
        out = bio.load_stage_dict(
            os.path.join(cfg.paths.mask_3d_dir, c, "scene0000_00.pth"))
        np.testing.assert_array_equal(np.asarray(out["ins"]),
                                      np.asarray(ref[c]["ins"]))
