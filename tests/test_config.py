"""Config: defaults mirror the reference YAML; flat reference configs load."""

import dataclasses

import pytest
import yaml

from beyondff_tpu.config import Config


REFERENCE_FLAT = {
    "dataset": "Scannet200",
    "scene_id": "scene0435_00",
    "root_dir": "./data/Scannet200/",
    "width_2d": 1296,
    "height_2d": 968,
    "downsample_ratio": 10,
    "ckpt_repo_id": "ShilongLiu/GroundingDINO",
    "dino_box_threshold": 0.35,
    "dino_text_threshold": 0.35,
    "filter_with_CLIP_feature": True,
    "descriptor_generator": "waffle",
    "CLIP_model_size": "ViT-L/14",
    "similarity_threshold": 0.2,
    "iou_thres": 0.2,
    "similarity_thres": 0.75,
    "min_aggragated_masks": 2,
    "if_occurance_threshold": False,
    "occurance_threshold": 0.3,
    "if_detected_ratio_threshold": True,
    "detected_ratio_threshold": 0.38,
    "remove_filtered_masks": 0.4,
    "remove_small_masks": 5,
    "stage1_iou_thres": 0.1,
    "refinment_sim_thres": 0.65,
    "refinment_sim_percentile": 0.2,
    "refiment_iou_thres": 0.45,
    "base_prompt": "",
}


def test_defaults_match_reference_yaml():
    cfg = Config()
    assert cfg.frames.width_2d == 1296 and cfg.frames.height_2d == 968
    assert cfg.frames.downsample_ratio == 10
    assert cfg.detector.box_threshold == 0.35
    assert cfg.detector.similarity_threshold == 0.2
    assert cfg.aggregation.iou_thres == 0.2
    assert cfg.aggregation.min_aggregated_masks == 2
    assert cfg.filtering.detected_ratio_threshold == 0.38
    assert cfg.refinement.iou_thres == 0.45
    assert cfg.refinement.sim_percentile == 0.2


def test_reference_flat_yaml_loads(tmp_path):
    p = tmp_path / "ref.yaml"
    p.write_text(yaml.safe_dump(REFERENCE_FLAT))
    cfg = Config.from_yaml(str(p))
    assert cfg.scene_id == "scene0435_00"
    assert cfg.aggregation.min_aggregated_masks == 2
    assert cfg.refinement.sim_thres == 0.65
    assert cfg.filtering.use_detected_ratio_threshold is True
    assert cfg.detector.filter_with_clip is True


def test_round_trip_and_override(tmp_path):
    cfg = Config()
    p = tmp_path / "cfg.yaml"
    cfg.to_yaml(str(p))
    cfg2 = Config.from_yaml(str(p))
    assert cfg2 == cfg
    cfg3 = cfg.override(**{"frames.downsample_ratio": 5, "base_prompt": "clothes"})
    assert cfg3.frames.downsample_ratio == 5 and cfg3.base_prompt == "clothes"
    assert cfg.frames.downsample_ratio == 10  # original untouched


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        Config.from_dict({"frames": {"nope": 1}})
    with pytest.raises(KeyError):
        Config().override(**{"frames.nope": 1})


def test_structured_yaml_loads():
    cfg = Config.from_dict({"frames": {"downsample_ratio": 2}, "base_prompt": "tv"})
    assert cfg.frames.downsample_ratio == 2 and cfg.base_prompt == "tv"
    assert dataclasses.asdict(cfg)["detector"]["clip_model_size"] == "ViT-L/14"


def test_reference_must_match_keys_translate(tmp_path):
    """The single-scene variant's phrase-gate pair maps onto
    detector.must_match_query / must_match_class (reference:
    segmentation_2d_single.py:136-146, sigleviz_config.yaml:2-3)."""
    import yaml

    from beyondff_tpu.config import Config

    raw = {"base_prompt": "table", "must_match_base_prompt": True,
           "must_match_class": "hair dryer", "downsample_ratio": 5}
    path = tmp_path / "ref.yaml"
    path.write_text(yaml.safe_dump(raw))
    cfg = Config.from_yaml(str(path))
    assert cfg.detector.must_match_query is True
    assert cfg.detector.must_match_class == "hair dryer"
