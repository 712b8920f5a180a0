"""Visualization exports: colored PLY round-trip."""

import numpy as np

from beyondff_tpu.utils.ply import read_ply_vertices, read_point_cloud_with_colors
from beyondff_tpu.visualization.visualize import _palette, write_colored_ply


def test_colored_ply_round_trip(tmp_path, rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (100, 3)).astype(np.uint8)
    path = str(tmp_path / "scene.ply")
    write_colored_ply(path, xyz, rgb)
    back_xyz, back_rgb = read_point_cloud_with_colors(path)
    np.testing.assert_allclose(back_xyz, xyz, rtol=1e-6)
    np.testing.assert_allclose(back_rgb * 255, rgb, atol=0.5)


def test_palette_distinct():
    p = _palette(10)
    assert p.shape == (10, 3)
    assert len({tuple(c) for c in p}) == 10


def test_ply_vertex_reader_ascii(tmp_path):
    path = tmp_path / "a.ply"
    path.write_text(
        "ply\nformat ascii 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\nend_header\n"
        "1.0 2.0 3.0\n4.0 5.0 6.0\n"
    )
    v = read_ply_vertices(str(path))
    np.testing.assert_allclose(v["x"], [1.0, 4.0])
    np.testing.assert_allclose(v["z"], [3.0, 6.0])


def test_snapshot_png(tmp_path, rng):
    import types

    from beyondff_tpu.visualization.visualize import SceneVisualizer, write_colored_ply

    xyz = rng.normal(size=(200, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (200, 3)).astype(np.uint8)
    ply = str(tmp_path / "scene.ply")
    write_colored_ply(ply, xyz, rgb)
    viz = SceneVisualizer.__new__(SceneVisualizer)  # skip heavy init
    out = viz.snapshot_png(ply)
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_frame_overlay(tmp_path):
    """2D annotated-frame export (reference draw=True output): masks blend
    into the RGB frame, boxes and labels drawn, PNG written."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import make_synthetic_scene

    from beyondff_tpu.config import Config
    from beyondff_tpu.visualization.visualize import SceneVisualizer

    root = str(tmp_path / "scene")
    cfg = Config.from_yaml(make_synthetic_scene.generate(root, query="clothes", seed=5))
    viz = SceneVisualizer(cfg, "scene0000_00", out_dir=str(tmp_path / "viz"))
    path = viz.frame_overlay("clothes")
    assert os.path.exists(path) and path.endswith("_2d.png")
    import cv2

    out = cv2.imread(path)
    assert out is not None and out.ndim == 3 and out.shape[2] == 3
    # the blend must have recolored the masked region vs the raw frame
    from beyondff_tpu.data.readers import build_dataset

    reader = build_dataset(cfg.paths.dataset,
                           os.path.join(cfg.paths.scene_2d_dir, "scene0000_00"))
    raw = reader.image("0")
    assert out.shape[:2] == raw.shape[:2]
    assert (out[..., ::-1] != raw).any()


def test_web_export(tmp_path):
    """Interactive single-file web viewer (reference pyviz3d export parity):
    one HTML with the RGB + GT + stage-1 layers embedded and toggleable."""
    import json
    import os
    import re
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import make_synthetic_scene

    from beyondff_tpu.config import Config
    from beyondff_tpu.visualization.webviz import export_scene

    root = str(tmp_path / "scene")
    cfg = Config.from_yaml(make_synthetic_scene.generate(root, query="clothes", seed=3))
    path = export_scene(cfg, "scene0000_00", class_names=["clothes"],
                        out_dir=str(tmp_path / "viz"), max_points=5000)
    assert os.path.exists(path) and path.endswith("index.html")
    html = open(path).read()
    n = int(re.search(r"const N = (\d+);", html).group(1))
    assert 0 < n <= 5000
    layers = json.loads(re.search(r"const LAYERS = (\[.*?\]);", html, re.S).group(1))
    names = [l["name"] for l in layers]
    assert "gt instances" in names and "stage-1 masks" in names
    gt = next(l for l in layers if l["name"] == "gt instances")
    assert gt["legend"], "GT layer must carry an instance legend"
    import base64

    rgb = base64.b64decode(gt["rgb"])
    assert len(rgb) == n * 3
    # no external resources: the file must work offline from file://
    assert "http://" not in html and "https://" not in html


def test_web_scene_downsample_and_validation(rng):
    import numpy as np
    import pytest

    from beyondff_tpu.visualization.webviz import WebScene

    xyz = rng.normal(size=(1000, 3)).astype(np.float32)
    scene = WebScene(xyz, max_points=100)
    assert scene.xyz.shape == (100, 3)
    scene.add_layer("ok", np.zeros((1000, 3), np.uint8))  # pre-downsample length
    with pytest.raises(ValueError):
        scene.add_layer("bad", np.zeros((50, 3), np.uint8))
