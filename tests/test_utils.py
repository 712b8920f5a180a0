"""Utils coverage: frame listing, profiling, text similarity, checkpoints."""

import os
import time

import numpy as np
import pytest

from beyondff_tpu.pipeline.text_sim import ClipTextSimilarity, ExactMatchSimilarity
from beyondff_tpu.utils import io as bio
from beyondff_tpu.utils.checkpoint import SceneCheckpoint, SweepCheckpoint
from beyondff_tpu.utils.profiling import StageProfiler


def test_list_scene_frames_numeric_sort(tmp_path):
    scene = tmp_path / "sceneX" / "color"
    scene.mkdir(parents=True)
    for i in (0, 2, 10, 100, 3):
        (scene / f"{i}.jpg").touch()
    (scene / "notes.txt").touch()
    frames = bio.list_scene_frames(str(tmp_path), "sceneX", downsample_ratio=1)
    assert frames == ["0", "2", "3", "10", "100"]  # numeric, not lexicographic
    assert bio.list_scene_frames(str(tmp_path), "sceneX", downsample_ratio=2) == ["0", "3", "100"]


def test_stage_profiler_rates():
    prof = StageProfiler("test")
    with prof.span("work", frames=10):
        time.sleep(0.01)
    with prof.span("work", frames=10):
        pass
    assert prof.counts["work"] == 2
    assert prof.items["work.frames"] == 20
    assert prof.rate("work", "frames") > 0
    assert "work" in prof.report()
    assert '"stage": "test"' in prof.to_json()


def test_exact_match_similarity():
    sim = ExactMatchSimilarity()
    assert sim("tv stand", "tv_stand") == 1.0
    assert sim("Chair", "chair ") == 1.0
    assert sim("chair", "table") == 0.0


def test_clip_text_similarity_caches():
    calls = []

    class FakeModel:
        def encode_text(self, toks):
            calls.append(1)
            return np.asarray(toks, np.float32) + 1.0

    tok = lambda texts: np.asarray([[len(t), 2.0, 3.0] for t in texts], np.float32)
    sim = ClipTextSimilarity(FakeModel(), tok)
    a = sim("chair", "chair")
    assert a == pytest.approx(1.0)
    sim("chair", "table")
    sim("chair", "table")
    assert len(calls) == 2  # 'chair' and 'table' encoded once each


def test_scene_checkpoint_round_trip(tmp_path):
    ck = SceneCheckpoint(str(tmp_path), "stage", "clothes")
    assert not ck.done("scene0")
    ck.mark("scene0")
    ck2 = SceneCheckpoint(str(tmp_path), "stage", "clothes")
    assert ck2.done("scene0") and not ck2.done("scene1")


def test_sweep_checkpoint_round_trip(tmp_path):
    path = str(tmp_path / "p.txt")
    ck = SweepCheckpoint(path)
    ck.mark("clothes", "projection", True)
    ck.mark("clothes", "refinement", False)
    ck2 = SweepCheckpoint(path)
    assert ck2.stage_done("clothes", "projection")
    assert not ck2.stage_done("clothes", "refinement")
    assert not ck2.stage_done("towel", "projection")


def test_prefetch_map_workers_preserve_order():
    import time

    from beyondff_tpu.utils.prefetch import prefetch_map

    def slow_sq(x):
        time.sleep(0.001 * (7 - x % 7))  # deliberately out-of-order completion
        return x * x

    items = list(range(40))
    assert list(prefetch_map(slow_sq, items, depth=8, workers=4)) == [x * x for x in items]
    assert list(prefetch_map(slow_sq, items, depth=2, workers=1)) == [x * x for x in items]


def test_prefetch_map_workers_propagate_errors():
    import pytest

    from beyondff_tpu.utils.prefetch import prefetch_map

    def boom(x):
        if x == 3:
            raise ValueError("x3")
        return x

    with pytest.raises(ValueError):
        list(prefetch_map(boom, range(10), depth=2, workers=3))


def test_mfu_cost_analysis_matmul():
    """XLA cost analysis drives the MFU accounting: a (512,512)@(512,512)
    matmul is exactly 2*512^3 FLOPs; utilization math follows from it."""
    import jax.numpy as jnp

    from beyondff_tpu.utils import mfu

    a = jnp.ones((512, 512), jnp.float32)
    cost = mfu.program_cost(lambda x, y: x @ y, a, a)
    assert cost is not None
    assert cost.flops == 2 * 512**3
    assert cost.bytes_accessed > 0
    rec = mfu.summarize("mm", cost, seconds=1e-3)
    assert rec["gflop"] == round(2 * 512**3 / 1e9, 2)
    assert 0 < rec["mfu"] < 1  # nominal CPU peak keeps this in range
    line = mfu.describe("mm", cost, 1e-3)
    assert "MFU" in line and "bound" in line
    # degenerate inputs stay reportable
    assert "n/a" in mfu.describe("none", None, 1.0)
    assert mfu.summarize("none", None, 1.0)["mfu"] is None


def test_mfu_chip_peaks_lookup():
    from beyondff_tpu.utils import mfu

    class FakeDev:
        device_kind = "TPU v5e"

    f, b = mfu.chip_peaks(FakeDev())
    assert f == 197e12 and b == 819e9
    f, b = mfu.chip_peaks(type("D", (), {"device_kind": "TPU v4"})())
    assert f == 275e12
