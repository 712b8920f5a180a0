"""tools/bench_sweep.py smoke test: the measured-sweep artifact generator.

The full-sweep bench (SWEEP_rNN.json) drives all four stage drivers per
(class, scene) in three access patterns (ref / banked / fused) on the real
chip; a crash there loses a multi-hour measurement. This runs the whole
tool at tiny scale on CPU — same code paths: per-class + fused threshold
calibration, run_classes banking, fused-caption demux, refinement and the
nan-tolerant eval tail — and validates the JSON-lines output contract.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_sweep_small_prints_contract_json(tmp_path):
    out_file = tmp_path / "sweep.json"
    env = dict(os.environ)
    env.update({
        "BFF_PLATFORM": "cpu",
        "JAX_PLATFORMS": "cpu",
        "BFF_COMPILE_CACHE_DIR": os.path.join(REPO, "tests", ".jax_cache"),
    })
    # single-device: the 8-virtual-device XLA flag would shard the detection
    # batch and double the compile work on the one-core host
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_sweep.py"),
         "--small", "--classes", "2", "--frames", "8", "--points", "4000",
         "--rounds", "1", "--calib-frames", "4", "--out", str(out_file)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # stage-profiler lines ([segmentation_2d] wall=...) interleave on stdout;
    # the contract is one parseable {"metric": ...} line per mode
    lines = [ln for ln in proc.stdout.strip().splitlines()
             if ln.startswith('{"metric"')]
    assert len(lines) == 3, f"expected one JSON line per mode, got {lines!r}"
    by_mode = {}
    for ln in lines:
        rec = json.loads(ln)
        mode = rec["metric"].removeprefix("sweep_").removesuffix(
            "_s_per_class_scene")
        by_mode[mode] = rec
        assert rec["value"] > 0
        assert rec["vs_baseline"] > 0
        stages = rec["extra"]["stages_s"]
        for stage in ("seg2d", "projection"):
            assert stages[stage] > 0, (stage, stages)
        # refine/eval at tiny scale can round to 0.00 in the artifact
        for stage in ("refinement", "evaluation"):
            assert stages[stage] >= 0, (stage, stages)
    assert set(by_mode) == {"ref", "banked", "fused"}
    # the artifact file carries the same lines (append contract)
    file_lines = [ln for ln in out_file.read_text().splitlines() if ln.strip()]
    assert [json.loads(ln) for ln in file_lines] == [
        json.loads(ln) for ln in lines]


def test_separable_threshold_tie_aware():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bff_bench_sweep", os.path.join(REPO, "tools", "bench_sweep.py"))
    bs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bs)
    import numpy as np

    # distinct stats: cut lands exactly on the designed quantile
    s = np.linspace(0.0, 1.0, 16)
    thr, k, designed = bs.separable_threshold(s, 0.25)
    assert k == designed == 4
    assert (s > thr).sum() == 4

    # tied block straddling the designed cut: snaps to the nearest
    # strictly-separable boundary and the realized count equals k exactly
    s = np.array([0.9] * 6 + [0.5] * 10)
    thr, k, designed = bs.separable_threshold(s, 0.25)
    assert designed == 4 and k == 6
    assert (s > thr).sum() == k

    # all stats identical: only the degenerate cuts exist
    s = np.full(8, 0.7)
    thr, k, _ = bs.separable_threshold(s, 0.25)
    assert k in (0, 8)
    assert (s > thr).sum() == k
