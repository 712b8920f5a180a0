"""bench.py smoke test: the round-end artifact generator must never regress.

The driver runs ``python bench.py`` unattended at round end; a crash there
loses the round's headline measurement (one round-4 full-bench run was
aborted by a fast-pipeline exception before the guards landed). This runs
the whole bench at small scale on CPU — every section that is on by default
at small scale, the same code paths the TPU run takes — and validates the
output contract the driver parses: every stdout line is JSON with the same
stable headline metric/value (the headline prints immediately after its
section so a driver timeout cannot erase it — round 4's rc=124 left
parsed:null; the final line re-prints it enriched with ``extra``).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_small_scale_prints_contract_json():
    env = dict(os.environ)
    env.update({
        "BFF_PLATFORM": "cpu",
        "JAX_PLATFORMS": "cpu",
        "BFF_BENCH_SCALE": "small",
        "BFF_BENCH_FRAMES": "8",
        "BFF_BENCH_ITERS": "1",
        "BFF_BENCH_PASSES": "1",
        # share the suite's persistent compile cache (conftest exports the
        # same variable for the in-process tests)
        "BFF_COMPILE_CACHE_DIR": os.path.join(REPO, "tests", ".jax_cache"),
    })
    # single-device: the 8-virtual-device XLA flag would shard the detection
    # batch and double the compile work on the one-core host
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 2, f"expected headline + enriched JSON lines, got {lines!r}"
    parsed = [json.loads(ln) for ln in lines]
    for out in parsed:
        assert out["metric"] == "seg2d_pipeline_frames_per_sec"
        assert out["unit"] == "frames/s"
        assert out["value"] > 0
        assert out["vs_baseline"] > 0
    # the early line and the enriched line must agree on the headline number
    assert parsed[0]["value"] == parsed[1]["value"]
    assert "extra" not in parsed[0]
    out = parsed[1]
    extra = out["extra"]
    # sections on by default at small scale must have produced numbers —
    # a silently-skipped section would otherwise look like a pass
    assert extra["seg2d_device_bound_fps"] > 0
    assert extra["seg2d_fast_device_fps"] > 0
    assert extra["seg2d_fast_pipeline_fps"] > 0
    assert isinstance(extra["mfu"], list) and len(extra["mfu"]) >= 7
    for rec in extra["mfu"]:
        assert rec["mfu"] >= 0 and rec["ms"] > 0


def test_bench_budget_guard_skips_sections_but_headline_survives():
    """With the wall-clock budget already spent, every secondary section must
    skip (not crash) and BOTH headline lines must still print and agree."""
    env = dict(os.environ)
    env.update({
        "BFF_PLATFORM": "cpu",
        "JAX_PLATFORMS": "cpu",
        "BFF_BENCH_SCALE": "small",
        "BFF_BENCH_FRAMES": "8",
        "BFF_BENCH_ITERS": "1",
        "BFF_BENCH_PASSES": "1",
        "BFF_BENCH_BUDGET_S": "0",
        "BFF_COMPILE_CACHE_DIR": os.path.join(REPO, "tests", ".jax_cache"),
    })
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 2, f"expected two JSON lines, got {lines!r}"
    parsed = [json.loads(ln) for ln in lines]
    assert parsed[0]["value"] == parsed[1]["value"] > 0
    assert "SECTION SKIPPED" in proc.stderr
    # skipped sections report null, not garbage
    assert parsed[1]["extra"]["seg2d_device_bound_fps"] is None
