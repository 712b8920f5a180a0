"""Sweep orchestrator: stage ordering, resume, failure tolerance."""

import pytest

from beyondff_tpu.config import Config
from beyondff_tpu.orchestration import SweepRunner, default_class_list


@pytest.fixture
def runner(tmp_path, monkeypatch):
    cfg = Config()
    r = SweepRunner(cfg, checkpoint_path=str(tmp_path / "ckpt.txt"))
    calls = []

    def fake_stage(stage, class_name):
        calls.append((stage, class_name))
        if class_name == "bad" and stage == "projection":
            raise RuntimeError("boom")

    monkeypatch.setattr(r, "_run_stage", fake_stage)
    r._calls = calls
    return r


def test_stages_in_order(runner):
    status = runner.process_class("towel")
    assert status == {s: True for s in SweepRunner.STAGES}
    assert [s for s, _ in runner._calls] == list(SweepRunner.STAGES)


def test_failure_stops_later_stages_and_is_recorded(runner):
    status = runner.process_class("bad")
    assert status["segmentation"] is True
    assert status["projection"] is False
    assert "refinement" not in status  # later stages not attempted
    # failure persisted in the checkpoint file
    assert runner.checkpoint.stage_done("bad", "segmentation")
    assert not runner.checkpoint.stage_done("bad", "projection")


def test_resume_skips_done_stages(tmp_path, monkeypatch):
    cfg = Config()
    path = str(tmp_path / "ckpt.txt")
    r1 = SweepRunner(cfg, checkpoint_path=path)
    monkeypatch.setattr(r1, "_run_stage", lambda s, c: None)
    r1.process_class("towel")

    r2 = SweepRunner(cfg, checkpoint_path=path)
    calls = []
    monkeypatch.setattr(r2, "_run_stage", lambda s, c: calls.append(s))
    status = r2.process_class("towel")
    assert calls == []  # everything checkpointed
    assert all(status.values())


def test_skip_list_and_class_list(runner):
    results = runner.run(classes=["towel", "ceiling light"], skip=("ceiling light",))
    assert list(results) == ["towel"]
    classes = default_class_list(2)
    assert len(classes) == 6


def test_find_parameters_skips_segmentation(tmp_path, monkeypatch):
    cfg = Config()
    r = SweepRunner(cfg, checkpoint_path=str(tmp_path / "c.txt"), skip_segmentation=True)
    calls = []
    monkeypatch.setattr(r, "_run_stage", lambda s, c: calls.append(s))
    status = r.process_class("towel")
    assert "segmentation" not in calls
    assert status["segmentation"] is True


def test_sweep_runner_real_stages_end_to_end(tmp_path):
    """Full orchestrated run on the synthetic fixture: seg2d (weightless,
    zero detections) -> projection -> refinement -> evaluation, with the
    sweep checkpoint recording every stage."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import make_synthetic_scene

    root = str(tmp_path / "sweeproot")
    cfg_path = make_synthetic_scene.generate(root, query="towel", seed=2)
    cfg = Config.from_yaml(cfg_path).override(**{
        "paths.results_dir": os.path.join(root, "eval_results")})
    runner = SweepRunner(cfg, config_path=cfg_path,
                         checkpoint_path=str(tmp_path / "proc.txt"))
    status = runner.process_class("towel")
    assert all(status.values()), status
    # results table row patched for the class
    table = open(os.path.join(root, "eval_results", "overall_results.txt")).read()
    assert "towel," in table
    # resume: second invocation does nothing
    runner2 = SweepRunner(cfg, checkpoint_path=str(tmp_path / "proc.txt"))
    called = []
    runner2._run_stage = lambda s, c: called.append(s)
    assert all(runner2.process_class("towel").values())
    assert called == []


def test_retries_recover_transient_failures(tmp_path, monkeypatch):
    cfg = Config()
    r = SweepRunner(cfg, checkpoint_path=str(tmp_path / "r.txt"), retries=2)
    attempts = {"n": 0}

    def flaky(stage, class_name):
        if stage == "projection":
            attempts["n"] += 1
            if attempts["n"] < 3:
                raise RuntimeError("transient")

    monkeypatch.setattr(r, "_run_stage", flaky)
    status = r.process_class("towel")
    assert all(status.values())
    assert attempts["n"] == 3  # failed twice, succeeded on the final retry


def test_amortized_projection_in_find_parameters(tmp_path, monkeypatch):
    """With cached 2D masks (find-parameters mode), the sweep runs projection
    for ALL classes scene-outer up front (projection.run_classes, shared
    per-scene depth bank) and the per-class loop then skips the stage."""
    import os
    import shutil
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import make_synthetic_scene

    root = str(tmp_path / "amroot")
    cfg_path = make_synthetic_scene.generate(root, query="towel", seed=2)
    cfg = Config.from_yaml(cfg_path)
    shutil.copytree(os.path.join(cfg.paths.mask_2d_dir, "towel"),
                    os.path.join(cfg.paths.mask_2d_dir, "clothes"))

    runner = SweepRunner(cfg, checkpoint_path=str(tmp_path / "p.txt"),
                         skip_segmentation=True)
    stage_calls = []
    monkeypatch.setattr(runner, "_run_stage",
                        lambda s, c: stage_calls.append((s, c)))
    res = runner.run(classes=["towel", "clothes"])
    assert all(all(v.values()) for v in res.values()), res
    # the amortized pass did the real projection work for both classes...
    for c in ("towel", "clothes"):
        assert os.path.exists(
            os.path.join(cfg.paths.mask_3d_dir, c, "scene0000_00.pth"))
    # ...so the per-class loop never invoked the projection stage
    assert not any(s == "projection" for s, _ in stage_calls), stage_calls
    # later stages still ran per class
    assert ("refinement", "towel") in stage_calls
    assert ("evaluation", "clothes") in stage_calls


def test_host_partition_properties():
    from beyondff_tpu.orchestration import host_partition, resolve_hosts

    classes = [f"c{i}" for i in range(11)]
    parts = [host_partition(classes, 3, i) for i in range(3)]
    # disjoint cover of the class list
    flat = [c for p in parts for c in p]
    assert sorted(flat) == sorted(classes) and len(flat) == len(set(flat))
    # balanced within one class
    sizes = [len(p) for p in parts]
    assert max(sizes) - min(sizes) <= 1
    # interleaved: host i starts at classes[i]
    assert parts[1][0] == "c1"
    assert host_partition(classes, 1, 0) == classes
    with pytest.raises(ValueError):
        host_partition(classes, 3, 3)
    with pytest.raises(ValueError):
        host_partition(classes, 0, 0)
    # explicit args pass through; single-process jax falls back to (1, 0)
    assert resolve_hosts(4, 2) == (4, 2)
    assert resolve_hosts(None, None) == (1, 0)


def test_multi_host_sweep_merges_bit_identical(tmp_path):
    """Two hosts over disjoint class partitions of the synthetic fixture
    (find-parameters mode: projection -> refinement -> evaluation per class),
    then merge: the merged results table must be BYTE-identical to a
    single-host run over the same classes, and the merged checkpoint must
    mark every (class, stage)."""
    import os
    import shutil
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import make_synthetic_scene

    from beyondff_tpu.orchestration import merge_host_results
    from beyondff_tpu.utils.checkpoint import SweepCheckpoint

    root = str(tmp_path / "mhroot")
    cfg_path = make_synthetic_scene.generate(root, query="towel", seed=2)
    classes = ["towel", "pillow", "blanket"]
    base = Config.from_yaml(cfg_path)
    for c in classes[1:]:
        shutil.copytree(os.path.join(base.paths.mask_2d_dir, "towel"),
                        os.path.join(base.paths.mask_2d_dir, c))

    def cfg_for(tag):
        return base.override(**{
            "paths.results_dir": os.path.join(root, f"eval_{tag}"),
            "paths.checkpoint_dir": os.path.join(root, f"ckpt_{tag}"),
        })

    # ---- multi-host: each host runs its partition with per-host artifacts
    mh_cfg = cfg_for("mh")
    mh_ckpt = str(tmp_path / "proc_mh.txt")
    for host in range(2):
        r = SweepRunner(mh_cfg, checkpoint_path=mh_ckpt,
                        skip_segmentation=True, amortize_projection=False,
                        hosts=2, host=host)
        res = r.run(classes, skip=())
        assert all(all(v.values()) for v in res.values()), res
    # per-host tables exist; canonical one doesn't yet
    rd = mh_cfg.paths.results_dir
    assert os.path.exists(os.path.join(rd, "overall_results.host0of2.txt"))
    assert os.path.exists(os.path.join(rd, "overall_results.host1of2.txt"))
    assert not os.path.exists(os.path.join(rd, "overall_results.txt"))
    merge_host_results(mh_cfg, 2, checkpoint_path=mh_ckpt)

    # ---- single-host reference over the same classes
    sh_cfg = cfg_for("sh")
    r = SweepRunner(sh_cfg, checkpoint_path=str(tmp_path / "proc_sh.txt"),
                    skip_segmentation=True, amortize_projection=False)
    res = r.run(classes, skip=())
    assert all(all(v.values()) for v in res.values()), res

    merged = open(os.path.join(rd, "overall_results.txt")).read()
    single = open(os.path.join(sh_cfg.paths.results_dir,
                               "overall_results.txt")).read()
    assert merged == single
    for c in classes:
        assert f"{c}," in merged
    ck = SweepCheckpoint(mh_ckpt)
    for c in classes:
        # find-parameters mode never marks segmentation (single-host parity)
        for stage in ("projection", "refinement", "evaluation"):
            assert ck.stage_done(c, stage), (c, stage)


def test_multi_host_cli_two_processes(tmp_path):
    """The literal multi-host deployment shape: TWO run_sweep.py PROCESSES
    sharing a filesystem, each with --hosts 2 --host i, then --merge-hosts —
    the merged table must carry every class's row."""
    import os
    import shutil
    import subprocess
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import make_synthetic_scene

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = str(tmp_path / "cliroot")
    cfg_path = make_synthetic_scene.generate(root, query="towel", seed=2)
    classes = ["towel", "pillow"]
    base = Config.from_yaml(cfg_path)
    shutil.copytree(os.path.join(base.paths.mask_2d_dir, "towel"),
                    os.path.join(base.paths.mask_2d_dir, "pillow"))

    env = dict(os.environ, BFF_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    ckpt = str(tmp_path / "proc.txt")

    def cli(*extra):
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "run_sweep.py"),
             "--config", cfg_path, "--classes", ",".join(classes),
             "--checkpoint", ckpt, "--find-parameters", *extra],
            cwd=repo, env=env, capture_output=True, text=True, timeout=900)
        assert proc.returncode == 0, proc.stderr[-3000:] + proc.stdout[-2000:]
        return proc.stdout

    for host in range(2):
        out = cli("--hosts", "2", "--host", str(host))
        assert "1/1 classes complete" in out, out
    cli("--merge-hosts", "2")
    table = open(os.path.join(base.paths.results_dir,
                              "overall_results.txt")).read()
    for c in classes:
        assert f"{c}," in table


def test_amortized_segmentation_phase(tmp_path, monkeypatch):
    """run(amortize_segmentation=True) runs the 2D stage for all classes
    scene-outer up front (segmentation_2d.run_classes) and the per-class
    loop then skips it; a failure falls back to the per-class stage."""
    cfg = Config()
    r = SweepRunner(cfg, checkpoint_path=str(tmp_path / "s.txt"))
    ran = {}
    import beyondff_tpu.pipeline.segmentation_2d as s2d

    monkeypatch.setattr(s2d, "Segmentor2D", lambda c: object())
    monkeypatch.setattr(
        s2d, "run_classes",
        lambda c, classes, segmentor=None: ran.setdefault("classes", list(classes)))
    stage_calls = []
    monkeypatch.setattr(r, "_run_stage", lambda s, c: stage_calls.append((s, c)))
    res = r.run(classes=["towel", "clothes"], amortize_segmentation=True)
    assert ran["classes"] == ["towel", "clothes"]
    assert not any(s == "segmentation" for s, _ in stage_calls)
    assert all(all(v.values()) for v in res.values())

    # failure path: run_classes raising leaves the per-class stage to do it
    r2 = SweepRunner(cfg, checkpoint_path=str(tmp_path / "s2.txt"))
    monkeypatch.setattr(s2d, "run_classes",
                        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("x")))
    calls2 = []
    monkeypatch.setattr(r2, "_run_stage", lambda s, c: calls2.append((s, c)))
    res2 = r2.run(classes=["towel", "clothes"], amortize_segmentation=True)
    assert ("segmentation", "towel") in calls2
    assert all(all(v.values()) for v in res2.values())
