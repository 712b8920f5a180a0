"""Class-sweep orchestrator: the pipeline's outermost driver.

Rebuild of the reference's subprocess loop (reference: evaluation/eval/
run_evl.py:56-118): for each class in head[:40]+common[:40]+tail[:40] minus a
skip list, run segmentation_2d -> projection -> refinement -> evaluation,
persisting per-(class, stage) completion to a YAML checkpoint so interrupted
multi-day sweeps resume exactly.

Unlike the reference, stages run in-process (models stay resident on the
device across classes instead of reloading per subprocess — the reference
pays a full GroundingDINO+SAM+CLIP load per class), with optional
``subprocess=True`` for crash isolation, and failures are caught per stage so
the sweep continues (run_evl.py:115-118).

Multi-host (the DCN leg of SURVEY §2.4): the 120-class x 142-scene sweep is
embarrassingly parallel over classes — ``SweepRunner(hosts=N, host=i)``
takes the deterministic interleaved partition ``classes[i::N]`` (balanced
across the head/common/tail frequency groups because the reference's class
list is grouped, run_evl.py:103), writes per-host checkpoints and per-host
results tables (no cross-host file races on a shared filesystem), and
:func:`merge_host_results` folds them into the canonical
``overall_results.txt`` byte-identically to a single-host run. Each host
drives its own chips; no cross-host collective is needed until the final
metrics merge, which is pure host-side file IO (SURVEY §2.4: "DCN only for
multi-host full-val sweeps ... one gather of per-scene metric records at
the end").
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
import traceback
from typing import Dict, List, Optional, Sequence

from beyondff_tpu.config import Config
from beyondff_tpu.data import scannet200
from beyondff_tpu.utils.checkpoint import SweepCheckpoint

# classes the reference skips as known-bad (run_evl.py:105)
DEFAULT_SKIP = ("ceiling light", "office chair")


def default_class_list(per_group: int = 40) -> List[str]:
    """head[:N] + common[:N] + tail[:N] (reference: run_evl.py:103)."""
    return (
        list(scannet200.HEAD_CATS_SCANNET_200[:per_group])
        + list(scannet200.COMMON_CATS_SCANNET_200[:per_group])
        + list(scannet200.TAIL_CATS_SCANNET_200[:per_group])
    )


def host_partition(classes: Sequence[str], hosts: int, host: int) -> List[str]:
    """Deterministic interleaved class partition: host ``i`` of ``N`` takes
    ``classes[i::N]``. Interleaving balances the head/common/tail mix (and
    with it the expected per-class cost) across hosts; the partition is a
    pure function of (classes, hosts, host) so every host computes the same
    global assignment without any coordination."""
    if hosts < 1:
        raise ValueError(f"hosts must be >= 1, got {hosts}")
    if not 0 <= host < hosts:
        raise ValueError(f"host index {host} out of range for {hosts} hosts")
    return list(classes)[host::hosts]


def host_suffix(hosts: int, host: int) -> str:
    return f".host{host}of{hosts}" if hosts > 1 else ""


def resolve_hosts(hosts=None, host=None) -> tuple:
    """(hosts, host) from explicit args, falling back to the JAX distributed
    runtime (``jax.process_count``/``jax.process_index``) when it is
    initialized with multiple processes, else single-host."""
    if hosts is not None:
        return int(hosts), int(host or 0)
    try:
        import jax

        if jax.process_count() > 1:
            return jax.process_count(), jax.process_index()
    except Exception:  # noqa: BLE001 - uninitialized backend etc.
        pass
    return 1, 0


def merge_host_results(cfg: Config, hosts: int,
                       checkpoint_path: str = "process_checkpoint.txt") -> None:
    """Fold per-host artifacts into the canonical single-host ones:

    * ``overall_results.host<i>of<n>.txt`` -> ``overall_results.txt``
      (byte-identical to a single-host run over the same classes);
    * per-host sweep checkpoints -> the canonical checkpoint (union; a class
      marked by any host keeps its flags).

    Per-scene stage outputs and per-(class, stage) scene checkpoints need no
    merge: classes are disjoint across hosts, so those files never collide.
    """
    from beyondff_tpu.pipeline.evaluate import merge_results_tables

    rd = cfg.paths.results_dir
    merge_results_tables(
        [os.path.join(rd, f"overall_results{host_suffix(hosts, i)}.txt")
         for i in range(hosts)],
        os.path.join(rd, "overall_results.txt"))
    merged = SweepCheckpoint(checkpoint_path)
    for i in range(hosts):
        part = SweepCheckpoint(checkpoint_path + host_suffix(hosts, i))
        for class_name, stages in part._state.items():
            merged._state.setdefault(class_name, {}).update(stages)
    merged.flush()


class SweepRunner:
    STAGES = ("segmentation", "projection", "refinement", "evaluation")

    def __init__(self, cfg: Config, config_path: Optional[str] = None,
                 checkpoint_path: str = "process_checkpoint.txt",
                 skip_segmentation: bool = False, use_subprocess: bool = False,
                 retries: int = 0, amortize_projection: bool = True,
                 hosts: int = 1, host: int = 0):
        self.cfg = cfg
        self.config_path = config_path
        # multi-host: this runner owns the deterministic class partition
        # classes[host::hosts]; its checkpoint and results table are
        # per-host files merged at the end (merge_host_results)
        self.hosts, self.host = hosts, host
        if not 0 <= host < hosts:
            raise ValueError(f"host index {host} out of range for {hosts} hosts")
        suffix = host_suffix(hosts, host)
        self.table_name = f"overall_results{suffix}.txt"
        self.checkpoint = SweepCheckpoint(checkpoint_path + suffix)
        # reuse cached 2D masks and only re-run the cheap stages — the
        # reference's parameter-sweep mode (run_evl_finding_parameter.py:56-87)
        self.skip_segmentation = skip_segmentation
        self.use_subprocess = use_subprocess
        # transient-failure recovery: per-stage retry budget (the reference
        # marks a class failed on the first error and moves on,
        # run_evl.py:115-118; scene-level resume makes retries cheap here)
        self.retries = retries
        # scene-outer multi-class projection for classes whose 2D masks are
        # already on disk: each scene's ~184 MB of depth uploads once and
        # serves every class (projection.run_classes — measured 2.1x/class
        # at 4 classes, asymptoting to device-bound). Per-(class, scene)
        # checkpoints stay interchangeable with the per-class driver.
        self.amortize_projection = amortize_projection
        self._segmentor = None

    # scene-outer multi-class 2D stage (opt-in via run(amortize_segmentation
    # =True) / run_sweep.py --amortize-segmentation): frames decode + upload
    # once per scene for the whole class list (segmentation_2d.run_classes —
    # measured 1.2x/class on the fast variant; GDINO gains ~nothing, it is
    # compute-bound). Off by default: it front-loads the heaviest stage
    # before any class completes end-to-end, which changes sweep progress
    # behavior (per-(class, scene) checkpoints still make it resumable).
    def _amortized_segmentation(self, classes: Sequence[str]) -> None:
        pending = [c for c in classes
                   if not self.checkpoint.stage_done(c, "segmentation")]
        if len(pending) < 2:
            return
        from beyondff_tpu.pipeline import segmentation_2d

        if self._segmentor is None:
            self._segmentor = segmentation_2d.Segmentor2D(self.cfg)
        t0 = time.time()
        try:
            segmentation_2d.run_classes(self.cfg, pending,
                                        segmentor=self._segmentor)
        except Exception:
            traceback.print_exc()
            print("[sweep] amortized segmentation failed; classes fall back "
                  "to the per-class stage")
            return
        for c in pending:
            self.checkpoint.mark(c, "segmentation", True)
        print(f"[sweep] amortized segmentation: {len(pending)} classes "
              f"({time.time() - t0:.1f}s)")

    # ------------------------------------------------------------- stages
    def _run_stage(self, stage: str, class_name: str) -> None:
        if self.use_subprocess:
            tool = {
                "segmentation": "tools/segmentation_2d.py",
                "projection": "tools/projection_2d_to_3d.py",
                "refinement": "tools/refinement.py",
                "evaluation": "tools/eval_scannet200.py",
            }[stage]
            subprocess.run(
                [sys.executable, tool, "--config", self.config_path, "--cls", class_name],
                check=True,
            )
            return
        if stage == "segmentation":
            from beyondff_tpu.pipeline import segmentation_2d

            if self._segmentor is None:
                self._segmentor = segmentation_2d.Segmentor2D(self.cfg)
            segmentation_2d.run(self.cfg, class_name, segmentor=self._segmentor)
        elif stage == "projection":
            from beyondff_tpu.pipeline import projection

            projection.run(self.cfg, class_name)
        elif stage == "refinement":
            from beyondff_tpu.pipeline import refinement

            refinement.run(self.cfg, class_name)
        elif stage == "evaluation":
            from beyondff_tpu.pipeline import evaluate

            evaluate.run(self.cfg, class_name, verbose=False,
                         table_name=self.table_name)

    def process_class(self, class_name: str) -> Dict[str, bool]:
        """All four stages for one class, with per-stage resume + failure
        tolerance (reference: run_evl.py:56-96)."""
        status: Dict[str, bool] = {}
        for stage in self.STAGES:
            if stage == "segmentation" and self.skip_segmentation:
                status[stage] = True
                continue
            if self.checkpoint.stage_done(class_name, stage):
                status[stage] = True
                continue
            t0 = time.time()
            ok = False
            for attempt in range(1 + max(0, self.retries)):
                try:
                    self._run_stage(stage, class_name)
                    ok = True
                    break
                except Exception:
                    traceback.print_exc()
                    if attempt < self.retries:
                        print(f"[sweep] {class_name} / {stage}: retry "
                              f"{attempt + 1}/{self.retries}")
            self.checkpoint.mark(class_name, stage, ok)
            status[stage] = ok
            print(f"[sweep] {class_name} / {stage}: {'ok' if ok else 'FAILED'} "
                  f"({time.time() - t0:.1f}s)")
            if not ok:
                break  # later stages depend on this one
        return status

    def _amortized_projection(self, classes: Sequence[str]) -> None:
        """Run projection scene-outer for every class whose segmentation is
        already complete (all of them in find-parameters mode), sharing each
        scene's depth upload. Falls back silently to the per-class stage on
        any error — per-(class, scene) checkpoints keep partial progress."""
        pending = [
            c for c in classes
            if (self.skip_segmentation
                or self.checkpoint.stage_done(c, "segmentation"))
            and not self.checkpoint.stage_done(c, "projection")
            and os.path.isdir(os.path.join(self.cfg.paths.mask_2d_dir, c))
        ]
        if len(pending) < 2:
            return
        from beyondff_tpu.pipeline import projection

        t0 = time.time()
        try:
            projection.run_classes(self.cfg, pending)
        except Exception:
            traceback.print_exc()
            print("[sweep] amortized projection failed; classes fall back to "
                  "the per-class stage")
            return
        for c in pending:
            self.checkpoint.mark(c, "projection", True)
        print(f"[sweep] amortized projection: {len(pending)} classes "
              f"({time.time() - t0:.1f}s)")

    def run(self, classes: Optional[Sequence[str]] = None,
            skip: Sequence[str] = DEFAULT_SKIP,
            amortize_segmentation: bool = False) -> Dict[str, Dict[str, bool]]:
        classes = classes if classes is not None else default_class_list()
        todo = [c for c in classes if c not in skip]
        if self.hosts > 1:
            todo = host_partition(todo, self.hosts, self.host)
            print(f"[sweep] host {self.host}/{self.hosts}: "
                  f"{len(todo)} classes of the partition")
        if not self.use_subprocess:
            if amortize_segmentation and not self.skip_segmentation:
                self._amortized_segmentation(todo)
            if self.amortize_projection:
                self._amortized_projection(todo)
        results = {}
        for class_name in todo:
            results[class_name] = self.process_class(class_name)
        return results
