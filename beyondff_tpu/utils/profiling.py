"""Tracing and throughput instrumentation.

The reference has no profiling beyond tqdm rates (SURVEY.md §5). Here every
stage driver can record named spans and derived rates (scenes/min,
frames/sec — the north-star metrics), and any region can be captured as an
XLA/TPU profile via ``trace`` for TensorBoard.

Usage:
    prof = StageProfiler("projection")
    with prof.span("lift", frames=len(chunk)):
        ...
    print(prof.report())

    with trace("/tmp/tb"):          # jax.profiler capture
        run_heavy_thing()
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StageProfiler:
    def __init__(self, stage: str):
        self.stage = stage
        self.durations: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.items: Dict[str, int] = defaultdict(int)
        self._t0 = time.time()

    @contextlib.contextmanager
    def span(self, name: str, **items: int) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.durations[name] += time.perf_counter() - t0
            self.counts[name] += 1
            for key, n in items.items():
                self.items[f"{name}.{key}"] += int(n)

    def rate(self, name: str, item: str) -> Optional[float]:
        """items/sec for a span, e.g. rate("lift", "frames")."""
        dur = self.durations.get(name)
        n = self.items.get(f"{name}.{item}")
        if not dur or n is None:
            return None
        return n / dur

    def report(self) -> str:
        total = time.time() - self._t0
        lines = [f"[{self.stage}] wall={total:.2f}s"]
        for name in self.durations:
            line = f"  {name}: {self.durations[name]:.2f}s x{self.counts[name]}"
            for key, n in self.items.items():
                span, _, item = key.partition(".")
                if span == name:
                    line += f" | {n} {item} ({n / max(self.durations[name], 1e-9):.1f}/s)"
            lines.append(line)
        return "\n".join(lines)

    def to_json(self) -> str:
        return json.dumps(
            {
                "stage": self.stage,
                "durations_s": dict(self.durations),
                "counts": dict(self.counts),
                "items": dict(self.items),
            }
        )


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler capture around a region (view in TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a device trace."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
