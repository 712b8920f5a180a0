"""Sweep orchestration: class x stage execution with checkpointed resume."""

from beyondff_tpu.orchestration.sweep import (  # noqa: F401
    SweepRunner,
    default_class_list,
    host_partition,
    merge_host_results,
    resolve_hosts,
)
