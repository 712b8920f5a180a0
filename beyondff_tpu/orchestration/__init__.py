"""Sweep orchestration: class x stage execution with checkpointed resume."""

from beyondff_tpu.orchestration.sweep import SweepRunner, default_class_list  # noqa: F401
