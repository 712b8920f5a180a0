"""Visualization exports for every pipeline intermediate."""

from beyondff_tpu.visualization.visualize import SceneVisualizer  # noqa: F401
