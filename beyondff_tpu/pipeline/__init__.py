"""Stage drivers: segmentation_2d -> projection -> refinement, plus sweep/eval CLIs."""
