"""ScanNet-protocol instance-segmentation evaluation (AP/AP50/AP25, recall)."""

from beyondff_tpu.eval.instance_eval import ScanNetEval  # noqa: F401
