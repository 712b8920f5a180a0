"""Dataset metadata, split lists and frame readers."""

from beyondff_tpu.data import replica, s3dis, scannet200, scannetpp  # noqa: F401
from beyondff_tpu.data.readers import ReplicaReader, S3DISReader, ScanNetReader, build_dataset  # noqa: F401
