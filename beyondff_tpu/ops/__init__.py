"""Device op namespace: the framework's TPU compute primitives in one place.

Implementations live in :mod:`beyondff_tpu.core` (pure-jnp ops with numpy
oracles) and :mod:`beyondff_tpu.kernels` (Pallas TPU kernels); this module is
the stable import surface for users composing custom pipelines.
"""

from beyondff_tpu.core.geometry import (  # noqa: F401
    fuse_projection,
    homogenize,
    lift_frames,
    lift_frames_packed,
    pack_masks,
    project_and_test,
    view_counts,
)
from beyondff_tpu.core.masks import (  # noqa: F401
    connected_components,
    group_or_and_mean,
    mask_iou,
    pairwise_iou,
)
from beyondff_tpu.kernels.flash_attention import attend as flash_attention  # noqa: F401
from beyondff_tpu.kernels.mask_iou import pad_and_iou as pairwise_iou_pallas  # noqa: F401
