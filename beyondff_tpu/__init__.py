"""BeyondFF-TPU: TPU-native query-aware refinement for open-vocabulary 3D instance segmentation.

A ground-up JAX / XLA / Pallas / pjit rebuild of the Beyond-Fixed-Forms pipeline
(reference: zhenghao2519/Beyond-Fixed-Forms). Given a 3D point cloud, posed
multi-view RGB-D frames, a free-text query and stage-1 3D instance masks, the
framework

  1. detects + segments the queried object in 2D frames (Grounding-DINO + SAM,
     or YOLO-World + EfficientSAM) as batched XLA inference under CLIP
     supervision (``beyondff_tpu.pipeline.segmentation_2d``),
  2. lifts 2D masks onto the point cloud with a fused back-projection /
     visibility / mask-gather kernel and aggregates multi-view votes into
     query-aware 3D masks (``beyondff_tpu.pipeline.projection``),
  3. fuses stage-1 and stage-2 masks into refined final instances
     (``beyondff_tpu.pipeline.refinement``),

evaluated with the ScanNet200 AP protocol (``beyondff_tpu.eval``).

The on-disk contracts (per-scene ``.pth``/``.npz`` stage outputs, RLE mask
encoding, ``{"ins","conf","final_class"}`` dicts) are byte-compatible with the
reference so outputs interoperate both ways.
"""

__version__ = "0.1.0"
